"""Data layer tests on a synthetic mini-VOC tree."""

import os

import numpy as np
import pytest
from PIL import Image as PilImage

from faster_rcnn_tpu.config import FasterRcnnConfig, DataConfig
from faster_rcnn_tpu.data import voc
from faster_rcnn_tpu.data.pipeline import TrainLoader, canvas_for, prepare_example

ANNOTATION_TMPL = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>"""

OBJECT_TMPL = """<object>
    <name>{cls}</name><difficult>{diff}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def make_voc_tree(root, images):
    """images: list of (name, w, h, [(cls, diff, x1, y1, x2, y2)]) in 1-based
    VOC coords."""
    for d in (voc.IMAGES_DIR, voc.ANNOTATIONS_DIR, voc.IMAGESETS_DIR):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    names = []
    for name, w, h, objects in images:
        arr = (np.random.RandomState(hash(name) % 2**31).rand(h, w, 3) * 255).astype(np.uint8)
        PilImage.fromarray(arr).save(os.path.join(root, voc.IMAGES_DIR, name + ".jpg"))
        objs = "".join(
            OBJECT_TMPL.format(cls=c, diff=int(d), x1=x1, y1=y1, x2=x2, y2=y2)
            for c, d, x1, y1, x2, y2 in objects
        )
        with open(os.path.join(root, voc.ANNOTATIONS_DIR, name + ".xml"), "w") as f:
            f.write(ANNOTATION_TMPL.format(name=name, w=w, h=h, objects=objs))
        names.append(name)
    with open(os.path.join(root, voc.IMAGESETS_DIR, "trainval.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return names


@pytest.fixture
def voc_root(tmp_path):
    root = str(tmp_path / "VOC")
    make_voc_tree(
        root,
        [
            ("000001", 500, 375, [("dog", False, 49, 241, 62, 295), ("person", True, 11, 21, 111, 121)]),
            ("000002", 300, 400, [("car", False, 101, 101, 201, 201)]),  # portrait
        ],
    )
    return root


class TestParsing:
    def test_annotation_parse_and_coord_shift(self, voc_root):
        rec = voc.parse_annotation(voc_root, "000001")
        assert (rec.width, rec.height) == (500, 375)
        assert len(rec.gt_boxes) == 2
        b = rec.gt_boxes[0]
        # 1-based VOC -> 0-based
        assert (b.x1, b.y1, b.x2, b.y2) == (48, 240, 61, 294)
        assert not b.difficult and rec.gt_boxes[1].difficult

    def test_missing_annotation_synthesized_in_memory(self, voc_root):
        # drop in an image with no xml (KITTI-test situation)
        arr = np.zeros((100, 200, 3), np.uint8)
        PilImage.fromarray(arr).save(os.path.join(voc_root, voc.IMAGES_DIR, "999999.jpg"))
        rec = voc.parse_annotation(voc_root, "999999")
        assert (rec.width, rec.height) == (200, 100)
        assert rec.gt_boxes == []
        # crucially: nothing written into the dataset dir (reference quirk fixed)
        assert not os.path.exists(os.path.join(voc_root, voc.ANNOTATIONS_DIR, "999999.xml"))

    def test_load_dataset_flip_doubles_and_resizes(self, voc_root):
        recs, ratios = voc.load_dataset([voc_root], "trainval", flip=True)
        assert len(recs) == 4
        r0 = recs[0]
        assert min(r0.width, r0.height) == 600 or max(r0.width, r0.height) == 1000
        # flipped copy: boxes mirrored
        orig, flipped = recs[0], recs[2]
        assert flipped.flipped
        np.testing.assert_allclose(
            flipped.gt_boxes[0].x1, orig.width - orig.gt_boxes[0].x2, atol=1e-3
        )

    def test_resize_policy_max_side(self):
        rec = voc.ImageRecord("x", 2000, 500, [], "none.jpg")
        out, ratio = rec.resize_within_bounds(600, 1000)
        assert out.width == 1000  # max-side binds
        assert abs(ratio - 0.5) < 1e-6


class TestPipeline:
    def test_prepare_example_padding(self, voc_root):
        cfg = FasterRcnnConfig()
        recs, _ = voc.load_dataset([voc_root], "trainval", flip=False)
        ex = prepare_example(recs[0], voc.VOC_CLASS_MAPPING, cfg)
        assert ex["image"].shape == (608, 1024, 3)
        h, w = ex["img_hw"]
        assert h <= 608 and w <= 1024
        # padding region equals preprocessed zeros? No — canvas is zero-filled
        assert np.all(ex["image"][h:, :, :] == 0)
        assert ex["gt_valid"].sum() == 2
        assert ex["gt_class"][0] == voc.VOC_CLASS_MAPPING["dog"]

    def test_orientation_bucketing(self, voc_root):
        cfg = FasterRcnnConfig()
        recs, _ = voc.load_dataset([voc_root], "trainval", flip=False)
        canvases = {canvas_for(r, cfg) for r in recs}
        assert canvases == {(608, 1024), (1024, 608)}

    def test_loader_yields_homogeneous_batches(self, voc_root):
        cfg = FasterRcnnConfig()
        recs, _ = voc.load_dataset([voc_root], "trainval", flip=True)
        loader = TrainLoader(recs, voc.VOC_CLASS_MAPPING, cfg, batch_size=2, num_workers=1)
        it = iter(loader)
        for _ in range(3):
            canvas, batch = next(it)
            assert batch["image"].shape == (2, canvas[0], canvas[1], 3)
            assert batch["gt_boxes"].shape == (2, cfg.data.max_gt_boxes, 4)


class TestNativeLoader:
    def test_native_matches_pil_at_identity_resize(self, voc_root):
        from faster_rcnn_tpu.data import native_loader
        from faster_rcnn_tpu.models.detector import preprocess_rgb

        if not native_loader.available():
            pytest.skip("native loader unavailable (no g++/libjpeg)")
        rec = voc.parse_annotation(voc_root, "000001")  # 500x375, no resize
        got = native_loader.load_canvas_native(
            rec.image_path, 400, 520, rec.height, rec.width, False
        )
        assert got is not None and got.shape == (400, 520, 3)
        # identity-scale bicubic has weights [0,1,0,0] -> decode+preprocess only;
        # PIL and the native path share libjpeg, so this is near-exact
        pixels = rec.load_pixels()
        want = preprocess_rgb(pixels)
        np.testing.assert_allclose(got[:375, :500], want, atol=1.0)
        assert np.all(got[375:] == 0) and np.all(got[:, 500:] == 0)

    def test_native_flip(self, voc_root):
        from faster_rcnn_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native loader unavailable")
        rec = voc.parse_annotation(voc_root, "000001")
        a = native_loader.load_canvas_native(rec.image_path, 375, 500, 375, 500, False)
        b = native_loader.load_canvas_native(rec.image_path, 375, 500, 375, 500, True)
        np.testing.assert_allclose(a, b[:, ::-1], atol=1e-4)

    def test_native_resize_smoke(self, voc_root):
        from faster_rcnn_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native loader unavailable")
        rec = voc.parse_annotation(voc_root, "000001")
        out = native_loader.load_canvas_native(rec.image_path, 256, 320, 192, 256, False)
        assert out is not None
        region = out[:192, :256]
        assert np.isfinite(region).all()
        # preprocessed values live in roughly [-MEAN, 255-MEAN] plus bicubic
        # overshoot (Catmull-Rom can exceed the input range on noise images)
        assert region.min() >= -180 and region.max() <= 220
