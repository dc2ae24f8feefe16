"""Automated tests for the last two previously smoke-only CLIs (PARITY C17/C18):
cli.annotate (annotate_video.py rebuild) and cli.gt_stats
(gt_object_stats.py rebuild)."""

import io
import os
import re
from contextlib import redirect_stdout

import jax
import numpy as np
import pytest
from PIL import Image as PilImage

from tests.test_data import make_voc_tree


# ---------------------------------------------------------------------------
# gt_stats: stats must match hand-computed values
# ---------------------------------------------------------------------------

def test_gt_stats_matches_hand_computed(tmp_path):
    from faster_rcnn_tpu.cli import gt_stats

    root = str(tmp_path / "VOC")
    # 1-based VOC coords; parsed 0-based. resize_dims 90,120 -> ratio 1.
    make_voc_tree(
        root,
        [
            ("000001", 120, 90, [("dog", False, 21, 21, 61, 51),     # w=40 h=30
                                 ("cat", False, 11, 11, 31, 91)]),   # w=20 h=80
            ("000002", 120, 90, [("dog", False, 1, 1, 101, 41)]),    # w=100 h=40
        ],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        gt_stats.main([
            "--voc_paths", root, "--img_set", "trainval",
            "--resize_dims", "90,120",
        ])
    out = buf.getvalue()

    heights = np.array([30.0, 80.0, 40.0])
    widths = np.array([40.0, 20.0, 100.0])
    areas = heights * widths
    assert f"height: count=3 mean={heights.mean():.1f}" in out
    assert f"std={heights.std():.1f}" in out
    assert f"width: count=3 mean={widths.mean():.1f}" in out
    assert f"area: count=3 mean={areas.mean():.1f}" in out
    # median height = 40, p25 width = 30
    assert re.search(r"height: .*p50=40\.0", out), out
    assert re.search(r"width: .*p25=30\.0", out), out
    guide = [round(float(x), 1) for x in np.percentile(np.sqrt(areas), [5, 25, 50, 75, 95])]
    assert str(guide) in out

    # class filter: only 'dog' boxes
    buf = io.StringIO()
    with redirect_stdout(buf):
        gt_stats.main([
            "--voc_paths", root, "--img_set", "trainval",
            "--resize_dims", "90,120", "--obj_class", "dog",
        ])
    assert "height: count=2" in buf.getvalue()


# ---------------------------------------------------------------------------
# annotate: output frames exist; drawn-box count equals an independent
# detection count under the same threshold/skip/boundary rules
# ---------------------------------------------------------------------------

def _save_fake_checkpoint(workdir, step, params):
    from faster_rcnn_tpu.utils import checkpoint as ckpt_lib

    ckpt_lib.save(os.path.join(workdir, f"step{step}"), 1,
                  {"state": {"params": params}}, wait=True)


def test_annotate_draws_expected_boxes(tmp_path):
    from faster_rcnn_tpu.cli import annotate as annotate_cli
    from faster_rcnn_tpu.data.pipeline import prepare_example
    from faster_rcnn_tpu.data.voc import ImageRecord, VOC_CLASS_MAPPING
    from faster_rcnn_tpu.inference import detections_to_records, make_detect_fn
    from faster_rcnn_tpu.models.detector import init_model

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        arr = (rng.rand(60, 96, 3) * 255).astype(np.uint8)
        arr[15:40, 20 + 20 * i:55 + 20 * i] = (210, 60, 50)
        PilImage.fromarray(arr).save(frames / f"f{i}.png")

    workdir = str(tmp_path / "work")
    args = [
        "--voc_paths", "unused", "--network", "vgg16",
        "--resize_dims", "60,96", "--anchor_scales", "16,32",
        "--input_dir", str(frames), "--output_dir", str(tmp_path / "out"),
        "--workdir", workdir, "--from_step", "4", "--det_threshold", "0.05",
    ]
    # fresh-init params checkpoint (random weights are fine: the test pins
    # the drawing/wiring contract, not model quality)
    from faster_rcnn_tpu.cli.common import config_from_args

    import argparse

    p = argparse.ArgumentParser()
    from faster_rcnn_tpu.cli.common import add_common_args

    add_common_args(p, training=False)
    cfg = config_from_args(p.parse_args(args[:8]))
    _, variables = init_model(jax.random.PRNGKey(3), cfg)
    _save_fake_checkpoint(workdir, 4, variables["params"])

    summary = annotate_cli.main(args)

    out_dir = tmp_path / "out"
    assert sorted(os.path.basename(p_) for p_, _ in summary) == ["f0.png", "f1.png"]
    for path, n_drawn in summary:
        out_path = out_dir / os.path.basename(path)
        assert out_path.exists()
        with PilImage.open(out_path) as im:
            assert (im.width, im.height) == (96, 60)

        # independent expected count through the library API
        detect = make_detect_fn(cfg, init_model(jax.random.PRNGKey(3), cfg)[0],
                                {"params": variables["params"],
                                 "batch_stats": variables.get("batch_stats", {})},
                                uint8_input=True)
        with PilImage.open(path) as im:
            w, h = im.width, im.height
        rec = ImageRecord(os.path.basename(path), w, h, [], path)
        rec, ratio = rec.resize_within_bounds(cfg.data.resize_min, cfg.data.resize_max)
        ex = prepare_example(rec, VOC_CLASS_MAPPING, cfg, uint8=True)
        dets = detect(ex["image"][None], ex["img_hw"][None])
        rev = {v: k for k, v in VOC_CLASS_MAPPING.items()}
        class_names = [rev[i] for i in range(len(rev))]
        recs = detections_to_records(dets, [ratio], class_names)[0]
        expected = 0
        for det in recs:
            if det["prob"] < 0.05 or det["cls_name"] in annotate_cli.SKIP_CLASSES:
                continue
            x1, y1, x2, y2 = det["bbox"]
            if x1 < 0 or y1 < 0 or x2 >= w or y2 >= h:
                continue
            expected += 1
        assert n_drawn == expected, (path, n_drawn, expected)
        if n_drawn > 0:
            with PilImage.open(path) as orig, PilImage.open(out_path) as ann:
                assert np.any(np.asarray(orig) != np.asarray(ann)), "nothing drawn"
