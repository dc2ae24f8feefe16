"""Scaled-down CI version of the real-annotation mAP proxy
(scripts/voc_real_anno_proxy.py; full results in NOTES.md round 3).

The full proxy trains ResNet-50 on TPU over 2,501 rendered real-VOC-GT
images and evaluates 20-class mAP on 2,510 val images.  CI can't train to
convergence, so this covers the proxy's *machinery* with discriminating
assertions:

  * rendering real annotation XMLs is deterministic and class-keyed;
  * the comp3 -> VOC-evaluator loop scores perfect GT-derived detections at
    mAP == 1.0 WITH difficult boxes correctly excluded;
  * corrupting classes or geometry measurably drops the score (the
    evaluator discriminates — the same property the full proxy proved on
    the trained model: clean 0.5960 vs reg-slice-bug 0.3593).
"""

import os

import numpy as np
import pytest

SRC_VOC = "/root/reference/test_data/VOC_test"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.path.join(SRC_VOC, "Annotations")),
    reason="reference VOC annotations not mounted",
)


@pytest.fixture(scope="module")
def proxy_tree(tmp_path_factory):
    from faster_rcnn_tpu.data.synth_render import build_proxy_dataset
    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING

    out = str(tmp_path_factory.mktemp("proxy") / "VOC")
    names = build_proxy_dataset(
        SRC_VOC, out, VOC_CLASS_MAPPING, img_sets=("val",), limit=16
    )
    return out, names


@needs_ref
def test_render_determinism_and_class_keying(proxy_tree):
    from PIL import Image as PilImage

    from faster_rcnn_tpu.data.synth_render import class_style, render_image
    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING, parse_annotation

    out, names = proxy_tree
    assert len(names) == 16
    # every annotation copied verbatim; every image rendered at XML size
    rec = parse_annotation(out, names[0])
    with PilImage.open(os.path.join(out, "JPEGImages", names[0] + ".jpg")) as im:
        assert (im.height, im.width) == (rec.height, rec.width)

    boxes = [tuple(b.corners.astype(int)) for b in rec.gt_boxes]
    cls = [VOC_CLASS_MAPPING[b.obj_cls] for b in rec.gt_boxes]
    a = render_image(names[0], rec.height, rec.width, boxes, cls, seed=0)
    b2 = render_image(names[0], rec.height, rec.width, boxes, cls, seed=0)
    np.testing.assert_array_equal(a, b2)

    # class styles must be pairwise distinct in (hue, orientation, period)
    styles = [class_style(i) for i in range(20)]
    sigs = {(tuple(s["base"].round(0)), s["orient"], s["period_div"]) for s in styles}
    assert len(sigs) == 20


def _write_dets_from_gt(out, names, perturb=None):
    """comp3 files with one detection per GT box (difficult included — the
    evaluator must IGNORE those, not count them as FP)."""
    from faster_rcnn_tpu.data.voc import parse_annotation
    from faster_rcnn_tpu.inference import write_dets

    rng = np.random.RandomState(0)
    dets_by_cls = {}
    for n in names:
        rec = parse_annotation(out, n)
        for b in rec.gt_boxes:
            cls_name, bbox = b.obj_cls, b.corners.astype(int)
            if perturb:
                cls_name, bbox = perturb(rng, cls_name, bbox)
            dets_by_cls.setdefault(cls_name, {}).setdefault(n, []).append(
                {"bbox": np.asarray(bbox), "prob": float(rng.uniform(0.5, 1.0))}
            )
    det_dir = os.path.join(out, "dets")
    write_dets(dets_by_cls, det_dir)
    return det_dir


def _present_classes(out, names):
    """Classes with at least one NON-difficult GT box in the subset (a class
    whose instances are all 'difficult' has npos == 0 and scores AP 0 even
    on perfect detections — correct VOC semantics)."""
    from faster_rcnn_tpu.data.voc import parse_annotation

    present = set()
    for n in names:
        for b in parse_annotation(out, n).gt_boxes:
            if not b.difficult:
                present.add(b.obj_cls)
    return sorted(present)


@needs_ref
def test_eval_loop_perfect_dets_score_1(proxy_tree):
    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING
    from faster_rcnn_tpu.evaluate import eval_all

    out, names = proxy_tree
    det_dir = _write_dets_from_gt(out, names)
    aps = eval_all(det_dir, out, VOC_CLASS_MAPPING, img_set="val", verbose=False)
    present = _present_classes(out, names)
    assert len(present) >= 5  # 16 real VOC images cover many classes
    for c in present:
        assert aps[c] == pytest.approx(1.0), (c, aps)


@needs_ref
def test_eval_loop_discriminates_corruption(proxy_tree):
    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING
    from faster_rcnn_tpu.evaluate import eval_all

    out, names = proxy_tree
    classes = [c for c in VOC_CLASS_MAPPING if c != "bg"]

    def wrong_class(rng, cls_name, bbox):
        others = [c for c in classes if c != cls_name]
        return others[rng.randint(len(others))], bbox

    def shifted_box(rng, cls_name, bbox):
        w = bbox[2] - bbox[0]
        return cls_name, bbox + np.array([w, 0, w, 0])  # shift by one width -> IoU < 0.5

    present = _present_classes(out, names)

    def mean_present(det_dir):
        aps = eval_all(det_dir, out, VOC_CLASS_MAPPING, img_set="val", verbose=False)
        return float(np.mean([aps[c] for c in present]))

    clean = mean_present(_write_dets_from_gt(out, names))
    bad_cls = mean_present(_write_dets_from_gt(out, names, wrong_class))
    bad_box = mean_present(_write_dets_from_gt(out, names, shifted_box))
    assert clean == pytest.approx(1.0)
    assert bad_cls < 0.25, (clean, bad_cls)
    assert bad_box < 0.25, (clean, bad_box)
