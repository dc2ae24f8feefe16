"""Fixture-forward golden on a SEEDED (proxy-trained) tree.

VERDICT r3 #10: the always-runnable transplant golden
(test_reference_fixture.py) pins numerics with a random-init backbone, so
its detections are quality-degenerate (zero-width boxes at negative
coords).  This module pins a second golden whose tree went through the
PRODUCTION seeding path — ``load_keras_h5`` of a Keras-2.0.8-layout h5
exported from the real-annotation-proxy joint checkpoint (the same by_name
h5 posture as the reference: resnet.py:481-485, 545-551) — run on the
deterministic proxy rendering of VOC image 000005.  The pinned detections
therefore exercise realistic decode ranges: positive box extents inside the
image frame at trained-model score spreads.

Gated on the seed h5 (produced by ``scripts/seeded_h5_derisk.py``; override
with FRCNN_SEED_H5).  The per-detection golden is additionally pinned to the
SHA-256 of the exact h5 it was captured from (GOLDEN_SEED_H5_SHA256): the h5
is an uncommitted, regenerable artifact, so a regenerated seed tree produces
*different but equally valid* detections — in that case the geometry
invariants still run and the golden comparison skips with a loud reason
instead of failing with confusing per-box errors.  To re-pin after a
regeneration, capture on the CPU backend and update BOTH constants:

    JAX_PLATFORMS=cpu python -m tests.test_seeded_fixture
"""

import hashlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

REF = "/root/reference"
VOC_TEST = os.path.join(REF, "test_data", "VOC_test")
SEED_H5 = os.environ.get("FRCNN_SEED_H5", "/tmp/voc_real_proxy/r50_seed.h5")

# SHA-256 of the seed h5 GOLDEN_SEEDED_DETS was captured from (r4 proxy-joint
# run, 2026-08-19).  A mismatch means the proxy was re-run since capture.
GOLDEN_SEED_H5_SHA256 = (
    "3cb568aa79e49d9d87503bea740d06f36f50c47a4f9edcc988497cd36432d600"
)

needs_seed_h5 = pytest.mark.skipif(
    not os.path.exists(SEED_H5),
    reason="seeded h5 not present (run scripts/seeded_h5_derisk.py)",
)
needs_voc = pytest.mark.skipif(
    not os.path.exists(VOC_TEST), reason="reference VOC mount not present"
)


def _seed_h5_sha256() -> str:
    h = hashlib.sha256()
    with open(SEED_H5, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def proxy_cfg():
    """EXACTLY the config the proxy trained the seed tree with
    (scripts/voc_real_anno_proxy.py _A), except f32 compute + einsum
    roi-align for cross-backend golden stability (same rationale as
    test_reference_fixture.small_net_cfg)."""
    import dataclasses

    from faster_rcnn_tpu.cli.common import config_from_args

    class _A:
        voc_paths = VOC_TEST
        network = "resnet50"
        resize_dims = "600,1000"
        anchor_scales = "16,32,64,128,256,512"
        kitti = False
        freeze_blocks = "none"

    cfg = config_from_args(_A())
    return cfg.replace(
        det=dataclasses.replace(cfg.det, roi_align_impl="einsum"),
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
    )


def _render_000005(tmpdir: str) -> str:
    """Materialize the deterministic proxy rendering of 000005 in a VOC
    layout (same renderer + jpeg quality as build_proxy_dataset, so the
    pixels match what the seed tree was trained on)."""
    import shutil

    from PIL import Image as PilImage

    from faster_rcnn_tpu.data.synth_render import render_image
    from faster_rcnn_tpu.data.voc import VOC_CLASS_MAPPING, parse_annotation

    for d in ("JPEGImages", "Annotations"):
        os.makedirs(os.path.join(tmpdir, d), exist_ok=True)
    shutil.copyfile(
        os.path.join(VOC_TEST, "Annotations", "000005.xml"),
        os.path.join(tmpdir, "Annotations", "000005.xml"),
    )
    rec = parse_annotation(VOC_TEST, "000005")
    boxes = [tuple(b.corners.astype(int)) for b in rec.gt_boxes]
    cls = [VOC_CLASS_MAPPING[b.obj_cls] for b in rec.gt_boxes]
    img = render_image("000005", rec.height, rec.width, boxes, cls, seed=0)
    PilImage.fromarray(img).save(
        os.path.join(tmpdir, "JPEGImages", "000005.jpg"), quality=92
    )
    return tmpdir


def _seeded_forward_outputs(tmpdir: str):
    import jax.numpy as jnp

    from faster_rcnn_tpu.data.voc import parse_annotation
    from faster_rcnn_tpu.inference import make_detect_fn
    from faster_rcnn_tpu.models.detector import init_model, preprocess_rgb
    from faster_rcnn_tpu.utils.keras_import import load_keras_h5

    cfg = proxy_cfg()
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    seeded, seeded_stats, loaded = load_keras_h5(SEED_H5, params, batch_stats)
    assert len(loaded) > 100, f"seed h5 only matched {len(loaded)} layers"
    variables = {"params": seeded, "batch_stats": seeded_stats}

    data_dir = _render_000005(tmpdir)
    record = parse_annotation(data_dir, "000005")
    record, _ = record.resize_within_bounds(cfg.data.resize_min, cfg.data.resize_max)
    pixels = preprocess_rgb(record.load_pixels())
    canvas = np.zeros((1, cfg.data.canvas_h, cfg.data.canvas_w, 3), np.float32)
    canvas[0, : record.height, : record.width] = pixels
    img_hw = np.array([[record.height, record.width]], np.int32)

    detect = make_detect_fn(cfg, model, variables)
    out = detect(jnp.asarray(canvas), jnp.asarray(img_hw))
    valid = np.asarray(out.valid)[0]
    return sorted(
        (int(c), round(float(b[0]), 2), round(float(b[1]), 2),
         round(float(b[2]), 2), round(float(b[3]), 2), round(float(s), 4))
        for c, b, s in zip(np.asarray(out.classes)[0][valid],
                           np.asarray(out.boxes)[0][valid],
                           np.asarray(out.scores)[0][valid])
    )


# Captured on the CPU backend from the r4 final proxy-joint seed h5 (sha256
# pinned above).  000005's GT is 2 chairs + 3 difficult chairs/sofa; the
# seeded model fires on the rendered chair textures with full-extent boxes.
GOLDEN_SEEDED_DETS = [
    (8, 6.18, 392.87, 103.8, 590.61, 0.9325),
    (8, 16.72, 395.86, 99.21, 479.79, 0.5877),
    (8, 265.11, 415.6, 417.58, 588.89, 0.9096),
    (8, 286.56, 393.29, 509.39, 583.29, 0.7855),
    (8, 374.74, 366.88, 508.09, 473.86, 0.8117),
    (8, 386.86, 299.51, 519.07, 453.47, 0.8589),
    (8, 388.38, 299.63, 462.33, 492.51, 0.7635),
]


@needs_seed_h5
@needs_voc
def test_seeded_forward_golden(tmp_path):
    got = _seeded_forward_outputs(str(tmp_path))
    # Realistic-geometry invariants the random-init golden cannot offer:
    # every detection a positive-extent box inside the (padded) frame.
    # These run for ANY seed h5, pinned or not.
    assert len(got) >= 3
    for c, x1, y1, x2, y2, s in got:
        assert x2 > x1 and y2 > y1, (c, x1, y1, x2, y2)
        assert x1 >= -50 and y1 >= -50 and x2 <= 1050 and y2 <= 650
        assert 0.0 < s <= 1.0
    # The per-detection golden only applies to the exact h5 it was captured
    # from; a regenerated proxy h5 is valid but different.
    sha = _seed_h5_sha256()
    if sha != GOLDEN_SEED_H5_SHA256:
        pytest.skip(
            f"seed h5 differs from golden capture (sha256 {sha[:12]}… != "
            f"{GOLDEN_SEED_H5_SHA256[:12]}…): geometry invariants passed; "
            "re-pin with JAX_PLATFORMS=cpu python -m tests.test_seeded_fixture"
        )
    # Same per-detection pinning tightness as the transplant golden.
    assert len(got) == len(GOLDEN_SEEDED_DETS), (len(got), got)
    for g, ref in zip(got, GOLDEN_SEEDED_DETS):
        assert g[0] == ref[0], (g, ref)
        for got_v, ref_v in zip(g[1:5], ref[1:5]):
            assert abs(got_v - ref_v) <= 0.5, (g, ref)
        assert abs(g[5] - ref[5]) <= 5e-3, (g, ref)


if __name__ == "__main__":
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        print("GOLDEN_SEEDED_DETS = [")
        for det in _seeded_forward_outputs(td):
            print(f"    {det},")
        print("]")
