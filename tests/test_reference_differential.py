"""Differential parity tests: our ops vs the REFERENCE'S OWN runnable code.

Every other parity test in this suite compares against
``tests/reference_impl.py`` — an independently written oracle from the
behavioral spec in SURVEY.md.  That independence avoids copying, but a sole
self-authored oracle can share its author's misreadings of the spec (VERDICT
r4 "What's missing" #1).  This module closes that blind spot by importing the
reference's actual NumPy machinery from ``/root/reference`` (read-only mount)
and running randomized head-to-head comparisons:

  (a) geometry: util.cross_ious / get_reg_params / transform_np_inplace /
      get_anchors (util.py:55-253) vs ops/boxes.py + config.compute_anchor_dims;
      anchor grids (rpn_util.py:276-298, det_util.py:162-175) vs ops/anchors.py.
  (b) NMS: det_util.nms (det_util.py:209-256) vs ops/nms.nms_topk across
      thresholds, box densities, and duplicate boxes.
  (c) RPN label assignment: RpnTrainingManager._process (rpn_util.py:54-103)
      + _apply_sampling boundary behavior vs ops/targets.rpn_targets on
      synthetic shapes.Image stubs.
  (d) proposal decode/clip (det_util.py:162-192, 370-380), the full
      train-path proposal chain (det_util.py:63-77), and det target
      construction (_rois_to_truth, det_util.py:310-366) vs
      ops/proposals.generate_proposals + ops/targets.det_targets.
  (e) data layer: voc_data_helpers.extract_img_metadata vs data/voc.py
      parse_annotation over the reference's real VOC2007 annotation XMLs,
      and shapes.Image.resize_within_bounds vs ImageRecord's.

The reference code is executed, never copied; it uses flat intra-package
imports, so ``/root/reference/faster_rcnn`` is appended (not prepended) to
sys.path to avoid shadowing anything of ours.  All comparisons that involve
float rounding allow the documented fp32-vs-fp64 half-tie slack (PARITY.md
C2); everything integral is compared exactly.
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_PKG = "/root/reference/faster_rcnn"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PKG), reason="reference mount not present"
)

if os.path.isdir(REF_PKG):
    if REF_PKG not in sys.path:
        sys.path.append(REF_PKG)  # flat imports: util, shapes, det_util, ...
    import det_util as ref_det_util  # noqa: E402
    import rpn_util as ref_rpn_util  # noqa: E402
    import shapes as ref_shapes  # noqa: E402
    import util as ref_util  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from faster_rcnn_tpu.config import compute_anchor_dims  # noqa: E402
from faster_rcnn_tpu.ops import anchors as anchor_ops  # noqa: E402
from faster_rcnn_tpu.ops import boxes as box_ops  # noqa: E402
from faster_rcnn_tpu.ops import nms as nms_ops  # noqa: E402
from faster_rcnn_tpu.ops.proposals import (  # noqa: E402
    generate_proposals,
    position_validity,
)
from faster_rcnn_tpu.ops.targets import (  # noqa: E402
    BBREG_MULTIPLIERS,
    det_targets,
    rpn_targets,
)

STRIDE = 16


def _random_boxes(rng, n, lo, hi, min_dim=1, max_dim=None, dtype=np.float32):
    """n random [x1,y1,x2,y2] boxes with positive integer dims in [lo, hi)."""
    max_dim = max_dim or (hi - lo)
    x1 = rng.randint(lo, hi - min_dim, size=n)
    y1 = rng.randint(lo, hi - min_dim, size=n)
    w = rng.randint(min_dim, max_dim + 1, size=n)
    h = rng.randint(min_dim, max_dim + 1, size=n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(dtype)


# ---------------------------------------------------------------------------
# (a) geometry: util.py vs ops/boxes.py + ops/anchors.py + config
# ---------------------------------------------------------------------------


class TestGeometryDifferential:
    def test_cross_ious(self):
        fn = jax.jit(box_ops.iou_matrix)
        rng = np.random.RandomState(0)
        for _ in range(50):
            b1 = _random_boxes(rng, 64, 0, 400, min_dim=1, max_dim=200)
            b2 = _random_boxes(rng, 7, 0, 400, min_dim=1, max_dim=300)
            ref = ref_util.cross_ious(b1.copy(), b2.copy())
            got = np.asarray(fn(b1, b2))
            np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)

    def test_get_reg_params(self):
        fn = jax.jit(box_ops.encode)
        rng = np.random.RandomState(1)
        for _ in range(50):
            anchors = _random_boxes(rng, 32, 0, 500, min_dim=4)
            gts = _random_boxes(rng, 32, 0, 500, min_dim=4)
            ref = np.array(
                [ref_util.get_reg_params(a, g) for a, g in zip(anchors, gts)],
                np.float64,
            )
            got = np.asarray(fn(anchors, gts))
            np.testing.assert_allclose(got, ref, rtol=0, atol=3e-6)

    def test_transform_np_inplace(self):
        fn = jax.jit(box_ops.decode)
        rng = np.random.RandomState(2)
        exact = total = 0
        for _ in range(50):
            anchors = _random_boxes(rng, 256, 0, 600, min_dim=2, max_dim=128)
            deltas = np.stack(
                [
                    rng.uniform(-1, 1, 256),
                    rng.uniform(-1, 1, 256),
                    rng.uniform(-0.7, 0.7, 256),
                    rng.uniform(-0.7, 0.7, 256),
                ],
                axis=1,
            ).astype(np.float32)
            # reference mutates its input; hand it a copy
            ref = ref_util.transform_np_inplace(anchors.copy(), deltas.copy())
            got = np.asarray(fn(anchors, deltas))
            # identical fp32 arithmetic except for the order x2 is rebuilt;
            # allow a 1px half-tie, require near-universal bit equality
            assert np.max(np.abs(got - ref)) <= 1.0
            exact += int(np.sum(got == ref))
            total += ref.size
        assert exact / total >= 0.999, f"only {exact}/{total} bit-equal"

    def test_get_anchors(self):
        rng = np.random.RandomState(3)
        scale_sets = [
            (16, 32, 64, 128, 256, 512),  # KITTI (notes:290)
            (32, 64, 128, 256, 512),
            (64, 128, 256),
        ] + [tuple(sorted(rng.choice([8, 16, 24, 32, 48, 64, 96, 128, 256, 512],
                                     size=4, replace=False))) for _ in range(47)]
        ratios = ((1, 1), (1, 2), (2, 1))
        for scales in scale_sets:
            ref = ref_util.get_anchors(list(scales), [list(r) for r in ratios])
            got = compute_anchor_dims(scales, ratios)
            np.testing.assert_array_equal(got, ref)

    def test_anchor_grid_image_space(self):
        dims = compute_anchor_dims((64, 128, 256), ((1, 1), (1, 2), (2, 1)))
        for rows, cols in [(38, 50), (37, 62), (5, 7), (38, 94)]:
            ref = ref_rpn_util._get_all_anchor_coords(rows, cols, dims, STRIDE)
            got = anchor_ops.anchor_grid_image_space(rows, cols, dims, STRIDE)
            np.testing.assert_array_equal(got, ref)

    def test_anchor_grid_conv_space(self):
        dims = compute_anchor_dims((16, 64, 256, 512), ((1, 1), (1, 2), (2, 1)))
        for rows, cols in [(38, 50), (12, 20), (38, 94)]:
            ref = ref_det_util._get_anchor_coords(
                rows, cols, dims // STRIDE
            ).reshape(-1, 4)
            got = anchor_ops.anchor_grid_conv_space(rows, cols, dims, STRIDE)
            np.testing.assert_array_equal(got, ref)

    def test_out_of_bounds(self):
        dims = compute_anchor_dims((64, 128, 256, 512), ((1, 1), (1, 2), (2, 1)))
        coords = anchor_ops.anchor_grid_image_space(30, 40, dims, STRIDE)
        mask_fn = anchor_ops.out_of_bounds_mask_fn(coords)
        for w, h in [(640, 480), (601, 423), (160, 160)]:
            ref_idx = ref_rpn_util._get_out_of_bounds_idxs(coords, w, h)
            got = np.asarray(mask_fn(w, h))
            np.testing.assert_array_equal(np.where(got)[0], ref_idx)

    def test_clip_to_grid(self):
        fn = jax.jit(box_ops.clip_to_grid, static_argnums=(1, 2))
        rng = np.random.RandomState(4)
        for _ in range(50):
            boxes = _random_boxes(rng, 128, -30, 90, min_dim=1, max_dim=60)
            rows, cols = int(rng.randint(10, 40)), int(rng.randint(10, 60))
            ref = ref_det_util._sanitize_boxes_inplace(cols, rows, boxes.copy())
            got = np.asarray(fn(boxes, rows, cols))
            np.testing.assert_array_equal(got, ref)

    def test_valid_mask(self):
        rng = np.random.RandomState(5)
        for _ in range(50):
            boxes = rng.randint(-5, 30, size=(64, 4)).astype(np.float32)
            ref_idx = ref_det_util._get_valid_box_idxs(boxes)
            got = np.asarray(box_ops.valid_mask(jnp.asarray(boxes)))
            np.testing.assert_array_equal(np.where(got)[0], ref_idx)


# ---------------------------------------------------------------------------
# (b) NMS: det_util.nms vs ops/nms.nms_topk
# ---------------------------------------------------------------------------


class TestNmsDifferential:
    def _compare(self, rng, n, grid, thresh, max_out, dup_frac=0.0):
        boxes = _random_boxes(rng, n, 0, grid, min_dim=2, max_dim=grid // 2)
        if dup_frac:
            ndup = int(n * dup_frac)
            boxes[rng.choice(n, ndup, replace=False)] = boxes[
                rng.choice(n, ndup, replace=True)
            ]
        probs = rng.uniform(0.01, 1.0, n).astype(np.float32)  # a.s. distinct
        ref_boxes, ref_probs = ref_det_util.nms(
            boxes.copy(), probs.copy(), overlap_thresh=thresh, max_boxes=max_out
        )
        got_boxes, got_scores, got_valid = self._fn(
            jnp.asarray(boxes), jnp.asarray(probs), thresh
        )
        got_valid = np.asarray(got_valid)
        got_boxes = np.asarray(got_boxes)[got_valid]
        got_scores = np.asarray(got_scores)[got_valid]
        assert len(got_boxes) == len(ref_boxes), (len(got_boxes), len(ref_boxes))
        np.testing.assert_array_equal(got_boxes, ref_boxes.astype(np.float32))
        np.testing.assert_allclose(got_scores, ref_probs, rtol=0, atol=1e-7)

    def test_randomized(self):
        import functools

        max_out = 64

        @functools.partial(jax.jit, static_argnums=2)
        def fn(boxes, scores, thresh):
            return nms_ops.nms_topk(
                boxes, scores, jnp.ones(boxes.shape[0], bool), max_out, thresh
            )

        self._fn = fn
        rng = np.random.RandomState(10)
        cases = 0
        for thresh in (0.5, 0.7, 0.9):
            for grid in (40, 80, 200):
                for _ in range(6):
                    self._compare(rng, 256, grid, thresh, max_out)
                    cases += 1
        # duplicate boxes: identical coords with distinct scores must suppress
        for _ in range(8):
            self._compare(rng, 256, 60, 0.7, max_out, dup_frac=0.3)
            cases += 1
        assert cases >= 60

    def test_max_boxes_cap(self):
        """The cap truncates selection order identically (det_util.py:253)."""
        import functools

        @functools.partial(jax.jit, static_argnums=2)
        def fn(boxes, scores, thresh):
            return nms_ops.nms_topk(
                boxes, scores, jnp.ones(boxes.shape[0], bool), 8, thresh
            )

        self._fn = fn
        rng = np.random.RandomState(11)
        for _ in range(10):
            self._compare(rng, 128, 300, 0.7, 8)


# ---------------------------------------------------------------------------
# (c) RPN label assignment on shapes.Image stubs
# ---------------------------------------------------------------------------


def _stub_image(rng, width, height, n_gt, classes=("car", "person", "dog")):
    gts = []
    for _ in range(n_gt):
        w = int(rng.randint(10, max(11, width // 2)))
        h = int(rng.randint(10, max(11, height // 2)))
        x1 = int(rng.randint(0, width - w))
        y1 = int(rng.randint(0, height - h))
        gts.append(
            ref_shapes.GroundTruthBox(
                obj_cls=classes[rng.randint(len(classes))],
                difficult=False,
                box=ref_shapes.Box(x1, y1, x1 + w, y1 + h),
            )
        )
    meta = ref_shapes.Metadata(
        "stub", width=width, height=height, gt_boxes=gts, image_path="/dev/null"
    )
    return ref_shapes.Image(meta)


class TestRpnTargetsDifferential:
    def test_label_assignment(self):
        """is_pos / can_use / bbreg targets head-to-head vs
        RpnTrainingManager._process (rpn_util.py:54-103).  Sampling is
        disabled on our side (sample_size = anchor count) so cls_mask equals
        the reference's pre-sampling can_use exactly."""
        dims = compute_anchor_dims((64, 128, 256), ((1, 1), (1, 2), (2, 1)))
        rng = np.random.RandomState(20)
        max_gt = 8
        cases = 0
        for width, height in [(800, 600), (500, 375), (1000, 600)]:
            rows, cols = height // STRIDE, width // STRIDE
            n = rows * cols * len(dims)
            anchors = anchor_ops.anchor_grid_image_space(rows, cols, dims, STRIDE)

            fn = jax.jit(
                lambda key, gt, gv, w=width, h=height, a=jnp.asarray(anchors), nn=n: rpn_targets(
                    key, a, gt, gv, w, h, sample_size=nn, max_pos=nn
                )
            )
            for _ in range(17):
                n_gt = int(rng.randint(1, max_gt))
                img = _stub_image(rng, width, height, n_gt)
                mgr = ref_rpn_util.RpnTrainingManager(
                    lambda h_, w_: (h_ // STRIDE, w_ // STRIDE),
                    STRIDE,
                    preprocess_func=lambda x: x,
                    anchor_dims=dims,
                )
                mgr._process(img)
                ref = mgr._cache[img.cache_key]

                gt = np.zeros((max_gt, 4), np.float32)
                gv = np.zeros((max_gt,), bool)
                for i, b in enumerate(img.gt_boxes):
                    gt[i] = b.corners
                    gv[i] = True
                out = fn(jax.random.PRNGKey(cases), jnp.asarray(gt), jnp.asarray(gv))

                np.testing.assert_array_equal(
                    np.asarray(out.cls_target), ref["is_pos"].astype(bool)
                )
                np.testing.assert_array_equal(
                    np.asarray(out.cls_mask), ref["can_use"].astype(bool)
                )
                pos = ref["is_pos"].astype(bool)
                np.testing.assert_allclose(
                    np.asarray(out.reg_target)[pos],
                    ref["bbreg_targets"][pos],
                    rtol=0,
                    atol=3e-4,
                )
                cases += 1
        assert cases >= 50

    def test_apply_sampling_invariants(self):
        """_apply_sampling (rpn_util.py:324-350) is RNG-dependent, so compare
        count invariants, not streams (SURVEY §7 hard part c)."""
        from faster_rcnn_tpu.ops.sampling import subsample_rpn_anchors

        rng = np.random.RandomState(21)
        random.seed(21)
        for trial in range(50):
            n = 4000
            is_pos = rng.rand(n) < rng.uniform(0.01, 0.08)
            can_use = (rng.rand(n) < 0.5) | is_pos
            ref_mask = ref_rpn_util._apply_sampling(
                is_pos.copy(), can_use.copy()
            ).astype(bool)
            got = np.asarray(
                subsample_rpn_anchors(
                    jax.random.PRNGKey(trial),
                    jnp.asarray(is_pos),
                    jnp.asarray(can_use),
                    256,
                    128,
                )
            )
            # identical pos/neg counts, and selections within the candidates
            assert np.sum(got & is_pos) == np.sum(ref_mask & is_pos)
            assert np.sum(got & ~is_pos) == np.sum(ref_mask & ~is_pos)
            assert not np.any(got & ~can_use)


# ---------------------------------------------------------------------------
# (d) proposal decode/clip, full proposal chain, det target construction
# ---------------------------------------------------------------------------

ROWS, COLS = 15, 20
PDIMS = compute_anchor_dims((64, 128, 256), ((1, 1), (1, 2), (2, 1)))
NA = len(PDIMS)


class TestProposalDifferential:
    def test_get_rois_decode_clip(self):
        """_get_rois (det_util.py:370-380): decode the RPN regression output
        against conv-space anchors, then clip."""
        conv_anchors = jnp.asarray(
            anchor_ops.anchor_grid_conv_space(ROWS, COLS, PDIMS, STRIDE)
        )

        @jax.jit
        def fn(regr):
            deltas = regr.reshape(-1, 4) / BBREG_MULTIPLIERS
            rois = box_ops.decode(conv_anchors, deltas)
            return box_ops.clip_to_grid(rois, ROWS, COLS)

        rng = np.random.RandomState(30)
        exact = total = 0
        for _ in range(50):
            regr = rng.normal(0, 2.0, (1, ROWS, COLS, 4 * NA)).astype(np.float32)
            ref = ref_det_util._get_rois(regr.copy(), PDIMS, STRIDE)
            got = np.asarray(fn(jnp.asarray(regr)))
            assert np.max(np.abs(got - ref)) <= 1.0  # fp half-tie slack
            exact += int(np.sum(got == ref))
            total += ref.size
        assert exact / total >= 0.999, f"only {exact}/{total} bit-equal"

    def _ref_train_chain(self, cls_out, regr_out, pre_nms, post_nms):
        """The reference's training proposal chain, det_util.py:63-77."""
        roi_coords = ref_det_util._get_rois(regr_out, PDIMS, STRIDE)
        roi_probs = cls_out.reshape(-1)
        valid_idxs = ref_det_util._get_valid_box_idxs(roi_coords)
        roi_coords, roi_probs = roi_coords[valid_idxs], roi_probs[valid_idxs]
        sorted_idxs = roi_probs.argsort()[::-1]
        truncated_idxs = sorted_idxs[0:pre_nms]
        roi_coords, roi_probs = roi_coords[truncated_idxs], roi_probs[truncated_idxs]
        roi_coords = roi_coords.astype("int16")
        return ref_det_util.nms(
            roi_coords, roi_probs, max_boxes=post_nms, overlap_thresh=0.7
        )

    def test_full_training_proposal_chain(self):
        """decode -> clip -> validity -> sort -> truncate -> int16 -> NMS
        (det_util.py:63-77) vs generate_proposals, end to end."""
        pre_nms, post_nms = 500, 100
        conv_anchors = jnp.asarray(
            anchor_ops.anchor_grid_conv_space(ROWS, COLS, PDIMS, STRIDE)
        )
        pos_valid = position_validity(ROWS, COLS, NA)(ROWS, COLS)

        @jax.jit
        def fn(cls_prob, regr):
            return generate_proposals(
                cls_prob, regr, conv_anchors, pos_valid, ROWS, COLS,
                pre_nms, post_nms, iou_thresh=0.7,
            )

        rng = np.random.RandomState(31)
        for trial in range(50):
            # Redraw until scores are tie-free in float32: ~2700 sigmoid
            # values collide with prob ~0.15/trial, and on ties the
            # reference's np.argsort (unstable introsort) orders them
            # arbitrarily — its own output becomes order-nondeterministic,
            # so exact comparison is only well-posed on tie-free inputs.
            while True:
                cls_out = 1.0 / (
                    1.0 + np.exp(-rng.normal(0, 2, (1, ROWS, COLS, NA)))
                ).astype(np.float32)
                if np.unique(cls_out).size == cls_out.size:
                    break
            regr_out = rng.normal(0, 2.0, (1, ROWS, COLS, 4 * NA)).astype(np.float32)
            ref_boxes, ref_probs = self._ref_train_chain(
                cls_out.copy(), regr_out.copy(), pre_nms, post_nms
            )
            out = fn(jnp.asarray(cls_out[0]), jnp.asarray(regr_out[0]))
            valid = np.asarray(out.valid)
            got_boxes = np.asarray(out.boxes)[valid]
            got_scores = np.asarray(out.scores)[valid]
            assert len(got_boxes) == len(ref_boxes), (
                trial, len(got_boxes), len(ref_boxes),
            )
            np.testing.assert_array_equal(got_boxes, ref_boxes.astype(np.float32))
            np.testing.assert_allclose(got_scores, ref_probs, rtol=0, atol=1e-6)

    def test_rois_to_truth(self):
        """_rois_to_truth + one-hot encoders (det_util.py:310-366) vs
        det_targets: eligibility, class labels, per-class reg targets."""
        sys.path.insert(0, "/root/reference")
        from faster_rcnn.data.voc_data_helpers import VOC_CLASS_MAPPING as REF_MAP

        num_classes = len(REF_MAP)
        bg = REF_MAP["bg"]
        inv_map = {v: k for k, v in REF_MAP.items()}
        classes = [inv_map[i] for i in range(num_classes - 1)]
        k = 64
        max_gt = 8

        @jax.jit
        def fn(rois, gt, gt_cls, gv):
            return det_targets(
                rois, jnp.ones(rois.shape[0], bool), gt, gt_cls, gv,
                num_classes, stride=STRIDE,
            )

        rng = np.random.RandomState(32)
        for trial in range(50):
            width, height = 640, 480
            n_gt = int(rng.randint(1, max_gt))
            img = _stub_image(rng, width, height, n_gt, classes=classes)
            # integral conv-space ROIs, as produced post-decode/clip/NMS;
            # bias half of them toward GT boxes so positives actually occur
            rois = _random_boxes(rng, k, 0, min(width, height) // STRIDE,
                                 min_dim=1, max_dim=12)
            for i in range(0, k, 2):
                g = img.gt_boxes[rng.randint(n_gt)]
                jx = rng.randint(-2, 3, size=4)
                rois[i] = np.round(g.corners / STRIDE) + jx
            rois[:, 2] = np.maximum(rois[:, 2], rois[:, 0] + 1)
            rois[:, 3] = np.maximum(rois[:, 3], rois[:, 1] + 1)
            rois = rois.astype(np.float32)

            ref_rois, ref_cls_1hot, ref_bbreg = ref_det_util._rois_to_truth(
                rois.copy(), img, REF_MAP, stride=STRIDE
            )

            gt = np.zeros((max_gt, 4), np.float32)
            gt_cls = np.full((max_gt,), bg, np.int32)
            gv = np.zeros((max_gt,), bool)
            for i, b in enumerate(img.gt_boxes):
                gt[i] = b.corners
                gt_cls[i] = REF_MAP[b.obj_cls]
                gv[i] = True
            out = fn(jnp.asarray(rois), jnp.asarray(gt), jnp.asarray(gt_cls),
                     jnp.asarray(gv))

            eligible_idx = np.where(np.asarray(out.eligible))[0]
            # same eligible ROI set, same (ascending-index) order
            np.testing.assert_array_equal(rois[eligible_idx], ref_rois)
            # class labels: ours compact ids, reference one-hot
            ref_cls = np.argmax(ref_cls_1hot, axis=1)
            np.testing.assert_array_equal(
                np.asarray(out.cls_target)[eligible_idx], ref_cls
            )
            # positives + their multiplier-scaled reg targets
            got_pos = np.asarray(out.is_pos)[eligible_idx]
            nreal = num_classes - 1
            ref_pos = ref_bbreg[:, :4 * nreal].sum(axis=1) > 0
            np.testing.assert_array_equal(got_pos, ref_pos)
            got_reg = np.asarray(out.reg_target)[eligible_idx]
            for j in np.where(ref_pos)[0]:
                c = ref_cls[j]
                np.testing.assert_allclose(
                    got_reg[j], ref_bbreg[j, 4 * nreal + 4 * c: 4 * nreal + 4 * c + 4],
                    rtol=0, atol=3e-4,
                )

    def test_det_samples_invariants(self):
        """_get_det_samples (det_util.py:260-306) is RNG-dependent: compare
        pos/neg counts across the pos-starved / neg-starved / plenty regimes."""
        from faster_rcnn_tpu.ops.sampling import sample_det_rois

        rng = np.random.RandomState(33)
        for trial in range(50):
            k = 256
            pos_rate = rng.choice([0.02, 0.1, 0.5, 0.9])
            is_pos = rng.rand(k) < pos_rate
            n_pos_avail = int(np.sum(is_pos))
            if n_pos_avail in (0, k):
                continue  # reference would hit its no-neg/no-pos edge paths
            ref_idx = ref_det_util._get_det_samples(is_pos.copy(), 64)
            ref_pos = int(np.sum(is_pos[ref_idx]))

            idx, any_valid = sample_det_rois(
                jax.random.PRNGKey(trial),
                jnp.ones(k, bool),
                jnp.asarray(is_pos),
                num_rois=64,
            )
            assert bool(any_valid)
            sel = np.asarray(idx)
            got_pos = int(np.sum(is_pos[sel[:64]]))
            # both take min(16, available) positives and fill to 64 with negs
            cap = min(16, n_pos_avail)
            assert len(ref_idx) == 64
            assert sel.shape[0] == 64
            assert ref_pos == cap, (trial, ref_pos, cap)
            assert got_pos == cap, (trial, got_pos, cap)


# ---------------------------------------------------------------------------
# (e) data layer: XML parsing + resize policy vs the reference's
# ---------------------------------------------------------------------------

VOC_TEST = "/root/reference/test_data/VOC_test"


@pytest.mark.skipif(not os.path.isdir(VOC_TEST), reason="VOC fixtures absent")
class TestDataLayerDifferential:
    def test_parse_annotation_vs_reference(self):
        sys.path.insert(0, "/root/reference")
        from faster_rcnn.data.voc_data_helpers import extract_img_metadata

        from faster_rcnn_tpu.data.voc import parse_annotation

        names = sorted(
            f[:-4] for f in os.listdir(os.path.join(VOC_TEST, "Annotations"))
        )
        rng = np.random.RandomState(40)
        sample = list(rng.choice(names, size=120, replace=False))
        if "000005" not in sample:
            sample.append("000005")
        for name in sample:
            ref = extract_img_metadata(VOC_TEST, name)
            got = parse_annotation(VOC_TEST, name)
            assert (got.width, got.height) == (ref.width, ref.height), name
            assert len(got.gt_boxes) == len(ref.gt_boxes), name
            for gb, rb in zip(got.gt_boxes, ref.gt_boxes):
                assert gb.obj_cls == rb.obj_cls, name
                assert gb.difficult == rb.difficult, name
                np.testing.assert_array_equal(
                    gb.corners, rb.corners.astype(np.float32), err_msg=name
                )

    def test_resize_within_bounds(self):
        from faster_rcnn_tpu.data.voc import ImageRecord

        rng = np.random.RandomState(41)
        for _ in range(50):
            w, h = int(rng.randint(80, 2000)), int(rng.randint(80, 2000))
            ref_img = ref_shapes.Image(
                ref_shapes.Metadata("x", width=w, height=h, gt_boxes=[],
                                    image_path="/dev/null")
            )
            ref_resized, ref_ratio = ref_img.resize_within_bounds(600, 1000)
            rec = ImageRecord("x", width=w, height=h, gt_boxes=[],
                              image_path="/dev/null")
            got, ratio = rec.resize_within_bounds(600, 1000)
            assert abs(ratio - ref_ratio) < 1e-12
            assert (got.width, got.height) == (ref_resized.width, ref_resized.height)
