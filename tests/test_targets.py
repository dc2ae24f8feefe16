"""Tests for on-device target assignment, samplers, and losses."""

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_tpu.config import compute_anchor_dims
from faster_rcnn_tpu.ops import anchors as anchor_ops
from faster_rcnn_tpu.ops import losses as loss_ops
from faster_rcnn_tpu.ops import sampling as samp_ops
from faster_rcnn_tpu.ops import targets as tgt_ops

from tests import reference_impl as ref


def make_rpn_setup():
    dims = compute_anchor_dims((32, 64, 128), ((1, 1), (1, 2), (2, 1)))
    rows, cols, stride = 12, 16, 16
    anchors = anchor_ops.anchor_grid_image_space(rows, cols, dims, stride)
    img_h, img_w = 12 * 16, 16 * 16
    gt = np.zeros((8, 4), np.float32)
    gt_valid = np.zeros(8, bool)
    gt[0] = [40, 40, 100, 110]
    gt[1] = [120, 30, 190, 160]
    gt[2] = [10, 150, 60, 180]
    gt_valid[:3] = True
    return anchors, gt, gt_valid, img_w, img_h


class TestRpnTargets:
    def test_rules_match_oracle(self):
        anchors, gt, gt_valid, img_w, img_h = make_rpn_setup()
        out = tgt_ops.rpn_targets(
            jax.random.PRNGKey(0),
            jnp.asarray(anchors),
            jnp.asarray(gt),
            jnp.asarray(gt_valid),
            img_w,
            img_h,
        )
        ious = ref.np_iou_matrix(anchors, gt[:3])
        max_iou = ious.max(axis=1)
        arg_gt = ious.argmax(axis=1)

        # oracle positive set: >0.7 plus per-gt argmax with nonzero best IoU
        pos = max_iou > 0.7
        for j in range(3):
            if ious[:, j].max() > 0:
                pos[ious[:, j].argmax()] = True
        np.testing.assert_array_equal(np.asarray(out.cls_target), pos)

        # out-of-bounds anchors never participate
        oob = (
            (anchors[:, 0] < 0)
            | (anchors[:, 1] < 0)
            | (anchors[:, 2] >= img_w)
            | (anchors[:, 3] >= img_h)
        )
        assert not np.any(np.asarray(out.cls_mask) & oob)

        # negatives in the mask must have max_iou < 0.3
        cls_mask = np.asarray(out.cls_mask)
        negs = cls_mask & ~pos
        assert np.all(max_iou[negs] < 0.3)

        # reg targets: positive, in-bounds anchors match the encode oracle x mult
        reg_mask = np.asarray(out.reg_mask)
        reg = np.asarray(out.reg_target)
        mult = np.array([10, 10, 5, 5], np.float32)
        checked = 0
        for i in np.where(reg_mask)[0]:
            want = ref.np_encode(anchors[i], gt[arg_gt[i]]) * mult
            np.testing.assert_allclose(reg[i], want, rtol=1e-3, atol=1e-3)
            checked += 1
        assert checked > 0

    def test_sampling_caps(self):
        anchors, gt, gt_valid, img_w, img_h = make_rpn_setup()
        out = tgt_ops.rpn_targets(
            jax.random.PRNGKey(1),
            jnp.asarray(anchors),
            jnp.asarray(gt),
            jnp.asarray(gt_valid),
            img_w,
            img_h,
        )
        total = int(np.asarray(out.cls_mask).sum())
        npos = int((np.asarray(out.cls_mask) & np.asarray(out.cls_target)).sum())
        assert total <= 256
        assert npos <= 128

    def test_no_gt_all_negative(self):
        anchors, gt, _, img_w, img_h = make_rpn_setup()
        out = tgt_ops.rpn_targets(
            jax.random.PRNGKey(2),
            jnp.asarray(anchors),
            jnp.asarray(gt),
            jnp.zeros(8, bool),
            img_w,
            img_h,
        )
        assert int(np.asarray(out.cls_target).sum()) == 0
        assert int(np.asarray(out.cls_mask).sum()) <= 256


class TestRpnSubsample:
    def test_caps_enforced_and_random(self):
        n = 1000
        is_pos = np.zeros(n, bool)
        is_pos[:300] = True
        can_use = np.ones(n, bool)
        k1 = jax.random.PRNGKey(0)
        m1 = np.asarray(
            samp_ops.subsample_rpn_anchors(k1, jnp.asarray(is_pos), jnp.asarray(can_use))
        )
        assert (m1 & is_pos).sum() == 128
        assert m1.sum() == 256
        m2 = np.asarray(
            samp_ops.subsample_rpn_anchors(
                jax.random.PRNGKey(7), jnp.asarray(is_pos), jnp.asarray(can_use)
            )
        )
        assert (m1 != m2).any()  # different keys -> different samples

    def test_few_candidates_all_kept(self):
        n = 100
        is_pos = np.zeros(n, bool)
        is_pos[:5] = True
        can_use = np.zeros(n, bool)
        can_use[:50] = True
        m = np.asarray(
            samp_ops.subsample_rpn_anchors(
                jax.random.PRNGKey(0), jnp.asarray(is_pos), jnp.asarray(can_use)
            )
        )
        np.testing.assert_array_equal(m, can_use)


class TestDetSampling:
    def _run(self, n_pos, n_neg, k=200, seed=0):
        eligible = np.zeros(k, bool)
        is_pos = np.zeros(k, bool)
        eligible[: n_pos + n_neg] = True
        is_pos[:n_pos] = True
        idx, ok = samp_ops.sample_det_rois(
            jax.random.PRNGKey(seed), jnp.asarray(eligible), jnp.asarray(is_pos)
        )
        return np.asarray(idx), bool(ok), is_pos

    def test_plenty_of_both(self):
        idx, ok, is_pos = self._run(40, 120)
        assert ok and len(idx) == 64
        assert is_pos[idx].sum() == 16  # exactly 25% positives

    def test_few_positives_all_taken(self):
        idx, ok, is_pos = self._run(5, 120)
        assert is_pos[idx].sum() == 5
        assert len(idx) == 64

    def test_few_negatives_replacement(self):
        idx, ok, is_pos = self._run(30, 10)
        assert ok
        neg_sel = idx[~is_pos[idx]]
        assert len(idx) == 64 and len(neg_sel) == 48
        assert set(neg_sel) <= set(range(30, 40))  # only real negatives, reused

    def test_no_negatives_tiles_positives(self):
        idx, ok, is_pos = self._run(20, 0)
        assert ok
        assert is_pos[idx].all()

    def test_nothing_eligible(self):
        _, ok, _ = self._run(0, 0)
        assert not ok


class TestDetTargets:
    def test_assignment(self):
        rois = np.array(
            [[5, 5, 15, 15], [6, 6, 14, 14], [30, 30, 34, 34], [0, 0, 2, 2]],
            np.float32,
        )
        gt = np.array([[80, 80, 240, 240]], np.float32)  # /16 -> [5,5,15,15]
        out = tgt_ops.det_targets(
            jnp.asarray(rois),
            jnp.ones(4, bool),
            jnp.asarray(gt),
            jnp.asarray([3], jnp.int32),
            jnp.ones(1, bool),
            num_classes=21,
            stride=16,
        )
        np.testing.assert_array_equal(np.asarray(out.is_pos), [True, True, False, False])
        np.testing.assert_array_equal(np.asarray(out.eligible), [True, True, False, False])
        np.testing.assert_array_equal(np.asarray(out.cls_target), [3, 3, 20, 20])
        # roi 0 IoU 1.0 with gt -> zero reg target
        np.testing.assert_allclose(np.asarray(out.reg_target)[0], [0, 0, 0, 0], atol=1e-6)

    def test_invalid_rois_excluded(self):
        rois = np.tile(np.array([[5, 5, 15, 15]], np.float32), (3, 1))
        gt = np.array([[80, 80, 240, 240]], np.float32)
        valid = np.array([True, False, True])
        out = tgt_ops.det_targets(
            jnp.asarray(rois),
            jnp.asarray(valid),
            jnp.asarray(gt),
            jnp.asarray([0], jnp.int32),
            jnp.ones(1, bool),
            num_classes=21,
        )
        np.testing.assert_array_equal(np.asarray(out.eligible), [True, False, True])


class TestLosses:
    def test_rpn_cls_loss_oracle(self, rng):
        n = 64
        logits = rng.standard_normal(n).astype(np.float32)
        target = (rng.uniform(size=n) > 0.7).astype(np.float32)
        mask = rng.uniform(size=n) > 0.5
        p = 1 / (1 + np.exp(-logits))
        bce = -(target * np.log(p) + (1 - target) * np.log(1 - p))
        want = (mask * bce).sum() / 256.0
        got = float(
            loss_ops.rpn_cls_loss(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(mask))
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_rpn_reg_loss_oracle(self, rng):
        n = 32
        pred = rng.standard_normal((n, 4)).astype(np.float32)
        tgt = rng.standard_normal((n, 4)).astype(np.float32)
        mask = rng.uniform(size=n) > 0.6
        d = np.abs(tgt - pred)
        sl1 = np.where(d <= 1, 0.5 * d * d, d - 0.5)
        want = 10.0 * (mask[:, None] * sl1).sum() / 2400.0
        got = float(loss_ops.rpn_reg_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_det_cls_loss_oracle(self, rng):
        r, c = 64, 21
        logits = rng.standard_normal((r, c)).astype(np.float32)
        y = rng.randint(0, c, r)
        p = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
        want = -np.log(p[np.arange(r), y]).mean()
        got = float(loss_ops.det_cls_loss(jnp.asarray(logits), jnp.asarray(y)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_det_reg_loss_oracle(self, rng):
        r, c = 64, 21
        pred = rng.standard_normal((r, 4 * (c - 1))).astype(np.float32)
        tgt = rng.standard_normal((r, 4)).astype(np.float32)
        cls = rng.randint(0, c - 1, r)
        pos = rng.uniform(size=r) > 0.75
        num = 0.0
        for i in range(r):
            if pos[i]:
                sl = pred[i, 4 * cls[i] : 4 * cls[i] + 4]
                d = np.abs(tgt[i] - sl)
                num += np.where(d <= 1, 0.5 * d * d, d - 0.5).sum()
        want = num / (4 * pos.sum() + 1e-4 * r * 4 * (c - 1))
        got = float(
            loss_ops.det_reg_loss(
                jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(cls), jnp.asarray(pos), c
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)
