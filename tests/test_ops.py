"""Unit tests for the geometry/NMS/RoI-align ops against NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faster_rcnn_tpu.config import AnchorConfig, compute_anchor_dims
from faster_rcnn_tpu.ops import anchors as anchor_ops
from faster_rcnn_tpu.ops import boxes as box_ops
from faster_rcnn_tpu.ops import nms as nms_ops
from faster_rcnn_tpu.ops import roi_align as roi_ops

from tests import reference_impl as ref


def random_boxes(rng, n, lo=0, hi=600):
    x1 = rng.uniform(lo, hi - 20, n)
    y1 = rng.uniform(lo, hi - 20, n)
    w = rng.uniform(1, 120, n)
    h = rng.uniform(1, 120, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


class TestBoxes:
    def test_iou_matrix_matches_oracle(self, rng):
        b1 = random_boxes(rng, 40)
        b2 = random_boxes(rng, 7)
        got = np.asarray(box_ops.iou_matrix(jnp.asarray(b1), jnp.asarray(b2)))
        want = ref.np_iou_matrix(b1, b2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_iou_degenerate_boxes_zero(self):
        b1 = jnp.array([[10.0, 10.0, 10.0, 20.0]])  # zero width
        b2 = jnp.array([[0.0, 0.0, 30.0, 30.0]])
        got = box_ops.iou_matrix(b1, b2)
        assert float(got[0, 0]) == 0.0

    def test_encode_matches_oracle(self, rng):
        a = random_boxes(rng, 25)
        g = random_boxes(rng, 25)
        got = np.asarray(box_ops.encode(jnp.asarray(a), jnp.asarray(g)))
        want = np.stack([ref.np_encode(a[i], g[i]) for i in range(25)])
        # fp32 log/div vs the oracle's fp64 — tolerance reflects dtype, not logic
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-4)

    def test_decode_roundtrip(self, rng):
        a = random_boxes(rng, 30)
        g = random_boxes(rng, 30)
        t = box_ops.encode(jnp.asarray(a), jnp.asarray(g))
        back = box_ops.decode(jnp.asarray(a), t, round_coords=False)
        np.testing.assert_allclose(np.asarray(back), g, rtol=1e-4, atol=1e-3)

    def test_decode_rounded_matches_oracle(self, rng):
        a = random_boxes(rng, 50)
        d = rng.uniform(-0.4, 0.4, (50, 4)).astype(np.float32)
        got = np.asarray(box_ops.decode(jnp.asarray(a), jnp.asarray(d)))
        want = ref.np_decode_rounded(a, d)
        # fp32 vs fp64 center math can flip a hard .5 rounding; allow 1px on <0.1%
        diff = np.abs(got - want)
        assert (diff > 0.51).mean() == 0.0
        assert (diff > 1e-3).mean() < 0.01

    def test_clip_to_grid(self):
        boxes = jnp.array(
            [[-5.0, -3.0, 4.0, 7.0], [10.0, 10.0, 10.0, 10.0], [30.0, 20.0, 99.0, 99.0]]
        )
        got = np.asarray(box_ops.clip_to_grid(boxes, rows=40, cols=60))
        # min size 1 enforced BEFORE clamping, then x1>=0, x2<=cols-1
        np.testing.assert_array_equal(got[0], [0, 0, 4, 7])
        np.testing.assert_array_equal(got[1], [10, 10, 11, 11])
        np.testing.assert_array_equal(got[2], [30, 20, 59, 39])


class TestAnchors:
    def test_default_anchor_dims(self):
        cfg = AnchorConfig()
        dims = cfg.dims
        assert dims.shape == (18, 2)
        # spot values from the shared_constants.py derivation:
        # scale 16 ratio (1,1): sqrt(256)/16=1 -> [16,16]
        np.testing.assert_array_equal(dims[0], [16, 16])
        # scale 16 ratio (1,2): naive [16,32], r=sqrt(512)/16≈1.41 -> [11,22]
        np.testing.assert_array_equal(dims[1], [11, 22])
        # scale 512 ratio (2,1): naive [1024,512], r=sqrt(2)≈1.414 -> floor-div
        np.testing.assert_array_equal(dims[17], [724, 362])

    def test_image_space_grid_matches_oracle(self):
        dims = compute_anchor_dims((32, 64), ((1, 1), (1, 2)))
        got = anchor_ops.anchor_grid_image_space(5, 7, dims, 16)
        want = ref.np_anchor_coords_image(5, 7, dims, 16)
        np.testing.assert_array_equal(got, want)

    def test_conv_space_grid_matches_oracle(self):
        dims = compute_anchor_dims((32, 64, 128), ((1, 1), (2, 1)))
        got = anchor_ops.anchor_grid_conv_space(6, 9, dims, 16)
        want = ref.np_anchor_coords_conv(6, 9, dims, 16)
        np.testing.assert_array_equal(got, want)

    def test_out_of_bounds_mask(self):
        dims = compute_anchor_dims((64,), ((1, 1),))
        grid = anchor_ops.anchor_grid_image_space(4, 4, dims, 16)
        mask_fn = anchor_ops.out_of_bounds_mask_fn(grid)
        m = np.asarray(mask_fn(64, 64))
        inb = np.where(~m)[0]
        # only anchors fully inside [0,64) survive
        for i in inb:
            x1, y1, x2, y2 = grid[i]
            assert x1 >= 0 and y1 >= 0 and x2 < 64 and y2 < 64


class TestNms:
    def _compare(self, rng, n, max_out, thresh, fn):
        boxes = random_boxes(rng, n, hi=200).astype(np.float32)
        probs = rng.uniform(size=n).astype(np.float32)
        want = ref.np_greedy_nms(boxes, probs, thresh, max_out)
        got_idx, got_valid = fn(boxes, probs)
        got = np.asarray(got_idx)[np.asarray(got_valid)]
        np.testing.assert_array_equal(got, want[: len(got)])
        assert len(got) == min(len(want), max_out)

    def test_sequential_matches_oracle(self, rng):
        self._compare(
            rng,
            300,
            50,
            0.5,
            lambda b, p: nms_ops.nms_indices(
                jnp.asarray(b), jnp.asarray(p), jnp.ones(len(b), bool), 50, 0.5
            ),
        )

    def test_sequential_respects_validity(self, rng):
        boxes = random_boxes(rng, 20, hi=100)
        probs = rng.uniform(size=20).astype(np.float32)
        valid = np.zeros(20, bool)
        valid[:5] = True
        idx, ok = nms_ops.nms_indices(
            jnp.asarray(boxes), jnp.asarray(probs), jnp.asarray(valid), 10, 0.5
        )
        assert set(np.asarray(idx)[np.asarray(ok)]) <= set(range(5))

    @pytest.mark.parametrize("n,tile", [(512, 128), (1024, 256)])
    def test_blocked_matches_sequential(self, rng, n, tile):
        boxes = random_boxes(rng, n, hi=300).astype(np.float32)
        probs = rng.uniform(size=n).astype(np.float32)
        want = ref.np_greedy_nms(boxes, probs, 0.7, n)
        got_b, got_s, got_v = nms_ops.nms_topk(
            jnp.asarray(boxes), jnp.asarray(probs), jnp.ones(n, bool), 200, 0.7, tile=tile
        )
        nv = int(np.asarray(got_v).sum())
        assert nv == min(len(want), 200)
        np.testing.assert_allclose(
            np.asarray(got_b)[:nv], boxes[want[:nv]], rtol=0, atol=0
        )

    def test_blocked_with_padding_rows(self, rng):
        n = 300
        boxes = random_boxes(rng, n, hi=300).astype(np.float32)
        probs = rng.uniform(size=n).astype(np.float32)
        valid = np.ones(n, bool)
        valid[250:] = False
        want = ref.np_greedy_nms(boxes[:250], probs[:250], 0.7, 100)
        got_b, _, got_v = nms_ops.nms_topk(
            jnp.asarray(boxes), jnp.asarray(probs), jnp.asarray(valid), 100, 0.7, tile=128
        )
        nv = int(np.asarray(got_v).sum())
        assert nv == min(len(want), 100)
        np.testing.assert_allclose(np.asarray(got_b)[:nv], boxes[want[:nv]])


class TestRoiAlign:
    def test_matches_tf1_bilinear_oracle(self, rng):
        feat = rng.standard_normal((24, 32, 5)).astype(np.float32)
        rois = np.array(
            [[3, 4, 17, 20], [0, 0, 7, 7], [10, 5, 11, 6], [25, 17, 32, 24]],
            np.float32,
        )
        got = np.asarray(roi_ops.roi_align(jnp.asarray(feat), jnp.asarray(rois), 7))
        for r in range(len(rois)):
            x1, y1, x2, y2 = rois[r].astype(int)
            crop = feat[y1:y2, x1:x2, :]
            want = ref.np_tf1_bilinear_resize(crop, 7, 7)
            np.testing.assert_allclose(got[r], want, rtol=1e-4, atol=1e-5)

    def test_batched(self, rng):
        feat = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
        rois = np.tile(np.array([[[2, 2, 10, 10]]], np.float32), (2, 4, 1))
        out = roi_ops.roi_align_batched(jnp.asarray(feat), jnp.asarray(rois), 7)
        assert out.shape == (2, 4, 7, 7, 3)

    def test_gradient_flows(self, rng):
        feat = jnp.asarray(rng.standard_normal((16, 16, 2)).astype(np.float32))
        rois = jnp.array([[2.0, 2.0, 9.0, 9.0]])

        def f(x):
            return jnp.sum(roi_ops.roi_align(x, rois, 7) ** 2)

        g = jax.grad(f)(feat)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestNmsTopkIndices:
    def test_matches_sequential(self, rng):
        n = 300
        boxes = random_boxes(rng, n, hi=200).astype(np.float32)
        probs = rng.uniform(size=n).astype(np.float32)
        valid = np.ones(n, bool)
        valid[280:] = False
        idx_a, ok_a = nms_ops.nms_indices(
            jnp.asarray(boxes), jnp.asarray(probs), jnp.asarray(valid), 100, 0.5
        )
        idx_b, ok_b = nms_ops.nms_topk_indices(
            jnp.asarray(boxes), jnp.asarray(probs), jnp.asarray(valid), 100, 0.5, tile=64
        )
        a = np.asarray(idx_a)[np.asarray(ok_a)]
        b = np.asarray(idx_b)[np.asarray(ok_b)]
        np.testing.assert_array_equal(a, b)


class TestRoiAlignEinsum:
    def test_matches_gather_impl(self, rng):
        from faster_rcnn_tpu.ops.roi_align import roi_align_einsum

        feat = rng.standard_normal((24, 32, 5)).astype(np.float32)
        rois = np.array(
            [[3, 4, 17, 20], [0, 0, 7, 7], [10, 5, 11, 6], [25, 17, 32, 24], [0, 0, 32, 24]],
            np.float32,
        )
        a = roi_ops.roi_align(jnp.asarray(feat), jnp.asarray(rois), 7)
        b = roi_align_einsum(jnp.asarray(feat), jnp.asarray(rois), 7)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_gradient_flows(self, rng):
        from faster_rcnn_tpu.ops.roi_align import roi_align_einsum

        feat = jnp.asarray(rng.standard_normal((16, 16, 2)).astype(np.float32))
        rois = jnp.array([[2.0, 2.0, 9.0, 9.0]])
        g1 = jax.grad(lambda x: jnp.sum(roi_align_einsum(x, rois, 7) ** 2))(feat)
        g2 = jax.grad(lambda x: jnp.sum(roi_ops.roi_align(x, rois, 7) ** 2))(feat)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)
