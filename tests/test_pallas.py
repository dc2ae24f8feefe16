"""Pallas kernel tests (interpreter mode — CPU-safe)."""

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_tpu.ops.roi_align import roi_align
from faster_rcnn_tpu.ops.roi_align_pallas import roi_align_pallas


def random_rois(rng, n, h, w):
    x1 = rng.randint(0, w - 2, n)
    y1 = rng.randint(0, h - 2, n)
    bw = rng.randint(1, 12, n)
    bh = rng.randint(1, 8, n)
    rois = np.stack(
        [x1, y1, np.minimum(x1 + bw, w - 1), np.minimum(y1 + bh, h - 1)], axis=1
    ).astype(np.int32)
    rois[:, 2] = np.maximum(rois[:, 2], rois[:, 0] + 1)
    rois[:, 3] = np.maximum(rois[:, 3], rois[:, 1] + 1)
    return rois


class TestRoiAlignPallas:
    def test_matches_xla_reference(self, rng):
        feat = rng.standard_normal((20, 28, 16)).astype(np.float32)
        rois = random_rois(rng, 12, 20, 28)
        got = roi_align_pallas(jnp.asarray(feat), jnp.asarray(rois), 7, True)
        want = roi_align(jnp.asarray(feat), jnp.asarray(rois, np.float32), 7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    def test_single_pixel_roi(self, rng):
        feat = rng.standard_normal((16, 16, 8)).astype(np.float32)
        rois = np.array([[5, 5, 6, 6]], np.int32)
        got = roi_align_pallas(jnp.asarray(feat), jnp.asarray(rois), 7, True)
        # 1x1 crop -> every output cell equals the single source pixel
        np.testing.assert_allclose(
            np.asarray(got)[0], np.broadcast_to(feat[5, 5], (7, 7, 8)), rtol=1e-5
        )

    def test_gradient_matches_xla(self, rng):
        feat = jnp.asarray(rng.standard_normal((16, 16, 4)).astype(np.float32))
        rois = jnp.asarray(random_rois(rng, 5, 16, 16))

        g1 = jax.grad(lambda x: jnp.sum(roi_align_pallas(x, rois, 7, True) ** 2))(feat)
        g2 = jax.grad(
            lambda x: jnp.sum(roi_align(x, rois.astype(jnp.float32), 7) ** 2)
        )(feat)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


class TestNmsPallas:
    def test_matches_xla_blocked(self, rng):
        from faster_rcnn_tpu.ops.nms import nms_sorted_mask_blocked, sort_by_score
        from faster_rcnn_tpu.ops.nms_pallas import nms_keep_mask_pallas

        n = 256
        x1 = rng.uniform(0, 180, n).astype(np.float32)
        y1 = rng.uniform(0, 180, n).astype(np.float32)
        w = rng.uniform(1, 100, n).astype(np.float32)
        h = rng.uniform(1, 100, n).astype(np.float32)
        boxes = np.stack([x1, y1, x1 + w, y1 + h], 1)
        scores = rng.uniform(size=n).astype(np.float32)
        valid = np.ones(n, bool)
        valid[240:] = False

        bs, _, vs = sort_by_score(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
        want = np.asarray(nms_sorted_mask_blocked(bs, vs, 0.6, tile=64))
        got = np.asarray(nms_keep_mask_pallas(bs, vs, 0.6, tile=64, interpret=True))
        np.testing.assert_array_equal(want, got)

    def test_early_exit_prefix_exact(self, rng):
        from faster_rcnn_tpu.ops.nms import nms_sorted_mask_blocked, sort_by_score
        from faster_rcnn_tpu.ops.nms_pallas import nms_keep_mask_pallas

        n = 256
        boxes = np.stack([
            rng.uniform(0, 150, n), rng.uniform(0, 150, n),
            rng.uniform(160, 250, n), rng.uniform(160, 250, n)], 1).astype(np.float32)
        scores = rng.uniform(size=n).astype(np.float32)
        bs, _, vs = sort_by_score(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool))
        want = np.where(np.asarray(nms_sorted_mask_blocked(bs, vs, 0.5, tile=64)))[0]
        got = np.where(np.asarray(
            nms_keep_mask_pallas(bs, vs, 0.5, tile=64, enough=5, interpret=True)))[0]
        k = min(5, len(want))
        np.testing.assert_array_equal(want[:k], got[:k])


class TestSortPallas:
    """Bitonic top-k kernel (ops/sort_pallas.py) — bit-exact vs lax.top_k."""

    def test_matches_topk_with_ties(self, rng):
        from faster_rcnn_tpu.ops.sort_pallas import topk_sorted_pallas

        for n, k in [(1000, 300), (1024, 1024), (3000, 1200), (5000, 10)]:
            x = rng.uniform(size=n).astype(np.float32)
            x[rng.randint(0, n, 50)] = 0.5  # tie plateau
            v, i = topk_sorted_pallas(jnp.asarray(x), k, interpret=True)
            tv, ti = jax.lax.top_k(jnp.asarray(x), k)
            np.testing.assert_array_equal(np.asarray(v), np.asarray(tv))
            np.testing.assert_array_equal(np.asarray(i), np.asarray(ti))

    def test_all_masked_indices_in_bounds(self):
        from faster_rcnn_tpu.ops.sort_pallas import topk_sorted_pallas

        x = np.full(2000, -1e30, np.float32)
        _, i = topk_sorted_pallas(jnp.asarray(x), 300, interpret=True)
        assert np.all(np.asarray(i) < 2000)
