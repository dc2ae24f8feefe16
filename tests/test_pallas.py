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


class TestConv1Pallas:
    """Stem-conv MXU kernel (ops/conv1_pallas.py) vs the XLA lowering."""

    def test_matches_xla_reference(self, rng):
        from faster_rcnn_tpu.ops.conv1_pallas import conv1_pallas, conv1_xla

        for (b, h, w) in [(2, 16, 24), (1, 32, 64), (2, 64, 256)]:
            x = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
            k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)).astype(np.float32))
            got = conv1_pallas(x, k, True)
            want = conv1_xla(x, k)
            assert got.shape == (b, h // 2, w // 2, 64)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_gradients_match_xla(self, rng):
        from faster_rcnn_tpu.ops.conv1_pallas import conv1_pallas, conv1_xla

        x = jnp.asarray(rng.standard_normal((1, 16, 32, 3)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)).astype(np.float32))
        ga = jax.grad(lambda x, k: jnp.sum(conv1_pallas(x, k, True) ** 2),
                      argnums=(0, 1))(x, k)
        gb = jax.grad(lambda x, k: jnp.sum(conv1_xla(x, k) ** 2),
                      argnums=(0, 1))(x, k)
        for u, v in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-4, atol=1e-4)

    def test_v2_matches_xla_reference(self, rng):
        from faster_rcnn_tpu.ops.conv1_pallas import conv1_pallas_v2, conv1_xla

        for (b, h, w) in [(2, 16, 24), (1, 32, 64), (2, 64, 256)]:
            x = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
            k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)).astype(np.float32))
            got = conv1_pallas_v2(x, k, True)
            want = conv1_xla(x, k)
            assert got.shape == (b, h // 2, w // 2, 64)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_v2_gradients_match_xla(self, rng):
        """v2's custom VJP replays the XLA conv transpose; with a LINEAR
        loss the cotangent is input-independent, so grads are bit-equal."""
        from faster_rcnn_tpu.ops.conv1_pallas import conv1_pallas_v2, conv1_xla

        x = jnp.asarray(rng.standard_normal((1, 16, 32, 3)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)).astype(np.float32))
        ga = jax.grad(lambda x, k: jnp.sum(conv1_pallas_v2(x, k, True)),
                      argnums=(0, 1))(x, k)
        gb = jax.grad(lambda x, k: jnp.sum(conv1_xla(x, k)),
                      argnums=(0, 1))(x, k)
        for u, v in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-5, atol=1e-5)

    def test_module_param_tree_and_xla_path_identical(self, rng):
        """Conv1 (the swappable stem module) must be indistinguishable from
        the nn.Conv it replaced on the default path: same param names,
        shapes, init values, and outputs."""
        import flax.linen as nn

        from faster_rcnn_tpu.models.resnet import Conv1

        x = jnp.asarray(rng.standard_normal((1, 16, 24, 3)).astype(np.float32))
        ref = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                      use_bias=True, dtype=jnp.float32,
                      param_dtype=jnp.float32, name="conv1")
        mod = Conv1(use_bias=True, dtype=jnp.float32, impl="xla", name="conv1")
        vr = ref.init(jax.random.PRNGKey(7), x)
        vm = mod.init(jax.random.PRNGKey(7), x)
        assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vm)
        for a, b in zip(jax.tree_util.tree_leaves(vr), jax.tree_util.tree_leaves(vm)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(ref.apply(vr, x)), np.asarray(mod.apply(vm, x)))

    def test_backbone_pallas_interpret_close_to_xla(self, rng):
        """The full ResNet stem through the kernel (interpret) stays within
        bf16-accumulation distance of the default path."""
        from faster_rcnn_tpu.models.resnet import ResNetBackbone

        x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32))
        a = ResNetBackbone(depth=50, conv1_impl="xla")
        b = ResNetBackbone(depth=50, conv1_impl="pallas_interpret")
        v = a.init(jax.random.PRNGKey(3), x)
        ya = np.asarray(a.apply(v, x), np.float32)
        yb = np.asarray(b.apply(v, x), np.float32)
        # same weights, only the stem lowering differs (bf16 everywhere)
        np.testing.assert_allclose(ya, yb, rtol=0.1, atol=0.15)
