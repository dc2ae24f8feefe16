"""models/layers._frozen_affine: exact forward, bf16 backward, frozen cots.

The custom VJP exists purely for TPU backward-path speed (10% of backbone
fwd+bwd, scripts/bench_bn_fold.py); these tests pin its contract:
  * forward BIT-IDENTICAL to the plain f32 affine (goldens / h5 parity);
  * dx equals autodiff of the plain affine up to one bf16 rounding of the
    per-channel multiply;
  * per-channel cotangents are exactly zero (the layer's frozen contract —
    parallel/freeze.py excludes these leaves from every optimizer);
  * FrozenBatchNorm / ChannelScale still produce identical apply() outputs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from faster_rcnn_tpu.models.layers import (
    ChannelScale,
    FrozenBatchNorm,
    _frozen_affine,
)


def _plain(x, mean, inv, bias):
    return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


def _inputs(seed=0, n=64, c=16, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.standard_normal((2, n, c)) * 3, dtype)
    mean = jnp.asarray(rng.standard_normal(c), jnp.float32)
    inv = jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    return x, mean, inv, bias


def test_forward_bit_identical():
    for dtype in (jnp.bfloat16, jnp.float32):
        x, mean, inv, bias = _inputs(dtype=dtype)
        got = jax.jit(_frozen_affine)(x, mean, inv, bias)
        want = jax.jit(_plain)(x, mean, inv, bias)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )


def test_dx_matches_autodiff_within_bf16_rounding():
    x, mean, inv, bias = _inputs()

    def f_custom(x):
        return jnp.sum(_frozen_affine(x, mean, inv, bias)
                       .astype(jnp.float32) ** 2)

    def f_plain(x):
        return jnp.sum(_plain(x, mean, inv, bias)
                       .astype(jnp.float32) ** 2)

    gx = np.asarray(jax.grad(f_custom)(x), np.float32)
    gp = np.asarray(jax.grad(f_plain)(x), np.float32)
    # one extra bf16 rounding of (cot * inv): relative tolerance 2^-7
    np.testing.assert_allclose(gx, gp, rtol=2 ** -7, atol=1e-6)


def test_frozen_param_cotangents_are_zero():
    x, mean, inv, bias = _inputs()

    def f(mean, inv, bias):
        return jnp.sum(_frozen_affine(x, mean, inv, bias)
                       .astype(jnp.float32))

    gm, gi, gb = jax.grad(f, argnums=(0, 1, 2))(mean, inv, bias)
    assert not np.any(np.asarray(gm))
    assert not np.any(np.asarray(gi))
    assert not np.any(np.asarray(gb))


def test_modules_unchanged_forward():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 12)) * 2, jnp.bfloat16)

    bn = FrozenBatchNorm(dtype=jnp.bfloat16)
    vs = bn.init(jax.random.PRNGKey(0), x)
    # non-trivial stats/params
    vs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype), vs)
    got = bn.apply(vs, x)
    p, s = vs["params"], vs["batch_stats"]
    inv = p["scale"] / jnp.sqrt(s["var"] + bn.epsilon)
    want = ((x.astype(jnp.float32) - s["mean"]) * inv
            + p["bias"]).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))

    cs = ChannelScale(dtype=jnp.bfloat16)
    vs = cs.init(jax.random.PRNGKey(1), x)
    vs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype), vs)
    got = cs.apply(vs, x)
    want = ((x.astype(jnp.float32) * vs["params"]["scale"])
            + vs["params"]["bias"]).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_vmap_compatible():
    x, mean, inv, bias = _inputs()
    xb = jnp.stack([x, x * 2])
    f = jax.vmap(lambda xi: _frozen_affine(xi, mean, inv, bias))
    out = jax.jit(f)(xb)
    np.testing.assert_array_equal(
        np.asarray(out[0], np.float32),
        np.asarray(_frozen_affine(x, mean, inv, bias), np.float32),
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
