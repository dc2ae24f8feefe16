"""Measure what folding the frozen-BN/Scale affines into convs could save.

Every BN in production is permanently frozen (models/layers.FrozenBatchNorm;
reference resnet.py bn_training=False), so its per-channel affine could fold
into the adjacent conv kernel+bias at apply time (VERDICT r4 #6).  Whether
that *saves time* depends on whether XLA:TPU already fuses the
bf16->f32 affine -> bf16 chain into the conv epilogue.  This script answers
empirically, by timing the REAL ResNet-50 backbone at the production canvas
under three interchangeable BN behaviors (monkeypatched, same param tree):

  prod       y = (f32(x) - mean) * (scale/sqrt(var+eps)) + bias   [as shipped]
  bf16       same affine, computed in bf16 (no upcast)
  identity   y = x   (the ceiling: what a full fold could reach, since a
             folded model runs conv' + relu only)

If prod == identity within noise, folding cannot pay and the result is a
documented null; if identity is materially faster, productionize the fold.

Usage: python scripts/bench_bn_fold.py [batch] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from faster_rcnn_tpu.utils.compile_cache import enable as _enable_cache

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def chain_time(name, step, x0, iters=N_ITERS):
    f = jax.jit(step)
    jax.block_until_ready(f(x0))
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:46s} {dt:9.2f} ms/iter  ({dt/B:6.3f} ms/img)", flush=True)
    return dt


def main():
    _enable_cache()
    from faster_rcnn_tpu.config import voc_config
    from faster_rcnn_tpu.models import layers as L
    from faster_rcnn_tpu.models.detector import FasterRCNN, init_model

    cfg = voc_config()
    h, w = cfg.data.canvas
    print(f"backbone fwd / fwd+bwd, B={B}, {h}x{w}, dtype=bf16")

    import flax.linen as nn

    from faster_rcnn_tpu.models import resnet as rn

    class Bf16BN(L.FrozenBatchNorm):
        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            mean = self.variable("batch_stats", "mean",
                                 lambda: jnp.zeros((c,), jnp.float32))
            var = self.variable("batch_stats", "var",
                                lambda: jnp.ones((c,), jnp.float32))
            inv = (scale / jnp.sqrt(var.value + self.epsilon)).astype(self.dtype)
            return (x - mean.value.astype(self.dtype)) * inv \
                + bias.astype(self.dtype)

    class IdentityBN(L.FrozenBatchNorm):
        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            self.variable("batch_stats", "mean",
                          lambda: jnp.zeros((c,), jnp.float32))
            self.variable("batch_stats", "var",
                          lambda: jnp.ones((c,), jnp.float32))
            return x

    orig_cls = rn.FrozenBatchNorm
    results = {}
    for mode, cls in (("prod", orig_cls), ("bf16-affine", Bf16BN),
                      ("identity(=full fold)", IdentityBN)):
        rn.FrozenBatchNorm = cls
        try:
            model, variables = init_model(jax.random.PRNGKey(0), cfg)
            bb_vars = {
                "params": {"backbone": variables["params"]["backbone"]},
                "batch_stats": variables.get("batch_stats", {}),
            }

            def fwd(x):
                feat = model.apply(bb_vars, x, method=FasterRCNN.backbone)
                # checksum-chain: next input depends on this output
                s = jnp.tanh(jnp.sum(feat.astype(jnp.float32)) * 1e-6)
                return x * 0.999 + s * 1e-3

            def fwd_bwd(x):
                def loss(v, x):
                    feat = model.apply(v, x, method=FasterRCNN.backbone)
                    return jnp.sum(feat.astype(jnp.float32))

                g = jax.grad(loss)(bb_vars, x)
                leaves = [l for l in jax.tree_util.tree_leaves(
                    g["params"]["backbone"]) if l.dtype == jnp.float32][-3:]
                s = jnp.tanh(sum(jnp.sum(jnp.abs(l)) for l in leaves) * 1e-6)
                return x * 0.999 + s * 1e-3

            x0 = jnp.asarray(
                np.random.RandomState(0).standard_normal((B, h, w, 3)),
                jnp.float32)
            tf = chain_time(f"[{mode}] backbone fwd", fwd, x0)
            tb = chain_time(f"[{mode}] backbone fwd+bwd", fwd_bwd, x0)
            results[mode] = (tf, tb)
        finally:
            rn.FrozenBatchNorm = orig_cls

    pf, pb = results["prod"]
    for mode, (tf, tb) in results.items():
        if mode != "prod":
            print(f"{mode}: fwd {100 * (pf - tf) / pf:+.1f}% "
                  f"fwd+bwd {100 * (pb - tb) / pb:+.1f}% vs prod")


if __name__ == "__main__":
    main()
