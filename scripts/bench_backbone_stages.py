"""Per-stage chained breakdown of the ResNet-50 backbone (fwd and fwd+bwd).

The train-step breakdown (NOTES.md round 3) shows backbone fwd+bwd at
48.6 ms/iter (B=16, 608x1024) — 16% MFU, bandwidth-bound.  This script
splits that cost by stage (conv1+pool / stage2 / stage3 / stage4) via
prefix differencing of the real module, to locate where the bandwidth goes
(early stages carry 4-16x the activation traffic of stage 4).

Usage: python scripts/bench_backbone_stages.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_ITERS = 20


def chain_time(name, step, x0, iters=N_ITERS):
    f = jax.jit(step)
    jax.block_until_ready(f(x0))
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:42s} {dt:9.2f} ms/iter  ({dt/B:6.3f} ms/img)", flush=True)
    return dt


def main():
    import flax.linen as nn

    from faster_rcnn_tpu.config import voc_config
    from faster_rcnn_tpu.models import resnet as rn
    from faster_rcnn_tpu.models.detector import init_model

    cfg = voc_config()
    h, w = cfg.data.canvas
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables.get("batch_stats", {}).get("backbone", {}),
    }

    class Prefix(nn.Module):
        """conv1+pool plus the first ``n_stages`` of stages 2..4, with the
        exact parameter names of ResNetBackbone so bb_vars applies."""

        n_stages: int

        @nn.compact
        def __call__(self, x):
            kw = dict(use_bias=True, separate_scale=False, dtype=jnp.bfloat16)
            x = x.astype(jnp.bfloat16)
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                        dtype=jnp.bfloat16, param_dtype=jnp.float32,
                        name="conv1")(x)
            from faster_rcnn_tpu.models.layers import FrozenBatchNorm
            x = FrozenBatchNorm(dtype=jnp.bfloat16, name="bn_conv1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            if self.n_stages >= 1:
                x = rn._stage(x, 2, ["a", "b", "c"], (64, 64, 256), (1, 1), **kw)
            if self.n_stages >= 2:
                x = rn._stage(x, 3, ["a", "b", "c", "d"], (128, 128, 512),
                              (2, 2), **kw)
            if self.n_stages >= 3:
                x = rn._stage(x, 4, rn._STAGE4_BLOCKS_50, (256, 256, 1024),
                              (2, 2), **kw)
            return x

    rng = np.random.RandomState(0)
    img0 = jax.device_put(
        (rng.standard_normal((B, h, w, 3)) * 30).astype(np.float32))

    names = ["conv1+pool", "+stage2", "+stage3", "+stage4(full)"]
    fwd_times, fb_times = [], []
    for n_stages, name in enumerate(names):
        mod = Prefix(n_stages=n_stages)

        def fwd(x, mod=mod):
            y = mod.apply(bb_vars, x)
            return (x.astype(jnp.float32)
                    + 1e-30 * jnp.sum(y.astype(jnp.float32))).astype(x.dtype)

        fwd_times.append(chain_time(f"fwd  {name}", fwd, img0))

        def fb(x, mod=mod):
            def loss(p):
                y = mod.apply({"params": p,
                               "batch_stats": bb_vars["batch_stats"]}, x)
                return jnp.sum(y.astype(jnp.float32))
            val, grads = jax.value_and_grad(loss)(bb_vars["params"])
            gs = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                     for l in jax.tree_util.tree_leaves(grads)[:3])
            return (x.astype(jnp.float32)
                    + 1e-30 * (val + gs)).astype(x.dtype)

        fb_times.append(chain_time(f"f+b  {name}", fb, img0))

    print("\nper-stage deltas (ms/iter):")
    for i in range(1, len(names)):
        print(f"  {names[i]:16s} fwd {fwd_times[i]-fwd_times[i-1]:7.2f}"
              f"   f+b {fb_times[i]-fb_times[i-1]:7.2f}")
    print(f"  {'conv1+pool':16s} fwd {fwd_times[0]:7.2f}"
          f"   f+b {fb_times[0]:7.2f}")


if __name__ == "__main__":
    main()
