"""Chained TPU timing: stem conv (7x7/s2) — XLA lowering vs Pallas kernel.

NOTES.md r3 measured conv1 fwd at ~6.9-7.2 ms (B=16, 608x1024, bf16) at ~1%
MXU utilization, and showed XLA-level reformulations don't help.  This times
ops/conv1_pallas.py against the nn.Conv lowering with the data-chained
pattern (each iteration's input depends on the previous output, so neither
the tunnel RTT nor XLA elision can fake the number).

Usage: python scripts/bench_conv1.py [batch] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from faster_rcnn_tpu.ops.conv1_pallas import (  # noqa: E402
    _phase_planes_v2, conv1_pallas, conv1_pallas_v2, conv1_xla,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
H, W = 608, 1024  # VOC train canvas


def chain_time(name, conv, x0, w, iters=ITERS):
    def step(x):
        y = conv(x, w)
        # fold the output back into the next input: forces serialization,
        # defeats elision, keeps the input statistics stable (tiny epsilon)
        return x0 + jnp.mean(y).astype(x0.dtype) * jnp.asarray(1e-6, x0.dtype)

    f = jax.jit(step)
    x = f(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:30s} {dt:8.2f} ms/iter  ({dt/B:6.3f} ms/img)", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()} B={B} canvas={H}x{W}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32) * 30,
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)).astype(np.float32) * 0.05,
                    jnp.bfloat16)

    # correctness cross-check on this backend first (device-side reduction —
    # never fetch the full activation through the tunnel)
    @jax.jit
    def relerr(x1, w1):
        ya = conv1_xla(x1, w1).astype(jnp.float32)
        yb = conv1_pallas(x1, w1).astype(jnp.float32)
        return jnp.max(jnp.abs(ya - yb)) / (jnp.max(jnp.abs(ya)) + 1e-9)

    @jax.jit
    def relerr_v2(x1, w1):
        ya = conv1_xla(x1, w1).astype(jnp.float32)
        yb = conv1_pallas_v2(x1, w1).astype(jnp.float32)
        return jnp.max(jnp.abs(ya - yb)) / (jnp.max(jnp.abs(ya)) + 1e-9)

    err = float(relerr(x[:1], w))
    print(f"max rel err (pallas vs xla, B=1): {err:.2e}", flush=True)
    assert err < 2e-2, "kernel numerics diverge on this backend"
    err2 = float(relerr_v2(x[:1], w))
    print(f"max rel err (pallas_v2 vs xla, B=1): {err2:.2e}", flush=True)
    assert err2 < 2e-2, "v2 kernel numerics diverge on this backend"

    chain_time("conv1 XLA", conv1_xla, x, w)
    chain_time("conv1 pallas", lambda a, b: conv1_pallas(a, b), x, w)
    chain_time("conv1 pallas_v2", lambda a, b: conv1_pallas_v2(a, b), x, w)
    # isolate the v2 XLA-side phase-split einsum cost (mean over the FULL
    # plane tensor in chain_time's step — no slice for XLA to DCE through)
    chain_time("v2 phase einsum only", lambda a, b: _phase_planes_v2(a), x, w)


if __name__ == "__main__":
    main()
