"""Decompose the loader-fed step time into device compute + H2D + dispatch.

The loader-fed joint train run (scripts/r5_pause_window.sh, NOTES.md r5)
sustains ~28 img/s steady-state at B=16 where the device-side step is 87 ms
(184 img/s).  This microbench measures the two non-compute terms on the
current backend so the gap can be attributed:

  * dispatch round-trip: a trivial jitted op executed + blocked N times —
    the per-call RPC latency of the dev tunnel (near-zero on local PCIe);
  * H2D: `jax.device_put` of exactly the batch the uint8 pipeline ships
    (B x 608 x 1024 x 3 uint8 = 29.9 MB) and its float32 equivalent.

Prints one JSON line so the numbers can be quoted verbatim.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, n=10, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    B = 16
    u8 = np.zeros((B, 608, 1024, 3), np.uint8)
    f32 = np.zeros((B, 608, 1024, 3), np.float32)

    @jax.jit
    def tiny(x):
        return x + 1.0

    x0 = jax.device_put(jnp.zeros((8, 8), jnp.float32), dev)
    t_dispatch = _timed(lambda: tiny(x0).block_until_ready(), n=20, warmup=5)

    t_u8 = _timed(
        lambda: jax.device_put(u8, dev).block_until_ready(), n=6, warmup=1
    )
    t_f32 = _timed(
        lambda: jax.device_put(f32, dev).block_until_ready(), n=4, warmup=1
    )

    out = {
        "backend": jax.default_backend(),
        "dispatch_roundtrip_ms": round(t_dispatch * 1e3, 2),
        "h2d_uint8_batch_ms": round(t_u8 * 1e3, 1),
        "h2d_uint8_MBps": round(u8.nbytes / t_u8 / 1e6, 1),
        "h2d_float32_batch_ms": round(t_f32 * 1e3, 1),
        "h2d_float32_MBps": round(f32.nbytes / t_f32 / 1e6, 1),
        "batch_bytes_uint8": u8.nbytes,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
