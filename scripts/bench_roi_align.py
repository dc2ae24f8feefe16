"""Microbenchmark: RoI-align implementations at KITTI detection shapes."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from faster_rcnn_tpu.ops.roi_align import roi_align_batched

H, W, C, R, B = 38, 94, 1024, 300, int(sys.argv[1]) if len(sys.argv) > 1 else 4
rng = np.random.RandomState(0)
feat = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32), jnp.bfloat16)
x1 = rng.randint(0, W - 2, (B, R)); y1 = rng.randint(0, H - 2, (B, R))
x2 = np.minimum(x1 + rng.randint(1, 40, (B, R)), W - 1)
y2 = np.minimum(y1 + rng.randint(1, 20, (B, R)), H - 1)
x2 = np.maximum(x2, x1 + 1); y2 = np.maximum(y2, y1 + 1)
rois = jnp.asarray(np.stack([x1, y1, x2, y2], -1).astype(np.float32))

ref = None
for impl in ["gather", "einsum", "pallas"]:
    fn = jax.jit(lambda f, r, impl=impl: roi_align_batched(f, r, 7, impl))
    out = jax.block_until_ready(fn(feat, rois))
    if ref is None:
        ref = np.asarray(out, np.float32)
    else:
        err = np.abs(np.asarray(out, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{impl}: max rel err vs gather = {err:.4f}")
    n = 50
    t0 = time.time()
    for _ in range(n):
        out = fn(feat, rois)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{impl:8s} B={B}: {dt*1e3:8.3f} ms/call  {dt/B*1e3:7.3f} ms/img  checksum={float(jnp.sum(out.astype(jnp.float32))):.1f}")
