"""Chained-measurement detect throughput for all three backbone families.

Reference baselines (BASELINE.md): VOC inference R50 0.53 s/img, R101
0.64 s/img, VGG16 similar-order; KITTI R50/R101 0.6-0.7 s/img.

Usage: python scripts/bench_networks.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from faster_rcnn_tpu.config import voc_config
from faster_rcnn_tpu.inference import make_detect_fn
from faster_rcnn_tpu.models.detector import init_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = 20


def bench(network: str):
    import functools

    cfg = voc_config(network)
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    detect = make_detect_fn(cfg, model, variables)
    # weights must be jit ARGUMENTS of the chained step: closing over them
    # embeds them as constants and (for VGG's 400MB fc kernels) exceeds the
    # remote compile service's request size limit (HTTP 413)
    detect_fn, (vs,) = detect.func, detect.args
    h, w = cfg.data.canvas
    rng = np.random.RandomState(0)
    img0 = jax.device_put(rng.standard_normal((B, h, w, 3)).astype(np.float32) * 30)
    img_hw = jax.device_put(np.tile([[600, 1000]], (B, 1)).astype(np.int32))

    @jax.jit
    def step(vs, x):
        out = detect_fn(vs, x, img_hw)
        cs = jnp.sum(out.scores) + 1e-6 * jnp.sum(jnp.clip(out.boxes, -1e9, 1e9))
        return (x.astype(jnp.float32) + 1e-30 * cs).astype(x.dtype)

    t0 = time.time()
    x = jax.block_until_ready(step(vs, img0))
    compile_s = time.time() - t0
    t0 = time.time()
    x = img0
    for _ in range(ITERS):
        x = step(vs, x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / ITERS
    ms_img = dt / B * 1000
    print(f"{network:10s} VOC {h}x{w} B={B}: {ms_img:6.2f} ms/img = "
          f"{1000/ms_img:6.1f} img/s  (compile {compile_s:.0f}s)")


nets = sys.argv[2].split(",") if len(sys.argv) > 2 else ["resnet50", "resnet101", "vgg16"]
for net in nets:
    bench(net)
