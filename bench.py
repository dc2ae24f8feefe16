"""Benchmark: ResNet-50 Faster R-CNN inference throughput on TPU.

Measures the fused detection program (backbone -> RPN -> proposal NMS ->
RoI-align 300 ROIs -> detector head -> per-class NMS) at the reference's KITTI
configuration: 600x1500 resize (BASELINE.md), 300 ROIs, ResNet-50.

Reference baseline: 0.6 s/image single GPU => 1.667 img/s (BASELINE.md,
notes:293).  North star: >= 20x per v5e-8 at mAP parity, i.e. ~4.2 img/s per
chip (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_IMG_S = 1.0 / 0.6  # reference KITTI ResNet-50 (BASELINE.md)


def main():
    import dataclasses

    import jax

    from faster_rcnn_tpu.config import kitti_config
    from faster_rcnn_tpu.inference import make_detect_fn
    from faster_rcnn_tpu.models.detector import init_model

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    cfg = kitti_config()
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    detect = make_detect_fn(cfg, model, variables)

    h, w = cfg.data.canvas
    rng = np.random.RandomState(0)
    images = rng.standard_normal((batch, h, w, 3)).astype(np.float32) * 50
    img_hw = np.tile([[600, 1500]], (batch, 1)).astype(np.int32)

    # warmup + compile
    t0 = time.time()
    out = detect(images, img_hw)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    for _ in range(2):
        jax.block_until_ready(detect(images, img_hw))

    t0 = time.time()
    for _ in range(iters):
        out = detect(images, img_hw)
    jax.block_until_ready(out)
    dt = time.time() - t0

    img_s = batch * iters / dt
    result = {
        "metric": "kitti_resnet50_inference_throughput",
        "value": round(img_s, 3),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 2),
    }
    print(
        f"# canvas={h}x{w} batch={batch} iters={iters} "
        f"compile={compile_s:.1f}s steady={dt/iters*1000:.1f}ms/batch "
        f"({dt/(batch*iters)*1000:.1f}ms/img)",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
