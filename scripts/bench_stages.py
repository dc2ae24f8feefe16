"""Stage-level timing of the fused detect program on TPU.

Times nested prefixes of the inference pipeline (each as its own jitted
program, steady-state, device-resident inputs) so per-stage cost falls out by
subtraction:

    backbone -> +rpn+proposals(NMS) -> +roi_align -> +det_head -> full detect

Usage: python scripts/bench_stages.py [batch] [align_impl]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from faster_rcnn_tpu.config import kitti_config
from faster_rcnn_tpu.inference import make_detect_fn
from faster_rcnn_tpu.models.detector import FasterRCNN, init_model
from faster_rcnn_tpu.ops.roi_align import roi_align_batched
from faster_rcnn_tpu.train.pipeline import rpn_forward_proposals

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
IMPL = sys.argv[2] if len(sys.argv) > 2 else None

cfg = kitti_config()
if IMPL:
    import dataclasses
    cfg = cfg.replace(det=dataclasses.replace(cfg.det, roi_align_impl=IMPL))
model, variables = init_model(jax.random.PRNGKey(0), cfg)
h, w = cfg.data.canvas
rng = np.random.RandomState(0)
images = jax.device_put(rng.standard_normal((B, h, w, 3)).astype(np.float32) * 30)
img_hw = jax.device_put(np.tile([[600, 1500]], (B, 1)).astype(np.int32))
vs = jax.device_put(variables)


@jax.jit
def s1_backbone(vs, images):
    return model.apply(vs, images, method=FasterRCNN.backbone)


@jax.jit
def s2_proposals(vs, images, img_hw):
    return rpn_forward_proposals(
        cfg, model, vs, images, img_hw, cfg.rpn.infer_pre_nms, cfg.rpn.infer_post_nms
    )


@jax.jit
def s3_align(vs, images, img_hw):
    feat, pboxes, _, pvalid = rpn_forward_proposals(
        cfg, model, vs, images, img_hw, cfg.rpn.infer_pre_nms, cfg.rpn.infer_post_nms
    )
    return roi_align_batched(feat, pboxes, cfg.det.pool_size, impl=cfg.det.roi_align_impl)


@jax.jit
def s4_head(vs, images, img_hw):
    feat, pboxes, _, pvalid = rpn_forward_proposals(
        cfg, model, vs, images, img_hw, cfg.rpn.infer_pre_nms, cfg.rpn.infer_post_nms
    )
    pooled = roi_align_batched(feat, pboxes, cfg.det.pool_size, impl=cfg.det.roi_align_impl)
    return model.apply(vs, pooled, method=FasterRCNN.det_head)


detect = make_detect_fn(cfg, model, variables)


def timeit(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:28s} {dt:8.2f} ms/batch  {dt/B:6.2f} ms/img")
    return dt


print(f"KITTI canvas {h}x{w}, B={B}, align_impl={cfg.det.roi_align_impl}")
t1 = timeit("backbone", s1_backbone, vs, images)
t2 = timeit("+rpn+proposal NMS", s2_proposals, vs, images, img_hw)
t3 = timeit("+roi_align", s3_align, vs, images, img_hw)
t4 = timeit("+det head (stage5+fc)", s4_head, vs, images, img_hw)
t5 = timeit("full detect (+decode+NMS)", lambda im, hw: detect(im, hw), images, img_hw)
print(f"\ndeltas: rpn+propNMS={t2-t1:.2f} align={t3-t2:.2f} "
      f"head={t4-t3:.2f} decode+finalNMS={t5-t4:.2f} ms/batch")
