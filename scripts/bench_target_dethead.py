"""Drill-down: where do `rpn targets` (9.6 ms) and `det head fwd+bwd`
(19.1 ms) go?  Candidates from the round-3 stage breakdown (NOTES.md).

Chained methodology as scripts/bench_chained.py.  Usage:
    python scripts/bench_target_dethead.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_ITERS = 30


def chain_time(name, step, x0, iters=N_ITERS):
    f = jax.jit(step)
    jax.block_until_ready(f(x0))
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:52s} {dt:9.2f} ms/iter", flush=True)
    return dt


def main():
    from faster_rcnn_tpu.config import voc_config
    from faster_rcnn_tpu.models.detector import FasterRCNN, init_model
    from faster_rcnn_tpu.ops import boxes as box_ops
    from faster_rcnn_tpu.ops.sampling import subsample_rpn_anchors
    from faster_rcnn_tpu.train import pipeline

    cfg = voc_config()
    consts = pipeline.build_constants(cfg)
    n = consts.anchors_image.shape[0]
    g = cfg.data.max_gt_boxes
    print(f"anchors={n} gt_slots={g} batch={B}")

    rng = np.random.RandomState(0)
    gt = np.zeros((B, g, 4), np.float32)
    gt[:, :3] = rng.uniform(0, 500, (B, 3, 4))
    gt[:, :3, 2:] += 100
    gt_valid = np.zeros((B, g), bool)
    gt_valid[:, :3] = True
    gt_b = jax.device_put(gt)
    gtv_b = jax.device_put(gt_valid)
    keys0 = jax.device_put(jax.random.split(jax.random.PRNGKey(0), B))

    # 1) IoU matrix only
    def iou_only(k):
        def one(key, gtb, gv):
            ious = box_ops.iou_matrix(consts.anchors_image, gtb)
            ious = jnp.where(gv[None, :], ious, 0.0)
            return jnp.sum(ious) + jnp.max(ious)
        s = jnp.sum(jax.vmap(one)(k, gt_b, gtv_b))
        return k + jnp.uint32(jnp.where(jnp.isfinite(s), 1, 0))

    chain_time("rpn: IoU matrix (N,G) only", iou_only, keys0)

    # 2) everything except sampling
    def tgt_nosample(k):
        def one(key, gtb, gv):
            ious = box_ops.iou_matrix(consts.anchors_image, gtb)
            ious = jnp.where(gv[None, :], ious, 0.0)
            max_iou = jnp.max(ious, axis=1)
            argmax_gt = jnp.argmax(ious, axis=1)
            best = jnp.argmax(ious, axis=0)
            has = (jnp.max(ious, axis=0) > 0.0) & gv
            is_pos = jnp.zeros((n,), bool).at[best].max(has) | (max_iou > 0.7)
            reg = box_ops.encode(consts.anchors_image, gtb[argmax_gt])
            return jnp.sum(reg) + jnp.sum(is_pos)
        s = jnp.sum(jax.vmap(one)(k, gt_b, gtv_b))
        return k + jnp.uint32(jnp.where(jnp.isfinite(s), 1, 0))

    chain_time("rpn: targets w/o sampler", tgt_nosample, keys0)

    # 3) sampler only (two rank-sorts over N)
    def sampler_only(k):
        def one(key):
            is_pos = jax.random.uniform(jax.random.fold_in(key, 9), (n,)) < 0.001
            can_use = jax.random.uniform(jax.random.fold_in(key, 8), (n,)) < 0.5
            return jnp.sum(subsample_rpn_anchors(key, is_pos, can_use))
        s = jnp.sum(jax.vmap(one)(k))
        return k + jnp.uint32(jnp.where(jnp.isfinite(s), 1, 0))

    chain_time("rpn: sampler only (2 argsorts over N)", sampler_only, keys0)

    # 4) det head fwd only vs fwd+bwd(params) vs fwd+bwd(input)
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    vs = jax.device_put({"params": params, "batch_stats": batch_stats})
    pooled0 = jax.device_put(
        rng.standard_normal((B, 64, 7, 7, 1024)).astype(np.float32))

    def dh_fwd(p):
        cl, rg = model.apply(vs, p, method=FasterRCNN.det_head)
        return (p.astype(jnp.float32) + 1e-30 * (jnp.sum(cl) + jnp.sum(rg))).astype(p.dtype)

    chain_time("det head fwd only", dh_fwd, pooled0)

    def dh_fb_input(p):
        def loss(pp):
            cl, rg = model.apply(vs, pp, method=FasterRCNN.det_head)
            return jnp.sum(cl) + jnp.sum(rg)
        val, grad = jax.value_and_grad(loss)(p)
        return (p.astype(jnp.float32) + 1e-30 * (val + jnp.sum(grad.astype(jnp.float32)))).astype(p.dtype)

    chain_time("det head fwd+bwd(input only)", dh_fb_input, pooled0)

    def dh_fb_params(p):
        def loss(prm):
            cl, rg = model.apply({"params": prm, "batch_stats": batch_stats},
                                 p, method=FasterRCNN.det_head)
            return jnp.sum(cl) + jnp.sum(rg)
        val, grads = jax.value_and_grad(loss)(params)
        gs = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                 for l in jax.tree_util.tree_leaves(grads)[:3])
        return (p.astype(jnp.float32) + 1e-30 * (val + gs)).astype(p.dtype)

    chain_time("det head fwd+bwd(params)", dh_fb_params, pooled0)


if __name__ == "__main__":
    main()
