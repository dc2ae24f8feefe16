"""Sub-stage chained breakdown of train-time proposal generation.

The proposal chain (ops/proposals.py: decode -> clip -> top_k -> NMS) costs
25.9 ms/iter at pre_nms=12000 and 14.5 at 6000 (B=16, NOTES.md round 3) —
the second-largest non-backbone cost in the joint step.  This splits it:
decode+clip+mask, top_k truncation, candidate gather, and the blocked NMS
itself, at both pre-NMS sizes.

Usage: python scripts/bench_proposal_stages.py [batch]
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
    print(f"{name:44s} {dt:9.2f} ms/iter  ({dt/B:6.3f} ms/img)", flush=True)
    return dt


def main():
    from faster_rcnn_tpu.config import voc_config
    from faster_rcnn_tpu.ops import boxes as box_ops
    from faster_rcnn_tpu.ops import nms as nms_ops
    from faster_rcnn_tpu.ops.targets import BBREG_MULTIPLIERS
    from faster_rcnn_tpu.train import pipeline

    cfg = voc_config()
    h, w = cfg.data.canvas
    rows, cols = h // cfg.model.stride, w // cfg.model.stride
    consts = pipeline.build_constants(cfg)
    anchors = consts.anchors_conv
    n = anchors.shape[0]
    posv = pipeline._position_validity(cfg)(rows, cols)

    rng = np.random.RandomState(0)
    probs0 = jax.device_put(rng.uniform(size=(B, n)).astype(np.float32))
    deltas0 = jax.device_put(
        (rng.standard_normal((B, n, 4)) * 0.2).astype(np.float32))

    def decode_clip(p):
        def one(pp):
            rois = box_ops.decode(anchors, deltas0[0] / BBREG_MULTIPLIERS)
            rois = box_ops.clip_to_grid(rois, rows, cols)
            valid = box_ops.valid_mask(rois) & posv
            return jnp.where(valid, pp, nms_ops.NEG_INF)
        m = jax.vmap(one)(p)
        return p + 1e-30 * jnp.sum(m)

    chain_time("decode+clip+mask (68k)", decode_clip, probs0)

    for k in (12000, 6000):
        def topk_only(p, k=k):
            s, i = jax.vmap(lambda pp: jax.lax.top_k(pp, k))(p)
            return p + 1e-30 * (jnp.sum(s) + jnp.sum(i.astype(jnp.float32)))

        chain_time(f"top_k 68k->{k}", topk_only, probs0)

        def topk_gather(p, k=k):
            def one(pp, dd):
                s, i = jax.lax.top_k(pp, k)
                return jnp.sum(dd[i]) + jnp.sum(s)
            r = jax.vmap(one)(p, deltas0)
            return p + 1e-30 * jnp.sum(r)

        chain_time(f"top_k+gather 68k->{k}", topk_gather, probs0)

        # NMS on presorted candidates (scores descending by construction)
        sc = jax.device_put(np.sort(
            rng.uniform(size=(B, k)).astype(np.float32), axis=1)[:, ::-1].copy())
        bx = jax.device_put(np.stack([
            rng.uniform(0, cols - 8, (B, k)), rng.uniform(0, rows - 8, (B, k)),
        ], -1).astype(np.float32))
        boxes4 = jnp.concatenate([
            bx, bx + rng.uniform(2, 8, (B, k, 2)).astype(np.float32)], -1)
        ok = jnp.ones((B, k), bool)

        def nms_only(s, boxes4=boxes4, ok=ok):
            def one(ss):
                b, s2, v = nms_ops.nms_topk(
                    boxes4[0], ss, ok[0], cfg.rpn.train_post_nms,
                    cfg.rpn.nms_iou, tile=cfg.rpn.nms_tile, presorted=True)
                return jnp.sum(b) + jnp.sum(s2)
            r = jax.vmap(one)(s)
            return s + 1e-30 * jnp.sum(r)

        chain_time(f"NMS {k}->2000 (blocked)", nms_only, sc)


if __name__ == "__main__":
    main()
