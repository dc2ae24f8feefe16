"""Chained stage breakdown of the TRAINING step (joint + det step-2).

Round-2 verdict: inference had a full chained stage breakdown (NOTES.md r2)
but the train path (33.7% MFU vs 47% inference) had none — nobody knew
whether the gap was backbone bwd, the 12000-box proposal NMS, the RoI-align
backward (which transposes the *einsum* formulation), or optimizer overhead.
This script answers that with the same data-chained methodology as
scripts/bench_chained.py (chain outputs into inputs, one final fetch).

Usage: python scripts/bench_train_stages.py [batch]
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
    x = jax.block_until_ready(f(x0))  # compile + warm
    del x
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:46s} {dt:9.2f} ms/iter  ({dt/B:6.3f} ms/img)", flush=True)
    return dt


def feedback(x, out_scalar):
    return (x.astype(jnp.float32) + 1e-30 * out_scalar).astype(x.dtype)


def main():
    from faster_rcnn_tpu.config import voc_config
    from faster_rcnn_tpu.models.detector import FasterRCNN, init_model
    from faster_rcnn_tpu.ops.roi_align import roi_align_batched
    from faster_rcnn_tpu.parallel.freeze import make_optimizer
    from faster_rcnn_tpu.train import pipeline

    cfg = voc_config()
    h, w = cfg.data.canvas
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    vs = jax.device_put({"params": params, "batch_stats": batch_stats})

    rng = np.random.RandomState(0)
    g = cfg.data.max_gt_boxes
    gt = np.zeros((B, g, 4), np.float32)
    gt_valid = np.zeros((B, g), bool)
    gt_cls = np.zeros((B, g), np.int32)
    for i in range(B):
        for j in range(3):
            x1, y1 = rng.randint(0, w - 90), rng.randint(0, h - 90)
            gt[i, j] = [x1, y1, x1 + rng.randint(30, 80), y1 + rng.randint(30, 80)]
            gt_valid[i, j] = True
            gt_cls[i, j] = rng.randint(0, cfg.model.num_classes - 1)
    batch = {
        "image": jax.device_put(
            (rng.standard_normal((B, h, w, 3)) * 30).astype(np.float32)),
        "gt_boxes": jax.device_put(gt),
        "gt_class": jax.device_put(gt_cls),
        "gt_valid": jax.device_put(gt_valid),
        "img_hw": jax.device_put(np.tile([[h, w]], (B, 1)).astype(np.int32)),
    }
    keys = jax.device_put(jax.random.split(jax.random.PRNGKey(1), B))
    img0 = batch["image"]
    consts = pipeline.build_constants(cfg)
    posv = pipeline._position_validity(cfg)

    # --- backbone fwd
    def bb_fwd(x):
        feat = model.apply(vs, x, method=FasterRCNN.backbone)
        return feedback(x, jnp.sum(feat.astype(jnp.float32)))

    t_bb_fwd = chain_time("backbone fwd", bb_fwd, img0)

    # --- backbone fwd+bwd (d/dparams like training)
    def bb_fb(x):
        def loss(p):
            feat = model.apply({"params": p, "batch_stats": batch_stats}, x,
                               method=FasterRCNN.backbone)
            return jnp.sum(feat.astype(jnp.float32))
        val, grads = jax.value_and_grad(loss)(params)
        gs = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                 for l in jax.tree_util.tree_leaves(grads)[:3])
        return feedback(x, val + gs)

    t_bb_fb = chain_time("backbone fwd+bwd(params)", bb_fb, img0)

    # --- backbone fwd+bwd at the JOINT frozen-prefix cut (production path)
    from faster_rcnn_tpu.parallel.freeze import frozen_prefix_stage

    sg = frozen_prefix_stage(cfg.model.network, cfg.model.freeze_blocks)

    def bb_fb_frozen(x):
        def loss(p):
            feat = model.apply({"params": p, "batch_stats": batch_stats}, x,
                               method=FasterRCNN.backbone, stop_grad_stage=sg)
            return jnp.sum(feat.astype(jnp.float32))
        val, grads = jax.value_and_grad(loss)(params)
        # consume UNFROZEN-suffix backbone leaves: the tree's last leaves
        # overall are rpn_head params, which get identically-zero gradient
        # under a backbone-only apply, letting XLA dead-code-eliminate the
        # whole backward pass (ADVICE r4)
        gs = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                 for l in jax.tree_util.tree_leaves(grads["backbone"])[-3:])
        return feedback(x, val + gs)

    t_bb_fbf = chain_time(f"backbone fwd+bwd(frozen prefix, sg={sg})",
                          bb_fb_frozen, img0)

    # --- rpn head fwd (on features)
    feat0 = jax.block_until_ready(
        jax.jit(lambda x: model.apply(vs, x, method=FasterRCNN.backbone))(img0))

    def rpn_fwd(f):
        cls_l, reg = model.apply(vs, f, method=FasterRCNN.rpn)
        return feedback(f, jnp.sum(cls_l) + jnp.sum(reg))

    t_rpn = chain_time("rpn head fwd", rpn_fwd, feat0)

    # --- rpn head fwd+bwd(params) — the joint step differentiates it
    def rpn_fb(f):
        def loss(p):
            cls_l, reg = model.apply({"params": p, "batch_stats": batch_stats},
                                     f, method=FasterRCNN.rpn)
            return jnp.sum(cls_l) + jnp.sum(reg)
        val, grads = jax.value_and_grad(loss)(params)
        gs = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                 for l in jax.tree_util.tree_leaves(grads)[-3:])
        return feedback(f, val + gs)

    t_rpn_fb = chain_time("rpn head fwd+bwd(params)", rpn_fb, feat0)

    # --- rpn target gen (vmap, device)
    import functools

    def rpn_tgt(k):
        def one(key):
            from faster_rcnn_tpu.ops import targets as tgt_ops
            tg = tgt_ops.rpn_targets(
                key, consts.anchors_image, batch["gt_boxes"][0],
                batch["gt_valid"][0], w, h,
                pos_iou=cfg.rpn.pos_iou, neg_iou=cfg.rpn.neg_iou,
                sample_size=cfg.rpn.sample_size, max_pos=cfg.rpn.max_pos_samples)
            return jnp.sum(tg.reg_target) + jnp.sum(tg.cls_mask)
        s = jnp.sum(jax.vmap(one)(k))
        return k + jnp.uint32(jnp.where(jnp.isfinite(s), 1, 0))

    t_rpntg = chain_time("rpn targets (vmap B)", rpn_tgt, keys)

    # --- proposal generation at TRAIN sizes (12000 -> NMS -> 2000)
    cls0, reg0 = jax.block_until_ready(
        jax.jit(lambda f: model.apply(vs, f, method=FasterRCNN.rpn))(feat0))
    from faster_rcnn_tpu.ops import proposals as prop_ops

    def props_train(c):
        probs = jax.nn.sigmoid(c)

        def one(p, r, hw):
            rows = hw[0] // cfg.model.stride
            cols = hw[1] // cfg.model.stride
            return prop_ops.generate_proposals(
                p, r, consts.anchors_conv, posv(rows, cols), rows, cols,
                pre_nms=cfg.rpn.train_pre_nms, post_nms=cfg.rpn.train_post_nms,
                iou_thresh=cfg.rpn.nms_iou, nms_tile=cfg.rpn.nms_tile)
        pr = jax.vmap(one)(probs, reg0, batch["img_hw"])
        return feedback(c, jnp.sum(pr.boxes) + jnp.sum(pr.scores))

    t_props = chain_time("proposals train (12000->nms->2000)", props_train, cls0)

    def props_6k(c):
        probs = jax.nn.sigmoid(c)

        def one(p, r, hw):
            rows = hw[0] // cfg.model.stride
            cols = hw[1] // cfg.model.stride
            return prop_ops.generate_proposals(
                p, r, consts.anchors_conv, posv(rows, cols), rows, cols,
                pre_nms=6000, post_nms=cfg.rpn.train_post_nms,
                iou_thresh=cfg.rpn.nms_iou, nms_tile=cfg.rpn.nms_tile)
        pr = jax.vmap(one)(probs, reg0, batch["img_hw"])
        return feedback(c, jnp.sum(pr.boxes) + jnp.sum(pr.scores))

    t_props6 = chain_time("proposals train (6000->nms->2000)", props_6k, cls0)

    # --- det targets + sampling on 2000 proposals
    props0 = jax.block_until_ready(jax.jit(
        lambda c: jax.vmap(lambda p, r, hw: prop_ops.generate_proposals(
            jax.nn.sigmoid(p), r, consts.anchors_conv,
            posv(hw[0] // 16, hw[1] // 16), hw[0] // 16, hw[1] // 16,
            pre_nms=cfg.rpn.train_pre_nms, post_nms=cfg.rpn.train_post_nms,
            iou_thresh=cfg.rpn.nms_iou, nms_tile=cfg.rpn.nms_tile))(
                c, reg0, batch["img_hw"]))(cls0))

    def det_tgt(k):
        rois64, cls_t, reg_t, pos_m, ok = jax.vmap(
            functools.partial(pipeline.det_losses_one_image, cfg)
        )(k, props0.boxes, props0.valid, batch["gt_boxes"],
          batch["gt_class"], batch["gt_valid"])
        s = jnp.sum(rois64) + jnp.sum(reg_t)
        return k + jnp.uint32(jnp.where(jnp.isfinite(s), 1, 0))

    t_dettg = chain_time("det targets+sample(64)", det_tgt, keys)

    rois0 = jax.block_until_ready(jax.jit(lambda k: jax.vmap(
        functools.partial(pipeline.det_losses_one_image, cfg)
    )(k, props0.boxes, props0.valid, batch["gt_boxes"], batch["gt_class"],
      batch["gt_valid"])[0])(keys))

    # --- roi align fwd (production impl) on (B, 64) rois
    def ra_fwd(f):
        pooled = roi_align_batched(f, rois0, cfg.det.pool_size,
                                   impl=cfg.det.roi_align_impl)
        return feedback(f, jnp.sum(pooled.astype(jnp.float32)))

    t_ra_fwd = chain_time(f"roi_align fwd [{cfg.det.roi_align_impl}] (B,64)", ra_fwd, feat0)

    # --- roi align fwd+bwd (the custom VJP transposes the einsum impl)
    def ra_fb(f):
        def loss(ff):
            pooled = roi_align_batched(ff, rois0, cfg.det.pool_size,
                                       impl=cfg.det.roi_align_impl)
            return jnp.sum(pooled.astype(jnp.float32))
        val, grad = jax.value_and_grad(loss)(f)
        return feedback(f, val + jnp.sum(grad.astype(jnp.float32)))

    t_ra_fb = chain_time(f"roi_align fwd+bwd [{cfg.det.roi_align_impl}]", ra_fb, feat0)

    def ra_fb_einsum(f):
        def loss(ff):
            pooled = roi_align_batched(ff, rois0, cfg.det.pool_size, impl="einsum")
            return jnp.sum(pooled.astype(jnp.float32))
        val, grad = jax.value_and_grad(loss)(f)
        return feedback(f, val + jnp.sum(grad.astype(jnp.float32)))

    t_ra_fbe = chain_time("roi_align fwd+bwd [einsum]", ra_fb_einsum, feat0)

    # --- det head fwd+bwd on pooled
    pooled0 = jax.block_until_ready(jax.jit(
        lambda f: roi_align_batched(f, rois0, cfg.det.pool_size,
                                    impl=cfg.det.roi_align_impl))(feat0))

    def dh_fb(p):
        def loss(pp):
            cl, rg = model.apply(vs, pp, method=FasterRCNN.det_head)
            return jnp.sum(cl) + jnp.sum(rg)
        val, grad = jax.value_and_grad(loss)(p)
        return feedback(p, val + jnp.sum(grad.astype(jnp.float32)))

    t_dh = chain_time("det head fwd+bwd(input)", dh_fb, pooled0)

    # --- det head fwd+bwd wrt params AND input — what the training step
    # actually pays (conv/dense dW matmuls cost ~= the forward pass again);
    # this is the stage the composite floor must use.
    def dh_fbp(p):
        def loss(pp, inp):
            cl, rg = model.apply({"params": pp, "batch_stats": batch_stats},
                                 inp, method=FasterRCNN.det_head)
            return jnp.sum(cl) + jnp.sum(rg)
        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, p)
        # consume det_head gradient leaves specifically: the full tree's last
        # leaves are rpn_head params with zero gradient here, so summing them
        # lets XLA eliminate every dW matmul (ADVICE r4 medium)
        gs = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                 for l in jax.tree_util.tree_leaves(grads[0]["det_head"])[-3:])
        return feedback(p, val + gs + jnp.sum(grads[1].astype(jnp.float32)))

    t_dhp = chain_time("det head fwd+bwd(params+input)", dh_fbp, pooled0)

    # --- full joint step (fwd+bwd+optimizer)
    tx = make_optimizer(params, cfg.model.network, cfg.model.freeze_blocks,
                        1e-4, weight_decay=1e-4, clip_grad_norm=10.0)

    # --- optimizer update alone (clip + SGDM + decay over the param tree)
    import optax

    grads0 = jax.device_put(jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-6), params))
    opt0 = jax.device_put(tx.init(params))

    def opt_step(carry):
        p, o = carry
        updates, o = tx.update(grads0, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o)

    t_opt = chain_time("optimizer update alone",
                       opt_step, (jax.device_put(params), opt0))
    state = pipeline.TrainState(
        jax.tree_util.tree_map(jnp.array, params), tx.init(params),
        jnp.zeros((), jnp.int32))
    step_fn = jax.jit(pipeline.make_joint_train_step(cfg, model, tx, batch_stats))
    jax.block_until_ready(step_fn(state, batch, keys))
    t0 = time.time()
    for _ in range(N_ITERS):
        state, metrics = step_fn(state, batch, keys)
    jax.block_until_ready(state.params)
    t_joint = (time.time() - t0) / N_ITERS * 1000
    print(f"{'FULL joint step (chained by opt state)':46s} {t_joint:9.2f} ms/iter"
          f"  ({t_joint/B:6.3f} ms/img)", flush=True)

    # --- step-2 det step (own backbone + frozen RPN)
    det_step = jax.jit(pipeline.make_det_train_step(cfg, model, tx, batch_stats))
    state2 = pipeline.TrainState(
        jax.tree_util.tree_map(jnp.array, params), tx.init(params),
        jnp.zeros((), jnp.int32))
    jax.block_until_ready(det_step(state2, batch, keys, vs))
    t0 = time.time()
    for _ in range(N_ITERS):
        state2, _ = det_step(state2, batch, keys, vs)
    jax.block_until_ready(state2.params)
    t_s2 = (time.time() - t0) / N_ITERS * 1000
    print(f"{'FULL det step-2 (chained by opt state)':46s} {t_s2:9.2f} ms/iter"
          f"  ({t_s2/B:6.3f} ms/img)", flush=True)

    print("\nsummary (ms/iter):")
    print(f"  backbone fwd {t_bb_fwd:.1f} | fwd+bwd {t_bb_fb:.1f} "
          f"| fwd+bwd(frozen sg={sg}) {t_bb_fbf:.1f} "
          f"| rpn {t_rpn:.1f} | rpn_fb {t_rpn_fb:.1f} | rpn_tgt {t_rpntg:.1f}")
    print(f"  opt_update {t_opt:.1f}")
    floor = (t_bb_fbf + t_rpn_fb + t_rpntg + t_props6 + t_dettg
             + t_ra_fb + t_dhp + t_opt)
    print(f"  stage-sum floor (frozen bb + rpn_fb + rpn_tgt + props6k + "
          f"det_tgt + ra_fb + det_head(params+input) + opt) = {floor:.1f} ms "
          f"vs FULL joint {t_joint:.1f} "
          f"(residual {t_joint - floor:+.1f} ms, "
          f"{(t_joint - floor) / t_joint * 100:+.1f}%)")
    print(f"  props12k {t_props:.1f} | props6k {t_props6:.1f} "
          f"| det_tgt {t_dettg:.1f}")
    print(f"  ra_fwd {t_ra_fwd:.1f} | ra_fb {t_ra_fb:.1f} "
          f"| ra_fb_einsum {t_ra_fbe:.1f} | det_head(input) {t_dh:.1f} "
          f"| det_head(params+input) {t_dhp:.1f}")
    print(f"  joint {t_joint:.1f} | step2 {t_s2:.1f}")


if __name__ == "__main__":
    main()
