"""Fused, jitted training steps for the 4-step Faster R-CNN scheme.

Where the reference crosses the host<->device boundary 2-3x per iteration
(rpn predict_on_batch -> NumPy proposal machinery -> train_on_batch; SURVEY.md
§3.2), each step here is ONE fixed-shape XLA program over a sharded batch:

  step 1/3  images ──backbone──rpn──┐
            gt ──rpn_targets(vmap)──┴── losses ── grad ── optax update

  step 2    images ──frozen-RPN──proposals(12000→NMS→2000)──det_targets──
            sample(64)──[own backbone]──roi_align──det head── losses ── update

  step 4    like step 2 but pooled features come from the frozen step-3
            RPN's backbone and only the detector head trains (the reference's
            host-cached conv features, det_util.py:85-87, become simply
            reusing the in-graph feature map).

Batch layout (all static shapes; B shards over the 'data' mesh axis):
  image:    (B, Hc, Wc, 3) — either float32 preprocessed pixels on the padded
            canvas, or raw RGB uint8 canvases (4x less host->device traffic;
            the BGR flip + ImageNet mean subtraction then runs on device —
            see ``ingest_images``; jit specializes per input dtype)
  gt_boxes: (B, G, 4) float32, resized-image coords
  gt_class: (B, G) int32
  gt_valid: (B, G) bool
  img_hw:   (B, 2) int32 actual (h, w) of the resized image within the canvas
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from faster_rcnn_tpu.config import FasterRcnnConfig
from faster_rcnn_tpu.models.detector import FasterRCNN
from faster_rcnn_tpu.ops import anchors as anchor_ops
from faster_rcnn_tpu.ops import losses as loss_ops
from faster_rcnn_tpu.ops import proposals as prop_ops
from faster_rcnn_tpu.ops import targets as tgt_ops
from faster_rcnn_tpu.ops.roi_align import roi_align_batched
from faster_rcnn_tpu.ops.sampling import sample_det_rois
from faster_rcnn_tpu.parallel.freeze import frozen_prefix_stage


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def ingest_images(images: jax.Array) -> jax.Array:
    """Device-side image ingest: raw uint8 RGB canvases are preprocessed on
    device (RGB->BGR + ImageNet mean subtraction, matching
    models.detector.preprocess_rgb / inference.make_detect_fn uint8_input);
    float32 batches are assumed already preprocessed on the host and pass
    through.  Dtype is static under jit, so each pipeline variant compiles
    its own specialization — no config knob needed."""
    if images.dtype == jnp.uint8:
        from faster_rcnn_tpu.models.detector import IMAGENET_BGR_MEANS

        return images[..., ::-1].astype(jnp.float32) - jnp.asarray(IMAGENET_BGR_MEANS)
    return images


class Constants(NamedTuple):
    """Static geometry baked into the jitted programs."""

    anchors_image: jax.Array  # (N, 4) image-space anchor grid
    anchors_conv: jax.Array   # (N, 4) conv-space anchor grid


def build_constants(cfg: FasterRcnnConfig) -> Constants:
    dims = cfg.anchors.dims
    ch, cw, s = cfg.conv_h, cfg.conv_w, cfg.model.stride
    return Constants(
        anchors_image=jnp.asarray(anchor_ops.anchor_grid_image_space(ch, cw, dims, s)),
        anchors_conv=jnp.asarray(anchor_ops.anchor_grid_conv_space(ch, cw, dims, s)),
    )


def _position_validity(cfg: FasterRcnnConfig):
    return prop_ops.position_validity(cfg.conv_h, cfg.conv_w, cfg.anchors.num_anchors)


# ---------------------------------------------------------------------------
# RPN training (steps 1 and 3)
# ---------------------------------------------------------------------------


def rpn_losses_one_image(cfg, consts, key, cls_logits, bbreg, gt_boxes, gt_class, gt_valid, img_hw):
    """Per-image RPN targets + masked losses (fixed shapes; used under vmap)."""
    del gt_class
    n = consts.anchors_image.shape[0]
    tg = tgt_ops.rpn_targets(
        key,
        consts.anchors_image,
        gt_boxes,
        gt_valid,
        img_hw[1],
        img_hw[0],
        pos_iou=cfg.rpn.pos_iou,
        neg_iou=cfg.rpn.neg_iou,
        sample_size=cfg.rpn.sample_size,
        max_pos=cfg.rpn.max_pos_samples,
    )
    cls_flat = cls_logits.reshape(n)
    reg_flat = bbreg.reshape(n, 4)
    l_cls = loss_ops.rpn_cls_loss(cls_flat, tg.cls_target, tg.cls_mask, cfg.rpn.n_cls)
    l_reg = loss_ops.rpn_reg_loss(
        reg_flat, tg.reg_target, tg.reg_mask, cfg.rpn.n_reg, cfg.rpn.lambda_reg
    )
    return l_cls, l_reg


def make_rpn_train_step(
    cfg: FasterRcnnConfig,
    model: FasterRCNN,
    tx: optax.GradientTransformation,
    batch_stats,
    freeze_blocks=None,
    freeze_modules=(),
):
    """Jittable (state, batch, keys) -> (state, metrics) for RPN training.

    ``freeze_blocks``/``freeze_modules`` mirror the spec the optimizer was
    built with (trainer.step_freeze_spec) so the backward pass can be cut at
    the frozen-prefix boundary; defaults reproduce step 1 / joint semantics
    (cfg.model.freeze_blocks, nothing module-frozen).
    """
    consts = build_constants(cfg)
    sg_stage = frozen_prefix_stage(
        cfg.model.network,
        cfg.model.freeze_blocks if freeze_blocks is None else freeze_blocks,
        freeze_modules,
    )

    def loss_fn(params, batch, keys):
        variables = {"params": params, "batch_stats": batch_stats}
        feat = model.apply(variables, ingest_images(batch["image"]),
                           method=FasterRCNN.backbone, stop_grad_stage=sg_stage)
        cls_logits, bbreg = model.apply(variables, feat, method=FasterRCNN.rpn)

        l_cls, l_reg = jax.vmap(
            functools.partial(rpn_losses_one_image, cfg, consts)
        )(keys, cls_logits, bbreg, batch["gt_boxes"], batch["gt_class"], batch["gt_valid"], batch["img_hw"])
        l_cls, l_reg = jnp.mean(l_cls), jnp.mean(l_reg)
        return l_cls + l_reg, {"rpn_cls": l_cls, "rpn_reg": l_reg}

    def step(state: TrainState, batch, keys):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, keys
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


# ---------------------------------------------------------------------------
# Proposal generation from a frozen RPN (steps 2, 4, inference)
# ---------------------------------------------------------------------------


def rpn_forward_proposals(cfg, model, rpn_variables, images, img_hw, pre_nms, post_nms):
    """Run the frozen RPN and produce proposals for each image in the batch.

    Returns (feat (B,h,w,F), boxes (B,K,4), scores (B,K), valid (B,K)).
    """
    feat = model.apply(rpn_variables, images, method=FasterRCNN.backbone)
    cls_logits, bbreg = model.apply(rpn_variables, feat, method=FasterRCNN.rpn)
    probs = jax.nn.sigmoid(cls_logits)
    consts = build_constants(cfg)
    posv = _position_validity(cfg)

    def one(prob_i, reg_i, hw_i):
        rows = hw_i[0] // cfg.model.stride
        cols = hw_i[1] // cfg.model.stride
        return prop_ops.generate_proposals(
            prob_i,
            reg_i,
            consts.anchors_conv,
            posv(rows, cols),
            rows,
            cols,
            pre_nms=pre_nms,
            post_nms=post_nms,
            iou_thresh=cfg.rpn.nms_iou,
            nms_tile=cfg.rpn.nms_tile,
        )

    props = jax.vmap(one)(probs, bbreg, img_hw)
    return feat, props.boxes, props.scores, props.valid


# ---------------------------------------------------------------------------
# Detector training (steps 2 and 4)
# ---------------------------------------------------------------------------


def det_losses_one_image(cfg, key, rois, roi_valid, gt_boxes, gt_class, gt_valid):
    """Targets + 64-ROI sample for one image.  Returns (rois64, cls_t, reg_t,
    pos_mask, any_valid)."""
    tg = tgt_ops.det_targets(
        rois,
        roi_valid,
        gt_boxes,
        gt_class,
        gt_valid,
        num_classes=cfg.model.num_classes,
        stride=cfg.model.stride,
        min_iou=cfg.det.min_iou,
        pos_iou=cfg.det.pos_iou,
    )
    idx, any_valid = sample_det_rois(
        key, tg.eligible, tg.is_pos, cfg.det.num_rois, cfg.det.pos_fraction
    )
    return (
        rois[idx],
        tg.cls_target[idx],
        tg.reg_target[idx],
        tg.is_pos[idx],
        any_valid,
    )


def make_det_train_step(
    cfg: FasterRcnnConfig,
    model: FasterRCNN,
    tx: optax.GradientTransformation,
    batch_stats,
    heads_only: bool = False,
    freeze_blocks=None,
    freeze_modules=(),
):
    """Detector train step: (state, batch, keys, rpn_vars) -> (state, metrics).

    heads_only=False (step 2): proposals from the frozen RPN; the detector's
      OWN backbone (trainable, inside ``params``) feeds RoI align — exactly the
      reference's step-2 wiring where the detector model embeds its own base
      (train_det_step2.py:73-99).
    heads_only=True (step 4): RoI align reads the frozen RPN's feature map and
      only the detector head trains (train_det_step4.py:69-95; the host-side
      conv-feature cache disappears — the feature map is already in-graph).
    """
    pre, post = cfg.rpn.train_pre_nms, cfg.rpn.train_post_nms
    sg_stage = frozen_prefix_stage(
        cfg.model.network,
        cfg.model.freeze_blocks if freeze_blocks is None else freeze_blocks,
        freeze_modules,
    )

    def loss_fn(params, batch, keys, rpn_vars):
        images = ingest_images(batch["image"])
        feat_rpn, pboxes, _, pvalid = rpn_forward_proposals(
            cfg, model, rpn_vars, images, batch["img_hw"], pre, post
        )
        pboxes = jax.lax.stop_gradient(pboxes)

        rois64, cls_t, reg_t, pos_m, ok = jax.vmap(
            functools.partial(det_losses_one_image, cfg)
        )(keys, pboxes, pvalid, batch["gt_boxes"], batch["gt_class"], batch["gt_valid"])

        variables = {"params": params, "batch_stats": batch_stats}
        if heads_only:
            pooled_src = jax.lax.stop_gradient(feat_rpn)
        else:
            pooled_src = model.apply(variables, images, method=FasterRCNN.backbone,
                                     stop_grad_stage=sg_stage)

        pooled = roi_align_batched(
            pooled_src, rois64, cfg.det.pool_size, impl=cfg.det.roi_align_impl
        )
        cls_logits, reg_out = model.apply(variables, pooled, method=FasterRCNN.det_head)

        def one_loss(cl, rg, ct, rt, pm, okk):
            l_cls = loss_ops.det_cls_loss(cl, ct)
            l_reg = loss_ops.det_reg_loss(rg, rt, ct, pm, cfg.model.num_classes)
            scale = okk.astype(jnp.float32)  # reference skips no-ROI images
            return l_cls * scale, l_reg * scale

        l_cls, l_reg = jax.vmap(one_loss)(cls_logits, reg_out, cls_t, reg_t, pos_m, ok)
        l_cls, l_reg = jnp.mean(l_cls), jnp.mean(l_reg)
        aux = {
            "det_cls": l_cls,
            "det_reg": l_reg,
            "num_valid_images": jnp.sum(ok.astype(jnp.int32)),
        }
        return l_cls + l_reg, aux

    def step(state: TrainState, batch, keys, rpn_vars):
        """``rpn_vars`` is a runtime argument (device-resident frozen RPN
        tree) — closing over it would bake 100s of MB of weights into the
        compiled program as literal constants."""
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, keys, rpn_vars
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


# ---------------------------------------------------------------------------
# Joint (approximate end-to-end) training — TPU-native extension
# ---------------------------------------------------------------------------


def make_joint_train_step(
    cfg: FasterRcnnConfig,
    model: FasterRCNN,
    tx: optax.GradientTransformation,
    batch_stats,
    freeze_blocks=None,
    freeze_modules=(),
):
    """Single-pass approximate-joint Faster R-CNN training.

    Not present in the reference (which only implements the paper's 4-step
    alternating scheme) — this is the modern formulation: ONE backbone
    forward serves both the RPN losses and (via stop-gradient proposals +
    RoI align on the same feature map) the detector losses, and all four
    losses are optimized together.  Halves the training-time compute vs.
    steps 1+2 and removes the inter-step weight handoff entirely.

    Signature: (state, batch, keys) -> (state, metrics).
    """
    consts = build_constants(cfg)
    posv = _position_validity(cfg)
    pre, post = cfg.rpn.train_pre_nms, cfg.rpn.train_post_nms
    sg_stage = frozen_prefix_stage(
        cfg.model.network,
        cfg.model.freeze_blocks if freeze_blocks is None else freeze_blocks,
        freeze_modules,
    )

    def loss_fn(params, batch, keys):
        variables = {"params": params, "batch_stats": batch_stats}
        feat = model.apply(variables, ingest_images(batch["image"]),
                           method=FasterRCNN.backbone, stop_grad_stage=sg_stage)
        cls_logits, bbreg = model.apply(variables, feat, method=FasterRCNN.rpn)

        # RPN losses
        rpn_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        l_rcls, l_rreg = jax.vmap(
            functools.partial(rpn_losses_one_image, cfg, consts)
        )(rpn_keys, cls_logits, bbreg, batch["gt_boxes"], batch["gt_class"],
          batch["gt_valid"], batch["img_hw"])

        # proposals from the CURRENT rpn output, boxes detached
        probs = jax.nn.sigmoid(cls_logits)

        def one(prob_i, reg_i, hw_i):
            rows = hw_i[0] // cfg.model.stride
            cols = hw_i[1] // cfg.model.stride
            return prop_ops.generate_proposals(
                prob_i, reg_i, consts.anchors_conv, posv(rows, cols), rows, cols,
                pre_nms=pre, post_nms=post, iou_thresh=cfg.rpn.nms_iou,
                nms_tile=cfg.rpn.nms_tile,
            )

        props = jax.vmap(one)(jax.lax.stop_gradient(probs),
                              jax.lax.stop_gradient(bbreg), batch["img_hw"])

        det_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        rois64, cls_t, reg_t, pos_m, ok = jax.vmap(
            functools.partial(det_losses_one_image, cfg)
        )(det_keys, props.boxes, props.valid, batch["gt_boxes"],
          batch["gt_class"], batch["gt_valid"])

        pooled = roi_align_batched(feat, rois64, cfg.det.pool_size, impl=cfg.det.roi_align_impl)
        dcls, dreg = model.apply(variables, pooled, method=FasterRCNN.det_head)

        def one_loss(cl, rg, ct, rt, pm, okk):
            s = okk.astype(jnp.float32)
            return (
                loss_ops.det_cls_loss(cl, ct) * s,
                loss_ops.det_reg_loss(rg, rt, ct, pm, cfg.model.num_classes) * s,
            )

        l_dcls, l_dreg = jax.vmap(one_loss)(dcls, dreg, cls_t, reg_t, pos_m, ok)

        m = {
            "rpn_cls": jnp.mean(l_rcls),
            "rpn_reg": jnp.mean(l_rreg),
            "det_cls": jnp.mean(l_dcls),
            "det_reg": jnp.mean(l_dreg),
            "num_valid_images": jnp.sum(ok.astype(jnp.int32)),
        }
        total = m["rpn_cls"] + m["rpn_reg"] + m["det_cls"] + m["det_reg"]
        return total, m

    def step(state: TrainState, batch, keys):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, keys
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step
