"""Masked detection losses.

Rewrites of loss_functions.py:15-77.  The reference packs loss masks into
``y_true`` channel concatenations because Keras losses only see (y_true,
y_pred); our losses take masks as first-class arguments.

Normalizers preserved exactly: N_CLS=256, N_REG=2400, LAMBDA_REG=10
(loss_functions.py:8-11), and the detector bbreg denominator's elementwise
``1e-4 + mask`` sum (loss_functions.py:66).

One conscious fix (documented per SURVEY.md §7 "quirks"): the reference's RPN
bbreg loss multiplies the mask *outside* the summed smooth-L1
(loss_functions.py:44: ``selected_losses * K.sum(...)``), so unselected
anchors' regression errors leak into the sum and the mask merely rescales the
scalar.  We implement the paper's intended masked sum
``λ·Σ(mask·smoothL1)/N_REG``; training-level behavior is equivalent in spirit
and strictly better conditioned.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(x: jax.Array) -> jax.Array:
    """Huber/smooth-L1 with transition at |x| = 1 (loss_functions.py:42-45)."""
    ax = jnp.abs(x)
    return jnp.where(ax <= 1.0, 0.5 * ax * ax, ax - 0.5)


def rpn_cls_loss(
    logits: jax.Array, target_pos: jax.Array, mask: jax.Array, n_cls: float = 256.0
) -> jax.Array:
    """Σ mask · BCE(is_pos, σ(logit)) / N_CLS  (loss_functions.py:21-28).

    Args:
      logits: (..., N) raw scores (reference head applies sigmoid in-graph;
        we keep logits for numerical stability).
      target_pos: (..., N) {0,1} positive labels.
      mask: (..., N) selected-anchor mask.
    """
    logits = logits.astype(jnp.float32)
    t = target_pos.astype(jnp.float32)
    # stable BCE-from-logits: max(x,0) - x*t + log(1+exp(-|x|))
    bce = jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(mask.astype(jnp.float32) * bce) / n_cls


def rpn_reg_loss(
    pred: jax.Array,
    target: jax.Array,
    mask: jax.Array,
    n_reg: float = 2400.0,
    lambda_reg: float = 10.0,
) -> jax.Array:
    """λ · Σ mask·smoothL1(target − pred) / N_REG (loss_functions.py:31-48,
    with the mask applied inside the sum — see module docstring)."""
    d = target.astype(jnp.float32) - pred.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    if m.ndim == d.ndim - 1:
        m = m[..., None]
    return lambda_reg * jnp.sum(m * smooth_l1(d)) / n_reg


def det_cls_loss(logits: jax.Array, cls_target: jax.Array) -> jax.Array:
    """Mean categorical cross-entropy over the ROI minibatch
    (loss_functions.py:70-77).  ``logits`` (R, C), ``cls_target`` (R,) ids."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, cls_target[:, None].astype(jnp.int32), axis=1)[:, 0]
    return jnp.mean(nll)


def det_reg_loss(
    pred: jax.Array,
    reg_target: jax.Array,
    cls_target: jax.Array,
    is_pos: jax.Array,
    num_classes: int,
    lambda_reg_det: float = 1.0,
) -> jax.Array:
    """Per-class smooth-L1 over positive ROIs (loss_functions.py:51-67).

    The reference one-hot-expands targets to (R, 4·(C−1)) and masks; we gather
    the predicted 4-slice at each positive ROI's class — identical sum.  The
    denominator reproduces Σ(1e-4 + mask) elementwise over the full
    (R, 4·(C−1)) mask matrix: 4·n_pos + 1e-4·R·4·(C−1).

    Args:
      pred: (R, 4·(C−1)) regression output, class-major 4-slices.
      reg_target: (R, 4) multiplier-scaled targets for each ROI's matched gt.
      cls_target: (R,) class ids (background = C−1; never positive).
      is_pos: (R,) bool.
    """
    r = pred.shape[0]
    c_fg = num_classes - 1
    cls_safe = jnp.minimum(cls_target, c_fg - 1).astype(jnp.int32)
    base = cls_safe * 4
    cols = base[:, None] + jnp.arange(4)[None, :]
    pred_slice = jnp.take_along_axis(pred.astype(jnp.float32), cols, axis=1)  # (R, 4)

    m = is_pos.astype(jnp.float32)[:, None]
    num = jnp.sum(m * smooth_l1(reg_target.astype(jnp.float32) - pred_slice))
    denom = 4.0 * jnp.sum(m) + 1e-4 * r * 4 * c_fg
    return lambda_reg_det * num / denom
