"""On-device training target assignment for RPN and detector heads.

Fixed-shape rewrites of the reference's host-NumPy managers:

* :func:`rpn_targets` — rpn_util.py:54-140 (RpnTrainingManager._process +
  rpn_y_true), producing flat per-anchor masks/targets instead of the packed
  ``[can_use || is_pos]`` channel concatenation (our losses take masks
  directly; the information content is identical).
* :func:`det_targets` — det_util.py:310-366 (_rois_to_truth and the one-hot
  encoders), producing a compact (class-id + 4 regression values) encoding
  instead of the (R, 8*(C-1)) one-hot matrix; the loss gathers the per-class
  regression slice, which is the same computation.

All dynamic-count operations (np.where index lists) become boolean masks over
static shapes; padded ground-truth rows are masked out of IoU columns.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from faster_rcnn_tpu.ops import boxes as box_ops
from faster_rcnn_tpu.ops.sampling import subsample_rpn_anchors

BBREG_MULTIPLIERS = jnp.array([10.0, 10.0, 5.0, 5.0], jnp.float32)  # shared_constants.py:5


class RpnTargets(NamedTuple):
    cls_mask: jax.Array      # (N,) bool — anchor participates in the cls loss
    cls_target: jax.Array    # (N,) bool — anchor is a positive
    reg_mask: jax.Array      # (N,) bool — anchor participates in the bbreg loss
    reg_target: jax.Array    # (N, 4) float32 — multiplier-scaled reg targets


def rpn_targets(
    key: jax.Array,
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    img_w: jax.Array,
    img_h: jax.Array,
    pos_iou: float = 0.7,
    neg_iou: float = 0.3,
    sample_size: int = 256,
    max_pos: int = 128,
) -> RpnTargets:
    """Assign RPN classification/regression targets for one image.

    Args:
      key: PRNG key for anchor subsampling.
      anchors: (N, 4) image-space anchor boxes (static constant).
      gt_boxes: (G, 4) padded ground-truth boxes, image space.
      gt_valid: (G,) bool validity of each gt row.
      img_w, img_h: actual (unpadded) image dims — anchors crossing this
        boundary are excluded (rpn_util.py:302-310), which also kills every
        anchor centered over canvas padding.

    Rules (rpn_util.py:74-95): positives are anchors with IoU > pos_iou to any
    gt PLUS, for each gt with nonzero best IoU, its argmax anchor; negatives
    have max IoU < neg_iou and are not positive; out-of-bounds anchors are
    excluded last (overriding positives, as in the reference's ordering).
    Regression targets point at each positive's own argmax gt.
    """
    n = anchors.shape[0]
    ious = box_ops.iou_matrix(anchors, gt_boxes)           # (N, G)
    ious = jnp.where(gt_valid[None, :], ious, 0.0)

    max_iou = jnp.max(ious, axis=1)
    argmax_gt = jnp.argmax(ious, axis=1)                   # first max, as np.argmax

    # Per-gt argmax anchors (rpn_util.py:77-80): only gts with best IoU > 0.
    best_anchor_per_gt = jnp.argmax(ious, axis=0)          # (G,)
    gt_has_overlap = (jnp.max(ious, axis=0) > 0.0) & gt_valid
    is_pos = jnp.zeros((n,), bool)
    is_pos = is_pos.at[best_anchor_per_gt].max(gt_has_overlap)
    is_pos = is_pos | (max_iou > pos_iou)

    # Regression targets for positives, scaled (rpn_util.py:85-93).
    matched_gt = gt_boxes[argmax_gt]
    reg = box_ops.encode(anchors, matched_gt) * BBREG_MULTIPLIERS
    reg_target = jnp.where(is_pos[:, None], reg, 0.0)

    is_neg = (~is_pos) & (max_iou < neg_iou)
    oob = (
        (anchors[:, 0] < 0)
        | (anchors[:, 1] < 0)
        | (anchors[:, 2] >= img_w)
        | (anchors[:, 3] >= img_h)
    )
    can_use = (is_pos | is_neg) & ~oob

    sampled = subsample_rpn_anchors(key, is_pos, can_use, sample_size, max_pos)
    return RpnTargets(
        cls_mask=sampled,
        cls_target=is_pos,
        reg_mask=is_pos & sampled,   # rpn_util.py:131 selected_is_pos
        reg_target=reg_target,
    )


class DetTargets(NamedTuple):
    eligible: jax.Array      # (K,) bool — IoU >= min_iou (and real ROI)
    is_pos: jax.Array        # (K,) bool — IoU >= pos_iou
    cls_target: jax.Array    # (K,) int32 — class id, background where not pos
    reg_target: jax.Array    # (K, 4) float32 — multiplier-scaled reg targets


def det_targets(
    rois: jax.Array,
    roi_valid: jax.Array,
    gt_boxes: jax.Array,
    gt_class: jax.Array,
    gt_valid: jax.Array,
    num_classes: int,
    stride: int = 16,
    min_iou: float = 0.1,
    pos_iou: float = 0.5,
) -> DetTargets:
    """Assign detector-head targets to proposals.

    Args:
      rois: (K, 4) proposals in feature-map coords (post-NMS, padded).
      roi_valid: (K,) bool.
      gt_boxes: (G, 4) ground truth in IMAGE coords; scaled here by 1/stride
        (floating point, no rounding — shapes.py:399-404 Box.resize) exactly as
        det_util.py:312-313.
      gt_class: (G,) int32 class ids (background id = num_classes - 1, the
        last index as in VOC_CLASS_MAPPING / KITTI_CLASS_MAPPING).
      num_classes: including background.

    Rules (det_util.py:310-334): ROIs with max IoU >= min_iou are eligible
    training examples; >= pos_iou are positives labeled with their argmax gt's
    class; eligible non-positives are background.
    """
    bg = num_classes - 1
    gt_conv = gt_boxes.astype(jnp.float32) / float(stride)
    ious = box_ops.iou_matrix(rois, gt_conv)
    ious = jnp.where(gt_valid[None, :], ious, 0.0)

    max_iou = jnp.max(ious, axis=1)
    argmax_gt = jnp.argmax(ious, axis=1)

    eligible = (max_iou >= min_iou) & roi_valid
    is_pos = (max_iou >= pos_iou) & eligible

    cls_target = jnp.where(is_pos, gt_class[argmax_gt], bg).astype(jnp.int32)
    reg = box_ops.encode(rois, gt_conv[argmax_gt]) * BBREG_MULTIPLIERS
    reg_target = jnp.where(is_pos[:, None], reg, 0.0)

    return DetTargets(eligible, is_pos, cls_target, reg_target)
