"""RPN output -> region proposals, as one fused fixed-shape device program.

Replaces the hottest host-side chain in the reference (det_util.py:39-77 and
136-158): predict_on_batch -> decode vs conv-space anchors -> clip -> validity
filter -> score sort -> truncate (12000/8000) -> int16 cast -> greedy NMS
(2000/300).  Here the whole chain is jnp on padded shapes:

* decode uses the banker's-rounded transform (util.py:111-142) against the
  static conv-space anchor grid (anchor_dims // stride, det_util.py:372-374);
* clip bounds are the *actual* per-image conv dims (dynamic scalars — shapes
  stay static);
* anchors whose grid position lies beyond the actual conv extent (canvas
  padding) are score-masked to -inf instead of dropped;
* truncation becomes top-k, NMS is the blocked exact-greedy TPU kernel.

The int16 cast (det_util.py:76) was purely a host-NMS speed hack; coordinates
are already integral after rounding, so it is dropped with no numeric effect.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_tpu.ops import boxes as box_ops
from faster_rcnn_tpu.ops import nms as nms_ops
from faster_rcnn_tpu.ops.targets import BBREG_MULTIPLIERS


class Proposals(NamedTuple):
    boxes: jax.Array   # (post_nms, 4) float32, feature-map coords
    scores: jax.Array  # (post_nms,)
    valid: jax.Array   # (post_nms,) bool


def position_validity(conv_h: int, conv_w: int, num_anchors: int):
    """Host helper: returns fn(rows, cols) -> (conv_h*conv_w*A,) bool marking
    anchors whose grid cell lies inside the actual (rows, cols) extent."""
    ys = np.repeat(np.arange(conv_h), conv_w * num_anchors).reshape(-1)
    xs = np.tile(np.repeat(np.arange(conv_w), num_anchors), conv_h)
    ys_c = jnp.asarray(ys)
    xs_c = jnp.asarray(xs)

    def fn(rows, cols):
        return (ys_c < rows) & (xs_c < cols)

    return fn


def generate_proposals(
    rpn_cls_prob: jax.Array,
    rpn_bbreg: jax.Array,
    conv_anchors: jax.Array,
    pos_valid: jax.Array,
    rows,
    cols,
    pre_nms: int,
    post_nms: int,
    iou_thresh: float = 0.7,
    nms_tile: int = 256,
) -> Proposals:
    """One image's proposals.

    Args:
      rpn_cls_prob: (h, w, A) objectness probabilities (sigmoid applied).
      rpn_bbreg: (h, w, 4A) regression output (multiplier-scaled, as trained).
      conv_anchors: (h*w*A, 4) static conv-space anchor grid.
      pos_valid: (h*w*A,) bool — anchor's grid cell within the actual image's
        conv extent.
      rows, cols: actual conv dims of this image (dynamic scalars).
      pre_nms: top-k candidates entering NMS (12000 train / 8000 infer).
      post_nms: proposals kept (2000 train / 300 infer).
    """
    n = conv_anchors.shape[0]
    probs = rpn_cls_prob.reshape(n).astype(jnp.float32)
    deltas = rpn_bbreg.reshape(n, 4).astype(jnp.float32)

    rois = box_ops.decode(conv_anchors, deltas / BBREG_MULTIPLIERS)
    rois = box_ops.clip_to_grid(rois, rows, cols)
    valid = box_ops.valid_mask(rois) & pos_valid

    # top-k prescore truncation (det_util.py:71-75)
    pre_nms = min(pre_nms, n)
    masked = jnp.where(valid, probs, nms_ops.NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked, pre_nms)
    top_boxes = rois[top_idx]
    top_valid = top_scores > nms_ops.NEG_INF / 2

    boxes, scores, ok = nms_ops.nms_topk(
        top_boxes, top_scores, top_valid, post_nms, iou_thresh, tile=nms_tile,
        presorted=True,  # top_k output is already score-descending
    )
    return Proposals(boxes=boxes, scores=scores, valid=ok)
