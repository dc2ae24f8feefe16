"""Pure-jnp box geometry: IoU matrices, bbox-regression encode/decode, clipping.

TPU-native rewrite of the reference's host-NumPy geometry (util.py:9-253).  All
functions are shape-polymorphic pure functions on fixed-size arrays, safe under
``jit``/``vmap``/``grad``, and use fp32 regardless of the surrounding compute dtype
(box math is precision-sensitive; conv compute is bf16).

Boxes are ``[x1, y1, x2, y2]`` corner format throughout, matching the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def area(boxes: jax.Array) -> jax.Array:
    """Plain ``(x2-x1)*(y2-y1)`` area, reference util.py:46-51 (_area).

    Note the reference has TWO area conventions: this one for IoU matrices
    (util.py:146-177) and the ``+1`` convention inside NMS (det_util.py:230) and
    VOC eval (eval_dets.py:92-101).  See :func:`area_plus_one`.
    """
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def area_plus_one(boxes: jax.Array) -> jax.Array:
    """``(x2-x1+1)*(y2-y1+1)`` area convention used by the reference NMS
    (det_util.py:230) and VOC evaluation (eval_dets.py:92-96)."""
    return (boxes[..., 2] - boxes[..., 0] + 1.0) * (boxes[..., 3] - boxes[..., 1] + 1.0)


def iou_matrix(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """All-pairs IoU between two box sets; result[i, j] = IoU(boxes1[i], boxes2[j]).

    Semantics of util.py:146-177 (cross_ious) — zero-width intersections clamp to
    0, no +1 convention — but fully vectorized as one (M, N) broadcast instead of
    the reference's python loop over the smaller set.  Degenerate boxes (zero
    area) yield IoU 0 via the safe divide.
    """
    b1 = boxes1.astype(jnp.float32)[:, None, :]   # (M, 1, 4)
    b2 = boxes2.astype(jnp.float32)[None, :, :]   # (1, N, 4)

    inter_w = jnp.maximum(
        0.0, jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0])
    )
    inter_h = jnp.maximum(
        0.0, jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1])
    )
    inter = inter_w * inter_h
    union = area(boxes1.astype(jnp.float32))[:, None] + area(
        boxes2.astype(jnp.float32)
    )[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def encode(anchors: jax.Array, gt: jax.Array) -> jax.Array:
    """Bounding-box regression encode: anchor + gt -> (tx, ty, tw, th).

    Reference util.py:180-206 (get_reg_params): center offsets normalized by
    anchor dims, log-space size ratios.  Degenerate anchors or gt (non-positive
    width/height) produce zeros rather than inf/nan so padded rows stay finite.
    """
    anchors = anchors.astype(jnp.float32)
    gt = gt.astype(jnp.float32)

    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    acx = (anchors[..., 0] + anchors[..., 2]) / 2.0
    acy = (anchors[..., 1] + anchors[..., 3]) / 2.0

    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    gcx = (gt[..., 0] + gt[..., 2]) / 2.0
    gcy = (gt[..., 1] + gt[..., 3]) / 2.0

    valid = (aw > 0) & (ah > 0) & (gw > 0) & (gh > 0)
    saw = jnp.where(valid, aw, 1.0)
    sah = jnp.where(valid, ah, 1.0)
    sgw = jnp.where(valid, gw, 1.0)
    sgh = jnp.where(valid, gh, 1.0)

    tx = (gcx - acx) / saw
    ty = (gcy - acy) / sah
    tw = jnp.log(sgw / saw)
    th = jnp.log(sgh / sah)
    t = jnp.stack([tx, ty, tw, th], axis=-1)
    return jnp.where(valid[..., None], t, 0.0)


def decode(anchors: jax.Array, deltas: jax.Array, round_coords: bool = True) -> jax.Array:
    """Apply regression deltas to anchors -> boxes.

    Matches util.py:111-142 (transform_np_inplace): the center/size transform
    followed by ``np.round`` (banker's rounding — jnp.round matches) of x1, y1,
    w, h *before* reconstituting x2 = x1 + w.  ``round_coords=False`` gives the
    float variant of util.py:55-74 (transform) used in the final detection
    decode (voc_dets.py:68).
    """
    anchors = anchors.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)

    w = anchors[..., 2] - anchors[..., 0]
    h = anchors[..., 3] - anchors[..., 1]
    cx = anchors[..., 0] + w / 2.0
    cy = anchors[..., 1] + h / 2.0

    cx = cx + deltas[..., 0] * w
    cy = cy + deltas[..., 1] * h
    nw = jnp.exp(deltas[..., 2]) * w
    nh = jnp.exp(deltas[..., 3]) * h
    x1 = cx - nw / 2.0
    y1 = cy - nh / 2.0

    if round_coords:
        x1, y1, nw, nh = jnp.round(x1), jnp.round(y1), jnp.round(nw), jnp.round(nh)

    return jnp.stack([x1, y1, x1 + nw, y1 + nh], axis=-1)


def clip_to_grid(boxes: jax.Array, rows, cols) -> jax.Array:
    """Clip boxes to a feature grid, reference det_util.py:179-192
    (_sanitize_boxes_inplace): enforce min width/height 1 first, then clamp
    x1,y1 >= 0 and x2 <= cols-1, y2 <= rows-1 (in that order — a box touching
    the right edge can still end with x2 = cols-1 < x1+1)."""
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    x2 = jnp.maximum(x1 + 1, x2)
    y2 = jnp.maximum(y1 + 1, y2)
    x1 = jnp.maximum(0, x1)
    y1 = jnp.maximum(0, y1)
    x2 = jnp.minimum(cols - 1, x2)
    y2 = jnp.minimum(rows - 1, y2)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def valid_mask(boxes: jax.Array) -> jax.Array:
    """Positive width AND height, reference det_util.py:196-206
    (_get_valid_box_idxs) — as a boolean mask instead of an index list."""
    return (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
