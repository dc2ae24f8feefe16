"""Independent NumPy oracles for the reference semantics.

These are written from the behavioral spec in SURVEY.md (NOT copied from the
reference repo) and serve as golden implementations that the jitted TPU ops
must match.  Each function documents which reference behavior it pins down.
"""

from __future__ import annotations

import math

import numpy as np


def np_iou_matrix(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """All-pairs IoU, no +1 convention (util.py:146-177 semantics)."""
    m, n = len(b1), len(b2)
    out = np.zeros((m, n), np.float32)
    for i in range(m):
        for j in range(n):
            ix1 = max(b1[i, 0], b2[j, 0])
            iy1 = max(b1[i, 1], b2[j, 1])
            ix2 = min(b1[i, 2], b2[j, 2])
            iy2 = min(b1[i, 3], b2[j, 3])
            iw = max(0.0, ix2 - ix1)
            ih = max(0.0, iy2 - iy1)
            inter = iw * ih
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            union = a1 + a2 - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def np_encode(anchor, gt):
    """get_reg_params (util.py:180-206)."""
    acx, acy = (anchor[0] + anchor[2]) / 2.0, (anchor[1] + anchor[3]) / 2.0
    aw, ah = anchor[2] - anchor[0], anchor[3] - anchor[1]
    gcx, gcy = (gt[0] + gt[2]) / 2.0, (gt[1] + gt[3]) / 2.0
    gw, gh = gt[2] - gt[0], gt[3] - gt[1]
    return np.array(
        [(gcx - acx) / aw, (gcy - acy) / ah, math.log(gw / aw), math.log(gh / ah)],
        np.float32,
    )


def np_decode_rounded(coords: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """transform_np_inplace semantics (util.py:111-142): banker's-round x1, y1,
    w, h then reconstitute corners.  Pure (no input mutation)."""
    coords = coords.astype(np.float64).copy()
    w = coords[:, 2] - coords[:, 0]
    h = coords[:, 3] - coords[:, 1]
    cx = coords[:, 0] + w / 2 + deltas[:, 0] * w
    cy = coords[:, 1] + h / 2 + deltas[:, 1] * h
    nw = np.exp(deltas[:, 2]) * w
    nh = np.exp(deltas[:, 3]) * h
    x1 = np.round(cx - nw / 2)
    y1 = np.round(cy - nh / 2)
    nw = np.round(nw)
    nh = np.round(nh)
    return np.stack([x1, y1, x1 + nw, y1 + nh], axis=1)


def np_greedy_nms(boxes: np.ndarray, probs: np.ndarray, overlap_thresh: float, max_boxes: int):
    """Greedy score-descending NMS with the +1 area convention
    (det_util.py:209-256). Ties broken by lowest index (our pinned rule)."""
    boxes = boxes.astype(np.float64)
    n = len(boxes)
    alive = np.ones(n, bool)
    pick = []
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    while alive.any() and len(pick) < max_boxes:
        cand = np.where(alive)[0]
        i = cand[np.argmax(probs[cand])]
        pick.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        iw = np.maximum(0, x2 - x1 + 1)
        ih = np.maximum(0, y2 - y1 + 1)
        inter = iw * ih
        iou = inter / (areas[i] + areas - inter)
        alive &= iou <= overlap_thresh
        alive[i] = False
    return np.array(pick, np.int64)


def np_anchor_dims(scales, ratios) -> np.ndarray:
    """shared_constants.py:9-11 derivation."""
    naive = np.array([[s * h, s * w] for s in scales for h, w in ratios])
    r = np.array([math.sqrt(s * h * s * w) / s for s in scales for h, w in ratios])
    return (naive // r[:, None]).astype(int)


def np_anchor_coords_image(conv_rows, conv_cols, anchor_dims, stride):
    """rpn_util.py:276-298 layout: index = (y*cols + x)*A + a."""
    a = len(anchor_dims)
    num = conv_rows * conv_cols * a
    coords = np.zeros((num, 4), np.float32)
    for idx in range(num):
        div = conv_cols * a
        y, rem = idx // div, idx % div
        x, ai = rem // a, rem % a
        xc, yc = int(stride * (x + 0.5)), int(stride * (y + 0.5))
        hgt, wid = anchor_dims[ai]
        x1 = xc - wid // 2
        y1 = yc - hgt // 2
        coords[idx] = [x1, y1, x1 + wid, y1 + hgt]
    return coords


def np_anchor_coords_conv(conv_rows, conv_cols, anchor_dims, stride):
    """det_util.py:162-175 with anchor_dims // stride: centers at grid indices."""
    dims = np.asarray(anchor_dims) // stride
    a = len(dims)
    coords = np.zeros((conv_rows, conv_cols, a, 4), np.float32)
    for ai, (hgt, wid) in enumerate(dims):
        for y in range(conv_rows):
            for x in range(conv_cols):
                x1 = x - wid // 2
                y1 = y - hgt // 2
                coords[y, x, ai] = [x1, y1, x1 + wid, y1 + hgt]
    return coords.reshape(-1, 4)


def np_tf1_bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """TF1 tf.image.resize_images bilinear, align_corners=False: src = dst*scale,
    taps floor / min(floor+1, in-1)."""
    in_h, in_w, c = img.shape
    out = np.zeros((out_h, out_w, c), np.float32)
    sy = in_h / out_h
    sx = in_w / out_w
    for i in range(out_h):
        fy = i * sy
        y0 = int(np.floor(fy))
        y1 = min(y0 + 1, in_h - 1)
        wy = fy - y0
        for j in range(out_w):
            fx = j * sx
            x0 = int(np.floor(fx))
            x1 = min(x0 + 1, in_w - 1)
            wx = fx - x0
            top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
            bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
            out[i, j] = top * (1 - wy) + bot * wy
    return out
