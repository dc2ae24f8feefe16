"""generate_proposals vs a NumPy oracle of the reference chain
(det_util.py:63-77 / 136-158): decode vs conv anchors -> clip -> validity ->
score sort -> truncate -> greedy NMS."""

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_tpu.config import compute_anchor_dims
from faster_rcnn_tpu.ops import anchors as anchor_ops
from faster_rcnn_tpu.ops import proposals as prop_ops

from tests import reference_impl as ref


def oracle_proposals(probs, deltas, anchors_conv, rows, cols, pre_nms, post_nms, thresh):
    mult = np.array([10, 10, 5, 5], np.float32)
    rois = ref.np_decode_rounded(anchors_conv.copy(), deltas / mult)
    # clip (det_util.py:179-192 order)
    rois[:, 2] = np.maximum(rois[:, 0] + 1, rois[:, 2])
    rois[:, 3] = np.maximum(rois[:, 1] + 1, rois[:, 3])
    rois[:, 0] = np.maximum(0, rois[:, 0])
    rois[:, 1] = np.maximum(0, rois[:, 1])
    rois[:, 2] = np.minimum(cols - 1, rois[:, 2])
    rois[:, 3] = np.minimum(rows - 1, rois[:, 3])
    valid = (rois[:, 2] > rois[:, 0]) & (rois[:, 3] > rois[:, 1])
    idxs = np.where(valid)[0]
    order = idxs[np.argsort(-probs[idxs], kind="stable")][:pre_nms]
    keep = ref.np_greedy_nms(rois[order], probs[order], thresh, post_nms)
    return rois[order][keep], probs[order][keep]


def test_generate_proposals_matches_oracle(rng):
    conv_h, conv_w = 8, 12
    dims = compute_anchor_dims((32, 64, 128), ((1, 1), (1, 2)))
    anchors = anchor_ops.anchor_grid_conv_space(conv_h, conv_w, dims, 16)
    n = conv_h * conv_w * len(dims)

    probs = rng.uniform(size=(conv_h, conv_w, len(dims))).astype(np.float32)
    deltas = (rng.standard_normal((conv_h, conv_w, 4 * len(dims))) * 2).astype(np.float32)

    posv = prop_ops.position_validity(conv_h, conv_w, len(dims))
    out = prop_ops.generate_proposals(
        jnp.asarray(probs), jnp.asarray(deltas), jnp.asarray(anchors),
        posv(conv_h, conv_w), conv_h, conv_w,
        pre_nms=n, post_nms=40, iou_thresh=0.7, nms_tile=128,
    )
    got_boxes = np.asarray(out.boxes)[np.asarray(out.valid)]
    got_scores = np.asarray(out.scores)[np.asarray(out.valid)]

    want_boxes, want_scores = oracle_proposals(
        probs.reshape(-1), deltas.reshape(-1, 4), anchors, conv_h, conv_w,
        pre_nms=n, post_nms=40, thresh=0.7,
    )
    assert len(got_boxes) == len(want_boxes)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)
    np.testing.assert_allclose(got_boxes, want_boxes, atol=1.0)  # fp32 round edge
    # strict equality for the overwhelming majority (rounding ties only)
    assert (np.abs(got_boxes - want_boxes) < 1e-3).mean() > 0.99


def test_position_validity_masks_padding():
    posv = prop_ops.position_validity(6, 8, 3)
    m = np.asarray(posv(4, 5)).reshape(6, 8, 3)
    assert m[:4, :5].all()
    assert not m[4:].any() and not m[:, 5:].any()
