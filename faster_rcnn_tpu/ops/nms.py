"""Fixed-shape, on-device non-maximum suppression.

The reference's NMS (det_util.py:209-256) is a host NumPy greedy loop and its
single hottest kernel (int16 casts and 12k truncation exist purely to make it
bearable, det_util.py:70-76).  On TPU it becomes a compiled fixed-shape program
with no host round-trip.

Two implementations, identical greedy semantics:

* :func:`nms_indices` — reference-style sequential greedy under ``lax.fori_loop``;
  O(max_out) serial steps of O(N) vector work.  Exact, simple, good for small
  ``max_out`` (inference: 300).
* :func:`nms_mask_blocked` — the blocked iterative algorithm used by TPU
  detection stacks: boxes are pre-sorted by score, suppression is propagated
  tile-by-tile with (T, T) IoU blocks that map onto the VPU, giving O(N^2/T)
  *vectorized* work and O(N/T) serial steps.  Used for the training proposal
  path (12000 -> 2000) where the sequential loop would dominate step time.

Both use the reference's +1 area convention (det_util.py:230-241) and its
"suppress when overlap > thresh" rule (det_util.py:249).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def _iou_one_vs_many(box: jax.Array, boxes: jax.Array) -> jax.Array:
    """+1-convention IoU of one box vs a set (reference det_util.py:230-247)."""
    x1 = jnp.maximum(box[0], boxes[:, 0])
    y1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[2], boxes[:, 2])
    y2 = jnp.minimum(box[3], boxes[:, 3])
    iw = jnp.maximum(0.0, x2 - x1 + 1.0)
    ih = jnp.maximum(0.0, y2 - y1 + 1.0)
    inter = iw * ih
    a1 = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
    a2 = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    return inter / (a1 + a2 - inter)


def nms_indices(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    max_out: int,
    iou_thresh: float,
) -> tuple[jax.Array, jax.Array]:
    """Sequential greedy NMS.

    Args:
      boxes: (N, 4) float boxes.
      scores: (N,) float scores.
      valid: (N,) bool, False rows are padding and never selected.
      max_out: static output count.
      iou_thresh: suppress candidates with overlap > this vs a selected box.

    Returns:
      (indices (max_out,) int32, out_valid (max_out,) bool).  Selection order is
      score-descending with first-index tie-breaking (the reference's unstable
      np.argsort makes ties platform-defined; we pin them deterministically).
    """
    boxes = boxes.astype(jnp.float32)
    n = boxes.shape[0]
    active0 = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)

    def body(t, state):
        active, idx_out, valid_out = state
        i = jnp.argmax(active)
        any_left = active[i] > NEG_INF / 2
        iou = _iou_one_vs_many(boxes[i], boxes)
        suppress = iou > iou_thresh
        new_active = jnp.where(suppress & any_left, NEG_INF, active)
        new_active = new_active.at[i].set(NEG_INF)
        idx_out = idx_out.at[t].set(jnp.where(any_left, i, 0).astype(jnp.int32))
        valid_out = valid_out.at[t].set(any_left)
        return new_active, idx_out, valid_out

    idx_out = jnp.zeros((max_out,), jnp.int32)
    valid_out = jnp.zeros((max_out,), bool)
    _, idx_out, valid_out = jax.lax.fori_loop(
        0, max_out, body, (active0, idx_out, valid_out)
    )
    del n
    return idx_out, valid_out


def _pairwise_iou_p1(a: jax.Array, b: jax.Array) -> jax.Array:
    """(M, N) +1-convention IoU block."""
    x1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    iw = jnp.maximum(0.0, x2 - x1 + 1.0)
    ih = jnp.maximum(0.0, y2 - y1 + 1.0)
    inter = iw * ih
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def _self_suppress_fixpoint(iou_gt: jax.Array, keep0: jax.Array) -> jax.Array:
    """Greedy keep-mask within one score-sorted tile by chaotic iteration.

    The greedy recurrence ``keep[k] = keep0[k] & ~∃ j<k: keep[j] & iou[j,k]>t``
    has a unique solution over the strict order j<k; iterating it from all-True
    converges to that solution in at most chain-depth steps (the standard TPU
    NMS trick — typically 2-4 iterations, worst case T).

    Args:
      iou_gt: (T, T) bool, iou[j, k] > thresh.
      keep0: (T,) bool, externally-unsuppressed candidates.
    """
    t = keep0.shape[0]
    tri = jnp.tril(iou_gt, k=-1)  # j<k pairs only: tri[k, j] with j<k

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < t)

    def body(state):
        keep, _, it = state
        sup = jnp.any(tri & keep[None, :], axis=1)  # (T,) suppressed by survivor j<k
        return keep0 & ~sup, keep, it + 1

    init = (keep0, jnp.zeros_like(keep0), 0)
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


@functools.partial(jax.jit, static_argnames=("tile", "iou_thresh", "enough"))
def _blocked_keep_mask(boxes, iou_thresh: float, tile: int, enough: int = 0):
    """Keep-mask of exact greedy NMS over *score-sorted* boxes.

    One serial phase per tile (N/T phases): tile i is first suppressed by all
    earlier survivors in a single (N, T) vectorized IoU sweep, then resolved
    internally by fixpoint iteration.  All heavy work is VPU-friendly
    broadcasting; the serial depth is N/T instead of N.

    ``enough > 0`` stops the sweep once that many survivors exist.  This is
    exact for a top-``enough`` consumer: suppression only flows from earlier
    (higher-scored) to later boxes, so the first ``enough`` keeps can never
    change once found — the tail is conservatively reported as kept and must
    be truncated by the caller (nms_topk does).
    """
    n = boxes.shape[0]
    num_tiles = n // tile
    idx = jnp.arange(n)

    def phase_body(state):
        i, keep, kept_count = state
        a = jax.lax.dynamic_slice(boxes, (i * tile, 0), (tile, 4))
        keep_a = jax.lax.dynamic_slice(keep, (i * tile,), (tile,))

        # Suppression from all earlier surviving boxes: (N, T) sweep.
        earlier = keep & (idx < i * tile)
        iou_all = _pairwise_iou_p1(boxes, a)                    # (N, T)
        sup = jnp.any(earlier[:, None] & (iou_all > iou_thresh), axis=0)
        keep_a = keep_a & ~sup

        # Intra-tile greedy via fixpoint.
        iou_aa = _pairwise_iou_p1(a, a) > iou_thresh
        # orient as [k, j]: row k suppressed by col j (j earlier in tile)
        keep_a = _self_suppress_fixpoint(iou_aa.T, keep_a)
        keep = jax.lax.dynamic_update_slice(keep, keep_a, (i * tile,))
        return i + 1, keep, kept_count + jnp.sum(keep_a)

    def phase_cond(state):
        i, _, kept_count = state
        go = i < num_tiles
        if enough > 0:
            go = go & (kept_count < enough)
        return go

    _, keep, _ = jax.lax.while_loop(
        phase_cond, phase_body, (0, jnp.ones((n,), bool), jnp.array(0, jnp.int32))
    )
    return keep


def nms_sorted_mask_blocked(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thresh: float,
    tile: int = 256,
    enough: int = 0,
) -> jax.Array:
    """Keep-mask for boxes that are ALREADY sorted by descending score.

    Invalid (padding) rows must be sorted to the end (they are, since padding
    scores are -inf).  Padding rows are given a far-away degenerate box so they
    never suppress anything, and are masked out of the result.

    ``enough``: early-exit survivor budget (see _blocked_keep_mask) — only
    the first ``enough`` kept entries are meaningful when set.
    """
    n = boxes.shape[0]
    if n % tile != 0:
        raise ValueError(f"n={n} must be a multiple of tile={tile}")
    boxes = boxes.astype(jnp.float32)
    # Send padded rows to isolated corners so their IoU vs anything real is 0.
    far = jnp.float32(-1e8)
    boxes = jnp.where(valid[:, None], boxes, jnp.array([far, far, far, far]))
    keep = _blocked_keep_mask(boxes, float(iou_thresh), tile, enough)
    return keep & valid


def sort_by_score(
    boxes: jax.Array, scores: jax.Array, valid: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Score-descending sort of (boxes, scores, valid) as ONE variadic
    lax.sort.

    Implementation is backend-conditional, chosen by measurement:
      * TPU: ONE variadic lax.sort.  argsort whose index output feeds several
        gathers that feed a lax loop triggers a pathological (minutes-long)
        XLA:TPU compile; the multi-operand sort compiles ~10x faster.
      * CPU: argsort + gathers.  There the variadic sort is the pathological
        one (~10 min compiles) and argsort is instant.
    Invalid rows sink to the end (score -inf) either way.

    Testing caveat: CI runs on CPU, so the blocked-NMS goldens pin only the
    argsort branch; the TPU variadic-sort branch is exercised by the bench
    and by tests/test_nms_tpu_sort.py (same-backend equivalence of the two
    sorts).  On exactly tied scores the two branches may order ties
    differently — production inputs are float32 sigmoid/softmax scores
    where ties are measure-zero but not impossible.
    """
    s = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)
    if jax.default_backend() == "tpu":
        ops = jax.lax.sort(
            (-s, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]), num_keys=1
        )
        scores_s = -ops[0]
        boxes_s = jnp.stack(ops[1:5], axis=1)
    else:
        order = jnp.argsort(-s)
        scores_s = s[order]
        boxes_s = boxes[order]
    return boxes_s, scores_s, scores_s > NEG_INF / 2


def nms_topk_indices(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    max_out: int,
    iou_thresh: float,
    tile: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """Blocked greedy NMS returning ORIGINAL indices in selection order.

    Same contract as :func:`nms_indices` (score-descending selection,
    (indices, out_valid)) but using the blocked kernel — preferable when
    max_out is large enough that the sequential loop's serial depth hurts
    (e.g. the 300-detection final per-class NMS).  The source index rides the
    variadic sort as an extra payload column.
    """
    n = boxes.shape[0]
    s = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)
    src = jnp.arange(n, dtype=jnp.int32)
    if jax.default_backend() == "tpu":
        ops = jax.lax.sort(
            (-s, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], src), num_keys=1
        )
        scores_s = -ops[0]
        boxes_s = jnp.stack(ops[1:5], axis=1)
        src_s = ops[5]
    else:
        order = jnp.argsort(-s)
        scores_s = s[order]
        boxes_s = boxes[order]
        src_s = src[order]
    valid_s = scores_s > NEG_INF / 2

    pad = (-n) % tile
    if pad:
        boxes_s = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        valid_s = jnp.pad(valid_s, (0, pad))
        src_s = jnp.pad(src_s, (0, pad))

    keep = nms_sorted_mask_blocked(boxes_s, valid_s, iou_thresh, tile=tile, enough=max_out)

    m = boxes_s.shape[0]
    rank = jnp.cumsum(keep) - 1
    slot = jnp.where(keep, rank, m - 1)
    perm = jnp.zeros((m,), jnp.int32)
    perm = perm.at[slot].set(jnp.where(keep, jnp.arange(m, dtype=jnp.int32), 0), mode="drop")
    out_valid = jnp.arange(max_out) < jnp.sum(keep)
    idx = jnp.where(out_valid, src_s[perm[:max_out]], 0).astype(jnp.int32)
    return idx, out_valid


def nms_topk(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    max_out: int,
    iou_thresh: float,
    tile: int = 256,
    presorted: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full proposal-style NMS: sort by score, blocked suppression, take the
    first ``max_out`` survivors (score order), return (boxes, scores, valid).

    This is the TPU replacement for the reference's
    ``sort -> truncate -> nms(max_boxes)`` chain at det_util.py:71-77.

    ``presorted=True`` skips the sort — use when the input already comes from
    ``top_k`` (descending scores with -inf padding).
    """
    if boxes.shape[0] < max_out:
        # fewer candidates than requested outputs (tiny images / small
        # canvases): pad with invalid slots so the compaction below can
        # always emit max_out rows
        extra = max_out - boxes.shape[0]
        boxes = jnp.pad(boxes, ((0, extra), (0, 0)))
        scores = jnp.pad(scores, (0, extra), constant_values=NEG_INF)
        valid = jnp.pad(valid, (0, extra))
    n = boxes.shape[0]
    if presorted:
        scores_s = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)
        boxes_s = boxes
        valid_s = scores_s > NEG_INF / 2
    else:
        boxes_s, scores_s, valid_s = sort_by_score(boxes, scores, valid)

    pad = (-n) % tile
    if pad:
        boxes_s = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        scores_s = jnp.pad(scores_s, (0, pad), constant_values=NEG_INF)
        valid_s = jnp.pad(valid_s, (0, pad))

    keep = nms_sorted_mask_blocked(boxes_s, valid_s, iou_thresh, tile=tile, enough=max_out)

    # Stable-compact survivors to the front, preserving score order.
    rank = jnp.cumsum(keep) - 1                      # output slot per survivor
    slot = jnp.where(keep, rank, boxes_s.shape[0] - 1)
    perm = jnp.zeros((boxes_s.shape[0],), jnp.int32)
    src = jnp.arange(boxes_s.shape[0], dtype=jnp.int32)
    # scatter: perm[slot[i]] = i for kept i (later writes only hit the dump slot)
    perm = perm.at[slot].set(jnp.where(keep, src, 0), mode="drop")
    out_idx = perm[:max_out]
    out_valid = jnp.arange(max_out) < jnp.sum(keep)
    out_boxes = jnp.where(out_valid[:, None], boxes_s[out_idx], 0.0)
    out_scores = jnp.where(out_valid, scores_s[out_idx], NEG_INF)
    return out_boxes, out_scores, out_valid
