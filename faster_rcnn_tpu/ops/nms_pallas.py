"""Pallas TPU kernel for blocked greedy NMS.

Same algorithm as ops/nms.py `_blocked_keep_mask` (score-sorted boxes, one
serial phase per tile: sweep against earlier survivors, then intra-tile
fixpoint), but compiled as ONE Mosaic kernel: the keep mask lives in a VMEM
scratch that persists across the sequential TPU grid, box coordinates stay
VMEM-resident in a lane-major (4, N) layout, and the per-phase sweep is a
(T, N) broadcast entirely on the VPU — no XLA loop machinery, no HLO-pass
pathologies (NOTES.md documents the sort->loop compile blowups this
sidesteps).

Layout notes (Mosaic constraints):
  * coords are passed as a (4, N) array: per-coordinate rows on sublanes,
    boxes on lanes; N must be a multiple of the tile size (the caller pads —
    padding boxes are parked at a far-away corner so IoU vs anything real
    is 0, and the +1 area convention keeps their self-IoU finite).
  * each phase transposes its (4, T) tile to (T, 4) once — small Mosaic
    transposes are cheap — so tile boxes broadcast on sublanes against the
    full lane-major coordinate rows.
  * the early-exit survivor budget is enforced with an SMEM counter +
    ``pl.when`` phase skip (the grid itself is fixed-length).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coords_ref, valid_ref, keep_ref, count_ref, *, tile: int,
            iou_thresh: float, enough: int):
    """One grid step = one tile phase.

    coords_ref: (4, N) f32 [x1; y1; x2; y2] rows, score-sorted columns.
    valid_ref: (1, N) f32 1/0 validity.
    keep_ref: (1, N) f32 output/running keep mask (VMEM, persists via
      input_output aliasing of the grid — written progressively).
    count_ref: (1, 1) SMEM survivor counter.
    """
    i = pl.program_id(0)
    n = coords_ref.shape[1]
    t = tile

    @pl.when(i == 0)
    def _init():
        keep_ref[...] = valid_ref[...]
        count_ref[0, 0] = jnp.int32(0)

    @pl.when((enough <= 0) | (count_ref[0, 0] < enough))
    def _phase():
        off = i * t
        a = coords_ref[:, pl.ds(off, t)]            # (4, T)
        at = jnp.transpose(a)                        # (T, 4)
        ax1 = at[:, 0:1]
        ay1 = at[:, 1:2]
        ax2 = at[:, 2:3]
        ay2 = at[:, 3:4]                             # (T, 1) each
        a_area = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)

        # --- sweep: suppression of tile i by earlier surviving boxes only ---
        # (suppression never flows backward through the score order, so tiles
        # > i need no IoU; per-step working set is a (T, T) block)
        def sweep(j, acc):
            joff = j * t
            x1 = coords_ref[0:1, pl.ds(joff, t)]      # (1, T)
            y1 = coords_ref[1:2, pl.ds(joff, t)]
            x2 = coords_ref[2:3, pl.ds(joff, t)]
            y2 = coords_ref[3:4, pl.ds(joff, t)]
            iw = jnp.maximum(0.0, jnp.minimum(ax2, x2) - jnp.maximum(ax1, x1) + 1.0)
            ih = jnp.maximum(0.0, jnp.minimum(ay2, y2) - jnp.maximum(ay1, y1) + 1.0)
            inter = iw * ih                           # (T, T)
            area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)  # (1, T)
            iou = inter / (a_area + area - inter)
            alive = keep_ref[:, pl.ds(joff, t)] > 0.5  # (1, T)
            return acc + jnp.sum(
                jnp.where(alive & (iou > iou_thresh), 1.0, 0.0), axis=1, keepdims=True
            )

        sup = jax.lax.fori_loop(0, i, sweep, jnp.zeros((t, 1), jnp.float32))
        # keep state as f32 0/1 throughout — Mosaic cannot transpose i1 vectors
        keep_a = jnp.where(
            (jnp.transpose(valid_ref[:, pl.ds(off, t)]) > 0.5) & (sup == 0.0), 1.0, 0.0
        )

        # --- intra-tile greedy fixpoint ---
        bx1 = coords_ref[0:1, pl.ds(off, t)]          # (1, T)
        by1 = coords_ref[1:2, pl.ds(off, t)]
        bx2 = coords_ref[2:3, pl.ds(off, t)]
        by2 = coords_ref[3:4, pl.ds(off, t)]
        iw2 = jnp.maximum(0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1) + 1.0)
        ih2 = jnp.maximum(0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1) + 1.0)
        inter2 = iw2 * ih2                            # (T, T): [row k, col j]
        b_area = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
        iou_tt = inter2 / (a_area + b_area - inter2)
        row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        colt = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        tri_gt = (colt < row) & (iou_tt > iou_thresh)  # j<k suppressor pairs

        keep0 = keep_a                                 # (T, 1) f32 0/1

        def cond(state):
            kp, prev, it = state
            return jnp.any(kp != prev) & (it < t)

        def body(state):
            kp, _, it = state
            # suppressed[k] = any_j tri_gt[k, j] & kp[j]; kp is (T,1) -> lanes
            kp_lanes = jnp.transpose(kp)               # (1, T) f32
            sup_k = jnp.sum(
                jnp.where(tri_gt & (kp_lanes > 0.5), 1.0, 0.0), axis=1, keepdims=True
            )
            return jnp.where((keep0 > 0.5) & (sup_k == 0.0), 1.0, 0.0), kp, it + 1

        keep_a, _, _ = jax.lax.while_loop(
            cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0))
        )

        keep_ref[:, pl.ds(off, t)] = jnp.transpose(keep_a)
        count_ref[0, 0] = count_ref[0, 0] + jnp.sum(keep_a.astype(jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("iou_thresh", "tile", "enough", "interpret")
)
def nms_keep_mask_pallas(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thresh: float,
    tile: int = 256,
    enough: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Keep-mask of exact greedy NMS over score-sorted boxes (Pallas kernel).

    Drop-in equivalent of ops/nms.py nms_sorted_mask_blocked: (N, 4) sorted
    boxes (padding rows must sort last), (N,) bool validity -> (N,) bool keep.
    N must be a multiple of ``tile``.  ``enough`` enables the early-exit
    survivor budget (only the first ``enough`` keeps are then meaningful).
    """
    n = boxes.shape[0]
    if n % tile != 0:
        raise ValueError(f"n={n} must be a multiple of tile={tile}")
    far = jnp.float32(-1e8)
    boxes = jnp.where(valid[:, None], boxes.astype(jnp.float32),
                      jnp.array([far, far, far, far]))
    coords = jnp.transpose(boxes)                      # (4, N)
    validf = valid.astype(jnp.float32)[None, :]        # (1, N)

    keep, _ = pl.pallas_call(
        functools.partial(_kernel, tile=tile, iou_thresh=float(iou_thresh),
                          enough=int(enough)),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((4, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(coords, validf)
    return (keep[0] > 0.5) & valid
