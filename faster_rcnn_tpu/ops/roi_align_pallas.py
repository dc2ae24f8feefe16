"""Pallas TPU kernel for RoI align (crop + TF1-bilinear resize).

The XLA implementation (ops/roi_align.py) lowers to 4 large gathers that
materialize 4 x (R, P, P, C) tap buffers in HBM before the lerp — ~240 MB of
HBM traffic per KITTI-sized image.  This kernel keeps the whole feature map
resident in VMEM (bf16 KITTI map: 38x94x1024x2B = 7.3 MB) and computes each
ROI's 7x7 bilinear samples with VMEM-local row reads, writing only the
(R, P*P, C) result — an order of magnitude less memory traffic and zero
intermediate buffers.

Semantics identical to ops/roi_align.py / the reference RoiResizeConv
(custom_layers.py:35-56): integer ROI corners, half-open crop, TF1 bilinear
grid (src = out_idx * crop/P, taps floor / min(floor+1, crop-1)).

The op is linear in the feature map, so the custom VJP computes the backward
pass by transposing the XLA reference implementation — no residuals needed
beyond the ROIs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from faster_rcnn_tpu.ops.roi_align import roi_align as roi_align_xla


_ALIGN = 16  # sublane alignment unit covering both f32 (8) and bf16 (16) tiling


def _kernel(rois_ref, feat_ref, out_ref, *, pool: int, width: int):
    """One grid step = one ROI.

    rois_ref: scalar-prefetch (R*4,) int32 [x1, y1, x2, y2] per ROI.
    feat_ref: (rows_padded, C) feature rows, VMEM-resident across grid steps
      (rows padded to a multiple of _ALIGN plus one spare block).
    out_ref: (1, P*P, C) this ROI's output block.

    Mosaic cannot issue a vector load at an arbitrary (runtime) sublane
    offset, so each tap loads the ALIGN-row block containing the target row
    (provably aligned via pl.multiple_of) and selects the row with an iota
    mask + cross-sublane sum — all VPU work on VMEM-resident data.
    """
    r = pl.program_id(0)
    x1 = rois_ref[4 * r]
    y1 = rois_ref[4 * r + 1]
    x2 = rois_ref[4 * r + 2]
    y2 = rois_ref[4 * r + 3]
    w = x2 - x1
    h = y2 - y1
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    def tap(row_idx):
        base = pl.multiple_of((row_idx // _ALIGN) * _ALIGN, _ALIGN)
        block = feat_ref[pl.ds(base, _ALIGN), :].astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (_ALIGN, 1), 0) + base
        sel = (rows == row_idx).astype(jnp.float32)
        return jnp.sum(block * sel, axis=0)  # (C,)

    for i in range(pool):
        sy = i * hf / pool
        y0 = jnp.floor(sy)
        fy = sy - y0
        y0i = y0.astype(jnp.int32)
        ya = y1 + y0i
        yb = y1 + jnp.minimum(y0i + 1, h - 1)
        for j in range(pool):
            sx = j * wf / pool
            x0 = jnp.floor(sx)
            fx = sx - x0
            x0i = x0.astype(jnp.int32)
            xa = x1 + x0i
            xb = x1 + jnp.minimum(x0i + 1, w - 1)

            f00 = tap(ya * width + xa)
            f01 = tap(ya * width + xb)
            f10 = tap(yb * width + xa)
            f11 = tap(yb * width + xb)

            top = f00 + (f01 - f00) * fx
            bot = f10 + (f11 - f10) * fx
            val = top + (bot - top) * fy
            out_ref[0, i * pool + j, :] = val.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def roi_align_pallas(features, rois, pool_size: int = 7, interpret: bool = False):
    """(H, W, C) x (R, 4) -> (R, P, P, C), Pallas TPU kernel.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests).  ROIs must satisfy the proposal clip invariants (x2 >= x1+1 etc.,
    det_util.py:179-192 semantics).
    """
    return _forward(features, rois, pool_size, interpret)


def _forward(features, rois, pool_size, interpret):
    h, w, c = features.shape
    r = rois.shape[0]
    rois_flat = rois.astype(jnp.int32).reshape(r * 4)
    feat2d = features.reshape(h * w, c)
    # pad rows so every ALIGN-row tap block is in bounds
    from faster_rcnn_tpu.ops.roi_align_pallas import _ALIGN  # self, for clarity

    rows_padded = ((h * w + _ALIGN - 1) // _ALIGN + 1) * _ALIGN
    feat2d = jnp.pad(feat2d, ((0, rows_padded - h * w), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            # whole feature map as one VMEM-resident block (constant index map
            # means it is DMA'd once and reused across all R grid steps)
            pl.BlockSpec((rows_padded, c), lambda i, rois_s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pool_size * pool_size, c), lambda i, rois_s: (i, 0, 0)),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, pool=pool_size, width=w),
        out_shape=jax.ShapeDtypeStruct((r, pool_size * pool_size, c), features.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rois_flat, feat2d)
    return out.reshape(r, pool_size, pool_size, c)


def _fwd(features, rois, pool_size, interpret):
    # zeros_like carries shape/dtype into the bwd rule as a legal JAX residual
    # (XLA folds it to a broadcast, no real memory cost)
    return _forward(features, rois, pool_size, interpret), (rois, jnp.zeros_like(features))


def _bwd(pool_size, interpret, residuals, g):
    rois, zeros = residuals
    # roi_align is linear in `features`: its VJP is the transpose of the
    # gather+lerp map, which we get from the XLA implementation's autodiff
    # evaluated at zero.
    _, vjp = jax.vjp(lambda f: roi_align_xla(f, rois, pool_size), zeros)
    (dfeat,) = vjp(g)
    return dfeat, None


roi_align_pallas.defvjp(_fwd, _bwd)
