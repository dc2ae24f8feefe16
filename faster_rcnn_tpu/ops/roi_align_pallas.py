"""Pallas TPU kernel for RoI align (crop + TF1-bilinear resize) on the MXU.

TPU-native replacement for the reference's ``RoiResizeConv`` Keras layer
(custom_layers.py:35-56).  The XLA alternatives in ops/roi_align.py both pay
heavy HBM traffic at detection shapes (R=300, 38x94x1024 feature map):

  * ``gather``: 4 tap gathers materialize 4x (R, P, P, C) buffers in HBM;
  * ``einsum``: the separable contraction writes + re-reads a (R, P, H, C)
    intermediate — ~0.65 GB per KITTI image in fp32.

This kernel never leaves VMEM between the taps and the pooled output.  The
bilinear resize is recast as ONE dense matmul per ROI tile against the
VMEM-resident feature map:

    out[q, c] = sum_{y,x} W2[q, (y,x)] * F[(y,x), c],   q = i*P + j
    W2[q, (y,x)] = Wy[i, y] * Wx[j, x]

where Wy/Wx are the exact TF1 tap-weight rows (ops/roi_align.py
``_tap_weights`` — the same code path as the einsum impl, so tap semantics are
identical by construction).  W2 is built on the MXU too, by expanding Wy / Wx
onto the (H*W) axis with constant one-hot expansion matrices:

    E1 = Wy_rep @ ExpandY        ExpandY[y, (y',x)] = [y == y']
    E2 = Wx_rep @ ExpandX        ExpandX[x, (y,x')] = [x == x']
    W2 = E1 * E2                 (VPU elementwise)

Per 8-ROI tile that is three MXU matmuls and one elementwise multiply; HBM
traffic is the feature map ONCE (constant-index block, DMA'd a single time
across all grid steps), the small tap-weight rows, and the output itself.
The (H*W) axis is processed in <=1024-column chunks so the W2 intermediates
stay within VMEM at KITTI scale (bf16 features: ~14 MB peak).

The op is linear in the feature map, so the custom VJP computes the backward
pass by transposing the XLA einsum implementation — no residuals needed
beyond the ROIs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from faster_rcnn_tpu.ops.roi_align import _tap_weights, roi_align_einsum

_TILE_ROIS = 8        # ROIs per grid step; M = 8*49 = 392 (must keep T*49 % 8 == 0)
_K_CHUNK = 512        # max HW-axis chunk: bounds VMEM; measured best vs 1024/1792


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _chunks(total: int):
    """Split [0, total) into <=_K_CHUNK slices, each a multiple of 128."""
    assert total % 128 == 0
    out, lo = [], 0
    while lo < total:
        size = min(_K_CHUNK, total - lo)
        out.append((lo, size))
        lo += size
    return tuple(out)


def _kernel(ranges_ref, wy_ref, wx_ref, ey_ref, ex_ref, f2_ref, out_ref,
            acc_ref, *, chunks):
    """One grid step = one tile of _TILE_ROIS ROIs.

    ranges_ref: scalar-prefetch (n_tiles*2,) int32 — this tile's inclusive
      [first, last] chunk indices covering the (y,x) support of all its ROIs
      (ROIs are pre-sorted by y1 so tiles are spatially coherent and the
      range is tight; W2 is provably zero outside it).
    wy_ref: (TQ, Hp)  per-(roi, out-cell) row tap weights for this tile
    wx_ref: (TQ, Wp)  per-(roi, out-cell) column tap weights
    ey_ref: (Hp, HWp) constant one-hot row expansion
    ex_ref: (Wp, HWp) constant one-hot column expansion
    f2_ref: (HWp, C)  flattened feature map, VMEM-resident across all steps
    out_ref: (TQ, C)  pooled output rows for this tile
    acc_ref: (TQ, C)  f32 scratch accumulator (needed because chunk work is
      predicated — a plain value chain can't thread through pl.when)
    """
    i = pl.program_id(0)
    c_lo = ranges_ref[2 * i]
    c_hi = ranges_ref[2 * i + 1]
    wy = wy_ref[:]
    wx = wx_ref[:]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for k, (lo, size) in enumerate(chunks):
        @pl.when((k >= c_lo) & (k <= c_hi))
        def _(lo=lo, size=size):
            e1 = jnp.dot(wy, ey_ref[:, lo:lo + size],
                         preferred_element_type=jnp.float32)
            e2 = jnp.dot(wx, ex_ref[:, lo:lo + size],
                         preferred_element_type=jnp.float32)
            w2 = (e1 * e2).astype(f2_ref.dtype)
            acc_ref[:] += jnp.dot(w2, f2_ref[lo:lo + size, :],
                                  preferred_element_type=jnp.float32)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _forward(features, rois, pool_size, interpret):
    h, w, c = features.shape
    r = rois.shape[0]
    p = pool_size
    q = p * p
    t = _TILE_ROIS
    dtype = features.dtype

    # Sort ROIs by y1 so each 8-ROI tile is spatially coherent: its chunk
    # support range along the flattened (y, x) axis becomes tight, letting
    # the kernel skip most chunks.  The output is un-sorted afterwards.
    rois = rois.astype(jnp.float32)
    order = jnp.argsort(rois[:, 1])                                # (R,)
    rois = rois[order]

    wy = _tap_weights(rois[:, 1], rois[:, 3] - rois[:, 1], h, p)   # (R, P, H)
    wx = _tap_weights(rois[:, 0], rois[:, 2] - rois[:, 0], w, p)   # (R, P, W)
    # (R, Q, *): row weights vary with the output row i -> repeat over j;
    # column weights vary with j -> tile over i
    wy_rep = jnp.repeat(wy, p, axis=1)                             # (R, Q, H)
    wx_rep = jnp.tile(wx, (1, p, 1))                               # (R, Q, W)

    hp = _round_up(h, 16)
    wp = _round_up(w, 16)
    hwp = _round_up(h * w, 128)
    r_pad = _round_up(r, t)

    wy_rep = jnp.pad(wy_rep, ((0, r_pad - r), (0, 0), (0, hp - h))).reshape(r_pad * q, hp)
    wx_rep = jnp.pad(wx_rep, ((0, r_pad - r), (0, 0), (0, wp - w))).reshape(r_pad * q, wp)

    # one-hot expansions onto the flattened (y, x) axis
    ey = jnp.repeat(jnp.eye(h, dtype=jnp.float32), w, axis=1)      # (H, H*W)
    ex = jnp.tile(jnp.eye(w, dtype=jnp.float32), (1, h))           # (W, H*W)
    ey = jnp.pad(ey, ((0, hp - h), (0, hwp - h * w)))
    ex = jnp.pad(ex, ((0, wp - w), (0, hwp - h * w)))

    f2 = jnp.pad(features.reshape(h * w, c), ((0, hwp - h * w), (0, 0)))

    # MXU inputs in the feature dtype (bf16 in production); accumulation fp32
    wy_rep = wy_rep.astype(dtype)
    wx_rep = wx_rep.astype(dtype)
    ey = ey.astype(dtype)
    ex = ex.astype(dtype)

    # Per-tile chunk support range (inclusive) along the flattened (y, x)
    # axis.  A ROI's taps live in rows [y1, y2) of the feature map, i.e.
    # flat indices [y1*w, y2*w).  Padded slots use (h, 0) so they never
    # widen a real tile's range; an all-padded tile gets first > last and
    # the kernel's predicates simply never fire.
    n_tiles = r_pad // t
    chunks = _chunks(hwp)
    y1_pad = jnp.concatenate([rois[:, 1], jnp.full((r_pad - r,), h, jnp.float32)])
    y2_pad = jnp.concatenate([rois[:, 3], jnp.zeros((r_pad - r,), jnp.float32)])
    y1_min = jnp.min(y1_pad.reshape(n_tiles, t), axis=1)
    y2_max = jnp.max(y2_pad.reshape(n_tiles, t), axis=1)
    first = jnp.clip((y1_min * w) // _K_CHUNK, 0, len(chunks) - 1)
    last = jnp.clip((y2_max * w - 1) // _K_CHUNK, 0, len(chunks) - 1)
    ranges = jnp.stack([first, last], axis=1).astype(jnp.int32).reshape(-1)

    tq = t * q
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tq, hp), lambda i, rs: (i, 0)),
            pl.BlockSpec((tq, wp), lambda i, rs: (i, 0)),
            # constant blocks: DMA'd once, reused across every grid step
            pl.BlockSpec((hp, hwp), lambda i, rs: (0, 0)),
            pl.BlockSpec((wp, hwp), lambda i, rs: (0, 0)),
            pl.BlockSpec((hwp, c), lambda i, rs: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tq, c), lambda i, rs: (i, 0)),
        scratch_shapes=[pltpu.VMEM((tq, c), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, chunks=chunks),
        out_shape=jax.ShapeDtypeStruct((r_pad * q, c), dtype),
        grid_spec=grid_spec,
        # Under vmap (batched images) the feature-map block index varies with
        # the batch grid dim, so Mosaic double-buffers it — 2x 7.3 MB at KITTI
        # scale overflows the default 16 MB scoped-vmem budget.  v5e has far
        # more physical VMEM; raise the cap for this kernel.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(ranges, wy_rep, wx_rep, ey, ex, f2)
    # un-sort back to the caller's ROI order
    inv = jnp.argsort(order)
    return out[: r * q].reshape(r, p, p, c)[inv]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def roi_align_pallas(features, rois, pool_size: int = 7, interpret: bool = False):
    """(H, W, C) x (R, 4) -> (R, P, P, C), Pallas TPU MXU kernel.

    Tap semantics identical to ops/roi_align.py (shared ``_tap_weights``);
    matmul inputs run in the feature dtype (bf16 in production) with fp32
    accumulation.  ``interpret=True`` runs the Pallas interpreter (CPU tests).
    ROIs must satisfy the proposal-clip invariants (x2 >= x1+1 etc.,
    det_util.py:179-192 semantics).
    """
    return _forward(features, rois, pool_size, interpret)


def _fwd(features, rois, pool_size, interpret):
    # zeros_like carries shape/dtype into the bwd rule as a legal JAX residual
    # (XLA folds it to a broadcast, no real memory cost)
    return _forward(features, rois, pool_size, interpret), (rois, jnp.zeros_like(features))


def _bwd(pool_size, interpret, residuals, g):
    rois, zeros = residuals
    # linear in `features`: the VJP is the transpose of the einsum
    # implementation's linear map, obtained from XLA autodiff at zero.
    _, vjp = jax.vjp(lambda f: roi_align_einsum(f, rois, pool_size), zeros)
    (dfeat,) = vjp(g)
    return dfeat, None


roi_align_pallas.defvjp(_fwd, _bwd)
