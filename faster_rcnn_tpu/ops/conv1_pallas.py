"""Pallas TPU kernel for the ResNet stem conv (7x7, stride 2, C_in=3).

The stem conv is the one convolution XLA cannot map well to the MXU: with
3 input channels the contraction depth is 147 taps but XLA's conv lowering
pads the channel dimension to the lane width, so the op runs at ~1% MXU
utilization — 6.9 ms of a 90 ms train step at B=16 608x1024 (NOTES.md r3).
XLA-level reformulations were measured and do not help (space-to-depth
9.9 ms, bf16 input 6.8 ms, 49-slice im2col 147 ms — NOTES.md r3): the fix
has to build the patch matrix in VMEM and feed the MXU directly.

The kernel recasts the 7x7/s2 conv as four dense matmuls per output row
over a phase-split input (reference stem: resnet.py:96-99 / vgg-style
Conv2D(64, (7,7), strides=(2,2)) in the upstream model zoo):

  1. Outside the kernel (one fused XLA transpose) the padded image is split
     by row parity, column parity, and channel into 12 half-resolution
     planes, and the 4 row-shifts delta = dy//2 are stacked:

       Q[b, y, (rp, p, c, delta), j] = xpad[b, 2(y+delta)+rp, 2j+p, c]

     so every input value a 7x7/s2 window touches is addressable by
     (plane, output row, lane).
  2. In the kernel, output row y is

       out[m, x] = sum_o A_o[m, x+o],   A_o = W2[o] @ Q[b, y]   (MXU)

     where W2[o][m, (rp,p,c,delta)] = w[2*delta+rp, 2*o+p, c, m] is the
     repacked 7x7 kernel (o = dx//2).  The +o lane shift commutes with the
     contraction, so it is applied AFTER the matmul as one ``pltpu.roll``
     of the (64, lanes) product — four rolls per row instead of 147
     per-tap shifts.  K = 48, M = 64, N = lanes: dense MXU work at the
     conv's true arithmetic depth (no channel padding).

Padding taps dy=7 / dx=7 (the 7x7 -> 8x8 round-up) carry zero weights, so
the result is exactly the SAME-padded stride-2 convolution.  The op is
linear in (x, w); the custom VJP replays the XLA convolution's transpose
(the stem is frozen in every production schedule, so the backward path is
cold anyway).

Exactness: identical tap arithmetic to ``lax.conv_general_dilated`` up to
f32 summation order (bf16 inputs, f32 accumulation on the MXU — same
contract as the XLA conv).  tests/test_pallas.py pins both dtypes in
interpreter mode; the TPU path max-rel-err vs XLA is 2.5e-3 (bf16).

MEASURED RESULTS (v5e, B=16 608x1024 bf16, chained — scripts/bench_conv1.py):
the v1 kernel above LOSES to XLA (12.0 ms vs 5.9 ms/iter) — the XLA-side
phase-plane transpose and the per-row M=64/K=48 matmuls (<20% MXU tile
occupancy) cost more than the channel padding they remove.  **The v2
kernel below (`_conv1_pallas_v2_impl`: selection-einsum phase split, one
K=192 MXU dot per output row) WINS: 4.02 ms vs XLA 5.82 ms**, and is the
production default (`config.conv1_impl = 'pallas_v2'`, config.py); v1 is
kept as the tested stepping-stone implementation.  History and per-variant
timings: NOTES.md r3 (v1) and r4 (v2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def conv1_xla(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Reference formulation: exactly what ``nn.Conv`` emits for the stem."""
    return lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _phase_planes(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> Q (B, H/2, 4C*4, NL) phase/shift-split planes.

    Q[b, y, ((rp*2+p)*C+c)*4+delta, j] = xpad[b, 2(y+delta)+rp, 2j+p, c]
    with xpad = x padded by (2, 4) rows/cols (the SAME window for 7x7/s2
    needs input rows 2y-2 .. 2y+4; the extra +1 row/col of zeros covers the
    zero-weight dy=7/dx=7 taps of the 8x8 round-up).
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "stem canvas dims must be even"
    xp = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (0, 0)))
    hp, wp = h + 6, w + 6  # both even
    nl = _round_up(wp // 2, 128)
    p = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
    p = p.transpose(0, 2, 4, 5, 1, 3)          # (b, rp, p, c, hp/2, wp/2)
    p = p.reshape(b, 4 * c, hp // 2, wp // 2)
    p = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (0, nl - wp // 2)))
    ys = h // 2
    # stack the 4 row shifts: y+delta <= ys-1+3 = hp//2 - 1 (exact fit)
    q = jnp.stack([p[:, :, d:d + ys, :] for d in range(4)], axis=2)
    return q.transpose(0, 3, 1, 2, 4).reshape(b, ys, 16 * c, nl)


def _pack_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, C, 64) -> W2 (4, 64, 16C): W2[o, m, ((rp*2+p)*C+c)*4+delta]
    = w[2*delta+rp, 2*o+p, c, m] (zero at the padded dy=7/dx=7 taps)."""
    c, m = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))      # (8, 8, C, 64)
    wp = wp.reshape(4, 2, 4, 2, c, m)                       # (delta, rp, o, p, c, m)
    wp = wp.transpose(2, 5, 1, 3, 4, 0)                     # (o, m, rp, p, c, delta)
    return wp.reshape(4, m, 16 * c)


def _kernel(q_ref, w_ref, o_ref, *, rows: int, w_out: int):
    nl = q_ref.shape[-1]
    for r in range(rows):
        v = q_ref[0, r]                                    # (48, NL)
        acc = jnp.zeros((w_ref.shape[1], nl), jnp.float32)
        for o in range(4):
            a = jnp.dot(w_ref[o], v, preferred_element_type=jnp.float32)
            # res[x] = a[x + o]: pltpu.roll needs non-negative shifts;
            # shift nl-o is the cyclic equivalent of -o (no-op for o=0).
            acc = acc + (pltpu.roll(a, nl - o, 1) if o else a)
        # (64, NL) -> (NL, 64), keep the w_out valid sublanes
        o_ref[0, r] = acc.T[:w_out].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv1_pallas_impl(x, w, interpret=False):
    b, h, width, c = x.shape
    m = w.shape[-1]
    dt = x.dtype
    q = _phase_planes(x)
    w2 = _pack_weights(w.astype(dt))
    ys, k, nl = q.shape[1], q.shape[2], q.shape[3]
    w_out = width // 2
    rows = next(r for r in (16, 8, 4, 2, 1) if ys % r == 0)
    grid = (b, ys // rows)
    return pl.pallas_call(
        functools.partial(_kernel, rows=rows, w_out=w_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, k, nl), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((4, m, k), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, w_out, m), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ys, w_out, m), dt),
        interpret=interpret,
    )(q, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1_pallas(x, w, interpret=False):
    """7x7/s2 SAME stem conv on the MXU; drop-in for ``conv1_xla``.

    x: (B, H, W, C) with H, W even (the 32-multiple canvas guarantees it);
    w: (7, 7, C, 64).  Output (B, H/2, W/2, 64) in x.dtype.
    """
    return _conv1_pallas_impl(x, w, interpret)


def _fwd(x, w, interpret=False):
    return conv1_pallas(x, w, interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(conv1_xla, x, w)
    return vjp(g)


conv1_pallas.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# v2: selection-matrix phase split (MXU einsum, no strided XLA transpose) +
# one K=192 matmul per output row built in-kernel from contiguous row reads.
#
# v1's post-mortem (NOTES.md r3): the XLA-side phase-plane transpose costs
# ~4 ms (lane-granular stride-2 gather) and the per-row K=48 dots occupy
# <20% of an MXU tile.  v2 fixes both:
#   * the even/odd column split is a 0/1 SELECTION MATMUL
#     P[b,c,p,h,j] = sum_w xpad[b,h,w,c] * S[w,p,j], S[w,p,j] = [w == 2j+p]
#     — the MXU does the "transpose" at matmul speed, and multiplying by
#     1.0 in bf16 is exact;
#   * the kernel reads CONTIGUOUS 8-row blocks per output row (the 7x7/s2
#     window rows 2y..2y+7 of each plane, no stride), stacks the four
#     column shifts o = dx//2 along K via three lane-rolls of the (48, NL)
#     patch block, and issues ONE (64x192)@(192xNL) dot — K util 75%
#     (192/256 on two MXU passes) vs v1's 37.5%, and 4x fewer dispatches.
# Contamination from the cyclic rolls lands in lanes >= NL-3, all of which
# are dead padding (w_out <= NL-125).
# --------------------------------------------------------------------------


def _phase_planes_v2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> P (B, 2C, Hp, NL) with
    P[b, c*2+p, i, j] = xpad[b, i, 2j+p, c] via a selection einsum."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (0, 0)))
    hp, wp = h + 6, w + 6
    nj = (wp + 1) // 2
    nl = _round_up(nj, 128)
    wi = jnp.arange(wp)[:, None, None]
    pi = jnp.arange(2)[None, :, None]
    ji = jnp.arange(nl)[None, None, :]
    sel = ((wi == 2 * ji + pi) & (ji < nj)).astype(x.dtype)
    p = jnp.einsum("bhwc,wpj->bcphj", xp, sel)
    return p.reshape(b, 2 * c, hp, nl)


def _pack_weights_v2(w: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, C, 64) -> W2m (64, 48C/3*4? = 64C... ) with
    W2m[m, 48*o + (c*2+p)*8 + dy] = w[dy, 2*o+p, c, m] (zero pad taps)."""
    c, m = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))   # (8, 8, C, M)
    wp = wp.reshape(8, 4, 2, c, m)                       # (dy, o, p, c, m)
    wp = wp.transpose(4, 1, 3, 2, 0)                     # (m, o, c, p, dy)
    return wp.reshape(m, 4 * c * 16)


def _kernel_v2(a_ref, b_ref, w_ref, o_ref, *, rows: int, w_out: int, n_cp: int):
    """Block j = ``rows`` output rows.  a_ref/b_ref are the SAME plane array
    with j / j+1 index maps: together they hold input rows
    [2*rows*j, 2*rows*j + 4*rows) — every slice below is static, so Mosaic
    gets aligned vector loads and Pallas double-buffers the streams."""
    nl = a_ref.shape[-1]
    per_cp = [
        jnp.concatenate([a_ref[0, cp], b_ref[0, cp]], axis=0)  # (4*rows, nl)
        for cp in range(n_cp)
    ]
    for r in range(rows):
        q0 = jnp.concatenate(
            [pc[2 * r:2 * r + 8] for pc in per_cp], axis=0
        )                                                  # (8*n_cp, nl)
        # static left-shift by o lanes via slice+concat (Mosaic's rotate op
        # rejects 16-bit data; the wrapped tail lands in dead padding lanes,
        # w_out <= nl-125, exactly like the cyclic roll it replaces)
        qp = jnp.concatenate(
            [q0] + [jnp.concatenate([q0[:, o:], q0[:, :o]], axis=1)
                    for o in (1, 2, 3)], axis=0
        )                                                  # (32*n_cp, nl)
        acc = jnp.dot(w_ref[...], qp, preferred_element_type=jnp.float32)
        o_ref[0, r] = acc.T[:w_out].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv1_pallas_v2_impl(x, w, interpret=False):
    b, h, width, c = x.shape
    m = w.shape[-1]
    dt = x.dtype
    p = _phase_planes_v2(x)
    w2 = _pack_weights_v2(w.astype(dt))
    n_cp, hp, nl = p.shape[1], p.shape[2], p.shape[3]
    ys, w_out = h // 2, width // 2
    rows = next(r for r in (8, 4, 2, 1) if ys % r == 0)
    n_blocks = ys // rows
    blk = 2 * rows  # input rows consumed per output block
    # pad the row dim to a whole number of blocks covering index j+1 for the
    # last j (see _kernel_v2); rounding up keeps every block fully in bounds
    rows_pad = max(hp, (n_blocks + 1) * blk)
    rows_pad = (rows_pad + blk - 1) // blk * blk
    p = jnp.pad(p, ((0, 0), (0, 0), (0, rows_pad - hp), (0, 0)))
    grid = (b, n_blocks)
    return pl.pallas_call(
        functools.partial(_kernel_v2, rows=rows, w_out=w_out, n_cp=n_cp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_cp, blk, nl), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, n_cp, blk, nl), lambda i, j: (i, 0, j + 1, 0)),
            pl.BlockSpec((m, 64 * c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, w_out, m), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ys, w_out, m), dt),
        interpret=interpret,
    )(p, p, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1_pallas_v2(x, w, interpret=False):
    """v2 stem conv: drop-in for ``conv1_xla`` (see module notes)."""
    return _conv1_pallas_v2_impl(x, w, interpret)


def _fwd_v2(x, w, interpret=False):
    return conv1_pallas_v2(x, w, interpret), (x, w)


conv1_pallas_v2.defvjp(_fwd_v2, _bwd)


def conv1(x, w, impl: str = "xla"):
    """Dispatch: 'pallas'/'pallas_v2' use the MXU kernels on TPU (XLA
    elsewhere — the interpreter is never a sane production default, cf.
    roi_align_batched); 'pallas_interpret'/'pallas_v2_interpret' force the
    interpreter (tests); 'xla' the reference lowering."""
    on_tpu = jax.default_backend() == "tpu"
    even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    if impl == "pallas" and on_tpu and even:
        return conv1_pallas(x, w)
    if impl == "pallas_v2" and on_tpu and even:
        return conv1_pallas_v2(x, w)
    if impl == "pallas_interpret":
        return conv1_pallas(x, w, interpret=True)
    if impl == "pallas_v2_interpret":
        return conv1_pallas_v2(x, w, interpret=True)
    return conv1_xla(x, w)
