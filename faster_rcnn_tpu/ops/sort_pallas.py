"""Pallas TPU bitonic sort: score-descending top-k (native top_k drop-in).

Covers the proposal pipeline's prescore truncation (top-12000/8000 by
objectness, det_util.py:71-75/153-156).  History: naive per-iteration timing
once blamed XLA's ``lax.top_k`` for ~2 ms/image here, but that number was a
tunnel-RTT measurement artifact — the data-chained re-measurement (NOTES.md
round 2, "the tunnel lies two ways") puts the real cost at **0.124 ms/img
for XLA top_k vs 0.135 ms/img for this kernel** at 64k scores on v5e.  XLA
therefore remains the production default in ops/proposals.py; this kernel is
kept as the tested, bit-identical native drop-in (and as the reference
implementation of a VPU sorting network for future shapes where XLA's sort
does regress).

The kernel sorts the whole padded score vector with a classic bitonic
network laid out on the VPU: scores live as one (N/128, 128) f32 VMEM tile;
a compare-exchange at XOR-distance d is two ``pltpu.roll``s (up/down) plus a
select, on sublanes for d >= 128 and on lanes for d < 128.  The full network
is log2(N)*(log2(N)+1)/2 = 136 stages at N=65536, each a handful of vector
ops over the tile.  The original element index rides along as an int32
payload, with ties broken by ascending index so results are bit-identical to
``jax.lax.top_k`` (which is stable) for any key vector, including the -inf
padding rows.

No gradient: callers (proposal generation) consume it under stop_gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG_INF = jnp.float32(-jnp.inf)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _kernel(keys_ref, idx_ref, out_keys_ref, out_idx_ref, *, n_pad: int):
    rows = n_pad // _LANES
    k = keys_ref[:]
    ix = idx_ref[:]
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)

    def partner(arr, j):
        """arr values at linear-index XOR distance j (j a power of two).

        pltpu.roll requires non-negative shifts; roll by (axis_size - d) is
        the cyclic equivalent of roll by -d.
        """
        if j >= _LANES:
            d = j // _LANES
            up = pltpu.roll(arr, rows - d, 0)   # up[r] = arr[r + d]
            down = pltpu.roll(arr, d, 0)        # down[r] = arr[r - d]
            bit_clear = (rr & d) == 0
        else:
            up = pltpu.roll(arr, _LANES - j, 1)
            down = pltpu.roll(arr, j, 1)
            bit_clear = (ll & j) == 0
        return jnp.where(bit_clear, up, down)

    def block_bit(size):
        """(i & size) != 0 over the linear index i = r*128 + l."""
        if size >= _LANES:
            return (rr & (size // _LANES)) != 0
        return (ll & size) != 0

    size = 2
    while size <= n_pad:
        j = size // 2
        while j >= 1:
            pk = partner(k, j)
            pi = partner(ix, j)
            # 'mine comes first' under the DESCENDING order with ascending
            # index tie-break (== lax.top_k semantics)
            first = (k > pk) | ((k == pk) & (ix < pi))
            lower = ~block_bit(j)            # i is the lower of the pair
            asc_block = block_bit(size)      # this block currently ascends
            # descending block: lower slot takes the 'first' element;
            # ascending block: the reverse
            take_first = lower ^ asc_block
            keep = take_first == first
            k = jnp.where(keep, k, pk)
            ix = jnp.where(keep, ix, pi)
            j //= 2
        size *= 2
    out_keys_ref[:] = k
    out_idx_ref[:] = ix


def sort_descending_pallas(scores: jax.Array, interpret: bool = False):
    """(N,) f32 -> (sorted_scores (N_pad,), original_indices (N_pad,)).

    Descending by score, ties by ascending index (lax.top_k semantics);
    -inf padding sorts to the end.  N is padded to the next power of two
    (minimum 1024 = 8 f32 sublane rows x 128 lanes).
    """
    n = scores.shape[0]
    n_pad = max(_next_pow2(n), 8 * _LANES)
    rows = n_pad // _LANES
    keys = jnp.full((n_pad,), _NEG_INF, jnp.float32).at[:n].set(
        scores.astype(jnp.float32)
    )
    idx = jnp.arange(n_pad, dtype=jnp.int32)

    out_k, out_i = pl.pallas_call(
        functools.partial(_kernel, n_pad=n_pad),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(keys.reshape(rows, _LANES), idx.reshape(rows, _LANES))
    return out_k.reshape(n_pad), out_i.reshape(n_pad)


def topk_sorted_pallas(scores: jax.Array, k: int, interpret: bool = False):
    """Drop-in for ``jax.lax.top_k`` on f32 scores (values, indices).

    Exact and bit-identical to top_k including tie order.  The returned
    indices are always < len(scores): a padding slot (index >= n, key -inf)
    can never outrank a real element — real keys are >= -inf, and on an
    exact -inf tie the ascending-index tie-break puts every real index
    before every padding index.  (A previous revision clamped idx with
    jnp.minimum "just in case", which could only have *introduced*
    duplicate indices; the invariant above makes it dead code.)
    """
    vals, idx = sort_descending_pallas(scores, interpret=interpret)
    return vals[:k], idx[:k]
