"""On-device minibatch samplers.

The reference samples anchors/ROIs on the host with ``random.sample`` /
``np.random.choice`` (rpn_util.py:324-350, det_util.py:260-306).  Those are
dynamic-size operations; here they become fixed-shape rank-based selections:
give every candidate a uniform random priority, rank candidates by priority
with one argsort, and keep the first ``k`` ranks — a without-replacement sample
of size ``k`` from a masked set, entirely inside the jitted program.

Distribution-level parity, not bitwise parity: the reference's RNG stream
cannot (and should not) be reproduced on TPU.  SURVEY.md §7 "hard parts" (c)
sanctions mAP-level equivalence for the samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def _ranks(priority: jax.Array) -> jax.Array:
    """rank[i] = position of element i when sorted by descending priority."""
    order = jnp.argsort(-priority)
    n = priority.shape[0]
    ranks = jnp.zeros((n,), jnp.int32)
    return ranks.at[order].set(jnp.arange(n, dtype=jnp.int32))


def random_subset_mask(key: jax.Array, mask: jax.Array, k, max_k: int = None) -> jax.Array:
    """Uniformly keep at most ``k`` True entries of ``mask`` (k may be traced).

    ``max_k``: static upper bound on k.  When given (and smaller than the
    candidate count) the selection runs as ``lax.top_k(priority, max_k)``
    plus a scatter — O(N log max_k) instead of the full O(N log N) argsort,
    which matters at RPN scale (68k anchors, max_k 128/256).  Identical
    selection to the rank path: both keep exactly the top-k priorities, and
    uniform(0,1) priorities are distinct w.p. 1."""
    pri = jnp.where(mask, jax.random.uniform(key, mask.shape), NEG_INF)
    if max_k is not None and max_k < mask.shape[0]:
        vals, idx = jax.lax.top_k(pri, max_k)
        keep_slot = (jnp.arange(max_k) < k) & (vals > NEG_INF / 2)
        return jnp.zeros(mask.shape, bool).at[idx].set(keep_slot, mode="drop")
    return mask & (_ranks(pri) < k)


def subsample_rpn_anchors(
    key: jax.Array,
    is_pos: jax.Array,
    can_use: jax.Array,
    sample_size: int = 256,
    max_pos: int = 128,
) -> jax.Array:
    """Reference rpn_util.py:324-350 (_apply_sampling): cap positives at
    ``max_pos``, then cap negatives so pos + neg <= ``sample_size``.

    Returns the sampled ``can_use`` mask.
    """
    kp, kn = jax.random.split(key)
    pos_mask = is_pos & can_use
    neg_mask = (~is_pos) & can_use

    kept_pos = random_subset_mask(kp, pos_mask, max_pos, max_k=max_pos)
    num_pos = jnp.sum(kept_pos)
    kept_neg = random_subset_mask(kn, neg_mask, sample_size - num_pos,
                                  max_k=sample_size)
    return kept_pos | kept_neg


def sample_det_rois(
    key: jax.Array,
    eligible: jax.Array,
    is_pos: jax.Array,
    num_rois: int = 64,
    pos_fraction: float = 0.25,
) -> tuple[jax.Array, jax.Array]:
    """Fast R-CNN ROI minibatch sampling, reference det_util.py:260-306.

    Rules reproduced:
      * up to ``num_rois * pos_fraction`` positives, all of them if fewer;
      * remainder filled with negatives, *with replacement* when there are not
        enough distinct negatives (det_util.py:293);
      * if there are no negatives at all, positives are tiled into the negative
        slots (det_util.py:297-299 quirk, kept for parity);
      * caller must handle the no-eligible-ROI case (reference skips the whole
        iteration, train_util.py:112-114) — we return ``any_valid=False``.

    Args:
      key: PRNG key.
      eligible: (K,) bool, ROI passed the >= 0.1 IoU filter and is real.
      is_pos: (K,) bool, ROI IoU >= 0.5 (only meaningful where eligible).

    Returns:
      (indices (num_rois,) int32 into the K-sized ROI array, any_valid bool).
    """
    k = eligible.shape[0]
    desired_pos = int(num_rois * pos_fraction)
    kp, kn, kr = jax.random.split(key, 3)

    pos_mask = eligible & is_pos
    neg_mask = eligible & (~is_pos)
    n_pos = jnp.sum(pos_mask)
    n_neg = jnp.sum(neg_mask)

    pos_rank = _ranks(jnp.where(pos_mask, jax.random.uniform(kp, (k,)), NEG_INF))
    neg_rank = jnp.where(neg_mask, jax.random.uniform(kn, (k,)), NEG_INF)
    neg_rank = _ranks(neg_rank)

    # pool_pos[j] = index of the positive with rank j (garbage past n_pos)
    pool_pos = jnp.zeros((k,), jnp.int32).at[pos_rank].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop"
    )
    pool_neg = jnp.zeros((k,), jnp.int32).at[neg_rank].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop"
    )

    take_pos = jnp.minimum(n_pos, desired_pos)
    desired_neg = num_rois - take_pos

    slots = jnp.arange(num_rois, dtype=jnp.int32)
    is_pos_slot = slots < take_pos
    neg_slot = slots - take_pos  # 0..desired_neg-1 for negative slots

    # Without replacement when n_neg >= desired_neg: pool order IS a uniform
    # permutation, so the first desired_neg entries are a uniform subset.
    # With replacement when 0 < n_neg < desired_neg: uniform random draws.
    rand_draw = jax.random.randint(kr, (num_rois,), 0, jnp.maximum(n_neg, 1))
    neg_choice = jnp.where(n_neg >= desired_neg, neg_slot, rand_draw)
    safe_mod_neg = jnp.maximum(n_neg, 1)
    neg_idx = pool_neg[neg_choice % safe_mod_neg]

    # No negatives at all: tile positives into negative slots.
    safe_mod_pos = jnp.maximum(n_pos, 1)
    tiled_pos = pool_pos[neg_slot % safe_mod_pos]
    neg_idx = jnp.where(n_neg > 0, neg_idx, tiled_pos)

    pos_idx = pool_pos[slots % safe_mod_pos]
    indices = jnp.where(is_pos_slot, pos_idx, neg_idx)
    any_valid = (n_pos + n_neg) > 0
    return indices, any_valid
