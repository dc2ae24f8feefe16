"""Equivalence of sort_by_score's two backend-conditional branches.

CI runs on CPU, so the suite's blocked-NMS goldens only ever execute the
argsort branch of ops/nms.sort_by_score; the TPU branch (ONE variadic
lax.sort, chosen for XLA:TPU compile-time pathologies) is otherwise
exercised only by the hardware bench (VERDICT r4 weak #7).  This module
runs BOTH branch bodies on the same backend (CPU) and asserts identical
output on tie-free scores, plus the invariants that must hold even with
ties (same score multiset, same kept-box multiset, valid prefix).

This pins the *logic* of the TPU branch; TPU-hardware numerics of
lax.sort itself are covered by the on-device bench goldens.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from faster_rcnn_tpu.ops.nms import NEG_INF


def _variadic_branch(boxes, scores, valid):
    """The TPU branch body of sort_by_score (ops/nms.py), verbatim logic."""
    s = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)
    ops = jax.lax.sort(
        (-s, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]), num_keys=1
    )
    scores_s = -ops[0]
    boxes_s = jnp.stack(ops[1:5], axis=1)
    return boxes_s, scores_s, scores_s > NEG_INF / 2


def _argsort_branch(boxes, scores, valid):
    """The CPU branch body of sort_by_score, verbatim logic."""
    s = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)
    order = jnp.argsort(-s)
    return boxes[order], s[order], s[order] > NEG_INF / 2


def _cases(rng, n_cases=25, n=300):
    for i in range(n_cases):
        boxes = rng.uniform(0, 500, size=(n, 4)).astype(np.float32)
        # unique scores: branch equality is only well-defined tie-free
        scores = rng.permutation(n).astype(np.float32) / n + 0.001
        valid = rng.rand(n) < rng.uniform(0.3, 1.0)
        yield jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


def test_branches_identical_tie_free():
    va = jax.jit(_variadic_branch)
    ar = jax.jit(_argsort_branch)
    rng = np.random.RandomState(7)
    for boxes, scores, valid in _cases(rng):
        b1, s1, v1 = va(boxes, scores, valid)
        b2, s2, v2 = ar(boxes, scores, valid)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_branch_invariants_with_ties():
    """With tied scores order may legitimately differ between branches, but
    each branch must still emit the same (box, score) multiset with valid
    rows as a descending-score prefix."""
    rng = np.random.RandomState(8)
    n = 200
    boxes = rng.uniform(0, 500, size=(n, 4)).astype(np.float32)
    scores = rng.choice([0.1, 0.5, 0.5, 0.9], size=n).astype(np.float32)
    valid = jnp.asarray(rng.rand(n) < 0.8)
    for branch in (_variadic_branch, _argsort_branch):
        b, s, v = jax.jit(branch)(jnp.asarray(boxes), jnp.asarray(scores), valid)
        b, s, v = np.asarray(b), np.asarray(s), np.asarray(v)
        nv = int(np.asarray(valid).sum())
        assert v.sum() == nv
        assert v[:nv].all() and not v[nv:].any()
        assert (np.diff(s[:nv]) <= 0).all()
        got = sorted(map(tuple, np.concatenate([b[:nv], s[:nv, None]], axis=1)))
        want_rows = np.concatenate(
            [boxes[np.asarray(valid)], np.asarray(scores)[np.asarray(valid), None]],
            axis=1,
        )
        want = sorted(map(tuple, want_rows))
        assert got == want


def test_production_sort_matches_reference_semantics():
    """ops/nms.sort_by_score (whichever branch this backend selects) agrees
    with a NumPy stable-sort oracle on tie-free inputs."""
    from faster_rcnn_tpu.ops.nms import sort_by_score

    fn = jax.jit(sort_by_score)
    rng = np.random.RandomState(9)
    for boxes, scores, valid in _cases(rng, n_cases=10):
        b, s, v = fn(boxes, scores, valid)
        sv = np.where(np.asarray(valid), np.asarray(scores), -np.inf)
        order = np.argsort(-sv, kind="stable")
        nv = int(np.asarray(valid).sum())
        np.testing.assert_array_equal(np.asarray(s)[:nv], sv[order][:nv])
        np.testing.assert_array_equal(
            np.asarray(b)[:nv], np.asarray(boxes)[order][:nv]
        )
        assert int(np.asarray(v).sum()) == nv


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
