"""LR phase schedules.

The reference re-``compile``s the Keras model per (iterations, lr) phase
(train_util.py:27-33) with phases parsed from strings like
"60000:1e-3,20000:1e-4" (args_util.py:30-45).  Here a phase list becomes one
optax piecewise-constant schedule — no recompilation, the LR is a traced
scalar.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import optax


def phases_from_str(s: str) -> List[Tuple[int, float]]:
    """"60000:1e-3,20000:1e-4" -> [(60000, 1e-3), (20000, 1e-4)]
    (args_util.py:30-45)."""
    phases = []
    for part in s.split(","):
        iters, lr = part.split(":")
        phases.append((int(iters), float(lr)))
    return phases


def schedule_from_phases(phases: Sequence[Tuple[int, float]]) -> optax.Schedule:
    """Piecewise-constant LR over cumulative phase boundaries."""
    scheds = [optax.constant_schedule(lr) for _, lr in phases]
    bounds = []
    total = 0
    for iters, _ in phases[:-1]:
        total += iters
        bounds.append(total)
    return optax.join_schedules(scheds, bounds) if bounds else scheds[0]


def total_iterations(phases: Sequence[Tuple[int, float]]) -> int:
    return sum(i for i, _ in phases)
