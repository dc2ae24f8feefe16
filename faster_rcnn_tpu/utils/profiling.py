"""Profiling utilities.

Rebuild of the reference's ``custom_decorators.profile`` (custom_decorators.py:
8-33): a nested wall-clock scope tracker printing an indented call tree when
the outermost scope exits.  Differences: prints in call order (the reference
prints reversed), is reentrant-safe via threading.local, and adds
``device_trace`` — a context manager around ``jax.profiler`` for real TPU
traces (the reference had no device-side profiling at all).

Host-side timers measure *dispatch* time for jitted calls; wrap with
``block=True`` to measure device completion.
"""

from __future__ import annotations

import contextlib
import functools
import threading
import time
from typing import Callable, List, Optional, Tuple

_state = threading.local()


def _frames() -> List[Tuple[int, str, float]]:
    if not hasattr(_state, "frames"):
        _state.frames = []
        _state.depth = 0
    return _state.frames


@contextlib.contextmanager
def scope(name: str, block: bool = False):
    """Timed scope; prints the accumulated tree when the outermost exits."""
    frames = _frames()
    _state.depth += 1
    depth = _state.depth
    idx = len(frames)
    frames.append((depth, name, 0.0))
    start = time.perf_counter()
    try:
        yield
    finally:
        if block:
            import jax

            (jax.device_put(0.0) + 0).block_until_ready()
        elapsed = time.perf_counter() - start
        frames[idx] = (depth, name, elapsed)
        _state.depth -= 1
        if _state.depth == 0:
            for d, n, t in frames:
                print(f"{'  ' * (d - 1)}{n}: {t * 1000:.2f} ms")
            frames.clear()


def profile(fn: Optional[Callable] = None, *, block: bool = False):
    """Decorator form of :func:`scope` (reference: @profile)."""

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            with scope(f.__qualname__, block=block):
                return f(*args, **kwargs)

        return wrapper

    return deco(fn) if fn is not None else deco


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a TPU/XLA profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling images/sec + ms/step tracker for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def ms_per_step(self) -> float:
        return 1000.0 * sum(self._times) / max(len(self._times), 1)

    def img_per_sec(self, batch_size: int) -> float:
        if not self._times:
            return 0.0
        return batch_size * len(self._times) / sum(self._times)
