"""Tracing / profiling utilities (SURVEY §5: the reference has none; the
rebuild uses ``jax.profiler`` traces + per-step timing)."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto:

    >>> with trace("/tmp/sod-trace"):
    ...     train_step(...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats for the train loop (dispatch-based:
    pair with a periodic device sync for exact numbers)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_seconds(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def images_per_second(self, batch_size: int) -> float:
        s = self.mean_step_seconds
        return batch_size / s if s > 0 else 0.0


def annotate(name: str):
    """Named profiler span decorator (shows up in traces)."""
    import jax

    def deco(fn):
        def wrapper(*a, **kw):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **kw)

        wrapper.__name__ = fn.__name__
        return wrapper

    return deco
