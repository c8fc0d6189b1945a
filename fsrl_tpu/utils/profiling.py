"""Profiling hooks: the reference only tracks wall-clock counters
(SURVEY.md §5); here those counters live in the trainer, and this module adds
the TPU-native layer — jax.profiler traces viewable in TensorBoard/XProf."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None, name: str = "train") -> Iterator[None]:
    """Capture a jax.profiler trace around a code block:

        with trace("logs/profile"):
            for _ in range(10):
                state, ... = train_iter(...)
    """
    import jax
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Cheap section timer mirroring the reference's collect/update split
    (``base_trainer.py:317-356``) + CVPO's estep/mstep timers."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + \
                time.perf_counter() - t0
