"""Lightweight tracing/profiling.

The reference's observability is wall-clock AverageMeters
(kadaptation_clip.py:53-69) — kept here for log parity — plus, TPU-native,
an optional ``jax.profiler`` trace context for real device timelines
(SURVEY.md §5.1 rebuild note).
"""

from __future__ import annotations

import contextlib
import logging
import time


class AverageMeter:
    """Computes and stores the average and current value
    (reference kadaptation_clip.py:53-69)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


@contextlib.contextmanager
def device_trace(log_dir: str = ""):
    """jax.profiler trace context; no-op when log_dir is empty."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("=> wrote device trace to %s", log_dir)


@contextlib.contextmanager
def timed(label: str):
    t0 = time.perf_counter()
    yield
    logging.info("%s: %.3fs", label, time.perf_counter() - t0)
