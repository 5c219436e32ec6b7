"""Tracing / profiling utilities (SURVEY.md §5: the reference only recorded
homemade wall-clock arrays; here the trainer integrates with jax.profiler
and reports the north-star coords/s counter)."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """coords/s counter: feed points-processed increments, read the rate."""

    def __init__(self):
        self.t0 = time.time()
        self.points = 0

    def add(self, npoints):
        self.points += int(npoints)

    @property
    def coords_per_s(self):
        dt = time.time() - self.t0
        return self.points / dt if dt > 0 else float("nan")


def profile_fit(fit_fn, *args, log_dir=None, **kwargs):
    """Run a fit under an optional profiler trace, returning
    (result, coords_per_s)."""
    ctx = trace(log_dir) if log_dir else contextlib.nullcontext()
    with ctx:
        res = fit_fn(*args, **kwargs)
    coords = args[2].shape[0] if len(args) > 2 else None
    cps = None
    if coords is not None and res.wall_time_s > 0:
        niters = len(res.mse_gt)
        cps = niters * coords / res.wall_time_s
    return res, cps
