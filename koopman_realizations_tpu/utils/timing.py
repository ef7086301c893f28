"""Timing and profiling helpers (reference: tic/toc ``comp_time``).

The reference instruments its real-time budget with tic/toc around each MPC
solve (``Ksim.m:205-217``), recorded as ``results.comp_time``.  Under jit the
whole closed loop is one XLA program, so the equivalents are:

- ``step_time``: wall-clock per control step of a compiled runner, averaged
  over repetitions (fills the comp_time-compatible field),
- ``profile_trace``: a jax.profiler trace context for per-kernel timing in
  TensorBoard / xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


def step_time(fn: Callable, args: tuple, n_steps: int, reps: int = 3) -> dict:
    """Measure mean wall time per control step of a compiled runner.

    Returns {mean, median, max, total_s} in seconds per step, matching the
    summary statistics the reference reports for ``comp_time`` (BASELINE.md
    rows are mean/median/max of that field).
    """
    out = jax.block_until_ready(fn(*args))        # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) / n_steps)
    times = np.asarray(times)
    return {"mean": float(times.mean()), "median": float(np.median(times)),
            "max": float(times.max()), "total_s": float(times.sum() * n_steps)}


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def comp_time_like(total_wall_s: float, n_steps: int) -> np.ndarray:
    """A per-step comp_time vector from a single compiled-loop wall time.

    Inside one fused scan individual solves are not separable; the uniform
    attribution keeps the reference's results-struct schema usable.
    """
    return np.full(n_steps, total_wall_s / max(n_steps, 1))
