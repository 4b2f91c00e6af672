"""Profiling/tracing helpers.

The reference instruments with CLOCK_MONOTONIC + cudaDeviceSynchronize fences
(pcg/sqp.cuh:33-35, experiment.cuh:14).  TPU equivalents: a blocking wall
timer around jitted calls, and jax.profiler traces for op-level breakdowns.
"""

from __future__ import annotations

import contextlib
import time

import jax


class WallTimer:
    """Blocking wall timer (time_delta_us_timespec equivalent): waits for all
    outputs before reading the clock."""

    def __init__(self):
        self.samples_us = []

    @contextlib.contextmanager
    def measure(self, *outputs):
        t0 = time.perf_counter()
        yield
        for out in outputs:
            jax.block_until_ready(out)
        self.samples_us.append((time.perf_counter() - t0) * 1e6)


def time_jitted(fn, *args, reps: int = 20, warmup: int = 2) -> float:
    """Median wall time (us) of fn(*args) with compile excluded."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        samples.append((time.perf_counter() - t0) * 1e6)
    samples.sort()
    return samples[len(samples) // 2]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mpcgpu_tpu_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
