"""Profiling / observability helpers.

The reference's only cost observability is the NFE counter (SURVEY.md §5);
here NFE flows out of every solve as a value, and this module adds
jax.profiler integration for device traces plus a simple wall-clock scope.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wallclock(name: str, sink=print):
    start = time.perf_counter()
    try:
        yield
    finally:
        sink(f"[{name}] {time.perf_counter() - start:.3f}s")


def annotate(name: str):
    """Named region that shows up in device traces."""
    return jax.profiler.TraceAnnotation(name)
