"""Profiling hooks.

The reference has no tracing/profiling beyond tqdm bars (SURVEY.md §5).
TPU-native observability: ``jax.profiler`` traces viewable in
TensorBoard/xprof, plus named annotations for the hot regions.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """Capture a device trace for the enclosed region (no-op if log_dir is
    None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation usable as decorator/context."""
    return jax.profiler.TraceAnnotation(name)
