"""Profiling hooks (the reference's only instrumentation is a GPU-memory
print, `main.py:175-177`; here: real tracing).

- ``annotate(name)`` — op-level trace annotation visible in the profiler
  timeline (wraps ``jax.profiler.TraceAnnotation``).
- ``profile(dir)``  — context manager capturing a full XLA/TPU trace
  viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile(log_dir: str | None):
    """Capture a device trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
