"""Reliable device timing.

On tunneled/virtualized TPU backends, ``block_until_ready`` can return
before execution finishes (observed: an 8192³ matmul "completing" at 32×
physical peak). The only trustworthy barrier is a host readback of a value
that data-depends on the computation. ``device_sync`` reduces to one scalar
on device (cheap) and pulls 4 bytes (large transfers through the tunnel
are minutes-slow — never fetch full arrays for timing).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_sync(x) -> float:
    """Barrier: returns a scalar data-dependent on ``x``'s computation."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "ravel")]
    if not leaves:
        return 0.0
    s = sum(jnp.sum(l.ravel()[:1]) for l in leaves)
    return float(s)


def timeit(f: Callable[[], object], *, reps: int = 30, warmup: int = 2) -> float:
    """Median-free mean seconds per call of ``f``, with readback sync."""
    out = None
    for _ in range(warmup):
        out = f()
    device_sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = f()
    device_sync(out)
    return (time.time() - t0) / reps
