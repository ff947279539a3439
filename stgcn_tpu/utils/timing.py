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


def timeit_chained(fn: Callable, x, *rest, inner: int = 16, reps: int = 4,
                   warmup: int = 1) -> float:
    """Dispatch-amortized seconds per application of ``fn(x, *rest)``.

    Host dispatch through the tunneled runtime costs ~1 ms per jitted
    call, so ``timeit`` cannot resolve sub-millisecond kernels. This
    builds ONE jitted ``lax.scan`` that applies ``fn`` ``inner`` times
    with a serializing data dependency between iterations (the next
    input is perturbed by 0×(a scalar of the previous output), so XLA
    can neither hoist the loop-invariant computation nor parallelize
    iterations), and divides the scan's wall time by ``inner``. The
    perturbation adds one elementwise pass over ``x`` per iteration —
    subtract a copy floor for ops near memory bound.

    If ``fn(x)``'s first output leaf matches ``x`` in shape/dtype, the
    output is fed back directly (zero overhead)."""

    probe = fn(x, *rest)
    first = jax.tree.leaves(probe)[0]
    x_leaf = jax.tree.leaves(x)[0]
    feedback = (not isinstance(x, (tuple, list, dict))
                and first.shape == x_leaf.shape
                and first.dtype == x_leaf.dtype)

    if feedback:
        @jax.jit
        def run(x0, *r):
            def body(c, _):
                y = fn(c, *r)
                return jax.tree.leaves(y)[0], ()
            out, _ = jax.lax.scan(body, x0, None, length=inner)
            return jnp.sum(out.ravel()[:1])
    else:
        @jax.jit
        def run(x0, *r):
            def body(c, _):
                xx, acc = c
                y = fn(xx, *r)
                l = jax.tree.leaves(y)[0].ravel()[0].astype(jnp.float32)
                # perturb EVERY leaf of the carry: anything untouched is
                # loop-invariant and XLA hoists every computation that
                # depends only on it out of the scan (measured: a full
                # model forward "ran" 5x faster because only the output
                # head stayed inside the loop)
                xx = jax.tree.map(
                    lambda a: a + (l * 0).astype(a.dtype), xx)
                return (xx, acc + l), ()
            (_, acc), _ = jax.lax.scan(body, (x0, jnp.float32(0)), None,
                                       length=inner)
            return acc

    for _ in range(warmup):
        out = run(x, *rest)
    device_sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = run(x, *rest)
    device_sync(out)
    return (time.time() - t0) / (reps * inner)
