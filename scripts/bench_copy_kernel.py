#!/usr/bin/env python
"""Diagnostic: pure-copy Pallas kernel over the vertex-fused block
shapes — isolates achievable DMA bandwidth from in-kernel compute.
Also measures the copy WITH the cv→vc→cv round-trip transpose, which
isolates the Mosaic transpose cost."""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgcn_tpu.kernels.vertex_fused import _cv2vc, _vc2cv
from stgcn_tpu.utils.timing import device_sync


def make(shape, tile_v, transpose, dtype=jnp.bfloat16):
    b, t, c, v = shape
    nvb = v // tile_v

    def kernel(x_ref, o_ref):
        val = x_ref[...]
        if transpose:
            val = _vc2cv(_cv2vc(val))
        o_ref[...] = val

    spec = pl.BlockSpec((b, t, c, tile_v), lambda i: (0, 0, 0, i))
    return pl.pallas_call(
        kernel, grid=(nvb,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


def bench(fn, x, reps=50):
    y = fn(x)
    device_sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = fn(x)
    device_sync(y)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile-v", type=int, default=128)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    for shape in [(8, 12, 8, 100352), (8, 10, 16, 100352),
                  (8, 8, 64, 100352)]:
        x = jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.bfloat16)
        byts = 2 * x.size * 2
        for tr in (False, True):
            f = jax.jit(make(shape, args.tile_v, tr))
            dt = bench(f, x)
            print(f"{shape} tile_v={args.tile_v} transpose={int(tr)}: "
                  f"{dt*1e3:7.2f} ms  {byts/dt/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
