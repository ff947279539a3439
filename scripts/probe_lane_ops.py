#!/usr/bin/env python
"""Mosaic lane-op cost probe at vertex-fused shapes: static lane slices
at sub-128 offsets, lane concat, and the K-fused tconv dot, vs the
current 3-small-dots + transpose formulation."""

import argparse
import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgcn_tpu.utils.timing import device_sync

V = 100352
TILE_V = 128
NVB = V // TILE_V
BT, T1, C = 8, 10, 16
T2 = T1 - 2
G = 128
_F32 = jnp.float32


def run(kernel, x, w, out_t_c):
    spec_x = pl.BlockSpec((BT, TILE_V, T1 * C), lambda i: (0, i, 0))
    spec_w = pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim)
    f = pl.pallas_call(
        kernel, grid=(NVB,),
        in_specs=[spec_x, spec_w],
        out_specs=pl.BlockSpec((BT, TILE_V, out_t_c), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BT, V, out_t_c), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    f = jax.jit(f)
    y = f(x, w)
    device_sync(y)
    t0 = time.time()
    for _ in range(30):
        y = f(x, w)
    device_sync(y)
    return (time.time() - t0) / 30


def main():
    rng = np.random.default_rng(0)
    # x: [BT, V, T1*C] flat t-major lanes (the "vt layout")
    x = jnp.asarray(rng.standard_normal((BT, V, T1 * C)) * 0.1, jnp.bfloat16)
    wk = jnp.asarray(rng.standard_normal((3, C, G)) * 0.1, jnp.bfloat16)
    # fused tap weight [3*C, G]
    wcat = wk.reshape(3 * C, G)

    def k_copy(x_ref, w_ref, o_ref):
        o_ref[...] = x_ref[...][:, :, : T2 * G // (G // C)] if False else \
            x_ref[...][:, :, : T2 * C * (G // C)]

    # 1) tconv via per-t' 48-lane slices at 16-lane offsets + one K=48 dot
    def k_slices(x_ref, w_ref, o_ref):
        xv = x_ref[...]           # [BT, TILE_V, T1*C]
        w = w_ref[...]            # [3C, G]
        for t in range(T2):
            tap = xv[:, :, t * C:(t + 3) * C]          # 48 lanes, 16-off
            r = tap.reshape(BT * TILE_V, 3 * C)
            o = lax.dot_general(r, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=_F32)
            o_ref[:, :, t * G:(t + 1) * G] = o.reshape(
                BT, TILE_V, G).astype(jnp.bfloat16)

    t1 = run(k_slices, x, wcat, T2 * G)

    # 2) same contraction but 3 separate K=16 dots per t' (no odd slices:
    #    taps at multiples of C... same offsets; isolates dot-count cost)
    def k_3dots(x_ref, w_ref, o_ref):
        xv = x_ref[...]
        w = w_ref[...]            # [3, C, G]
        for t in range(T2):
            acc = None
            for k in range(3):
                tap = xv[:, :, (t + k) * C:(t + k + 1) * C]
                r = tap.reshape(BT * TILE_V, C)
                o = lax.dot_general(r, w[k], (((1,), (0,)), ((), ())),
                                    preferred_element_type=_F32)
                acc = o if acc is None else acc + o
            o_ref[:, :, t * G:(t + 1) * G] = acc.reshape(
                BT, TILE_V, G).astype(jnp.bfloat16)

    t2 = run(k_3dots, x, wk, T2 * G)

    # 3) single big dot, K = T1*C (im2col-free lower bound on dot cost:
    #    wrong math, right shapes)
    wbig = jnp.asarray(rng.standard_normal((T1 * C, G)) * 0.1, jnp.bfloat16)

    def k_big(x_ref, w_ref, o_ref):
        xv = x_ref[...].reshape(BT * TILE_V, T1 * C)
        o = lax.dot_general(xv, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32)
        # broadcast one G-slab to all t' outputs (shape filler)
        ob = o.reshape(BT, TILE_V, G).astype(jnp.bfloat16)
        for t in range(T2):
            o_ref[:, :, t * G:(t + 1) * G] = ob

    t3 = run(k_big, x, wbig, T2 * G)

    by = (x.size + BT * V * T2 * G) * 2
    print(f"vt tconv, 48-lane slices + K=48 dot : {t1*1e3:7.2f} ms "
          f"({by/t1/1e9:5.0f} GB/s)")
    print(f"vt tconv, 3x K=16 dots             : {t2*1e3:7.2f} ms")
    print(f"vt single K=160 dot (lower bound)  : {t3*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
