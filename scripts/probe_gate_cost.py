#!/usr/bin/env python
"""Gate transcendental cost probe at vertex-fused shapes: bf16
tanh-composed sigmoid (current) vs f32 native logistic vs f32
tanh-compose, on the GLU gate p*sigmoid(q)."""

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

from stgcn_tpu.utils.timing import device_sync

V = 100352
TILE_V = 128
NVB = V // TILE_V
BT, T1, C0 = 8, 10, 64
_F32 = jnp.float32
_BF16 = jnp.bfloat16


def build(mode):
    def kernel(x_ref, o_ref):
        xv = x_ref[...].reshape(BT * TILE_V, T1 * 2 * C0)
        outs = []
        for t in range(T1):
            s = xv[:, t * 2 * C0:(t + 1) * 2 * C0]
            p, q = s[:, :C0], s[:, C0:]
            if mode == "bf16_tanh":
                half = _BF16(0.5)
                a = p * (jnp.tanh(q * half) * half + half)
            elif mode == "f32_logistic":
                a = (p.astype(_F32)
                     * jax.nn.sigmoid(q.astype(_F32))).astype(_BF16)
            elif mode == "f32_tanh":
                q32 = q.astype(_F32)
                a = (p.astype(_F32)
                     * (jnp.tanh(q32 * 0.5) * 0.5 + 0.5)).astype(_BF16)
            else:  # none: baseline without transcendentals
                a = p * q
            outs.append(a)
        o_ref[...] = jnp.concatenate(outs, axis=-1).reshape(
            BT, TILE_V, T1 * C0)

    return kernel


def run(mode, x):
    f = pl.pallas_call(
        build(mode), grid=(NVB,),
        in_specs=[pl.BlockSpec((BT, TILE_V, T1 * 2 * C0),
                               lambda i: (0, i, 0))],
        out_specs=pl.BlockSpec((BT, TILE_V, T1 * C0), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BT, V, T1 * C0), _BF16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    f = jax.jit(f)
    y = f(x)
    device_sync(y)
    t0 = time.time()
    for _ in range(30):
        y = f(x)
    device_sync(y)
    return (time.time() - t0) / 30


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BT, V, T1 * 2 * C0)) * 0.1, _BF16)
    for mode in ("none", "bf16_tanh", "f32_logistic", "f32_tanh"):
        dt = run(mode, x)
        print(f"{mode:13s}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
