#!/usr/bin/env python
"""Stage-by-stage cost of the vt head kernel: tconv dot → +gate →
+align dot → +concat assembly vs direct slice writes."""

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
BT, T_IN, C = 8, 12, 8
KT = 3
T1 = T_IN - KT + 1
C0, C1 = 64, 16
G1 = 2 * C0
_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _sig(x):
    half = _BF16(0.5)
    return jnp.tanh(x * half) * half + half


def build(stage):
    def kernel(x_ref, wk_ref, ga_ref, o_ref):
        xr = x_ref[...].reshape(BT * TILE_V, T_IN * C)
        wk = wk_ref[...]          # [KT*C, G1]
        ga = ga_ref[...]          # [C0, C1]
        if stage >= 4:            # folded: ONE [Lin, T1*G1] Toeplitz dot
            s_full = lax.dot_general(
                xr, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32)     # wk is [Lin, T1*G1] here
            if stage == 4:        # dot only
                o_ref[...] = s_full[:, : T1 * C1].astype(_BF16).reshape(
                    BT, TILE_V, T1 * C1)
                return
            # stage 5: + full-width gate ([all p | all q] layout) + align
            # stage 6: same but gate stays f32 (no bf16 round trip)
            half = T1 * C0
            if stage == 5:
                s_full = s_full.astype(_BF16)
                p, q = s_full[:, :half], s_full[:, half:]
                a1 = p * _sig(q)                  # xin folded into W
            else:
                p, q = s_full[:, :half], s_full[:, half:]
                a1 = (p * jax.nn.sigmoid(q)).astype(_BF16)
            outs5 = []
            for t in range(T1):
                a1_t = a1[:, t * C0:(t + 1) * C0]
                outs5.append(lax.dot_general(
                    a1_t, ga, (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32).astype(_BF16))
            o_ref[...] = jnp.concatenate(outs5, axis=-1).reshape(
                BT, TILE_V, T1 * C1)
            return
        outs = []
        for t in range(T1):
            tap = xr[:, t * C:(t + KT) * C]
            s = lax.dot_general(tap, wk, (((1,), (0,)), ((), ())),
                                preferred_element_type=_F32)
            if stage == 0:        # dot only
                piece = s[:, :C1].astype(_BF16)
            else:
                s = s.astype(_BF16)
                p, q = s[:, :C0], s[:, C0:]
                xin = jnp.pad(xr[:, (t + KT - 1) * C:(t + KT) * C],
                              ((0, 0), (0, C0 - C)))
                a1 = (p + xin) * _sig(q)
                if stage == 1:    # + gate
                    piece = a1[:, :C1]
                else:             # + align dot
                    piece = lax.dot_general(
                        a1, ga, (((1,), (0,)), ((), ())),
                        preferred_element_type=_F32).astype(_BF16)
            outs.append(piece)
        if stage == 3:            # direct slice writes
            for t in range(T1):
                o_ref[:, :, t * C1:(t + 1) * C1] = outs[t].reshape(
                    BT, TILE_V, C1)
        else:                     # concat assembly
            o_ref[...] = jnp.concatenate(outs, axis=-1).reshape(
                BT, TILE_V, T1 * C1)

    return kernel


def run(stage, x, wk, ga):
    if stage >= 4:
        rng = np.random.default_rng(1)
        wk = jnp.asarray(rng.standard_normal(
            (T_IN * C, T1 * G1)) * 0.1, _BF16)
    f = pl.pallas_call(
        build(stage), grid=(NVB,),
        in_specs=[pl.BlockSpec((BT, TILE_V, T_IN * C), lambda i: (0, i, 0)),
                  pl.BlockSpec(wk.shape, lambda i: (0, 0)),
                  pl.BlockSpec(ga.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((BT, TILE_V, T1 * C1), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BT, V, T1 * C1), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    f = jax.jit(f)
    y = f(x, wk, ga)
    device_sync(y)
    t0 = time.time()
    for _ in range(30):
        y = f(x, wk, ga)
    device_sync(y)
    return (time.time() - t0) / 30


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BT, V, T_IN * C)) * 0.1, _BF16)
    wk = jnp.asarray(rng.standard_normal((KT * C, G1)) * 0.1, _BF16)
    ga = jnp.asarray(rng.standard_normal((C0, C1)) * 0.1, _BF16)
    names = ["dot only          ", "+ gate            ",
             "+ align dot+concat", "+ align, slice-wr ",
             "folded dot only   ", "folded + gate+algn",
             "folded, f32 gate  "]
    for stage in (0, 1, 2, 3, 4, 5, 6):
        dt = run(stage, x, wk, ga)
        print(f"stage {stage} {names[stage]}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
