#!/usr/bin/env python
"""Probe: channel-contracting dots on cv-layout tiles WITHOUT the
cv<->vc transposes, vs the current transpose+folded-dot formulation.

The vertex-fused kernels (kernels/vertex_fused.py) transpose every tile
[bt, t, c, v] -> [bt, t, v, c] around each channel dot (the math helpers
fold (bt,t,v) into matmul rows). ROADMAP r3 measured those in-VMEM
transposes at ~9 us/step across a 784-step sweep (~8.7 ms additive VPU
time). Candidate replacement: a batched dot_general that contracts the
sublane c axis directly — per (bt,t) slice, w^T[c_out,c] @ x[c,v] is a
standard row-major MXU matmul (contraction in RHS sublanes / LHS lanes).

Variants timed per (c_in, c_out) at tail/head tile shapes, 784-tile
sweep over 100352 vertices:
  copy     — HBM floor
  tp_dot   — cv2vc + [btv,c]@[c,g] folded dot + vc2cv (current)
  bdot     — dot_general batched over folded (bt*t), w broadcast
  bdot_pre — same but w pre-broadcast outside the kernel (hoist check)
"""

import argparse
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
_F32 = jnp.float32


def run(kernel, x, w, c_out, bt, reps=30):
    spec_x = pl.BlockSpec((bt, x.shape[1], TILE_V), lambda i: (0, 0, i))
    spec_w = pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim)
    f = pl.pallas_call(
        kernel, grid=(NVB,),
        in_specs=[spec_x, spec_w],
        out_specs=pl.BlockSpec((bt, c_out, TILE_V), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((bt, c_out, V), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    f = jax.jit(f)
    y = f(x, w)
    device_sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = f(x, w)
    device_sync(y)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bt", type=int, default=40,
                    help="folded batch*time rows per tile")
    args = ap.parse_args()
    bt = args.bt
    rng = np.random.default_rng(0)

    for c_in, c_out in ((16, 16), (16, 128), (64, 128), (64, 16)):
        x = jnp.asarray(rng.standard_normal((bt, c_in, V)) * 0.1,
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((c_in, c_out)) * 0.1,
                        jnp.bfloat16)
        wb = jnp.broadcast_to(w[None], (bt, c_in, c_out))

        def k_copy(x_ref, w_ref, o_ref):
            xv = x_ref[...]
            o_ref[...] = jnp.broadcast_to(
                xv[:, :1, :], o_ref.shape).astype(jnp.bfloat16) \
                if xv.shape[1] != o_ref.shape[1] else xv

        def k_tp_dot(x_ref, w_ref, o_ref):
            xv = x_ref[...]                        # [bt, c, 128]
            xvc = jnp.transpose(xv, (0, 2, 1))     # cv2vc
            o = lax.dot_general(xvc.reshape(bt * TILE_V, c_in), w_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=_F32)
            ovc = o.reshape(bt, TILE_V, c_out).astype(jnp.bfloat16)
            o_ref[...] = jnp.transpose(ovc, (0, 2, 1))   # vc2cv

        def k_bdot(x_ref, w_ref, o_ref):
            xv = x_ref[...]                        # [bt, c, 128]
            wb_ = jnp.broadcast_to(
                w_ref[...].T[None], (bt, c_out, c_in))
            o = lax.dot_general(wb_, xv,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=_F32)
            o_ref[...] = o.astype(jnp.bfloat16)

        def k_bdot_pre(x_ref, w_ref, o_ref):
            xv = x_ref[...]
            o = lax.dot_general(
                jnp.transpose(w_ref[...], (0, 2, 1)), xv,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=_F32)
            o_ref[...] = o.astype(jnp.bfloat16)

        t_copy = run(k_copy, x, w, c_out, bt)
        t_tp = run(k_tp_dot, x, w, c_out, bt)
        t_b = run(k_bdot, x, w, c_out, bt)
        t_bp = run(k_bdot_pre, x, wb, c_out, bt)
        print(f"c {c_in:3d}->{c_out:3d}  copy {t_copy*1e3:6.2f}  "
              f"tp_dot {t_tp*1e3:6.2f}  bdot {t_b*1e3:6.2f}  "
              f"bdot_pre {t_bp*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
