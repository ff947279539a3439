#!/usr/bin/env python
"""Micro-benchmark for the vertex-fused head/tail kernels at 100k-vertex
block shapes: where does the fused forward/step time go, and how do
(tile_v, b_tile) move it. Dispatch-amortized, readback-synced."""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from stgcn_tpu.kernels.vertex_fused import (
    VertexBlockCfg, head_fused, tail_fused)
from stgcn_tpu.utils.timing import device_sync


def bench(fn, args, reps):
    out = fn(*args)
    device_sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    device_sync(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--vertices", type=int, default=100352)
    ap.add_argument("--tile-v", type=int, default=128)
    ap.add_argument("--b-tile", type=int, default=0)
    ap.add_argument("--block", type=int, default=0, choices=(0, 1, 2))
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--grads", action="store_true")
    args = ap.parse_args()

    b, vp = args.batch, args.vertices
    # default STGCN plan: blocks [[1],[64,16,64],[64,16,64],[128,128],[1]]
    t_in = [12, 8, 4][args.block]
    c_in = [8, 64, 64][args.block]
    cfg = VertexBlockCfg(
        kt=3, ks=3, act_func="glu", graph_conv_type="cheb_graph_conv",
        droprate=0.5, v_true=vp - 256, v_pad=vp, t_in=t_in, c_in=c_in,
        c0=64, c1=16, c2=64, tile_v=args.tile_v,
        apply_ln=args.block > 0, training=True,
        precision="bfloat16", b_tile=args.b_tile)
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    x = f(b, cfg.t_in, cfg.c_in, vp)
    mu = jnp.zeros((b, cfg.t_in, 1, 1), jnp.float32)
    rstd = jnp.ones((b, cfg.t_in, 1, 1), jnp.float32)
    lng = jnp.ones((cfg.c_in, vp), jnp.float32)
    lnb = jnp.zeros((cfg.c_in, vp), jnp.float32)
    c1k, c1b = f(3, cfg.c_in, cfg.g1), f32(cfg.g1)
    gaw, gab = f(cfg.c0, cfg.c1), f32(cfg.c1)
    xg = f(b, cfg.t1, cfg.c1, vp)
    ta, tb = f(b, cfg.t1, cfg.c1, vp), f(b, cfg.t1, cfg.c1, vp)
    gcw, gcb = f(3, cfg.c1, cfg.c1), f32(cfg.c1)
    c2k, c2b = f(3, cfg.c1, cfg.g2), f32(cfg.g2)

    head = jax.jit(lambda *a: head_fused(cfg, 7, *a))
    tail = jax.jit(lambda *a: tail_fused(cfg, cfg.v_true, *a))
    h_args = (x, mu, rstd, lng, lnb, c1k, c1b, gaw, gab)
    t_args = (xg, ta, tb, gcw, gcb, c2k, c2b)

    t_h = bench(head, h_args, args.reps)
    t_t = bench(tail, t_args, args.reps)
    h_bytes = (x.size + b * cfg.t1 * cfg.c1 * vp) * 2
    t_bytes = (3 * xg.size + b * cfg.t2 * cfg.c2 * vp) * 2
    print(f"block {args.block} tile_v {cfg.tile_v} b_tile "
          f"{cfg.b_tile or b}: head fwd {t_h*1e3:7.2f} ms "
          f"({h_bytes/t_h/1e9:6.0f} GB/s)  tail fwd {t_t*1e3:7.2f} ms "
          f"({t_bytes/t_t/1e9:6.0f} GB/s)", flush=True)

    if args.grads:
        gh = jax.jit(jax.grad(lambda *a: jnp.sum(
            head_fused(cfg, 7, *a).astype(jnp.float32) ** 2), argnums=(0,)))
        gt = jax.jit(jax.grad(lambda *a: sum(
            jnp.sum(o.astype(jnp.float32) ** 2)
            for o in tail_fused(cfg, cfg.v_true, *a)), argnums=(0, 1, 2)))
        t_hb = bench(gh, h_args, args.reps)
        t_tb = bench(gt, t_args, args.reps)
        print(f"    head fwd+bwd {t_hb*1e3:7.2f} ms   "
              f"tail fwd+bwd {t_tb*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
