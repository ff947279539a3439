#!/usr/bin/env python
"""Stage-level breakdown of the configs[2] forward (PEMS-BAY V=325,
B=512, bf16): which stage keeps the measured forward above the ~2.9 ms
HBM-physical bound (BASELINE.md r3 analysis)?

Times, dispatch-amortized and readback-synced, on the real chip:
  - copy floors for the two activation layouts ([B,T,V,64] vc zero-pad
    2x lanes; [B,T,64,Vp] cv zero-pad in lanes only)
  - dense nv graph pair at fused shapes ([N,V]@[V,V] twice)
  - head_fused / tail_fused Mosaic kernels per block
  - head_reference / tail_reference (whole-array XLA) per block
  - full fused forward (pallas + xla backends), full unfused forward

Usage: python scripts/probe_configs2_stages.py [--batch 512]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from stgcn_tpu.data.datasets import load_adj
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
from stgcn_tpu.kernels.vertex_fused import (VertexBlockCfg, head_fused,
                                            head_reference, pick_b_tile,
                                            tail_fused, tail_reference)
from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
from stgcn_tpu.nn.model import STGCN
from stgcn_tpu.ops import dense_graph_op
from stgcn_tpu.utils.timing import device_sync


def bench(fn, *args, reps=30):
    """Dispatch-amortized per-application time (tunnel dispatch is ~1 ms,
    so sub-ms stages need the chained timer)."""
    from stgcn_tpu.utils.timing import timeit_chained

    return timeit_chained(fn, *args, inner=12, reps=max(2, reps // 10))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--only-forwards", action="store_true")
    ap.add_argument("--with-steps", action="store_true",
                    help="also time full train steps (fwd+bwd+adamw)")
    args = ap.parse_args()
    b = args.batch

    adj, v = load_adj("pems-bay", os.path.join(ROOT, "data"))
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = dense_graph_op(art, dtype=jnp.bfloat16)
    v_pad = gop.v_pad
    model = STGCN(n_his=12, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 12, v, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1], gop,
                        deterministic=True)["params"]

    if args.only_forwards:
        _forwards(args, model, gop, params, x)
        return

    # ---- copy floors
    a_vc = jnp.asarray(rng.standard_normal((b, 10, v, 64)), jnp.bfloat16)
    a_cv = jnp.asarray(rng.standard_normal((b, 10, 64, v_pad)), jnp.bfloat16)
    t = bench(lambda a: a * jnp.bfloat16(1.0001), a_vc, reps=args.reps)
    print(f"copy floor vc [B,10,{v},64]: {t*1e3:7.2f} ms", flush=True)
    t = bench(lambda a: a * jnp.bfloat16(1.0001), a_cv, reps=args.reps)
    print(f"copy floor cv [B,10,64,{v_pad}]: {t*1e3:7.2f} ms", flush=True)

    # ---- dense nv pair at fused shapes (block 1: c1=16)
    x_nv = jnp.asarray(rng.standard_normal((b * 10 * 16, v_pad)),
                       jnp.bfloat16)
    t = bench(lambda g, xx: g.cheb_pair_nv(xx)[1], gop, x_nv, reps=args.reps)
    print(f"dense cheb_pair_nv [N={b*10*16}, {v_pad}]: {t*1e3:7.2f} ms",
          flush=True)

    # ---- per-block kernels (mirror fused_sparse_forward's prepass)
    blocks, _ = model._plan()
    n_st = len(blocks) - 3
    cfgs, cur_t, c_in = [], 12, 8
    for l in range(n_st):
        c0, c1, c2 = blocks[l + 1]
        cfgs.append(VertexBlockCfg(
            kt=3, ks=3, act_func="glu", graph_conv_type="cheb_graph_conv",
            droprate=0.5, v_true=v, v_pad=v_pad, t_in=cur_t, c_in=c_in,
            c0=c0, c1=c1, c2=c2, tile_v=128, apply_ln=(l > 0),
            training=False, precision="bfloat16"))
        cur_t = cfgs[-1].t2
        c_in = max(c2, 8)
    bt = min(pick_b_tile(c, b) for c in cfgs)
    cfgs = [dataclasses.replace(c, b_tile=bt) for c in cfgs]
    print(f"b_tile={bt} (grid {b//bt} x {v_pad//128})", flush=True)

    for l, cfg in enumerate(cfgs):
        hx = jnp.asarray(rng.standard_normal((b, cfg.t_in, cfg.c_in, v_pad)),
                         jnp.bfloat16)
        mu = jnp.zeros((b, cfg.t_in, 1, 1), jnp.float32)
        rstd = jnp.ones((b, cfg.t_in, 1, 1), jnp.float32)
        lng = jnp.ones((cfg.c_in, v_pad), jnp.float32)
        lnb = jnp.zeros((cfg.c_in, v_pad), jnp.float32)
        c1k = jnp.asarray(rng.standard_normal((3, cfg.c_in, cfg.g1)),
                          jnp.bfloat16)
        c1b = jnp.zeros((cfg.g1,), jnp.float32)
        gaw = jnp.asarray(rng.standard_normal((cfg.c0, cfg.c1)), jnp.bfloat16)
        gab = jnp.zeros((cfg.c1,), jnp.float32)
        gcw = jnp.asarray(rng.standard_normal((3, cfg.c1, cfg.c1)),
                          jnp.bfloat16)
        gcb = jnp.zeros((cfg.c1,), jnp.float32)
        c2k = jnp.asarray(rng.standard_normal((3, cfg.c1, cfg.g2)),
                          jnp.bfloat16)
        c2b = jnp.zeros((cfg.g2,), jnp.float32)
        xg = jnp.asarray(rng.standard_normal((b, cfg.t1, cfg.c1, v_pad)),
                         jnp.bfloat16)
        ta = jnp.asarray(rng.standard_normal((b, cfg.t1, cfg.c1, v_pad)),
                         jnp.bfloat16)

        t_h = bench(lambda *a: head_fused(cfg, 0, *a), hx, mu, rstd, lng,
                    lnb, c1k, c1b, gaw, gab, reps=args.reps)
        t_t = bench(lambda *a: tail_fused(cfg, jnp.int32(v), *a)[0],
                    xg, ta, ta, gcw, gcb, c2k, c2b, reps=args.reps)
        t_hr = bench(lambda *a: head_reference(
            cfg, a[0], (a[1], a[2], a[3], a[4]), (a[5], a[6], a[7], a[8])),
            hx, mu, rstd, lng, lnb, c1k, c1b, gaw, gab, reps=args.reps)
        t_tr = bench(lambda *a: tail_reference(
            cfg, a[0], [a[1], a[2]], (a[3], a[4], a[5], a[6]))[0],
            xg, ta, ta, gcw, gcb, c2k, c2b, reps=args.reps)
        print(f"block {l}: head_fused {t_h*1e3:6.2f} | tail_fused "
              f"{t_t*1e3:6.2f} | head_ref {t_hr*1e3:6.2f} | tail_ref "
              f"{t_tr*1e3:6.2f} ms", flush=True)

    # ---- full forwards
    _forwards(args, model, gop, params, x)


def _forwards(args, model, gop, params, x):
    import optax

    cases = [
        ("unfused", lambda p, xx: model.apply({"params": p}, xx, gop,
                                              deterministic=True)),
        ("vf-pallas", lambda p, xx: fused_sparse_forward(
            p, xx, gop, model, deterministic=True)),
        ("vf-xla", lambda p, xx: fused_sparse_forward(
            p, xx, gop, model, deterministic=True, use_pallas="xla")),
    ]
    for name, fn in cases:
        t = bench(fn, params, x, reps=args.reps)
        print(f"forward {name}: {t*1e3:7.2f} ms", flush=True)

    if not args.with_steps:
        return
    tx = optax.adamw(1e-3, weight_decay=1e-3)
    key = jax.random.PRNGKey(7)
    train_cases = [
        ("unfused", lambda p, xx, r: model.apply(
            {"params": p}, xx, gop, deterministic=False,
            rngs={"dropout": r})),
        ("vf-pallas", lambda p, xx, r: fused_sparse_forward(
            p, xx, gop, model, deterministic=False, rng=r)),
    ]
    for name, fn in train_cases:
        s0 = tx.init(params)

        def step(carry, xx, fn=fn):
            p, s, r = carry
            r, sub = jax.random.split(r)

            def loss(pp):
                pred = fn(pp, xx, sub)
                return jnp.mean(pred.astype(jnp.float32) ** 2)

            l, grads = jax.value_and_grad(loss)(p)
            up, s2 = tx.update(grads, s, p)
            return (optax.apply_updates(p, up), s2, r), l

        t = bench(step, (params, s0, key), x, reps=args.reps)
        print(f"train step {name}: {t*1e3:7.2f} ms "
              f"({x.shape[0]/t:.0f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
