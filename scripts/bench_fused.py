#!/usr/bin/env python
"""Fused-vs-unfused ST-block benchmark at BASELINE configs[2] scale
(PEMS-BAY V=325, large batch).

Measures, dispatch-amortized with readback sync (see utils/timing.py):
  - unfused flax forward (f32 and bf16 compute)
  - fused Pallas forward (f32 internals vs bf16 internals)
  - full train-step (fwd+bwd+adamw) for each path
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from stgcn_tpu.data.datasets import load_adj
from stgcn_tpu.graph import build_gso
from stgcn_tpu.nn.model import STGCN
from stgcn_tpu.nn.fused import fused_forward
from stgcn_tpu.ops import dense_graph_op
from stgcn_tpu.utils.timing import device_sync, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--skip", default="", help="comma-list of cases to skip")
    args = ap.parse_args()

    adj, v = load_adj("pems-bay", os.path.join(ROOT, "data"))
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    gop = dense_graph_op(art)
    model = STGCN(n_his=12)
    b = args.batch
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, 12, v, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x[:1], gop,
                        deterministic=True)["params"]
    rng = jax.random.PRNGKey(7)
    skip = set(args.skip.split(",")) if args.skip else set()

    import optax
    tx = optax.adamw(1e-3, weight_decay=1e-3)
    opt_state = tx.init(params)

    def train_step(apply_fn):
        def f(p, s, xx, r):
            def loss(pp):
                y = apply_fn(pp, xx, r)
                return jnp.mean((y.reshape(b, -1)) ** 2)
            l, g = jax.value_and_grad(loss)(p)
            up, s2 = tx.update(g, s, p)
            return optax.apply_updates(p, up), s2, l
        return jax.jit(f)

    cases = {}

    def unfused(dtype):
        m = STGCN(n_his=12, dtype=dtype)
        def apply_fn(p, xx, r):
            return m.apply({"params": p}, xx, gop, deterministic=False,
                           rngs={"dropout": r})
        def fwd_fn(p, xx, r):
            return m.apply({"params": p}, xx, gop, deterministic=True)
        return apply_fn, fwd_fn

    def fused(precision):
        def apply_fn(p, xx, r):
            return fused_forward(p, xx, gop, model, deterministic=False,
                                 rng=r, precision=precision)
        def fwd_fn(p, xx, r):
            return fused_forward(p, xx, gop, model, deterministic=True,
                                 precision=precision)
        return apply_fn, fwd_fn

    cases["unfused_f32"] = unfused(None)
    cases["unfused_bf16"] = unfused(jnp.bfloat16)
    cases["fused_f32"] = fused("default")
    cases["fused_bf16"] = fused("bfloat16")

    for name, (apply_fn, fwd_fn) in cases.items():
        if name in skip:
            continue
        try:
            jf = jax.jit(fwd_fn)
            t0 = time.time()
            out = jf(params, x, rng)
            device_sync(out)
            compile_s = time.time() - t0
            t_fwd = timeit(lambda: jf(params, x, rng), reps=args.reps)
            ts = train_step(apply_fn)
            t0 = time.time()
            p2, s2, l = ts(params, opt_state, x, rng)
            device_sync(l)
            compile2_s = time.time() - t0
            t_step = timeit(lambda: ts(params, opt_state, x, rng)[2],
                            reps=args.reps)
            print(f"{name:14s} fwd {t_fwd*1e3:7.2f} ms   step {t_step*1e3:7.2f} ms"
                  f"   (compile {compile_s:.1f}/{compile2_s:.1f}s)", flush=True)
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
