#!/usr/bin/env python
"""configs[2] probe: vertex-fused sparse path vs unfused XLA bf16 at
PEMS-BAY V=325, large batch — isolated forward, isolated train step,
and a 16-step lax.scan (the production trainer shape; round-3 found an
isolated-step win that regressed inside the scanned epoch).

Usage: python scripts/probe_configs2_vf.py [--batch 512] [--reps 20]
"""

import argparse
import dataclasses
import os
import sys
import time
from functools import partial

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import optax

from stgcn_tpu.data.datasets import load_adj
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
from stgcn_tpu.nn.model import STGCN
from stgcn_tpu.ops.graph_op import make_graph_op
from stgcn_tpu.utils.timing import device_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--scan-steps", type=int, default=16)
    args = ap.parse_args()
    b = args.batch

    adj, v = load_adj("pems-bay", os.path.join(ROOT, "data"))
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    from stgcn_tpu.ops import dense_graph_op
    gop = dense_graph_op(art, dtype=jnp.bfloat16)
    gop_banded = make_graph_op(art, "banded", banded_block_size=128,
                               dtype=jnp.bfloat16, nv=True)
    model = STGCN(n_his=12, dtype=jnp.bfloat16, remat=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 12, v, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1], gop,
                        deterministic=True)["params"]
    tx = optax.adamw(1e-3, weight_decay=1e-3)
    key = jax.random.PRNGKey(7)

    def apply_unfused(p, xx, r, det):
        rngs = None if det else {"dropout": r}
        return model.apply({"params": p}, xx, gop, deterministic=det,
                           rngs=rngs)

    def apply_vf_pallas(p, xx, r, det):
        return fused_sparse_forward(p, xx, gop, model, deterministic=det,
                                    rng=r)

    def apply_vf_xla(p, xx, r, det):
        return fused_sparse_forward(p, xx, gop, model, deterministic=det,
                                    rng=r, use_pallas="xla")

    def apply_vf_banded(p, xx, r, det):
        return fused_sparse_forward(p, xx, gop_banded, model,
                                    deterministic=det, rng=r)

    cases = [("unfused+dense", apply_unfused),
             ("vf-pallas+dense", apply_vf_pallas),
             ("vf-xla+dense", apply_vf_xla)]
    if os.environ.get("PROBE_BANDED"):
        cases.append(("vf-pallas+banded", apply_vf_banded))
    for name, apply_fn in cases:
        fwd = jax.jit(lambda p, xx, fn=apply_fn: fn(p, xx, None, True))
        y = fwd(params, x); device_sync(y)
        t0 = time.time()
        for _ in range(args.reps):
            y = fwd(params, x)
        device_sync(y)
        t_fwd = (time.time() - t0) / args.reps

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(p, s, xx, r, fn=apply_fn):
            def loss(pp):
                pred = fn(pp, xx, r, False)
                return jnp.mean(pred.astype(jnp.float32) ** 2)
            l, grads = jax.value_and_grad(loss)(p)
            up, s2 = tx.update(grads, s, p)
            return optax.apply_updates(p, up), s2, l

        ps = jax.tree.map(jnp.copy, params)
        ss = tx.init(ps)
        ps, ss, l = step(ps, ss, x, key); device_sync(l)
        t0 = time.time()
        for _ in range(args.reps):
            ps, ss, l = step(ps, ss, x, key)
        device_sync(l)
        t_step = (time.time() - t0) / args.reps

        @partial(jax.jit, donate_argnums=(0, 1))
        def epoch(p, s, xx, r, fn=apply_fn):
            def body(carry, i):
                p_, s_ = carry
                def loss(pp):
                    pred = fn(pp, xx, jax.random.fold_in(r, i), False)
                    return jnp.mean(pred.astype(jnp.float32) ** 2)
                l_, grads = jax.value_and_grad(loss)(p_)
                up, s2 = tx.update(grads, s_, p_)
                return (optax.apply_updates(p_, up), s2), l_
            (p, s), ls = jax.lax.scan(body, (p, s),
                                      jnp.arange(args.scan_steps))
            return p, s, ls[-1]

        ps = jax.tree.map(jnp.copy, params)
        ss = tx.init(ps)
        ps, ss, l = epoch(ps, ss, x, key); device_sync(l)
        nrep = max(2, args.reps // 4)
        t0 = time.time()
        for _ in range(nrep):
            ps, ss, l = epoch(ps, ss, x, key)
        device_sync(l)
        t_scan = (time.time() - t0) / nrep / args.scan_steps

        print(f"{name:16s} fwd {t_fwd*1e3:7.2f} ms | step "
              f"{t_step*1e3:7.2f} ms | scanned step {t_scan*1e3:7.2f} ms "
              f"({b/t_scan:.0f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
