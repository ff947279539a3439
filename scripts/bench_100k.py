#!/usr/bin/env python
"""100k-vertex single-chip training-step benchmark (BASELINE configs[3]
scale) with a coarse phase breakdown.

Measures, dispatch-amortized with readback sync:
  - graph op alone (cheb pair at training width)
  - model forward
  - full train step (fwd+bwd+adamw, remat)
for the banded sparse path, optionally with the vertex-fused kernels.
"""

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--block-size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--fused", action="store_true",
                    help="vertex-fused sparse-path kernels")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--step-only", action="store_true",
                    help="skip the pair/forward sections (memory headroom)")
    ap.add_argument("--tile-v", type=int, default=128)
    ap.add_argument("--b-tile", type=int, default=None)
    ap.add_argument("--profile-dir", default=None)
    args = ap.parse_args()

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.nn.model import STGCN
    from stgcn_tpu.ops.graph_op import make_graph_op
    from stgcn_tpu.utils.timing import device_sync

    v = args.vertices
    t0 = time.time()
    adj = random_road_graph(v, k_neighbors=8, seed=0)
    import dataclasses

    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = make_graph_op(art, "banded", banded_block_size=args.block_size,
                        dtype=jnp.bfloat16, nv=args.fused)
    print(f"prep {time.time()-t0:.1f}s  slabs {gop.slabs.shape} "
          f"{gop.slabs.dtype}", flush=True)

    b, n_his = args.batch, 12
    model = STGCN(n_his=n_his, dtype=jnp.bfloat16, remat=not args.no_remat)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n_his, v, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1], gop,
                        deterministic=True)["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"params {n_params:,}", flush=True)

    import optax
    tx = optax.adamw(1e-3, weight_decay=1e-3)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(7)

    if args.fused:
        from stgcn_tpu.nn.fused_sparse import fused_sparse_forward

        def apply_fn(p, g, xx, r, det):
            return fused_sparse_forward(p, xx, g, model, deterministic=det,
                                        rng=r, tile_v=args.tile_v,
                                        b_tile=args.b_tile)
    else:
        def apply_fn(p, g, xx, r, det):
            rngs = None if det else {"dropout": r}
            return model.apply({"params": p}, xx, g, deterministic=det,
                               rngs=rngs)

    if not args.step_only:
        # --- graph op alone (training width: N = B*T1*C1) ---
        xg = jnp.asarray(rng.standard_normal((b, 10, v, 16)), jnp.bfloat16)

        @jax.jit
        def pair(g, xx):
            return g.cheb_pair(xx)

        out = pair(gop, xg); device_sync(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = pair(gop, xg)
        device_sync(out)
        t_pair = (time.time() - t0) / args.reps
        print(f"cheb_pair(N={b*10*16}): {t_pair*1e3:7.2f} ms", flush=True)
        del out, xg

        # --- forward ---
        fwd = jax.jit(lambda p, g, xx: apply_fn(p, g, xx, None, True))
        y = fwd(params, gop, x); device_sync(y)
        t0 = time.time()
        for _ in range(args.reps):
            y = fwd(params, gop, x)
        device_sync(y)
        t_fwd = (time.time() - t0) / args.reps
        print(f"forward:            {t_fwd*1e3:7.2f} ms", flush=True)
        del y

    # --- train step ---
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(p, s, g, xx, r):
        def loss(pp):
            pred = apply_fn(pp, g, xx, r, False)
            return jnp.mean(pred.astype(jnp.float32) ** 2)
        l, grads = jax.value_and_grad(loss)(p)
        up, s2 = tx.update(grads, s, p)
        return optax.apply_updates(p, up), s2, l

    try:
        params, opt_state, l = step(params, opt_state, gop, x, key)
        device_sync(l)
    except Exception:
        stats = jax.local_devices()[0].memory_stats() or {}
        print({k: round(v / 2**30, 2) for k, v in stats.items()
               if "bytes" in k}, flush=True)
        raise
    t0 = time.time()
    for _ in range(args.reps):
        params, opt_state, l = step(params, opt_state, gop, x, key)
    device_sync(l)
    t_step = (time.time() - t0) / args.reps
    print(f"train step:         {t_step*1e3:7.2f} ms "
          f"({args.batch/t_step:.1f} samples/s)", flush=True)

    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            for _ in range(3):
                params, opt_state, l = step(params, opt_state, gop, x, key)
            device_sync(l)
        print(f"trace written to {args.profile_dir}", flush=True)


if __name__ == "__main__":
    main()
