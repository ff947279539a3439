#!/usr/bin/env python
"""Fine-grained breakdown of the 100k-vertex fused training step: where do
the 269 ms (BENCH_r02) go? Measures, dispatch-amortized and
readback-synced, at training shapes (B=8, bf16, banded bs=512 stream pack):

  - the [B,T,C,V] <-> [V,N] fold/unfold transposes around the graph kernels
  - the cheb pair on a pre-folded [V,N] operand (kernel time alone)
  - the pair as the model calls it (folds included)
  - head/tail kernels per block
  - full fused forward, full fused train step
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


def bench(fn, *args, reps=20):
    from stgcn_tpu.utils.timing import device_sync

    out = fn(*args)
    device_sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    device_sync(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--block-size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import dataclasses

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.ops.graph_op import make_graph_op

    v, b = args.vertices, args.batch
    t0 = time.time()
    adj = random_road_graph(v, k_neighbors=8, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = make_graph_op(art, "banded", banded_block_size=args.block_size,
                        dtype=jnp.bfloat16)
    print(f"prep {time.time()-t0:.1f}s slabs {gop.slabs.shape} "
          f"{gop.slabs.dtype} v_pad {gop.v_pad} pair_stream "
          f"{gop.pair_stream}", flush=True)

    rng = np.random.default_rng(0)
    t1_len, c1 = 10, 16
    n = b * t1_len * c1
    # cv-layout graph operand as the fused path produces it
    xg_cv = jnp.asarray(rng.standard_normal((b, t1_len, c1, gop.v_pad)),
                        jnp.bfloat16)
    x_vn = jnp.asarray(rng.standard_normal((gop.v_pad, n)), jnp.bfloat16)

    from stgcn_tpu.nn.fused_sparse import _from_vn, _vn

    fold = jax.jit(lambda a: _vn(a))
    unfold = jax.jit(lambda y, like: _from_vn(y, like))
    t_fold = bench(fold, xg_cv, reps=args.reps)
    t_unfold = bench(unfold, x_vn, xg_cv, reps=args.reps)
    print(f"fold  [B,T,C,V]->[V,N]: {t_fold*1e3:7.2f} ms", flush=True)
    print(f"unfold [V,N]->[B,T,C,V]: {t_unfold*1e3:7.2f} ms", flush=True)

    pair_vn = jax.jit(lambda g, xx: g.cheb_pair_vn(xx))
    t_pair_vn = bench(pair_vn, gop, x_vn, reps=args.reps)
    print(f"cheb_pair_vn (kernel only, N={n}): {t_pair_vn*1e3:7.2f} ms",
          flush=True)

    apply_vn = jax.jit(lambda g, xx: g.apply_vn(xx))
    t_apply = bench(apply_vn, gop, x_vn, reps=args.reps)
    print(f"single apply_vn: {t_apply*1e3:7.2f} ms", flush=True)

    def pair_cv(g, a):
        xv = _vn(a)
        t1, t2 = g.cheb_pair_vn(xv)
        return _from_vn(t1, a), _from_vn(t2, a)

    t_pair_cv = bench(jax.jit(pair_cv), gop, xg_cv, reps=args.reps)
    print(f"cheb pair with folds (as model runs it): {t_pair_cv*1e3:7.2f} ms",
          flush=True)

    # pair backward (the chain stream) via grad of sum
    def pair_loss(xx, g):
        t1, t2 = g.cheb_pair_vn(xx)
        return jnp.sum(t1.astype(jnp.float32)) + jnp.sum(
            t2.astype(jnp.float32))

    t_pair_grad = bench(jax.jit(jax.grad(pair_loss)), x_vn, gop,
                        reps=args.reps)
    print(f"pair fwd+bwd (grad wrt x): {t_pair_grad*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
