#!/usr/bin/env python
"""Why does the dense nv Chebyshev pair cost 2.5 ms at configs[2] shapes
([N=81920, 384] bf16, two [N,V]@[V,V] matmuls ~0.25 ms MXU / ~0.3 ms
HBM)? Decompose: single dot, dot via pre-padded matrix, contraction on
lanes vs sublanes, the f32 upcast chain in t2, and candidate rewrites.
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
from stgcn_tpu.ops import dense_graph_op
from stgcn_tpu.utils.timing import device_sync


def bench(fn, *args, reps=50):
    f = jax.jit(fn)
    out = f(*args)
    device_sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    device_sync(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512 * 10 * 16)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    adj, v = load_adj("pems-bay", os.path.join(ROOT, "data"))
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = dense_graph_op(art, dtype=jnp.bfloat16)
    vp = gop.v_pad
    n = args.n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, vp)), jnp.bfloat16)
    mat = jnp.asarray(np.pad(art.to_dense(), ((0, vp - v),) * 2),
                      jnp.bfloat16)
    mat_t = mat.T.copy() if hasattr(mat.T, "copy") else jnp.asarray(mat.T)

    t = bench(lambda a, m: jax.lax.dot_general(
        a, m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        x, mat, reps=args.reps)
    print(f"single dot lanes-lanes (as apply_nv): {t*1e3:7.3f} ms", flush=True)

    t = bench(lambda a, m: jax.lax.dot_general(
        a, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        x, mat_t, reps=args.reps)
    print(f"single dot lanes-sublanes (x @ matT): {t*1e3:7.3f} ms", flush=True)

    t = bench(lambda a, m: jnp.dot(a, m).astype(jnp.bfloat16),
              x, mat_t, reps=args.reps)
    print(f"single dot bf16-accum:                {t*1e3:7.3f} ms", flush=True)

    t = bench(lambda g, a: g.apply_nv(a), gop, x, reps=args.reps)
    print(f"gop.apply_nv (incl mat pad):          {t*1e3:7.3f} ms", flush=True)

    t = bench(lambda g, a: g.cheb_pair_nv(a)[1], gop, x, reps=args.reps)
    print(f"gop.cheb_pair_nv:                     {t*1e3:7.3f} ms", flush=True)

    def pair_min(a, m):
        t1 = jax.lax.dot_general(a, m, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16)
        t2 = jax.lax.dot_general(t1, 2.0 * m, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        t2 = (t2 - a.astype(jnp.float32)).astype(jnp.bfloat16)
        return t1, t2

    t = bench(lambda a, m: pair_min(a, m)[1], x, mat_t, reps=args.reps)
    print(f"pair rewrite (matT, folded 2x, one f32 chain): {t*1e3:7.3f} ms",
          flush=True)

    # combined single matmul for both applications: [G; 2G^2 - I] stacked
    m2 = jnp.concatenate([mat_t, 2.0 * (mat_t @ mat_t)
                          - jnp.eye(vp, dtype=jnp.bfloat16)], axis=1)

    def pair_onedot(a, mm):
        y = jax.lax.dot_general(a, mm, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y[:, :vp].astype(jnp.bfloat16), y[:, vp:].astype(jnp.bfloat16)

    t = bench(lambda a, mm: pair_onedot(a, mm)[1], x, m2, reps=args.reps)
    print(f"pair as ONE [N,V]@[V,2V] dot (G2 precomputed): {t*1e3:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
