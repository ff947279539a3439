#!/usr/bin/env python
"""Round-5 probe: the 100k graph aggregation at training widths.

Measures, dispatch-amortized (timeit_chained) on the real chip:
  - banded bf16 pair fwd / chain bwd (the production r4 path)
  - banded int8 pair fwd / chain bwd (VERDICT r4 next #4a)
  - ELL bf16 / int8 pair fwd (two applications — no wavefront)
and prints each pack's geometry (w, nbr, bytes) so the HBM-vs-MXU
bound is decidable from the numbers.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=100_000)
    ap.add_argument("--n", type=int, default=1280)  # B*T1*c1 = 8*10*16
    ap.add_argument("--inner", type=int, default=8)
    args = ap.parse_args()

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.ops.graph_op import make_graph_op
    from stgcn_tpu.utils.timing import timeit_chained

    v, n = args.vertices, args.n
    t0 = time.time()
    adj = random_road_graph(v, k_neighbors=8, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    nnz = art.matrix.nnz
    print(f"prep {time.time()-t0:.1f}s nnz={nnz}", flush=True)

    rng = np.random.default_rng(0)

    def run(label, gop):
        x = jnp.asarray(rng.standard_normal((n, gop.v_pad)), jnp.bfloat16)
        pair = jax.jit(lambda xx, g: g.cheb_pair_nv(xx))
        t_pair = timeit_chained(lambda xx, g: pair(xx, g)[0], x, gop,
                                inner=args.inner)
        # fwd+bwd: QUADRATIC loss so the cotangents depend on x (a linear
        # loss makes dx constant — the whole chain hoists out of the
        # timing scan); grads wrt x only, so dslabs is DCE'd exactly as
        # in the production step (params-only grads)
        def pair_loss(xx, g):
            t1, t2 = g.cheb_pair_nv(xx)
            return (jnp.sum(t1.astype(jnp.float32) ** 2)
                    + jnp.sum(t2.astype(jnp.float32) ** 2))
        grad = jax.jit(jax.grad(pair_loss))
        t_chain = timeit_chained(lambda xx, g: grad(xx, g), x, gop,
                                 inner=args.inner)
        print(f"{label:28s} pair {t_pair*1e3:7.2f} ms | "
              f"pair fwd+bwd(grad) {t_chain*1e3:7.2f} ms", flush=True)

    # banded bf16 (production r4)
    t0 = time.time()
    gb = make_graph_op(art, "banded", banded_block_size=256,
                       dtype=jnp.bfloat16, nv=True)
    w = gb.slabs_nv.shape[1]
    by = gb.slabs_nv.size * gb.slabs_nv.dtype.itemsize
    print(f"banded bf16: pack {time.time()-t0:.0f}s nbr={gb.slabs_nv.shape[0]}"
          f" w={w} v_pad={gb.v_pad} slab_bytes={by/1e9:.2f}GB "
          f"fill={by/2/nnz:.0f}x", flush=True)
    run("banded bf16", gb)
    del gb

    t0 = time.time()
    gi = make_graph_op(art, "banded_int8", banded_block_size=256, nv=True)
    by = gi.slabs_nv.size
    print(f"banded int8: pack {time.time()-t0:.0f}s "
          f"slab_bytes={by/1e9:.2f}GB", flush=True)
    run("banded int8", gi)
    del gi

    for kind, bs in (("ell", 256), ("ell_int8", 256), ("ell", 128)):
        t0 = time.time()
        ge = make_graph_op(art, kind, dtype=jnp.bfloat16,
                           banded_block_size=bs)
        by = ge.data.size * ge.data.dtype.itemsize
        tiles = int(np.asarray(ge.counts).sum())
        flops = 4 * tiles * bs * bs * n  # pair = 2 apps
        print(f"{kind}/bs{bs}: pack {time.time()-t0:.0f}s "
              f"nbr={ge.data.shape[0]} max_b={ge.data.shape[1]} "
              f"tiles={tiles} bytes={by/1e9:.3f}GB "
              f"pair_mxu_floor={flops/197e12*1e3:.2f}ms", flush=True)
        run(f"{kind}/bs{bs}", ge)
        del ge


if __name__ == "__main__":
    main()
