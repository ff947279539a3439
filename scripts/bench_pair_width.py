#!/usr/bin/env python
"""Cheb-pair dispatch check at training widths: single application vs
the fused pair on the same banded pack, across N."""

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

from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
from stgcn_tpu.ops.graph_op import make_graph_op
from stgcn_tpu.utils.timing import device_sync


def bench(fn, args, reps=30):
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
    ap.add_argument("--block-size", type=int, default=512)
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[128, 1280, 2560])
    args = ap.parse_args()

    adj = random_road_graph(args.vertices, k_neighbors=8, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = make_graph_op(art, "banded", banded_block_size=args.block_size,
                        dtype=jnp.bfloat16)
    print(f"slabs {gop.slabs.shape} pair_safe={gop.pair_safe} "
          f"pair_stream={gop.pair_stream}", flush=True)
    rng = np.random.default_rng(1)

    single = jax.jit(lambda g, x: g.apply_vn(x))
    pair = jax.jit(lambda g, x: g.cheb_pair_vn(x))

    for n in args.widths:
        x = jnp.asarray(rng.standard_normal((gop.v_pad, n)) * 0.1,
                        jnp.bfloat16)
        t1 = bench(single, (gop, x))
        tp = bench(pair, (gop, x))
        print(f"N={n:5d}: single {t1*1e3:7.2f} ms   pair {tp*1e3:7.2f} ms "
              f"(ratio {tp/t1:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
