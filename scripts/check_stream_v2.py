#!/usr/bin/env python
"""Quick on-TPU check of the block-ring streaming pair/chain kernels."""
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
from stgcn_tpu.kernels import banded_spmm as bk
from stgcn_tpu.ops.graph_op import banded_graph_op
from stgcn_tpu.utils.timing import device_sync


def check(v, bs, n, dtype, quantize, seed=0):
    adj = random_road_graph(v, k_neighbors=8, seed=seed)
    import dataclasses
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = banded_graph_op(art, dtype=dtype, block_size=bs, quantize=quantize)
    assert gop.pair_stream, "pack not stream-safe?!"
    rng = np.random.default_rng(1)

    def randv():
        # contract: rows past n_vertex are zero padding (cheb_pair_vn pads)
        a = rng.standard_normal((gop.v_pad, n))
        a[gop.n_vertex:] = 0.0
        return jnp.asarray(a, dtype)

    x = randv()

    t1, t2 = jax.jit(bk.banded_cheb_pair_stream)(
        gop.slabs, gop.lo, x, scales=gop.scales)
    # oracle: two reference applications with dense slab math
    s = gop.slabs if gop.scales is None else \
        gop.slabs.astype(jnp.float32) * gop.scales[:, :, None]
    r1 = bk.banded_spmm_reference(s, gop.lo, x, block_size=bs)
    r1 = jnp.pad(r1, ((0, gop.v_pad - r1.shape[0]), (0, 0))) \
        if r1.shape[0] < gop.v_pad else r1[:gop.v_pad]
    r2 = 2.0 * bk.banded_spmm_reference(s, gop.lo, r1, block_size=bs)
    r2 = (jnp.pad(r2, ((0, gop.v_pad - r2.shape[0]), (0, 0)))
          if r2.shape[0] < gop.v_pad else r2[:gop.v_pad]) - x
    e1 = float(jnp.max(jnp.abs(t1.astype(jnp.float32) - r1)))
    e2 = float(jnp.max(jnp.abs(t2.astype(jnp.float32) - r2)))
    sc1 = float(jnp.max(jnp.abs(r1))) or 1.0
    sc2 = float(jnp.max(jnp.abs(r2))) or 1.0
    print(f"v={v} bs={bs} n={n} {dtype.__name__} q={quantize}: "
          f"pair err {e1/sc1:.2e} {e2/sc2:.2e}", flush=True)
    assert e1 / sc1 < 3e-2 and e2 / sc2 < 3e-2, "pair mismatch"

    # chain: (dt1, dx) = (g1 + 2 A^T g2, A^T dt1 - g2)
    g1 = randv()
    g2 = randv()
    dt1, dx = jax.jit(bk.banded_chain_stream)(
        gop.slabs_t, gop.lo_t, g2, g1, scales_t=gop.scales_t)
    st = gop.slabs_t if gop.scales_t is None else \
        gop.slabs_t.astype(jnp.float32) * gop.scales_t[:, :, None]

    def fit(y):
        return jnp.pad(y, ((0, gop.v_pad - y.shape[0]), (0, 0))) \
            if y.shape[0] < gop.v_pad else y[:gop.v_pad]

    rdt1 = g1.astype(jnp.float32) + 2.0 * fit(
        bk.banded_spmm_reference(st, gop.lo_t, g2, block_size=bs))
    rdx = fit(bk.banded_spmm_reference(
        st, gop.lo_t, rdt1.astype(dtype), block_size=bs)) - g2
    e3 = float(jnp.max(jnp.abs(dt1.astype(jnp.float32) - rdt1)))
    e4 = float(jnp.max(jnp.abs(dx.astype(jnp.float32) - rdx)))
    sc3 = float(jnp.max(jnp.abs(rdt1))) or 1.0
    sc4 = float(jnp.max(jnp.abs(rdx))) or 1.0
    print(f"   chain err {e3/sc3:.2e} {e4/sc4:.2e}", flush=True)
    assert e3 / sc3 < 3e-2 and e4 / sc4 < 3e-2, "chain mismatch"

    # timing at training width
    f = jax.jit(lambda xx: bk.banded_cheb_pair_stream(
        gop.slabs, gop.lo, xx, scales=gop.scales))
    out = f(x); device_sync(out)
    t0 = time.time()
    reps = 30
    for _ in range(reps):
        out = f(x)
    device_sync(out)
    dt = (time.time() - t0) / reps
    nbr, _, w = gop.slabs.shape
    gb = (gop.slabs.size * gop.slabs.dtype.itemsize
          + 3 * x.size * x.dtype.itemsize) / 1e9
    print(f"   stream pair: {dt*1e3:6.2f} ms  ({gb/dt:.0f} GB/s on "
          f"slab+x+2out bytes, w={w})", flush=True)


if __name__ == "__main__":
    check(3000, 256, 256, jnp.bfloat16, False)       # tiny, multiple blocks
    check(3000, 256, 256, jnp.bfloat16, True)        # tiny int8
    check(20000, 512, 1280, jnp.bfloat16, False)     # training width
    check(20000, 256, 640, jnp.float32, False)       # f32, odd width
