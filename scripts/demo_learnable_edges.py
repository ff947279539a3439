#!/usr/bin/env python
"""Learnable edge weights at 100k vertices (VERDICT r2 item 6 / SURVEY
§2.11 item 2): differentiate the full fused training step THROUGH the
banded slab values and take a few optimizer steps on them.

The slab gradient is the band-sampled SDDMM, computed as a scan over
block rows (`kernels/banded_spmm.banded_sddmm_scan`,
`kernels/banded_nv._nv_dslabs`) — one ``[w, n]`` window at a time, so no
``[nbr, w, n]`` temporary (~10 GB at 1M vertices) is ever materialized.
Correctness of the slab gradients vs dense autodiff is covered by
tests/test_kernels.py::{test_cheb_pair_slab_grads_match_dense,
test_nv_slab_gradient_matches_dense}; this script demonstrates the
capability at BASELINE configs[3] scale.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--lr_edges", type=float, default=1e-4)
    args = ap.parse_args()

    import dataclasses

    import optax

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
    from stgcn_tpu.nn.model import STGCN
    from stgcn_tpu.ops.graph_op import make_graph_op
    from stgcn_tpu.utils.timing import device_sync

    v, b = args.vertices, args.batch
    t0 = time.time()
    adj = random_road_graph(v, k_neighbors=8, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = make_graph_op(art, "banded", banded_block_size=256,
                        dtype=jnp.bfloat16, nv=True)
    model = STGCN(n_his=12, dtype=jnp.bfloat16, remat=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 12, v, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, v)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1], gop,
                        deterministic=True)["params"]
    print(f"prep {time.time()-t0:.1f}s  slabs_nv {gop.slabs_nv.shape} "
          f"{gop.slabs_nv.dtype}", flush=True)

    tx = optax.adamw(1e-3, weight_decay=1e-3)
    tx_edges = optax.sgd(args.lr_edges)
    opt_state = tx.init(params)
    edge_state = tx_edges.init(gop.slabs_nv.astype(jnp.float32))
    key = jax.random.PRNGKey(7)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def step(params, slabs_f32, opt_state, edge_state, g, xx, yy, r):
        def loss(p, slabs):
            # both orientations of the forward pack move together; the
            # transpose pack (= the same array for symmetric GSOs) is
            # VJP-auxiliary data, not an independent function of A
            g2 = g.replace(slabs_nv=slabs.astype(jnp.bfloat16),
                           slabs_nv_t=slabs.astype(jnp.bfloat16))
            pred = fused_sparse_forward(p, xx, g2, model,
                                        deterministic=False, rng=r)
            return jnp.mean((pred.reshape(pred.shape[0], -1) - yy) ** 2)

        l, (gp, gs) = jax.value_and_grad(loss, argnums=(0, 1))(
            params, slabs_f32)
        up, opt_state = tx.update(gp, opt_state, params)
        params = optax.apply_updates(params, up)
        upe, edge_state = tx_edges.update(gs, edge_state)
        slabs_f32 = optax.apply_updates(slabs_f32, upe)
        gnorm = jnp.sqrt(sum(jnp.sum(t.astype(jnp.float32) ** 2)
                             for t in jax.tree.leaves(gs)))
        return params, slabs_f32, opt_state, edge_state, l, gnorm

    slabs_f32 = gop.slabs_nv.astype(jnp.float32)
    losses = []
    for i in range(args.steps):
        t0 = time.time()
        params, slabs_f32, opt_state, edge_state, l, gn = step(
            params, slabs_f32, opt_state, edge_state, gop, x, y, key)
        device_sync(l)
        losses.append(float(l))
        print(f"step {i}: loss {float(l):.5f}  |dL/dslabs| {float(gn):.4e} "
              f" ({time.time()-t0:.1f}s)", flush=True)
    assert np.isfinite(losses).all() and float(gn) > 0.0
    print("learnable-edge demo OK: finite loss, nonzero slab gradients, "
          "no O(nbr*w*n) temporary", flush=True)


if __name__ == "__main__":
    main()
