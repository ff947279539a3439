#!/usr/bin/env python
"""1M-vertex single-chip step: pack/block-size and LN-param-dtype A/B.

Measures the full training step (fused blocks + ELL aggregation + Lion
bf16 momentum + minimal remat) for:
  - ELL bs=256 pack (the bench default; 3.1 GiB int8 at 1M)
  - ELL bs=128 pack (~half the pack bytes -> half the H2D transfer and
    half the per-apply pack stream)
  - the better of those with ln_param_dtype=bf16 (VERDICT r4 #7)
Prints step ms + device peak memory per variant. Packs are cached under
data/.bench_cache (host-side arrays; H2D through the tunneled runtime is
~34 MB/s, so pack bytes are the dominant prep cost).
"""

import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_pack(n_vertex: int, bs: int):
    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.packing import pack_ell_nv
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering

    cache = os.path.join(ROOT, "data", ".bench_cache",
                         f"ell_v{n_vertex}_k8_s0_bs{bs}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["data"], z["cols"], z["counts"], z["scales"], int(z["nnz"])
    t0 = time.time()
    adj = random_road_graph(n_vertex, k_neighbors=8, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    data, cols, counts, scales = pack_ell_nv(art.matrix, block_size=bs,
                                             quantize=True)
    log(f"[pack bs={bs}] built in {time.time() - t0:.0f}s, "
        f"{data.nbytes / 2**30:.2f} GiB")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, data=data, cols=cols, counts=counts, scales=scales,
             nnz=int(art.matrix.nnz))
    return data, cols, counts, scales, int(art.matrix.nnz)


def measure(n_vertex: int, bs: int, ln_dtype, batch=1, reps=3):
    from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
    from stgcn_tpu.nn.model import STGCN
    from stgcn_tpu.ops.graph_op import EllGraphOp
    from stgcn_tpu.train.optim import lion
    from stgcn_tpu.utils.timing import device_sync

    data, cols, counts, scales, nnz = get_pack(n_vertex, bs)
    t0 = time.time()
    gop = EllGraphOp(data=jnp.asarray(data), cols=jnp.asarray(cols),
                     counts=jnp.asarray(counts),
                     data_t=None, cols_t=None, counts_t=None,
                     scales=jnp.asarray(scales), scales_t=None,
                     n_vertex=n_vertex, block_size=bs)
    gop = gop.replace(data_t=gop.data, cols_t=gop.cols, counts_t=gop.counts,
                      scales_t=gop.scales)
    log(f"[bs={bs}] pack on device {time.time() - t0:.0f}s "
        f"({data.nbytes / 2**30:.2f} GiB)")
    model = STGCN(n_his=12, dtype=jnp.bfloat16, remat=True,
                  ln_param_dtype=ln_dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 12, n_vertex, 1)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1], gop,
                        deterministic=True)["params"]
    tx = lion(1e-3, weight_decay=1e-3, mu_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(7)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, s, g, xx, r):
        def loss(pp):
            pred = fused_sparse_forward(pp, xx, g, model,
                                        deterministic=False, rng=r,
                                        remat_policy="minimal")
            return jnp.mean(pred.astype(jnp.float32) ** 2)
        l, grads = jax.value_and_grad(loss)(p)
        up, s2 = tx.update(grads, s, p)
        return optax.apply_updates(p, up), s2, l

    p = jax.tree.map(jnp.copy, params)
    s = tx.init(p)
    t0 = time.time()
    p, s, l = step(p, s, gop, x, key)
    device_sync(l)
    log(f"[bs={bs} ln={ln_dtype.__name__}] compile+first "
        f"{time.time() - t0:.0f}s loss={float(l):.4f}")
    t0 = time.time()
    for _ in range(reps):
        p, s, l = step(p, s, gop, x, key)
    device_sync(l)
    dt = (time.time() - t0) / reps
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2**30
    log(f"[bs={bs} ln={ln_dtype.__name__}] {dt * 1e3:.1f} ms/step "
        f"peak {peak:.2f} GiB")
    return {"bs": bs, "ln": ln_dtype.__name__, "step_ms": dt * 1e3,
            "peak_gib": peak, "pack_gib": data.nbytes / 2**30}


def main():
    out = []
    for bs, ln in ((256, jnp.float32), (128, jnp.float32),
                   (128, jnp.bfloat16), (256, jnp.bfloat16)):
        try:
            out.append(measure(1_000_000, bs, ln))
        except Exception as e:
            log(f"[bs={bs} ln={ln.__name__}] FAILED {type(e).__name__}: {e}")
            out.append({"bs": bs, "ln": ln.__name__,
                        "error": str(e)[:200]})
        print(json.dumps(out[-1]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
