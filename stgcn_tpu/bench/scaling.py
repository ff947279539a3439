"""Edges/s scaling-efficiency harness (BASELINE: measured at 1 chip,
1 host, N>=2 hosts; target >=80% on a 2-host slice).

Measures the vertex-partitioned ring SpMM (`stgcn_tpu/dist/halo.py`) on
meshes of increasing ``graph``-axis size over the same synthetic road
graph, and reports ``efficiency(P) = t(1) / t(P) / P`` — the fraction of
perfect linear scaling retained. With one chip per shard the ring's
ppermute rides ICI (intra-slice) or DCN (multi-host via
``jax.distributed``); the harness itself is topology-agnostic.

On this dev environment only one physical TPU chip exists, so the
harness's multi-device path is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count``): the numbers there check the
*measurement path and partitioned-kernel correctness*, not silicon speed.

Run: ``python -m stgcn_tpu.bench.scaling [--vertices 100000] [--parts 1 2 4 8]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def measure_ring_spmm(n_vertex: int = 100_000, n_feat: int = 128,
                      parts: tuple[int, ...] = (1, 2, 4, 8),
                      reps: int = 30, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.dist import make_mesh, sharded_graph_op
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.utils.timing import device_sync

    art = build_gso(random_road_graph(n_vertex, k_neighbors=8, seed=seed),
                    "sym_norm_lap", cheb=True)
    nnz = art.matrix.nnz
    rng = np.random.default_rng(1)

    results = {}
    base = None
    for p in parts:
        if p > len(jax.devices()):
            print(f"[scaling] skip P={p} (only {len(jax.devices())} devices)",
                  file=sys.stderr)
            continue
        mesh = make_mesh(data=1, graph=p)
        gop, part = sharded_graph_op(art, mesh)
        x = jnp.asarray(
            rng.standard_normal((gop.n_vertex_pad, n_feat)).astype(np.float32))
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jax.device_put(x, NamedSharding(mesh, P("graph", None)))

        from stgcn_tpu.dist.halo import ring_spmm

        f = jax.jit(lambda b, xx, m=mesh: ring_spmm(b, xx, m))
        y = f(gop.blocks, x)
        device_sync(y)
        t0 = time.time()
        for _ in range(reps):
            y = f(gop.blocks, x)
        device_sync(y)
        dt = (time.time() - t0) / reps
        eps = nnz / dt
        if base is None:
            base = (p, dt)
        eff = (base[1] / dt) * (base[0] / p)
        results[p] = {"time_s": dt, "edges_per_s": eps, "efficiency": eff}
        print(f"[scaling] P={p}: {dt*1e3:8.3f} ms  {eps:.3e} edges/s  "
              f"efficiency {eff:.2f}", file=sys.stderr)
    return {"n_vertex": n_vertex, "nnz": int(nnz), "n_feat": n_feat,
            "backend": jax.default_backend(),
            "device_kind": jax.devices()[0].device_kind,
            "parts": {str(k): v for k, v in results.items()}}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=100_000)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--parts", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args(argv)
    out = measure_ring_spmm(args.vertices, args.feat, tuple(args.parts),
                            args.reps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
