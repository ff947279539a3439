"""Edges/s scaling-efficiency harness (BASELINE: measured at 1 chip,
1 host, N>=2 hosts; target >=80% on a 2-host slice).

Measures the vertex-partitioned SpMM on meshes of increasing
``graph``-axis size over the same synthetic road graph, and reports
``efficiency(P) = t(1) / t(P) / P`` — the fraction of perfect linear
scaling retained.

Two operators (``--op``):

- ``banded`` (default) — per-shard banded slab packs with boundary-only
  halo exchange (:class:`stgcn_tpu.dist.BandedShardedGraphOp`): per-shard
  communication is ``2·halo·N`` bytes regardless of shard count. This is
  the only representation that reaches the 100k/1M-vertex BASELINE
  configs (the dense ring needs O(V²/P) memory per shard).
- ``ring`` — the dense row-block ring (kept for comparison at small V).

``--quantize`` packs int8 slabs (per-row output scales) — required at the
1M-vertex scale where bf16 slabs exceed HBM.

With one chip per shard the exchange rides ICI (intra-slice) or DCN
(multi-host via ``jax.distributed``); the harness is topology-agnostic.
On this dev environment only one physical TPU chip exists, so the
multi-device path is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count``): those numbers check the
measurement path and partitioned-kernel correctness, not silicon speed.

Run: ``python -m stgcn_tpu.bench.scaling [--vertices 100000]
[--parts 1 2 4 8] [--op banded|ring] [--quantize]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time


# Nominal v5p per-chip numbers for the roofline-style scaling projection
# (docs/OVERLAP.md "Projected efficiency"): HBM bandwidth, and the
# bandwidth a nearest-neighbor halo exchange sees per direction — one ICI
# link along the partition axis intra-slice, the host NIC share for the
# inter-host (DCN) hop. Derated by the fractions the kernels/collectives
# actually achieve (HBM: our measured single-chip roofline fraction).
V5P_HBM = 2765e9
V5P_ICI_LINK = 90e9   # one-way per-link
DCN_PER_HOST = 25e9   # ~200 Gbps NIC
HBM_FRAC = 0.73       # measured banded-SpMM roofline fraction (BENCH r1-r3)
LINK_FRAC = 0.8


def project_efficiency(interior_bytes_per_shard: float,
                       comm_bytes_per_shard: float) -> dict:
    """Roofline-style scaling projection for a v5p shard (VERDICT r3 #6).

    ``t_c`` = per-shard interior kernel time (HBM-bound: slab + x + y
    bytes at the measured roofline fraction of v5p HBM). ``t_m`` = halo
    exchange time (``comm_bytes_per_shard`` counts both directions; the
    two directions ride distinct links concurrently, so the wire time is
    half the total over one derated link). The overlap schedule
    (docs/OVERLAP.md: interior aggregation is exchange-independent) hides
    ``min(t_c, t_m)``:

        efficiency_overlap = t_c / max(t_c, t_m)
        efficiency_serial  = t_c / (t_c + t_m)      (no-overlap bound)

    Emitted per P for both ICI (intra-slice) and DCN (host boundary)
    transports; the BASELINE >=80% 2-host target compares against the
    DCN overlap number.
    """
    t_c = interior_bytes_per_shard / (HBM_FRAC * V5P_HBM)
    out = {}
    for name, bw in (("ici", LINK_FRAC * V5P_ICI_LINK),
                     ("dcn", LINK_FRAC * DCN_PER_HOST)):
        t_m = (comm_bytes_per_shard / 2) / bw
        out[f"t_comm_{name}_us"] = t_m * 1e6
        out[f"projected_efficiency_{name}"] = t_c / max(t_c, t_m)
        out[f"projected_efficiency_{name}_serial"] = t_c / (t_c + t_m)
    out["t_interior_us"] = t_c * 1e6
    # headline field: ICI overlap projection (intra-slice scaling)
    out["projected_efficiency"] = out["projected_efficiency_ici"]
    return out


def measure_spmm_scaling(n_vertex: int = 100_000, n_feat: int = 128,
                         parts: tuple[int, ...] = (1, 2, 4, 8),
                         reps: int = 30, seed: int = 0, op: str = "banded",
                         quantize: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.dist import (banded_sharded_graph_op, make_mesh,
                                sharded_graph_op)
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.utils.timing import device_sync

    art = build_gso(random_road_graph(n_vertex, k_neighbors=8, seed=seed),
                    "sym_norm_lap", cheb=True)
    nnz = art.matrix.nnz
    # on a CPU host the virtual devices share a couple of cores, so wall
    # time measures nothing about chips — mark it so readers (and the
    # bench JSON) can't mistake the numbers for silicon scaling
    time_valid = jax.default_backend() == "tpu"
    # the same feature rows at every P (padding differs per partition), so
    # sharded results are directly comparable against the first P measured
    x_rows = np.random.default_rng(1).standard_normal(
        (n_vertex, n_feat)).astype(np.float32)

    results = {}
    base = None
    y_base = None
    for p in parts:
        if p > len(jax.devices()):
            print(f"[scaling] skip P={p} (only {len(jax.devices())} devices)",
                  file=sys.stderr)
            continue
        mesh = make_mesh(data=1, graph=p)
        extra = {}
        if op == "banded":
            gop, part = banded_sharded_graph_op(art, mesh, quantize=quantize)
            extra["halo_rows"] = gop.halo
            extra["comm_bytes_per_shard"] = (
                2 * gop.halo * n_feat * jnp.dtype(jnp.float32).itemsize)
            extra["interior_frac"] = ((gop.interior[1] - gop.interior[0])
                                      / gop.slabs.shape[1])
            # v5p projection from the pack's own byte counts: per-shard
            # slab bytes + local x rows + local y rows (f32 here)
            slab_bytes = (gop.slabs.size // gop.slabs.shape[0]
                          ) * gop.slabs.dtype.itemsize
            xy_rows = gop.n_vertex_pad // p
            interior_bytes = slab_bytes + 2 * xy_rows * n_feat * 4
            extra.update(project_efficiency(
                interior_bytes, extra["comm_bytes_per_shard"]))
        else:
            gop, part = sharded_graph_op(art, mesh)
            s = gop.blocks.shape[1]
            extra["comm_bytes_per_shard"] = (
                (p - 1) * s * n_feat * jnp.dtype(jnp.float32).itemsize)
        # the RCM permutation is deterministic on the same matrix, so
        # part.perm is identical at every P — x_rows are "already
        # permuted" features and outputs compare row-for-row across P
        pad = gop.n_vertex_pad - n_vertex
        x = jnp.asarray(np.pad(x_rows, ((0, pad), (0, 0))))
        x = jax.device_put(x, NamedSharding(mesh, P("graph", None)))

        # the operator is a jit ARGUMENT (pytree), not a closure constant:
        # captured slab packs blow the remote-compile payload limit
        f = jax.jit(lambda g, xx: g(xx))
        y = f(gop, x)
        device_sync(y)
        t0 = time.time()
        for _ in range(reps):
            y = f(gop, x)
        device_sync(y)
        dt = (time.time() - t0) / reps
        eps = nnz / dt
        if base is None:
            base = (p, dt)
        eff = (base[1] / dt) * (base[0] / p)
        # structural correctness: the same output rows at every P
        y_host = np.asarray(jax.device_get(y))[:n_vertex]
        if y_base is None:
            y_base = y_host
            extra["max_abs_diff_vs_base"] = 0.0
            extra["allclose_vs_base"] = True
        else:
            diff = float(np.max(np.abs(y_host - y_base)))
            ref = float(np.max(np.abs(y_base)))
            extra["max_abs_diff_vs_base"] = diff
            extra["allclose_vs_base"] = bool(diff <= 1e-4 * max(ref, 1.0))
        results[p] = {"time_s": dt, "edges_per_s": eps, "efficiency": eff,
                      "time_valid": time_valid, **extra}
        print(f"[scaling] P={p}: {dt*1e3:8.3f} ms  {eps:.3e} edges/s  "
              f"efficiency {eff:.2f}  {extra}", file=sys.stderr)
        del gop, x, y, y_host  # free this P's pack before building the next
    return {"n_vertex": n_vertex, "nnz": int(nnz), "n_feat": n_feat,
            "op": op, "quantize": quantize,
            "backend": jax.default_backend(),
            "device_kind": jax.devices()[0].device_kind,
            "time_valid": time_valid,
            "invalid_on_cpu": ["time_s", "edges_per_s", "efficiency"],
            "parts": {str(k): v for k, v in results.items()}}


def measure_ring_spmm(n_vertex: int = 100_000, n_feat: int = 128,
                      parts: tuple[int, ...] = (1, 2, 4, 8),
                      reps: int = 30, seed: int = 0) -> dict:
    """Back-compat wrapper: the dense ring measurement."""
    return measure_spmm_scaling(n_vertex, n_feat, parts, reps, seed,
                                op="ring")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=100_000)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--parts", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--op", choices=["banded", "ring"], default="banded")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="pin the jax platform in-process (a sitecustomize "
                         "may force a TPU plugin; env vars don't win)")
    ap.add_argument("--devices", type=int, default=None,
                    help="virtual CPU device count (with --platform cpu)")
    args = ap.parse_args(argv)
    if args.devices:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    out = measure_spmm_scaling(args.vertices, args.feat, tuple(args.parts),
                               args.reps, op=args.op, quantize=args.quantize)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
