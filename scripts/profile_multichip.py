#!/usr/bin/env python
"""Multi-chip halo-exchange overlap profiler (VERDICT r4 next #9).

docs/OVERLAP.md proves the *dependence structure* that lets XLA's
latency-hiding scheduler overlap the boundary-halo ``ppermute``s with
the interior aggregation, but the actual schedule can only be observed
on real multi-chip hardware. This script is the ready-to-run first
action for that hardware: it traces ``halo_banded_spmm`` applications
at P>=2 under ``jax.profiler`` and checks the ``collective-permute``
rows against the interior compute rows.

    python scripts/profile_multichip.py               # real devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/profile_multichip.py --parts 4 --vertices 8192
                                                      # virtual smoke test

Emits ONE JSON line on stdout:
  {"parts": P, "apply_ms": t, "permute_ms": tp, "overlapped_frac": f,
   "collective_events": n, ...}

``overlapped_frac`` is the fraction of collective-permute device time
whose wall interval is covered by concurrently-running compute events on
the same device lane — ~1.0 means the LHS hid the exchange behind the
interior matmul (docs/OVERLAP.md's claim); ~0.0 means it serialized.
On the virtual CPU mesh collectives don't lower to collective-permute
custom calls, so the smoke test only validates the harness end-to-end
(trace capture, parse, JSON emission) — expect ``collective_events: 0``
there.
"""

import argparse
import dataclasses
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _intervals_union(iv):
    """Total length of the union of [start, end) intervals."""
    total = 0.0
    last_end = None
    for s, e in sorted(iv):
        if last_end is None or s > last_end:
            total += e - s
            last_end = e
        elif e > last_end:
            total += e - last_end
            last_end = e
    return total


def analyze_trace(trace_dir):
    """Parse the newest chrome trace: per-device-lane collective-permute
    intervals vs compute intervals; how much permute time is covered."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        return {"error": f"no trace files under {trace_dir}"}
    f = max(files, key=os.path.getmtime)
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    coll = {}     # pid -> [(start, end)]
    compute = {}  # pid -> [(start, end)]
    coll_us = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "")
        ts, dur = float(e.get("ts", 0.0)), float(e.get("dur", 0.0))
        if "collective-permute" in name or "all-reduce" in name \
                or "all-gather" in name:
            coll.setdefault(e["pid"], []).append((ts, ts + dur))
            coll_us += dur
        elif dur > 0:
            compute.setdefault(e["pid"], []).append((ts, ts + dur))
    covered = 0.0
    for pid, ivs in coll.items():
        comp = sorted(compute.get(pid, []))
        for s, e in ivs:
            # union of compute time inside [s, e]
            clipped = [(max(s, cs), min(e, ce)) for cs, ce in comp
                       if ce > s and cs < e]
            covered += _intervals_union([(a, b) for a, b in clipped
                                         if b > a])
    return {
        "trace_file": os.path.basename(f),
        "collective_events": sum(len(v) for v in coll.values()),
        "permute_ms": round(coll_us / 1e3, 3),
        "overlapped_frac": round(covered / coll_us, 3) if coll_us else None,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=100_000)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--parts", type=int, default=0,
                    help="mesh size (default: all devices)")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--block-size", type=int, default=256)
    ap.add_argument("--dir", default="/tmp/mc_trace")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="pin the jax platform in-process (a sitecustomize "
                         "may force a TPU plugin; env vars don't win)")
    ap.add_argument("--devices", type=int, default=None,
                    help="virtual CPU device count (with --platform cpu)")
    args = ap.parse_args(argv)

    if args.devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.devices}").strip()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.dist.halo import banded_sharded_graph_op
    from stgcn_tpu.utils.timing import device_sync

    devs = jax.devices()
    p_n = args.parts or len(devs)
    if len(devs) < p_n:
        print(json.dumps({"error": f"need {p_n} devices, have {len(devs)}"}))
        return 1
    mesh = Mesh(np.array(devs[:p_n]).reshape(p_n), ("graph",))
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log(f"[mc] mesh {mesh.shape} on {devs[0].device_kind}")

    t0 = time.time()
    adj = random_road_graph(args.vertices, k_neighbors=8, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    gop, part = banded_sharded_graph_op(
        art, mesh, block_size=args.block_size, quantize=args.quantize,
        dtype=jnp.bfloat16)
    log(f"[mc] pack {time.time() - t0:.1f}s halo={gop.halo} rows/shard "
        f"(comm {2 * gop.halo * args.feat * 2 / 1024:.1f} KiB/shard/apply)")
    assert gop.halo > 0, "toy graph too small: no boundary exchange to profile"

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((gop.n_vertex_pad, args.feat)),
                    jnp.bfloat16),
        NamedSharding(mesh, P("graph", None)))
    apply_j = jax.jit(lambda g, xx: g.apply_vn(xx))
    y = apply_j(gop, x)
    device_sync(y)

    t0 = time.time()
    for _ in range(args.reps):
        y = apply_j(gop, y)
    device_sync(y)
    dt = (time.time() - t0) / args.reps
    log(f"[mc] apply {dt * 1e3:.2f} ms")

    with jax.profiler.trace(args.dir):
        for _ in range(args.reps):
            y = apply_j(gop, y)
        device_sync(y)

    res = analyze_trace(args.dir)
    res.update({"parts": p_n, "vertices": args.vertices,
                "feat": args.feat, "apply_ms": round(dt * 1e3, 3),
                "halo_rows": gop.halo,
                "device": devs[0].device_kind})
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
