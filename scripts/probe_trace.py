#!/usr/bin/env python
"""Capture a jax.profiler trace of a callable at configs[2] shapes and
print the top device ops by total duration (parses the chrome trace the
profiler writes — no tensorboard needed).

Usage: python scripts/probe_trace.py [--what vf|unfused|head0] [--dir /tmp/tr]
"""

import argparse
import dataclasses
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp


def run_traced(fn, args, trace_dir, reps=6):
    from stgcn_tpu.utils.timing import device_sync

    f = jax.jit(fn)
    out = f(*args)
    device_sync(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            out = f(*args)
        device_sync(out)


def top_ops(trace_dir, k=30):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", trace_dir)
        return
    f = max(files, key=os.path.getmtime)
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # keep complete events on device lanes (TensorFlow Op / XLA Ops)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dur = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        d = float(e.get("dur", 0.0))
        dur[name] += d
        cnt[name] += 1
        total += d
    print(f"trace {os.path.basename(f)}: {total/1e3:.2f} ms total device "
          f"time across {sum(cnt.values())} events")
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:k]:
        print(f"  {d/1e3:9.3f} ms  x{cnt[name]:4d}  {name[:110]}")

    # ---- fwd/bwd attribution (VERDICT r4 next #3): bucket device time by
    # the jax op_name in the event metadata — "transpose(jvp(...))" marks
    # the backward, a plain name the forward; "named" pallas/fusion source
    # lines identify the kernel family.
    buckets = defaultdict(float)
    classified = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        # skip the nested whole-module / per-rep envelope events — they
        # contain every op event and would double-count as "fwd ?"
        if name.startswith("jit_") or name.isdigit():
            continue
        a = e.get("args", {}) or {}
        meta = " ".join(str(v) for v in a.values()) + " " + e.get("name", "")
        d = float(e.get("dur", 0.0))
        direction = "bwd" if "transpose(jvp" in meta else \
            ("opt" if ("lion" in meta or "adamw" in meta
                       or "apply_updates" in meta) else "fwd")
        src = "?"
        mfile = [t for t in meta.replace('"', " ").split()
                 if ".py" in t and "site-packages" not in t]
        if mfile:
            src = os.path.basename(mfile[0].split("source_file=")[-1])
        elif "pallas" in meta or "custom-call" in meta:
            src = "custom-call"
        elif "fusion" in e.get("name", ""):
            src = "xla-fusion"
        elif "copy" in e.get("name", "") or "transpose" in e.get("name", ""):
            src = "copy/transpose"
        buckets[(direction, src)] += d
        classified += d
    if classified:
        print(f"\nfwd/bwd attribution ({classified/1e3:.2f} ms classified):")
        for (direction, src), d in sorted(buckets.items(),
                                          key=lambda kv: -kv[1])[:20]:
            print(f"  {d/1e3:9.3f} ms  {direction:3s}  {src}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="vf")
    ap.add_argument("--dir", default="/tmp/jax_trace")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        top_ops(args.dir)
        return

    from stgcn_tpu.data.datasets import load_adj
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
    from stgcn_tpu.nn.model import STGCN
    from stgcn_tpu.ops import dense_graph_op

    if args.what.endswith("-100k"):
        from stgcn_tpu.data.synthetic import random_road_graph
        from stgcn_tpu.ops.graph_op import make_graph_op

        v = 100_000
        adj = random_road_graph(v, k_neighbors=8, seed=0)
        art = build_gso(adj, "sym_norm_lap", cheb=True)
        art = dataclasses.replace(
            art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
        gop = make_graph_op(art, "banded", banded_block_size=256,
                            dtype=jnp.bfloat16, nv=True)
        model = STGCN(n_his=12, dtype=jnp.bfloat16, remat=True)
        b = 8
        args.what = args.what[: -len("-100k")]
        args.reps = min(args.reps, 4)
    else:
        adj, v = load_adj("pems-bay", os.path.join(ROOT, "data"))
        art = build_gso(adj, "sym_norm_lap", cheb=True)
        art = dataclasses.replace(
            art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
        gop = dense_graph_op(art, dtype=jnp.bfloat16)
        model = STGCN(n_his=12, dtype=jnp.bfloat16)
        b = 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 12, v, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1], gop,
                        deterministic=True)["params"]

    # the graph operator is always a jit ARGUMENT (pytree): captured slab
    # packs as closure constants blow the remote-compile payload limit
    if args.what == "vf":
        fn = lambda g, p, xx: fused_sparse_forward(p, xx, g, model,
                                                   deterministic=True)
        fargs = (gop, params, x)
    elif args.what == "unfused":
        fn = lambda g, p, xx: model.apply({"params": p}, xx, g,
                                          deterministic=True)
        fargs = (gop, params, x)
    elif args.what in ("step-vf", "step-unfused"):
        import optax

        tx = optax.adamw(1e-3, weight_decay=1e-3)
        key = jax.random.PRNGKey(7)
        s0 = tx.init(params)
        vf = args.what == "step-vf"

        def fn(g, p, s, xx, r):
            def loss(pp):
                if vf:
                    pred = fused_sparse_forward(pp, xx, g, model,
                                                deterministic=False, rng=r)
                else:
                    pred = model.apply({"params": pp}, xx, g,
                                       deterministic=False,
                                       rngs={"dropout": r})
                return jnp.mean(pred.astype(jnp.float32) ** 2)

            l, grads = jax.value_and_grad(loss)(p)
            up, s2 = tx.update(grads, s, p)
            return optax.apply_updates(p, up), s2, l

        fargs = (gop, params, s0, x, key)
    else:
        raise SystemExit(f"unknown --what {args.what}")
    run_traced(fn, fargs, args.dir, reps=args.reps)
    top_ops(args.dir)


if __name__ == "__main__":
    main()
