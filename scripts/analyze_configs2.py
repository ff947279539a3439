#!/usr/bin/env python
"""BASELINE configs[2] roofline analysis (VERDICT r2 item 4b): is the
unfused XLA bf16 forward at PEMS-BAY B=512 actually bound, and by what?

Computes, for the exact config (V=325, B=512, n_his=12, channel plan
[[1],[64,16,64],[64,16,64],[128,128],[1]]):

  - MXU flop count and time at peak;
  - the *minimum* HBM traffic under perfect fusion (each stage boundary
    tensor crosses HBM once each way; intra-stage elementwise fused);
  - the VPU transcendental budget of the gates (σ per GLU gate), priced
    with a measured per-element σ cost;
  - the measured unfused bf16 forward, against the composite bound.

Prints a JSON summary for BASELINE.md.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

V, B, T0 = 325, 512, 12
BF = 2  # bytes
HBM = 819e9     # v5e
MXU = 197e12    # v5e bf16


def model_counts():
    """Per-stage flops + minimal boundary traffic of the forward."""
    flops = 0
    bytes_min = 0
    t = T0
    c_in = 1
    stages = []

    def stage(name, fl, rd, wr):
        nonlocal flops, bytes_min
        flops += fl
        bytes_min += rd + wr
        stages.append((name, fl, rd + wr))

    for blk in range(2):
        t1, t2 = t - 2, t - 4
        # tconv1 (+gate fused): read in, write a1 [B,t1,V,64]
        g1 = 128
        stage(f"b{blk}.tconv1+gate",
              2 * B * t1 * V * (3 * c_in) * g1,
              B * t * V * c_in * BF, B * t1 * V * 64 * BF)
        # align 64->16 + cheb chain (dense G) + contraction + residual+relu
        fl = 2 * B * t1 * V * 64 * 16            # align
        fl += 2 * 2 * B * t1 * 16 * V * V        # two G applications
        fl += 3 * 2 * B * t1 * V * 16 * 16       # contraction
        stage(f"b{blk}.graph",
              fl, B * t1 * V * 64 * BF, B * t1 * V * 16 * BF)
        # tconv2 (+gate) + LN + dropout: read h16, write out [B,t2,V,64]
        stage(f"b{blk}.tconv2+gate+ln",
              2 * B * t2 * V * (3 * 16) * 128,
              B * t1 * V * 16 * BF, B * t2 * V * 64 * BF)
        t, c_in = t2, 64
    # output block: tconv(Ko=4 collapse, 64->256 gated) + LN + fc1 + fc2
    stage("out.tconv+gate", 2 * B * 1 * V * (4 * 64) * 256,
          B * 4 * V * 64 * BF, B * 1 * V * 128 * BF)
    stage("out.fc", 2 * B * V * (128 * 128 + 128),
          B * V * 128 * BF, B * V * 1 * 4)
    # gates: sigmoid count (GLU: one σ per gated output element)
    sig = (B * 10 * V * 64 + B * 8 * V * 64) * 2 + B * 1 * V * 128
    return flops, bytes_min, sig, stages


def measure_sigma_cost():
    """Measured per-element σ cost (bf16 tanh-compose, production gate)."""
    from stgcn_tpu.utils.timing import device_sync

    n = 64 * 1024 * 1024
    x = jnp.ones((n,), jnp.bfloat16)
    f = jax.jit(lambda v: jnp.tanh(v * jnp.bfloat16(0.5)))
    out = f(x)
    device_sync(out)
    t0 = time.time()
    for _ in range(20):
        out = f(out)
    device_sync(out)
    dt = (time.time() - t0) / 20
    return dt / n


def measure_unfused_forward():
    from stgcn_tpu.cli.main import build_trainer
    from stgcn_tpu.train.loop import TrainConfig
    from stgcn_tpu.utils.timing import device_sync

    cfg = TrainConfig(batch_size=B, compute_dtype="bfloat16",
                      ckpt_dir="/tmp/cfg2_ck", dataset_name="pems-bay")
    tr = build_trainer(cfg, dataset="pems-bay",
                       data_root=os.path.join(ROOT, "data"),
                       graph_op_kind="dense")
    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, T0, V, 1)), jnp.float32)
    fwd = jax.jit(lambda p, g, xx: tr._apply_fn(g, p, xx, deterministic=True))
    y = fwd(tr.params, tr.gop, x)
    device_sync(y)
    t0 = time.time()
    for _ in range(50):
        y = fwd(tr.params, tr.gop, x)
    device_sync(y)
    return (time.time() - t0) / 50


def main():
    flops, bytes_min, sig, stages = model_counts()
    t_mxu = flops / MXU
    t_hbm = bytes_min / HBM
    sig_cost = measure_sigma_cost()
    t_gates = sig * sig_cost
    t_meas = measure_unfused_forward()
    # stages can overlap MXU/VPU/DMA; the composite bound is the max of
    # the three independent engines' serial demands
    bound = max(t_mxu, t_hbm, t_gates)
    out = {
        "config": f"PEMS-BAY V={V} B={B} bf16 forward",
        "mxu_flops": flops, "t_mxu_ms": t_mxu * 1e3,
        "hbm_bytes_min": bytes_min, "t_hbm_min_ms": t_hbm * 1e3,
        "sigma_count": sig, "sigma_cost_ns": sig_cost * 1e9,
        "t_gates_ms": t_gates * 1e3,
        "composite_bound_ms": bound * 1e3,
        "measured_unfused_ms": t_meas * 1e3,
        "bound_fraction": bound / t_meas,
        "stages": [(n, round(f / 1e9, 2), round(by / 1e6, 1))
                   for n, f, by in stages],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
