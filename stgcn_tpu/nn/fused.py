"""Fused-kernel forward for the whole STGCN model.

A functional apply over the *same* flax param pytree the unfused
:class:`~stgcn_tpu.nn.model.STGCN` trains — checkpoints are interchangeable
between paths. Each ST-Conv block runs as one Pallas kernel
(:mod:`stgcn_tpu.kernels.fused_stblock`); the output head (`model/layers.py:
260-284`) stays in XLA — it is a short chain of matmuls that XLA fuses well,
and it runs once per step (time already collapsed to one frame).

Training-mode dropout inside the fused blocks uses the on-core PRNG (seeded
per block from the step rng), so trajectories differ bitwise from the
unfused path (as any two dropout-mask sources do) while matching in
distribution; deterministic-mode outputs match the unfused model to float
tolerance (tested in tests/test_fused.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from stgcn_tpu.kernels.fused_stblock import fused_st_block
from stgcn_tpu.nn.model import STGCN


def _output_block_apply(params: dict, x: jax.Array, v_true: int, *,
                        act_func: str, droprate: float, deterministic: bool,
                        rng: jax.Array | None, prec=None,
                        dtype=None) -> jax.Array:
    """The 'TNFF' head in plain jnp (`model/layers.py:260-284`):
    time-collapsing temporal gate → LN([V, C]) → fc1 → relu → dropout → fc2.
    ``x``: [B, Ko, V, c]. ``dtype``: compute dtype for the conv/gate and
    fc matmuls (LN statistics stay f32) — mirrors the flax OutputBlock's
    mixed-precision casts (`nn/layers.py:287-303`); leaving it None runs
    the whole head in the params' dtype (f32), which at B=512 costs
    ~1.8 ms of [B, V, 256] f32 traffic the unfused path does not pay."""
    cdt = dtype or jnp.float32
    ck = params["tmp_conv1"]["causal_conv"]["kernel"]   # [ko, 1, c, g]
    cb = params["tmp_conv1"]["causal_conv"]["bias"]
    ko, _, c_in, g = ck.shape
    gated = act_func in ("glu", "gtu")
    c0 = g // 2 if gated else g

    x = x.astype(cdt)
    ck = ck.astype(cdt)
    s = sum(jnp.einsum("bvc,cd->bvd", x[:, k], ck[k, 0], precision=prec)
            for k in range(ko))
    s = (s + cb).astype(cdt)
    xin = x[:, ko - 1]
    if c_in < c0:
        xin = jnp.pad(xin, ((0, 0), (0, 0), (0, c0 - c_in)))
    if gated:
        p, q = s[..., :c0], s[..., c0:]
        lin = p + xin
        a = (lin if act_func == "glu" else jnp.tanh(lin)) * jax.nn.sigmoid(q)
    elif act_func == "relu":
        a = jax.nn.relu(s + xin)
    else:
        a = jax.nn.silu(s + xin)

    # LayerNorm over (V, C) jointly, eps=1e-12, f32 statistics
    # (`model/layers.py:272`; flax LN dtype=f32 in nn/layers.py:289-291)
    a32 = a.astype(jnp.float32)
    mu = jnp.mean(a32, axis=(-2, -1), keepdims=True)
    var = jnp.mean((a32 - mu) ** 2, axis=(-2, -1), keepdims=True)
    a32 = (a32 - mu) * jax.lax.rsqrt(var + 1e-12)
    a = (a32 * params["ln"]["scale"] + params["ln"]["bias"]).astype(cdt)

    a = jnp.einsum("bvc,cd->bvd", a, params["fc1"]["kernel"].astype(cdt),
                   precision=prec) + params["fc1"]["bias"].astype(cdt)
    a = jax.nn.relu(a)
    if not deterministic and droprate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - droprate, a.shape)
        a = jnp.where(keep, a / (1.0 - droprate), jnp.zeros((), cdt))
    a = jnp.einsum("bvc,cd->bvd", a, params["fc2"]["kernel"].astype(cdt),
                   precision=prec) + params["fc2"]["bias"].astype(cdt)
    return a[:, None, :, :]  # [B, 1, V, end]


def fused_forward(params: dict, x: jax.Array, gop: Any, model: STGCN, *,
                  deterministic: bool = True, rng: jax.Array | None = None,
                  precision: str = "default",
                  use_pallas: bool | None = None,
                  interpret: bool = False) -> jax.Array:
    """Forward pass with fused ST-block kernels.

    ``params``: the flax ``variables['params']`` tree of ``model``.
    ``gop`` must be a dense graph operator (``.matrix``); callers should
    fall back to ``model.apply`` for sparse representations.
    """
    gso = gop.matrix
    blocks, ko = model._plan()
    n_st = len(blocks) - 3
    v = x.shape[2]

    seeds = None
    out_rng = None
    if not deterministic and model.droprate > 0.0:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        seeds = jax.random.randint(rng, (n_st,), 0, jnp.iinfo(jnp.int32).max)
        out_rng = jax.random.fold_in(rng, 0x0FF5E7)

    for l in range(n_st):
        x = fused_st_block(
            x, gso, params[f"st_block_{l}"],
            kt=model.kt, ks=model.ks, act_func=model.act_func,
            graph_conv_type=model.graph_conv_type, droprate=model.droprate,
            deterministic=deterministic,
            seed=(seeds[l] if seeds is not None else 0),
            precision=precision, use_pallas=use_pallas, interpret=interpret)

    if ko > 1:
        prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)
        y = _output_block_apply(params["output"], x, v,
                                dtype=(jnp.bfloat16
                                       if precision == "bfloat16" else None),
                                act_func=model.act_func,
                                droprate=model.droprate,
                                deterministic=deterministic, rng=out_rng,
                                prec=prec)
    else:  # ko == 0 — inline fc head (`models.py:38-42,48-51`)
        a = jnp.einsum("btvc,cd->btvd", x, params["fc1"]["kernel"]) \
            + params["fc1"]["bias"]
        a = jax.nn.relu(a)
        y = jnp.einsum("btvc,cd->btvd", a, params["fc2"]["kernel"]) \
            + params["fc2"]["bias"]
    return y.astype(jnp.float32)
