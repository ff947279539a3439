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


def _cv_dot(x_bcv: jax.Array, w_cd: jax.Array, prec=None) -> jax.Array:
    """``[B, C, V] × [C, D] → [B, D, V]`` as an explicit batched
    ``[D, C] @ [C, V]`` dot — contraction in LHS lanes / RHS sublanes,
    the MXU's native orientation. A plain ``einsum('bcv,cd->bdv')``
    lets XLA pick a transposing lowering that costs ~2.4 ms per dot at
    V=100k; this form measures at the matmul floor. The broadcast
    weight is [B, D, C] — bytes are negligible at head widths."""
    b = x_bcv.shape[0]
    wb = jnp.broadcast_to(w_cd.T[None], (b,) + w_cd.T.shape)
    return jax.lax.dot_general(wb, x_bcv, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32,
                               precision=prec).astype(x_bcv.dtype)


def _output_block_apply_cv(params: dict, x_cv: jax.Array, v_true: int, *,
                           act_func: str, droprate: float,
                           deterministic: bool, rng: jax.Array | None,
                           prec=None, dtype=None) -> jax.Array:
    """cv-layout twin of :func:`_output_block_apply`: consumes
    ``[B, Ko, C, V_pad]`` (channel-before-vertex) and returns
    ``[B, 1, V_true, end]`` — so the fused sparse path never transposes
    its full-size activations back to vertex-major (at 100k vertices the
    ``[B, T, V, C]`` exit transpose plus the vc head measured ~20 ms of
    the train step; with ``end == 1`` the cv→vc exit is a pure reshape).
    Same math as the vc head (`model/layers.py:260-284`), LN statistics
    in f32 over the (C, V) pair."""
    cdt = dtype or jnp.float32
    ck = params["tmp_conv1"]["causal_conv"]["kernel"]   # [ko, 1, c, g]
    cb = params["tmp_conv1"]["causal_conv"]["bias"]
    ko, _, c_in, g = ck.shape
    gated = act_func in ("glu", "gtu")
    c0 = g // 2 if gated else g

    x_cv = x_cv[..., :v_true].astype(cdt)              # [B, Ko, C, V]
    ck = ck.astype(cdt)
    # temporal conv: contraction over the channel sublanes per tap
    s = sum(_cv_dot(x_cv[:, k], ck[k, 0], prec).astype(jnp.float32)
            for k in range(ko))
    s = (s + cb.astype(jnp.float32)[:, None]).astype(cdt)   # [B, g, V]
    xin = x_cv[:, ko - 1]
    if c_in < c0:
        xin = jnp.pad(xin, ((0, 0), (0, c0 - c_in), (0, 0)))
    if gated:
        p, q = s[:, :c0], s[:, c0:]
        lin = p + xin
        a = (lin if act_func == "glu" else jnp.tanh(lin)) * jax.nn.sigmoid(q)
    elif act_func == "relu":
        a = jax.nn.relu(s + xin)
    else:
        a = jax.nn.silu(s + xin)

    # LayerNorm over (V, C) jointly, eps=1e-12, f32 statistics
    a32 = a.astype(jnp.float32)
    mu = jnp.mean(a32, axis=(-2, -1), keepdims=True)
    var = jnp.mean((a32 - mu) ** 2, axis=(-2, -1), keepdims=True)
    a32 = (a32 - mu) * jax.lax.rsqrt(var + 1e-12)
    # ln scale/bias are [V, C] in the shared param tree → cv orientation
    lnw = params["ln"]["scale"].T[None]
    lnb = params["ln"]["bias"].T[None]
    a = (a32 * lnw + lnb).astype(cdt)                  # [B, c0, V]

    a = _cv_dot(a, params["fc1"]["kernel"].astype(cdt), prec) \
        + params["fc1"]["bias"].astype(cdt)[:, None]
    a = jax.nn.relu(a)
    if not deterministic and droprate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - droprate, a.shape)
        a = jnp.where(keep, a / (1.0 - droprate), jnp.zeros((), cdt))
    a = _cv_dot(a, params["fc2"]["kernel"].astype(cdt), prec) \
        + params["fc2"]["bias"].astype(cdt)[:, None]
    # [B, end, V] → [B, 1, V, end]
    return jnp.transpose(a, (0, 2, 1))[:, None]


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
