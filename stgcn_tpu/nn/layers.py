"""STGCN layers, TPU-first.

Activations are ``[batch, time, vertex, channel]`` throughout — channels-last
matches the TPU lane dimension, so there are *zero* layout permutes in the
whole forward pass (the reference permutes 8+ times per block,
``model/layers.py:145,196,228,255,278,282``).

Numerical semantics mirror the reference exactly (citations per layer);
layout and dispatch are redesigned:

- graph aggregation goes through a :class:`~stgcn_tpu.ops.GraphOp` passed as
  a call argument (dense MXU matmul or Pallas block-sparse SpMM), not a
  tensor smuggled through module constructors (`main.py:103`);
- temporal convs are `lax.conv_general_dilated` NHWC valid convs that XLA
  lowers onto the MXU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from stgcn_tpu.nn import init as tinit

ACTIVATIONS = ("glu", "gtu", "relu", "silu")


class Align(nn.Module):
    """Channel matcher for residual paths (`model/layers.py:7-23`):
    1×1 conv when shrinking, zero-pad channels when growing, identity else."""

    c_out: int
    dtype: Any = None  # compute dtype (params stay f32); None = f32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        if c_in > self.c_out:
            x = nn.Dense(
                self.c_out,
                dtype=self.dtype,
                kernel_init=tinit.dense_kernel_init,
                bias_init=tinit.dense_bias_init(c_in),
                name="align_conv",
            )(x)
        elif c_in < self.c_out:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, self.c_out - c_in)]
            x = jnp.pad(x, pad)
        return x


class CausalConv(nn.Module):
    """Valid (or left-padded causal) temporal conv, kernel ``(Kt, 1)``.

    Matches `model/layers.py:40-57`: with ``causal_pad=False`` (the only mode
    STGCN uses) it is a valid conv shrinking time by ``Kt−1``; with
    ``causal_pad=True`` the input is left-padded in time so output length
    equals input length.
    """

    c_out: int
    kt: int
    causal_pad: bool = False
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        kernel = self.param("kernel", tinit.conv_kernel_init,
                            (self.kt, 1, c_in, self.c_out))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        if self.causal_pad:
            x = jnp.pad(x, ((0, 0), (self.kt - 1, 0), (0, 0), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", tinit.conv_bias_init(c_in, self.kt),
                              (self.c_out,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


class TemporalConvLayer(nn.Module):
    """Gated temporal conv (`model/layers.py:59-120`).

    GLU: ``(x_p + x_in) ⊙ σ(x_q)`` — note the residual is added *inside* the
    linear branch of the gate (`layers.py:105`), a nonstandard GLU preserved
    for parity. GTU: ``tanh(x_p + x_in) ⊙ σ(x_q)``. relu/silu:
    ``act(conv(x) + x_in)``.
    """

    kt: int
    c_out: int
    act_func: str = "glu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.act_func not in ACTIVATIONS:
            raise NotImplementedError(
                f"activation {self.act_func!r} not implemented; expected {ACTIVATIONS}")
        x_in = Align(self.c_out, dtype=self.dtype, name="align")(x)[:, self.kt - 1:, :, :]
        gated = self.act_func in ("glu", "gtu")
        y = CausalConv(2 * self.c_out if gated else self.c_out, self.kt,
                       dtype=self.dtype, name="causal_conv")(x)
        if gated:
            x_p = y[..., : self.c_out]
            x_q = y[..., self.c_out:]
            lin = x_p + x_in
            if self.act_func == "glu":
                return lin * jax.nn.sigmoid(x_q)
            return jnp.tanh(lin) * jax.nn.sigmoid(x_q)
        if self.act_func == "relu":
            return jax.nn.relu(y + x_in)
        return jax.nn.silu(y + x_in)


class ChebGraphConv(nn.Module):
    """Chebyshev spectral graph conv, order ``Ks`` (`model/layers.py:122-172`).

    ``T_0 = x``, ``T_1 = Gx``, ``T_k = 2G·T_{k−1} − T_{k−2}``; output
    ``Σ_k T_k W_k + b``. The polynomial terms are folded into the weight
    contraction incrementally (no ``[Ks, ...]`` stack is materialized —
    better HBM behavior at large V than the reference's ``torch.stack``,
    `layers.py:163`).
    """

    c_out: int
    ks: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, gop: Any) -> jax.Array:
        if self.ks < 1:
            raise ValueError(f"Ks must be a positive integer, got {self.ks}")
        c_in = x.shape[-1]
        # torch-shape [Ks, c_in, c_out] ⇒ fan_in = c_in*c_out (see nn/init.py)
        weight = self.param("weight",
                            tinit.uniform_fan(tinit.torch_fan_in((self.ks, c_in, self.c_out))),
                            (self.ks, c_in, self.c_out))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            weight = weight.astype(self.dtype)

        from jax.ad_checkpoint import checkpoint_name

        t_prev2 = x
        out = jnp.einsum("...vi,io->...vo", t_prev2, weight[0])
        if self.ks == 3 and hasattr(gop, "cheb_pair"):
            # fused recurrence: the sparse operator streams from HBM once
            # for both applications (kernels/banded_spmm.banded_cheb_pair).
            # The terms carry checkpoint names so the remat policy
            # (`model.py:89-92`) saves them instead of replaying the pair.
            t1, t2 = gop.cheb_pair(x)
            t1 = checkpoint_name(t1, "stgcn_graph_term")
            t2 = checkpoint_name(t2, "stgcn_graph_term")
            out = out + jnp.einsum("...vi,io->...vo", t1, weight[1])
            out = out + jnp.einsum("...vi,io->...vo", t2, weight[2])
        elif self.ks >= 2:
            t_prev1 = checkpoint_name(gop(x), "stgcn_graph_term")
            out = out + jnp.einsum("...vi,io->...vo", t_prev1, weight[1])
            for k in range(2, self.ks):
                t_k = checkpoint_name(gop(t_prev1, scale=2.0) - t_prev2,
                                      "stgcn_graph_term")
                out = out + jnp.einsum("...vi,io->...vo", t_k, weight[k])
                t_prev2, t_prev1 = t_prev1, t_k

        if self.use_bias:
            bias = self.param("bias",
                              tinit.uniform_fan(tinit.torch_fan_in((self.ks, c_in, self.c_out))),
                              (self.c_out,))
            out = out + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return out


class GraphConv(nn.Module):
    """1st-order GCN conv: ``(Gx)W + b`` (`model/layers.py:174-206`)."""

    c_out: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, gop: Any) -> jax.Array:
        c_in = x.shape[-1]
        # torch-shape [c_in, c_out] ⇒ torch fan_in = size(1) = c_out (quirk)
        weight = self.param("weight",
                            tinit.uniform_fan(tinit.torch_fan_in((c_in, self.c_out))),
                            (c_in, self.c_out))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            weight = weight.astype(self.dtype)
        from jax.ad_checkpoint import checkpoint_name

        gx = checkpoint_name(gop(x), "stgcn_graph_term")
        out = jnp.einsum("...vi,io->...vo", gx, weight)
        if self.use_bias:
            bias = self.param("bias",
                              tinit.uniform_fan(tinit.torch_fan_in((c_in, self.c_out))),
                              (self.c_out,))
            out = out + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return out


class GraphConvLayer(nn.Module):
    """Align → graph conv (at ``c_out → c_out`` width) → residual add
    (`model/layers.py:208-231`). The 64→16 bottleneck happens in the align
    1×1 conv; the graph conv itself is square."""

    graph_conv_type: str
    c_out: int
    ks: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, gop: Any) -> jax.Array:
        x_in = Align(self.c_out, dtype=self.dtype, name="align")(x)
        if self.graph_conv_type == "cheb_graph_conv":
            x_gc = ChebGraphConv(self.c_out, self.ks, self.use_bias,
                                 dtype=self.dtype, name="cheb_graph_conv")(x_in, gop)
        elif self.graph_conv_type == "graph_conv":
            x_gc = GraphConv(self.c_out, self.use_bias, dtype=self.dtype,
                             name="graph_conv")(x_in, gop)
        else:
            raise ValueError(f"unknown graph_conv_type {self.graph_conv_type!r}")
        return x_gc + x_in


class STConvBlock(nn.Module):
    """'TGTND' sandwich (`model/layers.py:233-258`): temporal gate → graph
    conv → ReLU → temporal gate → LayerNorm([V, C], eps=1e-12) → dropout."""

    kt: int
    ks: int
    channels: tuple[int, int, int]
    act_func: str
    graph_conv_type: str
    use_bias: bool = True
    droprate: float = 0.5
    dtype: Any = None
    # per-vertex LN affine params: at 1M vertices these [V, C] arrays are
    # 99.9% of all parameters (2.06 GB f32); bf16 halves that (parity
    # mode keeps f32 — the normalization statistics stay f32 either way)
    ln_param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, gop: Any, deterministic: bool = True) -> jax.Array:
        x = TemporalConvLayer(self.kt, self.channels[0], self.act_func,
                              dtype=self.dtype, name="tmp_conv1")(x)
        x = GraphConvLayer(self.graph_conv_type, self.channels[1], self.ks,
                           self.use_bias, dtype=self.dtype, name="graph_conv")(x, gop)
        x = jax.nn.relu(x)
        x = TemporalConvLayer(self.kt, self.channels[2], self.act_func,
                              dtype=self.dtype, name="tmp_conv2")(x)
        # torch LayerNorm([n_vertex, c]) normalizes jointly over (V, C);
        # statistics always in f32 for stability under bf16 compute
        x = nn.LayerNorm(epsilon=1e-12, reduction_axes=(-2, -1),
                         feature_axes=(-2, -1), dtype=jnp.float32,
                         param_dtype=self.ln_param_dtype,
                         name="ln")(x)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Dropout(self.droprate, deterministic=deterministic)(x)
        return x


class OutputBlock(nn.Module):
    """'TNFF' head (`model/layers.py:260-284`): temporal gate collapsing the
    remaining ``Ko`` steps to 1 → LayerNorm → fc1 → ReLU → dropout → fc2."""

    ko: int
    channels: tuple[int, int]
    end_channel: int
    act_func: str
    use_bias: bool = True
    droprate: float = 0.5
    dtype: Any = None
    ln_param_dtype: Any = jnp.float32  # see STConvBlock.ln_param_dtype

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = TemporalConvLayer(self.ko, self.channels[0], self.act_func,
                              dtype=self.dtype, name="tmp_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-12, reduction_axes=(-2, -1),
                         feature_axes=(-2, -1), dtype=jnp.float32,
                         param_dtype=self.ln_param_dtype,
                         name="ln")(x)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Dense(self.channels[1], use_bias=self.use_bias, dtype=self.dtype,
                     kernel_init=tinit.dense_kernel_init,
                     bias_init=tinit.dense_bias_init(self.channels[0]),
                     name="fc1")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.droprate, deterministic=deterministic)(x)
        x = nn.Dense(self.end_channel, use_bias=self.use_bias, dtype=self.dtype,
                     kernel_init=tinit.dense_kernel_init,
                     bias_init=tinit.dense_bias_init(self.channels[1]),
                     name="fc2")(x)
        return x
