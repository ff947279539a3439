"""Fused ST-Conv block Pallas kernel (BASELINE configs[2]).

One STConvBlock — the reference "TGTND" sandwich (`model/layers.py:233-258`):
temporal gated conv → graph conv (+align/residual) → ReLU → temporal gated
conv → LayerNorm([V, C], eps=1e-12) → dropout — computed for a tile of the
batch entirely in VMEM, with a single HBM read of the block input and a
single HBM write of the block output. The unfused XLA path round-trips
~10 activation tensors of shape ``[B, T, V, 64..128]`` through HBM per
block; at PEMS-BAY scale (V=325) the step is HBM-bound, so fusing is the
main single-chip lever.

Design notes (TPU-first):

- All tensors inside the kernel are **lists of 2-D ``[V_pad, C]`` values**
  indexed by ``(batch, time)``; every op is either elementwise (VPU) or a
  2-D ``dot`` (MXU). This avoids 4-D relayouts entirely — the model's
  channel counts (16/64/128) live in the lane dimension and V in sublanes.
- The temporal convs are tap-decomposed: ``s[t] = Σ_k x[t+k] @ K[k]`` —
  ``kt`` matmuls per output step, no im2col materialization.
- The Chebyshev recurrence runs in the same list form; ``T_k`` terms are
  folded into the weight contraction incrementally.
- V is padded to a sublane multiple; LayerNorm statistics are masked to the
  true vertex count (padded LN scale/bias rows are zero, so padded output
  rows are exactly zero).
- Dropout uses the on-core PRNG (`pltpu.prng_random_bits`) seeded by
  ``(seed, program_id)`` — the backward kernel regenerates the identical
  mask, so no mask tensor ever touches HBM.
- The backward is a second Pallas kernel over the same grid: it *recomputes*
  the forward intermediates for its batch tile in VMEM (recompute is cheap —
  the forward is itself fused) and applies the chain rule, emitting ``dx``
  plus weight gradients accumulated across the sequential TPU grid.

Reference semantics mirrored exactly (citations): in-gate residual GLU/GTU
(`model/layers.py:105,109`), zero-pad channel align (`layers.py:17-19`),
graph-conv residual (`layers.py:229`), joint (V, C) LayerNorm with
eps=1e-12 (`layers.py:246`), dropout after LN (`layers.py:248,256`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class FusedBlockConfig:
    """Static configuration of one fused ST block (hashable: used as a
    ``custom_vjp`` nondiff arg and a cache key)."""

    kt: int
    ks: int
    act_func: str            # glu | gtu | relu | silu
    graph_conv_type: str     # cheb_graph_conv | graph_conv
    droprate: float
    v_true: int              # true vertex count (LN mask)
    v_pad: int               # padded vertex count (sublane multiple)
    t_in: int
    c_in: int
    c0: int                  # temporal-gate width
    c1: int                  # graph-conv (bottleneck) width
    c2: int                  # second temporal-gate width
    batch_tile: int
    training: bool           # apply dropout (with PRNG) or not
    interpret: bool = False  # pallas interpret mode (CPU debugging)
    precision: str = "default"  # 'default' = bf16 MXU passes (production);
                                # 'highest' = full f32 (parity runs)

    @property
    def gated(self) -> bool:
        return self.act_func in ("glu", "gtu")

    @property
    def g1(self) -> int:
        return 2 * self.c0 if self.gated else self.c0

    @property
    def g2(self) -> int:
        return 2 * self.c2 if self.gated else self.c2

    @property
    def t1(self) -> int:
        return self.t_in - self.kt + 1

    @property
    def t2(self) -> int:
        return self.t1 - self.kt + 1


# --------------------------------------------------------------------------
# shared math (runs both inside Pallas kernels and as plain jnp)
# --------------------------------------------------------------------------

_PRECISIONS = {"default": None, "highest": lax.Precision.HIGHEST}


def _dot(a: jax.Array, b: jax.Array, prec=None) -> jax.Array:
    """2-D matmul, f32 accumulation."""
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=_F32, precision=prec)


def _dot_t_a(a: jax.Array, b: jax.Array, prec=None) -> jax.Array:
    """``aᵀ @ b`` without an explicit transpose (contract dim0 × dim0)."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=_F32, precision=prec)


def _dot_b_t(a: jax.Array, b: jax.Array, prec=None) -> jax.Array:
    """``a @ bᵀ`` without an explicit transpose (contract dim1 × dim1)."""
    return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           preferred_element_type=_F32, precision=prec)


def _pad_channels(x: jax.Array, c_out: int) -> jax.Array:
    """Zero-pad channel align (`model/layers.py:17-19`); identity if equal."""
    c_in = x.shape[-1]
    if c_in == c_out:
        return x
    if c_in > c_out:
        raise ValueError("fused block supports c_in <= c_out align only")
    return jnp.pad(x, ((0, 0), (0, c_out - c_in)))


def _gate_fwd(cfg: FusedBlockConfig, s: jax.Array, xin: jax.Array,
              c: int) -> jax.Array:
    """Reference gate semantics (`model/layers.py:105,109,111-115`)."""
    if cfg.gated:
        p, q = s[:, :c], s[:, c:]
        lin = p + xin
        if cfg.act_func == "glu":
            return lin * jax.nn.sigmoid(q)
        return jnp.tanh(lin) * jax.nn.sigmoid(q)
    z = s + xin
    if cfg.act_func == "relu":
        return jax.nn.relu(z)
    return jax.nn.silu(z)


def _gate_bwd(cfg: FusedBlockConfig, s: jax.Array, xin: jax.Array,
              c: int, da: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Returns (ds, dxin)."""
    if cfg.gated:
        p, q = s[:, :c], s[:, c:]
        lin = p + xin
        sq = jax.nn.sigmoid(q)
        if cfg.act_func == "glu":
            dlin = da * sq
            dq = da * lin * sq * (1.0 - sq)
        else:  # gtu
            th = jnp.tanh(lin)
            dlin = da * sq * (1.0 - th * th)
            dq = da * th * sq * (1.0 - sq)
        return jnp.concatenate([dlin, dq], axis=1), dlin
    z = s + xin
    if cfg.act_func == "relu":
        dz = da * (z > 0).astype(da.dtype)
    else:  # silu
        sz = jax.nn.sigmoid(z)
        dz = da * sz * (1.0 + z * (1.0 - sz))
    return dz, dz


def _tconv_fwd(xs: Sequence[jax.Array], kernel: jax.Array, bias: jax.Array,
               tb: int, t_in: int, kt: int, prec=None) -> list[jax.Array]:
    """Tap-decomposed valid temporal conv on a (b, t)-indexed list.

    ``xs[b*t_in + t]`` is ``[V_pad, c_in]``; returns list of length
    ``tb * (t_in - kt + 1)`` of ``[V_pad, c_out]``.
    """
    t_out = t_in - kt + 1
    out = []
    for b in range(tb):
        for t in range(t_out):
            acc = _dot(xs[b * t_in + t], kernel[0], prec)
            for k in range(1, kt):
                acc = acc + _dot(xs[b * t_in + t + k], kernel[k], prec)
            out.append(acc + bias[None, :])
    return out


def _graph_chain_fwd(cfg: FusedBlockConfig, g_mat: jax.Array,
                     xg: Sequence[jax.Array], gc_w: jax.Array,
                     gc_b: jax.Array) -> tuple[list[jax.Array], list[list[jax.Array]]]:
    """Cheb recurrence / 1st-order conv on the list form.

    Returns (gc outputs, T_k term lists for the backward).
    `model/layers.py:146-168,194-204`.
    """
    n = len(xg)
    prec = _PRECISIONS[cfg.precision]
    ts: list[list[jax.Array]] = []
    if cfg.graph_conv_type == "graph_conv":
        t1 = [_dot(g_mat, x, prec) for x in xg]
        ts.append(t1)
        out = [_dot(t1[i], gc_w[0], prec) + gc_b[None, :] for i in range(n)]
        return out, ts

    # cheb: T0 = x, T1 = Gx, Tk = 2G T_{k-1} − T_{k-2}
    ts.append(list(xg))
    out = [_dot(xg[i], gc_w[0], prec) for i in range(n)]
    if cfg.ks >= 2:
        t1 = [_dot(g_mat, x, prec) for x in xg]
        ts.append(t1)
        out = [out[i] + _dot(t1[i], gc_w[1], prec) for i in range(n)]
        for k in range(2, cfg.ks):
            tk = [2.0 * _dot(g_mat, ts[k - 1][i], prec) - ts[k - 2][i]
                  for i in range(n)]
            ts.append(tk)
            out = [out[i] + _dot(tk[i], gc_w[k], prec) for i in range(n)]
    out = [o + gc_b[None, :] for o in out]
    return out, ts


def _ln_stats(cfg: FusedBlockConfig, a: jax.Array,
              vmask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Masked joint (V, C) LayerNorm statistics (`model/layers.py:246`)."""
    denom = float(cfg.v_true * cfg.c2)
    am = a * vmask
    mu = jnp.sum(am) / denom
    d = (a - mu) * vmask
    var = jnp.sum(d * d) / denom
    rstd = lax.rsqrt(var + 1e-12)
    return mu, rstd


def _forward_pieces(cfg: FusedBlockConfig, g_mat: jax.Array, vmask: jax.Array,
                    xs: list[jax.Array], w: tuple, drop_masks=None) -> dict:
    """The full block forward on the list form; returns every intermediate
    the backward needs. ``drop_masks``: None (no dropout) or a list of
    pre-scaled keep masks per (b, t2)."""
    (c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb) = w
    tb, kt = cfg.batch_tile, cfg.kt
    prec = _PRECISIONS[cfg.precision]

    s1 = _tconv_fwd(xs, c1k, c1b, tb, cfg.t_in, kt, prec)
    xin1 = [_pad_channels(xs[b * cfg.t_in + t + kt - 1], cfg.c0)
            for b in range(tb) for t in range(cfg.t1)]
    a1 = [_gate_fwd(cfg, s1[i], xin1[i], cfg.c0) for i in range(len(s1))]

    xg = [_dot(a, gaw, prec) + gab[None, :] for a in a1]
    gc, ts = _graph_chain_fwd(cfg, g_mat, xg, gcw, gcb)
    r = [gc[i] + xg[i] for i in range(len(xg))]
    h = [jax.nn.relu(x) for x in r]

    s2 = _tconv_fwd(h, c2k, c2b, tb, cfg.t1, kt, prec)
    xin2 = [_pad_channels(h[b * cfg.t1 + t + kt - 1], cfg.c2)
            for b in range(tb) for t in range(cfg.t2)]
    a2 = [_gate_fwd(cfg, s2[i], xin2[i], cfg.c2) for i in range(len(s2))]

    y = []
    stats = []
    for i, a in enumerate(a2):
        mu, rstd = _ln_stats(cfg, a, vmask)
        stats.append((mu, rstd))
        yi = ((a - mu) * rstd) * lng + lnb
        if drop_masks is not None:
            yi = yi * drop_masks[i]
        y.append(yi)
    return dict(s1=s1, xin1=xin1, a1=a1, xg=xg, ts=ts, gc=gc, r=r, h=h,
                s2=s2, xin2=xin2, a2=a2, stats=stats, y=y)


def _backward_pieces(cfg: FusedBlockConfig, g_mat: jax.Array,
                     gt_mat: jax.Array, vmask: jax.Array,
                     xs: list[jax.Array], w: tuple, fw: dict,
                     gys: list[jax.Array], drop_masks=None) -> dict:
    """Hand-derived chain rule over the list form. Returns dx list plus
    per-weight gradient contributions (summed over this tile)."""
    (c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb) = w
    tb, kt = cfg.batch_tile, cfg.kt
    prec = _PRECISIONS[cfg.precision]
    n1 = tb * cfg.t1
    denom = float(cfg.v_true * cfg.c2)

    dlng = jnp.zeros_like(lng)
    dlnb = jnp.zeros_like(lnb)
    da2 = []
    for i, gy in enumerate(gys):
        if drop_masks is not None:
            gy = gy * drop_masks[i]
        a = fw["a2"][i]
        mu, rstd = fw["stats"][i]
        xhat = (a - mu) * rstd * vmask
        dlng = dlng + gy * xhat
        dlnb = dlnb + gy
        gd = gy * lng
        m1 = jnp.sum(gd * vmask) / denom
        m2 = jnp.sum(gd * xhat) / denom
        da2.append(rstd * (gd - m1 - xhat * m2) * vmask)

    # temporal gate 2 backward
    ds2, dxin2 = [], []
    for i in range(len(da2)):
        ds, dxin = _gate_bwd(cfg, fw["s2"][i], fw["xin2"][i], cfg.c2, da2[i])
        ds2.append(ds)
        dxin2.append(dxin)

    dc2k_taps = [jnp.zeros(c2k.shape[1:], _F32) for _ in range(kt)]
    dc2b = sum(jnp.sum(d, axis=0) for d in ds2)
    dh = [jnp.zeros((cfg.v_pad, cfg.c1), _F32) for _ in range(n1)]
    for b in range(tb):
        for t in range(cfg.t2):
            i = b * cfg.t2 + t
            for k in range(kt):
                j = b * cfg.t1 + t + k
                dc2k_taps[k] = dc2k_taps[k] + _dot_t_a(fw["h"][j], ds2[i], prec)
                dh[j] = dh[j] + _dot_b_t(ds2[i], c2k[k], prec)
            j_res = b * cfg.t1 + t + kt - 1
            dh[j_res] = dh[j_res] + dxin2[i][:, : cfg.c1]
    dc2k = jnp.stack(dc2k_taps)

    # relu + residual split
    dr = [dh[i] * (fw["r"][i] > 0).astype(_F32) for i in range(n1)]
    dgc = dr
    dxg = [d for d in dr]  # residual branch

    # graph chain backward
    n_w = gcw.shape[0]
    dgcw_terms = [jnp.zeros(gcw.shape[1:], _F32) for _ in range(n_w)]
    dgcb = sum(jnp.sum(d, axis=0) for d in dgc)
    ts = fw["ts"]
    if cfg.graph_conv_type == "graph_conv":
        for i in range(n1):
            dgcw_terms[0] = dgcw_terms[0] + _dot_t_a(ts[0][i], dgc[i], prec)
            dt1 = _dot_b_t(dgc[i], gcw[0], prec)
            dxg[i] = dxg[i] + _dot(gt_mat, dt1, prec)
    else:
        for i in range(n1):
            dts = [_dot_b_t(dgc[i], gcw[k], prec) for k in range(cfg.ks)]
            for k in range(cfg.ks):
                dgcw_terms[k] = dgcw_terms[k] + _dot_t_a(ts[k][i], dgc[i], prec)
            if cfg.ks == 1:
                dxg[i] = dxg[i] + dts[0]
                continue
            # adjoint of T_k = 2 G T_{k-1} − T_{k-2}, then T_1 = G T_0
            dt_hi = dts[cfg.ks - 1]
            dt_lo = dts[cfg.ks - 2]
            for k in range(cfg.ks - 1, 1, -1):
                dt_lo = dt_lo + 2.0 * _dot(gt_mat, dt_hi, prec)
                dt_lo2 = dts[k - 2] - dt_hi
                dt_hi, dt_lo = dt_lo, dt_lo2
            dxg[i] = dxg[i] + dt_lo + _dot(gt_mat, dt_hi, prec)
    dgcw = jnp.stack(dgcw_terms)

    # graph align backward
    dgaw = jnp.zeros_like(gaw)
    dgab = sum(jnp.sum(d, axis=0) for d in dxg)
    da1 = []
    for i in range(n1):
        dgaw = dgaw + _dot_t_a(fw["a1"][i], dxg[i], prec)
        da1.append(_dot_b_t(dxg[i], gaw, prec))

    # temporal gate 1 backward
    ds1, dxin1 = [], []
    for i in range(n1):
        ds, dxin = _gate_bwd(cfg, fw["s1"][i], fw["xin1"][i], cfg.c0, da1[i])
        ds1.append(ds)
        dxin1.append(dxin)

    dc1k_taps = [jnp.zeros(c1k.shape[1:], _F32) for _ in range(kt)]
    dc1b = sum(jnp.sum(d, axis=0) for d in ds1)
    dx = [jnp.zeros((cfg.v_pad, cfg.c_in), _F32)
          for _ in range(tb * cfg.t_in)]
    for b in range(tb):
        for t in range(cfg.t1):
            i = b * cfg.t1 + t
            for k in range(kt):
                j = b * cfg.t_in + t + k
                dc1k_taps[k] = dc1k_taps[k] + _dot_t_a(xs[j], ds1[i], prec)
                dx[j] = dx[j] + _dot_b_t(ds1[i], c1k[k], prec)
            j_res = b * cfg.t_in + t + kt - 1
            dx[j_res] = dx[j_res] + dxin1[i][:, : cfg.c_in]
    dc1k = jnp.stack(dc1k_taps)

    return dict(dx=dx, dc1k=dc1k, dc1b=dc1b, dgaw=dgaw, dgab=dgab,
                dgcw=dgcw, dgcb=dgcb, dc2k=dc2k, dc2b=dc2b,
                dlng=dlng, dlnb=dlnb)


# --------------------------------------------------------------------------
# dropout masks (kernel PRNG / reference jax.random)
# --------------------------------------------------------------------------

def _kernel_drop_masks(cfg: FusedBlockConfig, seed: jax.Array) -> list[jax.Array] | None:
    """Pre-scaled keep masks regenerated identically in fwd and bwd kernels:
    seeded by (seed, program_id), drawn in ascending (b, t2) order."""
    if not cfg.training or cfg.droprate <= 0.0:
        return None
    pltpu.prng_seed(seed, pl.program_id(0))
    thr = np.uint32(round(cfg.droprate * float(2 ** 32)))
    inv_keep = 1.0 / (1.0 - cfg.droprate)
    masks = []
    for _ in range(cfg.batch_tile * cfg.t2):
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((cfg.v_pad, cfg.c2)), jnp.uint32)
        masks.append((bits >= thr).astype(_F32) * inv_keep)
    return masks


def reference_drop_masks(cfg: FusedBlockConfig, rng: jax.Array,
                         n_total: int) -> jax.Array | None:
    """jax.random dropout masks for the pure-jnp path, [B, t2, V_pad, c2]."""
    if not cfg.training or cfg.droprate <= 0.0:
        return None
    keep = jax.random.bernoulli(rng, 1.0 - cfg.droprate,
                                (n_total, cfg.t2, cfg.v_pad, cfg.c2))
    return keep.astype(_F32) / (1.0 - cfg.droprate)


# --------------------------------------------------------------------------
# Pallas kernels
# --------------------------------------------------------------------------

def _vmask_const(cfg: FusedBlockConfig) -> jax.Array:
    return (lax.broadcasted_iota(jnp.int32, (cfg.v_pad, 1), 0)
            < cfg.v_true).astype(_F32)


def _make_fwd_kernel(cfg: FusedBlockConfig):
    def kernel(seed_ref, x_ref, g_ref, c1k, c1b, gaw, gab, gcw, gcb,
               c2k, c2b, lng, lnb, out_ref):
        w = (c1k[...], c1b[...], gaw[...], gab[...], gcw[...], gcb[...],
             c2k[...], c2b[...], lng[...], lnb[...])
        g_mat = g_ref[...]
        vmask = _vmask_const(cfg)
        xs = [x_ref[b, t] for b in range(cfg.batch_tile)
              for t in range(cfg.t_in)]
        masks = _kernel_drop_masks(cfg, seed_ref[0])
        fw = _forward_pieces(cfg, g_mat, vmask, xs, w, masks)
        for b in range(cfg.batch_tile):
            for t in range(cfg.t2):
                out_ref[b, t] = fw["y"][b * cfg.t2 + t]

    return kernel


def _make_bwd_kernel(cfg: FusedBlockConfig):
    def kernel(seed_ref, x_ref, g_ref, gt_ref, c1k, c1b, gaw, gab, gcw, gcb,
               c2k, c2b, lng, lnb, gy_ref,
               dx_ref, dc1k_ref, dc1b_ref, dgaw_ref, dgab_ref,
               dgcw_ref, dgcb_ref, dc2k_ref, dc2b_ref, dlng_ref, dlnb_ref):
        w = (c1k[...], c1b[...], gaw[...], gab[...], gcw[...], gcb[...],
             c2k[...], c2b[...], lng[...], lnb[...])
        g_mat = g_ref[...]
        gt_mat = gt_ref[...]
        vmask = _vmask_const(cfg)
        xs = [x_ref[b, t] for b in range(cfg.batch_tile)
              for t in range(cfg.t_in)]
        gys = [gy_ref[b, t] for b in range(cfg.batch_tile)
               for t in range(cfg.t2)]
        masks = _kernel_drop_masks(cfg, seed_ref[0])
        fw = _forward_pieces(cfg, g_mat, vmask, xs, w, masks)
        bw = _backward_pieces(cfg, g_mat, gt_mat, vmask, xs, w, fw, gys,
                              masks)
        for b in range(cfg.batch_tile):
            for t in range(cfg.t_in):
                dx_ref[b, t] = bw["dx"][b * cfg.t_in + t]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dc1k_ref[...] = jnp.zeros_like(dc1k_ref)
            dc1b_ref[...] = jnp.zeros_like(dc1b_ref)
            dgaw_ref[...] = jnp.zeros_like(dgaw_ref)
            dgab_ref[...] = jnp.zeros_like(dgab_ref)
            dgcw_ref[...] = jnp.zeros_like(dgcw_ref)
            dgcb_ref[...] = jnp.zeros_like(dgcb_ref)
            dc2k_ref[...] = jnp.zeros_like(dc2k_ref)
            dc2b_ref[...] = jnp.zeros_like(dc2b_ref)
            dlng_ref[...] = jnp.zeros_like(dlng_ref)
            dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

        dc1k_ref[...] += bw["dc1k"]
        dc1b_ref[...] += bw["dc1b"][None, :]
        dgaw_ref[...] += bw["dgaw"]
        dgab_ref[...] += bw["dgab"][None, :]
        dgcw_ref[...] += bw["dgcw"]
        dgcb_ref[...] += bw["dgcb"][None, :]
        dc2k_ref[...] += bw["dc2k"]
        dc2b_ref[...] += bw["dc2b"][None, :]
        dlng_ref[...] += bw["dlng"]
        dlnb_ref[...] += bw["dlnb"]

    return kernel


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, *_: (0,) * nd)


def _fwd_pallas(cfg: FusedBlockConfig, seed, x, gso, w):
    nb = x.shape[0] // cfg.batch_tile
    (c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb) = w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # seed
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((cfg.batch_tile, cfg.t_in, cfg.v_pad, cfg.c_in),
                         lambda i, *_: (i, 0, 0, 0)),
            _const_spec(gso.shape),
            _const_spec(c1k.shape), _const_spec(c1b.shape),
            _const_spec(gaw.shape), _const_spec(gab.shape),
            _const_spec(gcw.shape), _const_spec(gcb.shape),
            _const_spec(c2k.shape), _const_spec(c2b.shape),
            _const_spec(lng.shape), _const_spec(lnb.shape),
        ],
        out_specs=pl.BlockSpec((cfg.batch_tile, cfg.t2, cfg.v_pad, cfg.c2),
                               lambda i, *_: (i, 0, 0, 0)),
    )
    flops_tile = _flops_estimate(cfg)
    return pl.pallas_call(
        _make_fwd_kernel(cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (x.shape[0], cfg.t2, cfg.v_pad, cfg.c2), _F32),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * nb,
            bytes_accessed=(x.size + x.shape[0] * cfg.t2 * cfg.v_pad * cfg.c2) * 4,
            transcendentals=nb * cfg.batch_tile * cfg.v_pad
            * (cfg.t1 * cfg.g1 + cfg.t2 * cfg.g2),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, gso,
      c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb)


def _bwd_pallas(cfg: FusedBlockConfig, seed, x, gso, gso_t, w, gy):
    nb = x.shape[0] // cfg.batch_tile
    (c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb) = w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((cfg.batch_tile, cfg.t_in, cfg.v_pad, cfg.c_in),
                         lambda i, *_: (i, 0, 0, 0)),
            _const_spec(gso.shape), _const_spec(gso_t.shape),
            _const_spec(c1k.shape), _const_spec(c1b.shape),
            _const_spec(gaw.shape), _const_spec(gab.shape),
            _const_spec(gcw.shape), _const_spec(gcb.shape),
            _const_spec(c2k.shape), _const_spec(c2b.shape),
            _const_spec(lng.shape), _const_spec(lnb.shape),
            pl.BlockSpec((cfg.batch_tile, cfg.t2, cfg.v_pad, cfg.c2),
                         lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((cfg.batch_tile, cfg.t_in, cfg.v_pad, cfg.c_in),
                         lambda i, *_: (i, 0, 0, 0)),
            _const_spec(c1k.shape), _const_spec((1, cfg.g1)),
            _const_spec(gaw.shape), _const_spec((1, cfg.c1)),
            _const_spec(gcw.shape), _const_spec((1, cfg.c1)),
            _const_spec(c2k.shape), _const_spec((1, cfg.g2)),
            _const_spec(lng.shape), _const_spec(lnb.shape),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, _F32),
        jax.ShapeDtypeStruct(c1k.shape, _F32),
        jax.ShapeDtypeStruct((1, cfg.g1), _F32),
        jax.ShapeDtypeStruct(gaw.shape, _F32),
        jax.ShapeDtypeStruct((1, cfg.c1), _F32),
        jax.ShapeDtypeStruct(gcw.shape, _F32),
        jax.ShapeDtypeStruct((1, cfg.c1), _F32),
        jax.ShapeDtypeStruct(c2k.shape, _F32),
        jax.ShapeDtypeStruct((1, cfg.g2), _F32),
        jax.ShapeDtypeStruct(lng.shape, _F32),
        jax.ShapeDtypeStruct(lnb.shape, _F32),
    ]
    return pl.pallas_call(
        _make_bwd_kernel(cfg),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _flops_estimate(cfg) * nb,
            bytes_accessed=2 * (x.size + gy.size) * 4,
            transcendentals=2 * nb * cfg.batch_tile * cfg.v_pad
            * (cfg.t1 * cfg.g1 + cfg.t2 * cfg.g2),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, gso, gso_t,
      c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb, gy)


def _flops_estimate(cfg: FusedBlockConfig) -> int:
    """Per-tile matmul FLOPs (for the compiler's pipeline scheduler)."""
    v, tb = cfg.v_pad, cfg.batch_tile
    f = tb * cfg.t1 * 2 * v * cfg.c_in * cfg.g1          # conv1
    f += tb * cfg.t1 * 2 * v * cfg.c0 * cfg.c1           # align
    n_g = (1 if cfg.graph_conv_type == "graph_conv" else max(cfg.ks - 1, 0))
    f += tb * cfg.t1 * n_g * 2 * v * v * cfg.c1          # graph matmuls
    n_w = 1 if cfg.graph_conv_type == "graph_conv" else cfg.ks
    f += tb * cfg.t1 * n_w * 2 * v * cfg.c1 * cfg.c1     # weight contraction
    f += tb * cfg.t2 * 2 * v * cfg.c1 * cfg.g2           # conv2
    return f


# --------------------------------------------------------------------------
# custom_vjp wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_block(cfg: FusedBlockConfig, seed, x, gso, gso_t,
                 c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb):
    return _fwd_pallas(cfg, seed, x, gso,
                       (c1k, c1b, gaw, gab, gcw, gcb, c2k, c2b, lng, lnb))


def _fused_block_fwd(cfg, seed, x, gso, gso_t, *w):
    y = _fwd_pallas(cfg, seed, x, gso, w)
    return y, (seed, x, gso, gso_t, w)


def _fused_block_bwd(cfg, res, gy):
    seed, x, gso, gso_t, w = res
    grads = _bwd_pallas(cfg, seed, x, gso, gso_t, w, gy)
    (dx, dc1k, dc1b, dgaw, dgab, dgcw, dgcb, dc2k, dc2b, dlng, dlnb) = grads
    seed_bar = np.zeros((), jax.dtypes.float0)
    return (seed_bar, dx, jnp.zeros_like(gso), jnp.zeros_like(gso_t),
            dc1k, dc1b[0], dgaw, dgab[0], dgcw, dgcb[0],
            dc2k, dc2b[0], dlng, dlnb)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


# --------------------------------------------------------------------------
# pure-jnp reference (CPU path + correctness oracle)
# --------------------------------------------------------------------------

def st_block_reference(cfg: FusedBlockConfig, x: jax.Array, gso: jax.Array,
                       w: tuple, drop_masks: jax.Array | None = None) -> jax.Array:
    """Same math as the kernel, vmapped over batch in plain jnp.

    ``x``: [B, t_in, V_pad, c_in]; ``drop_masks``: [B, t2, V_pad, c2]
    pre-scaled keep masks or None. Differentiable via JAX autodiff.
    """
    vmask = _vmask_const(cfg)
    one = dataclasses.replace(cfg, batch_tile=1)

    def single(xb, mb):
        xs = [xb[t] for t in range(cfg.t_in)]
        masks = None if mb is None else [mb[t] for t in range(cfg.t2)]
        fw = _forward_pieces(one, gso, vmask, xs, w, masks)
        return jnp.stack(fw["y"])

    if drop_masks is None:
        return jax.vmap(lambda xb: single(xb, None))(x)
    return jax.vmap(single)(x, drop_masks)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

def _pick_batch_tile(cfg_proto: FusedBlockConfig) -> int:
    """Largest tile whose backward working set stays well under VMEM."""
    v = cfg_proto.v_pad
    per_sample = 4 * v * (
        cfg_proto.t_in * max(cfg_proto.c_in, 8)
        + cfg_proto.t1 * (2 * cfg_proto.g1 + 2 * cfg_proto.c0
                          + (cfg_proto.ks + 4) * max(cfg_proto.c1, 8))
        + cfg_proto.t2 * (2 * cfg_proto.g2 + 3 * cfg_proto.c2))
    budget = 10 * 1024 * 1024 - 4 * v * v
    return max(1, min(8, budget // max(per_sample, 1)))


def fused_st_block(x: jax.Array, gso: jax.Array, params: dict, *,
                   kt: int, ks: int, act_func: str, graph_conv_type: str,
                   droprate: float, deterministic: bool,
                   seed: jax.Array | int = 0,
                   drop_rng: jax.Array | None = None,
                   batch_tile: int | None = None,
                   use_pallas: bool | None = None,
                   precision: str = "default",
                   interpret: bool = False) -> jax.Array:
    """Apply one fused STConvBlock.

    ``x``: [B, T, V, c_in] (V may be unpadded); ``gso``: dense [V, V];
    ``params``: the flax param subtree of one ``STConvBlock`` (same tree the
    unfused model trains — fused and unfused paths share checkpoints).
    Returns [B, T − 2(kt−1), V, c2] (same V as the input).
    """
    blk = params
    c1k = blk["tmp_conv1"]["causal_conv"]["kernel"]   # [kt, 1, c_in, g1]
    c1b = blk["tmp_conv1"]["causal_conv"]["bias"]
    gaw = blk["graph_conv"]["align"]["align_conv"]["kernel"]
    gab = blk["graph_conv"]["align"]["align_conv"]["bias"]
    if graph_conv_type == "cheb_graph_conv":
        gcw = blk["graph_conv"]["cheb_graph_conv"]["weight"]
        gcb = blk["graph_conv"]["cheb_graph_conv"]["bias"]
    else:
        gcw = blk["graph_conv"]["graph_conv"]["weight"][None]
        gcb = blk["graph_conv"]["graph_conv"]["bias"]
    c2k = blk["tmp_conv2"]["causal_conv"]["kernel"]
    c2b = blk["tmp_conv2"]["causal_conv"]["bias"]
    lng = blk["ln"]["scale"]
    lnb = blk["ln"]["bias"]

    b, t_in, v, c_in = x.shape
    c0 = gaw.shape[0]
    c1 = gaw.shape[1]
    c2 = lng.shape[-1]
    v_pad = _round_up(v, 16)
    training = (not deterministic) and droprate > 0.0

    # Mosaic can't lower the backward's N=1 matmul (dx for a 1-channel
    # input); pad tiny channel counts to a sublane multiple. The pads are
    # differentiable, so the extra dx / dkernel rows slice away in the VJP.
    if c_in < 8:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 8 - c_in)))
        c1k = jnp.pad(c1k, ((0, 0), (0, 0), (0, 8 - c_in), (0, 0)))
        c_in = 8

    proto = FusedBlockConfig(
        kt=kt, ks=ks, act_func=act_func, graph_conv_type=graph_conv_type,
        droprate=droprate, v_true=v, v_pad=v_pad, t_in=t_in, c_in=c_in,
        c0=c0, c1=c1, c2=c2, batch_tile=1, training=training,
        interpret=interpret, precision=precision)
    tb = batch_tile if batch_tile is not None else _pick_batch_tile(proto)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" or interpret

    # pad vertex axis (graph + LN params follow; LN stats are masked)
    if v_pad != v:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, v_pad - v), (0, 0)))
        gso = jnp.pad(gso, ((0, v_pad - v), (0, v_pad - v)))
        lng = jnp.pad(lng, ((0, v_pad - v), (0, 0)))
        lnb = jnp.pad(lnb, ((0, v_pad - v), (0, 0)))
    w = (jnp.squeeze(c1k, axis=1).astype(_F32), c1b.astype(_F32),
         gaw.astype(_F32), gab.astype(_F32), gcw.astype(_F32),
         gcb.astype(_F32), jnp.squeeze(c2k, axis=1).astype(_F32),
         c2b.astype(_F32), lng.astype(_F32), lnb.astype(_F32))
    x = x.astype(_F32)
    gso = gso.astype(_F32)

    if not use_pallas:
        cfg = dataclasses.replace(proto, batch_tile=1)
        masks = None
        if training:
            rng = drop_rng if drop_rng is not None \
                else jax.random.PRNGKey(seed if isinstance(seed, int) else 0)
            masks = reference_drop_masks(cfg, rng, b)
        y = st_block_reference(cfg, x, gso, w, masks)
        return y[:, :, :v, :]

    # pad batch to a tile multiple
    b_pad = _round_up(b, tb)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0), (0, 0)))
    cfg = dataclasses.replace(proto, batch_tile=tb)
    y = _fused_block(cfg, seed, x, gso, gso.T, *w)
    return y[:b, :, :v, :]
