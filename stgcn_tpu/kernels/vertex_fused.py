"""Vertex-tiled fused ST-block kernels for the sparse (large-V) path.

At 100k+ vertices the training step is dominated by elementwise HBM
chains — LN/gates/dropout on ``[B, T, V, 64]`` activations and their
backprop — not by the graph SpMM (measured: graph ≈ 36 ms of a 473 ms
step; ROADMAP.md). The dense fused block (:mod:`fused_stblock`) cannot
help there: it holds all of V in VMEM. These kernels tile the **vertex
axis** instead and fuse everything *around* the graph aggregation:

- ``head_fused`` — [prev block's LayerNorm-normalize + dropout →]
  temporal conv 1 → gate → bottleneck align: one HBM read of the block
  input, one write of the ``c1``-narrow graph operand ``xg``.
- (graph aggregation runs between them: the existing banded/ELL Pallas
  SpMM / fused Chebyshev-pair kernels, `ops/graph_op.py`.)
- ``tail_fused`` — Chebyshev weight contraction → residual → ReLU →
  temporal conv 2 → gate, emitting the pre-LN activation ``a2`` plus
  per-tile LayerNorm partial sums (sum, sum-of-squares) so the joint
  (V, C) statistics (`model/layers.py:246`) reduce across tiles in one
  tiny XLA step.

The LayerNorm *normalize* + dropout of block ``l`` runs inside block
``l+1``'s ``head_fused`` (it is per-vertex once the scalar stats are
known), so between ST blocks no full-size activation crosses HBM more
than once in each direction. Dropout uses the on-core PRNG seeded by
``(seed, program_id)`` and is regenerated identically in the backward
kernel — no mask tensor in HBM.

All large I/O crosses HBM in channel-before-vertex layout ``[B, T, C,
V]``: Pallas pins row-major operand layouts, and with C ∈ {8, 16} in
the lane dimension the TPU (8, 128) tiling would pad HBM buffers 8–16×
(measured: a B=8 100k-vertex train step demanded 15.3 GB of temps at
15% utilization). C sits in sublanes (multiple of 8), V in lanes
(multiple of 128): zero padding. The kernel math is cv-native — every
channel contraction runs as a (b·t)-batched ``[g, c] @ [c, v]`` MXU dot
(contraction in RHS sublanes / LHS lanes, :func:`_bdot`), so no
cv↔vc tile transposes exist on the hot path (the earlier vc-internal
formulation paid ~9 µs of VPU transpose per 128-vertex tile — ~8.7 ms
per kernel sweep at 100k vertices; probe: ``scripts/probe_cv_dot.py``,
batched cv dots measure at the copy floor on every shape).

Both kernels ship hand-written recompute-based backward kernels wired
via ``custom_vjp`` (the forward is cheap to recompute per tile), with
weight gradients accumulated in f32 across the sequential TPU grid —
the same scheme as :mod:`fused_stblock`, whose layer math helpers
(`_gate_fwd/_gate_bwd/_tconv_fwd/_tconv_bwd` …) are reused verbatim;
reference semantics citations live there.

Everything runs in the activation dtype (bf16 in production) with f32
matmul accumulation and f32 LayerNorm statistics.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgcn_tpu.kernels.fused_stblock import (
    _BF16,
    _F32,
    _PRECISIONS,
    _fsum,
    _pos_mask,
    _round_up,
    _shift_pad_t,
    _sigmoid,
    _sum_vc,
)


@dataclasses.dataclass(frozen=True)
class VertexBlockCfg:
    """Static config shared by the head/tail kernels of one ST block
    (hashable: ``custom_vjp`` nondiff arg and compile-cache key)."""

    kt: int
    ks: int
    act_func: str
    graph_conv_type: str
    droprate: float
    v_true: int          # true vertex count (LN statistics mask)
    v_pad: int           # padded vertex count (tile_v multiple)
    t_in: int            # input time length of this block
    c_in: int
    c0: int
    c1: int
    c2: int
    tile_v: int
    apply_ln: bool       # head: normalize+dropout the input (block l>0)
    training: bool
    interpret: bool = False
    precision: str = "default"
    b_tile: int = 0      # batch tile (0 = whole batch per grid step)
    # larger batch tile for FORWARD kernels only (0 = use b_tile). The
    # backward's VMEM footprint pins b_tile low; forward-only grids can
    # run ~4x fewer, bigger steps — the dominant cost at small V is
    # per-grid-step overhead (measured ~12 us/step at configs[2]).
    # Dropout-mask-generating heads (training & apply_ln) must keep
    # b_tile: the in-kernel PRNG mask is seeded per grid step and the
    # backward regenerates it, so fwd/bwd tilings must match there
    # (_drop_mask; enforced in _grid_of).
    b_tile_fwd: int = 0
    backend: str = "pallas"  # "pallas" (Mosaic kernels) | "xla" (whole-array
    #                          cv-layout jnp cores, autodiff backward)

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

    @property
    def n_terms(self) -> int:
        """Graph terms entering the weight contraction besides xg."""
        return 1 if self.graph_conv_type == "graph_conv" else self.ks - 1


def _compiler_params():
    # v5e has 128 MB of VMEM per core; STGCN_VMEM_LIMIT_MB widens the
    # scoped budget for tiling experiments (watch for Mosaic spills)
    import os

    mb = int(os.environ.get("STGCN_VMEM_LIMIT_MB", "100"))
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


def bwd_bytes_per_sample(cfg: VertexBlockCfg) -> int:
    """Estimated per-grid-step VMEM bytes PER BATCH SAMPLE of the worst
    kernel (the tail backward — f32 intermediates for the forward
    replay, the gradient chain, and double-buffered input blocks)."""
    nt = cfg.n_terms
    return 4 * cfg.tile_v * (
        cfg.t_in * cfg.c_in * 3
        + cfg.t1 * (cfg.g1 * 3 + cfg.c0 * 2 + cfg.c1 * (5 + 2 * nt))
        + cfg.t2 * (cfg.g2 * 3 + cfg.c2 * 4))


def pick_b_tile(cfg: VertexBlockCfg, b: int,
                budget_bytes: int = 52 * 1024 * 1024) -> int:
    """Batch tile whose estimated per-grid-step VMEM footprint
    (:func:`bwd_bytes_per_sample`) stays under ``budget_bytes`` (the
    kernels' scoped limit is 100 MB). Prefers an exact divisor of ``b``
    (no padding); falls back to the largest power of two under budget,
    for which the caller pads the batch."""
    per_sample = bwd_bytes_per_sample(cfg)
    cap = max(1, min(b, budget_bytes // per_sample))
    for d in range(cap, 0, -1):
        if b % d == 0:
            if 2 * d > cap:
                return d          # divisor within 2x of cap: no padding
            break
    return 1 << (cap.bit_length() - 1)


def pick_b_tile_fwd(cfg: VertexBlockCfg, b: int, b_tile: int,
                    budget_bytes: int = 52 * 1024 * 1024) -> int:
    """Larger batch tile for the forward-only kernels (see
    ``VertexBlockCfg.b_tile_fwd``): the forward footprint is the block
    I/O plus the head/tail intermediates in f32, far below the tail
    backward's. Returns the largest multiple of ``b_tile`` that divides
    the (padded) batch ``b`` and fits the budget — the multiple/divisor
    constraints keep one padded batch valid for both tilings."""
    nt = cfg.n_terms
    # f32 intermediates of the LARGER of the two forward kernels (they
    # never coexist in one grid step): head = x + s1 + xin1/a1 + xg;
    # tail = xg+terms + r/h + s2 + xin2/a2. I/O blocks double-buffer but
    # are small next to the gate-width intermediates.
    head = cfg.t_in * cfg.c_in * 2 + cfg.t1 * (cfg.g1 + cfg.c0 * 2 + cfg.c1)
    tail = (cfg.t1 * cfg.c1 * (2 + nt)
            + cfg.t2 * (cfg.g2 + cfg.c2 * 2))
    per_sample = 4 * cfg.tile_v * max(head, tail)
    cap = max(1, min(b, budget_bytes // per_sample))
    best = b_tile
    k = 1
    while True:
        cand = b_tile * k
        if cand > cap or cand > b:
            break
        if b % cand == 0:
            best = cand
        k += 1
    return best


# --------------------------------------------------------------------------
# shared math (runs inside Pallas kernels and as plain jnp reference)
# --------------------------------------------------------------------------

def _cv2vc(x):
    """[b, t, c, v_tile] → [b, t, v_tile, c]. NOT on the kernel hot path
    anymore (the cores are cv-native, see :func:`_bdot`); kept as the
    layout-study reference and for ``scripts/bench_copy_kernel.py``."""
    b, t, c, v = x.shape
    return jnp.transpose(x.reshape(b * t, c, v), (0, 2, 1)).reshape(
        b, t, v, c)


def _vc2cv(x):
    """[b, t, v_tile, c] → [b, t, c, v_tile] (see :func:`_cv2vc`)."""
    b, t, v, c = x.shape
    return jnp.transpose(x.reshape(b * t, v, c), (0, 2, 1)).reshape(
        b, t, c, v)


def _bdot(x, w, prec=None):
    """cv-layout channel contraction ``[bt, t, c, v] × [c, g] → [bt, t,
    g, v]`` (f32 result) as a (bt·t)-batched ``[g, c] @ [c, v]`` matmul:
    the contraction sits in the RHS sublanes / LHS lanes — the MXU's
    native row-major operand layout — so no cv↔vc transpose is needed.
    Measured at the copy floor for every (c, g) the kernels use
    (``scripts/probe_cv_dot.py``; the broadcast of ``w`` is free)."""
    bt, t, c, v = x.shape
    g = w.shape[1]
    if c == 1:  # K=1 degenerate dot: outer-product broadcast on the VPU
        return w.astype(_F32).T.reshape(1, 1, g, 1) * x.astype(_F32)
    xr = x.reshape(bt * t, c, v)
    wb = jnp.broadcast_to(w.T[None], (bt * t, g, c))
    out = lax.dot_general(wb, xr, (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=_F32, precision=prec)
    return out.reshape(bt, t, g, v)


def _bdot_xla(x, w, prec=None):
    """XLA-path twin of :func:`_bdot` — a plain einsum so XLA picks its
    own batching/layout instead of materializing the broadcast weight
    (the explicit batched form is Mosaic-only; at B=512 the broadcast
    would be ~80 MB in HBM)."""
    return jnp.einsum("btcv,cg->btgv", x, w, precision=prec,
                      preferred_element_type=_F32)


def _dot_of(cfg):
    return _bdot_xla if cfg.backend == "xla" else _bdot


def _bdot_sum(a, b, prec=None):
    """cv-layout weight-gradient contraction: Σ over (bt, t, v) of
    ``a[.., ca, v] · b[.., cb, v] → [ca, cb]`` f32 — batched ``A @ Bᵀ``
    with the v contraction in both operands' lanes, then a tiny
    batch-axis reduction."""
    bt, t, ca, v = a.shape
    cb = b.shape[2]
    out = lax.dot_general(a.reshape(bt * t, ca, v), b.reshape(bt * t, cb, v),
                          (((2,), (2,)), ((0,), (0,))),
                          preferred_element_type=_F32, precision=prec)
    return jnp.sum(out, axis=0)


def _pad_channels_cv(x4, c_out):
    """Zero-pad channel align on the cv channel axis (-2)
    (`model/layers.py:17-19`); identity if equal."""
    c_in = x4.shape[2]
    if c_in == c_out:
        return x4
    if c_in > c_out:
        raise ValueError("fused block supports c_in <= c_out align only")
    return jnp.pad(x4, ((0, 0), (0, 0), (0, c_out - c_in), (0, 0)))


def _gate_fwd_cv(cfg, s, xin, c, want_aux: bool = False):
    """cv-layout mirror of ``fused_stblock._gate_fwd`` (reference gate
    semantics `model/layers.py:105,109,111-115`; channel axis -2)."""
    aux = {}
    if cfg.gated:
        p, q = s[:, :, :c, :], s[:, :, c:, :]
        lin = p + xin
        sq = _sigmoid(q)
        aux["sq"] = sq
        if cfg.act_func == "glu":
            a = lin * sq
        else:
            th = jnp.tanh(lin)
            aux["th"] = th
            a = th * sq
    else:
        z = s + xin
        if cfg.act_func == "relu":
            a = jnp.maximum(z, 0)
        else:  # silu
            sz = _sigmoid(z)
            aux["sq"] = sz
            a = z * sz
    return (a, aux) if want_aux else a


def _gate_bwd_cv(cfg, s, xin, c, da, aux=None):
    """cv-layout mirror of ``fused_stblock._gate_bwd``; returns
    (ds, dxin)."""
    one = s.dtype.type(1.0)
    aux = aux or {}
    if cfg.gated:
        p, q = s[:, :, :c, :], s[:, :, c:, :]
        lin = p + xin
        sq = aux.get("sq")
        if sq is None:
            sq = _sigmoid(q)
        if cfg.act_func == "glu":
            dlin = da * sq
            dq = da * lin * sq * (one - sq)
        else:  # gtu
            th = aux.get("th")
            if th is None:
                th = jnp.tanh(lin)
            dlin = da * sq * (one - th * th)
            dq = da * th * sq * (one - sq)
        return jnp.concatenate([dlin, dq], axis=2), dlin
    z = s + xin
    if cfg.act_func == "relu":
        dz = da * _pos_mask(z)
    else:  # silu
        sz = aux.get("sq")
        if sz is None:
            sz = _sigmoid(z)
        dz = da * sz * (one + z * (one - sz))
    return dz, dz


def _tconv_fwd_cv(x4, kernel, bias, kt, prec=None, dot=_bdot):
    """Tap-decomposed valid temporal conv on cv tiles, one batched dot
    per tap. ``x4``: [bt, t, c_in, v]; ``kernel``: [kt, c_in, c_out]."""
    t_out = x4.shape[1] - kt + 1
    acc = dot(x4[:, 0:t_out], kernel[0], prec)
    for k in range(1, kt):
        acc = acc + dot(x4[:, k:k + t_out], kernel[k], prec)
    return (acc + bias.astype(_F32)[:, None]).astype(x4.dtype)


def _tconv_bwd_cv(x4, ds, kernel, kt, prec):
    """Backward of the cv tap-decomposed conv: (dkernel, dbias, dx)."""
    t_out = ds.shape[1]
    t_total = x4.shape[1]
    dk = jnp.stack([_bdot_sum(x4[:, k:k + t_out], ds, prec)
                    for k in range(kt)])
    db = _fsum(ds, (0, 1, 3))
    dx = _shift_pad_t(_bdot(ds, kernel[0].T, prec).astype(ds.dtype),
                      0, t_total)
    for k in range(1, kt):
        dx = dx + _shift_pad_t(_bdot(ds, kernel[k].T, prec).astype(ds.dtype),
                               k, t_total)
    return dk, db, dx


def _ln_drop_fwd(cfg, x4, mu, rstd, lng, lnb, mask):
    """Normalize the previous block's pre-LN output with given scalar
    stats, apply the (V, C) affine, then dropout. All operands cv-layout:
    ``x4`` [bt, t, c, v_tile]; ``mu``/``rstd``: [B, T, 1, 1] keepdims
    (Mosaic cannot reshape a 2D vector to trailing-singleton 4D, so stats
    stay 4D end-to-end); ``lng``/``lnb``: [c, tile_v] (zero on padded
    rows)."""
    cdt = x4.dtype
    xn = (x4.astype(_F32) - mu) * rstd
    y = (xn * lng + lnb).astype(cdt)
    if mask is not None:
        y = y * mask
    return y


def _ln_drop_bwd(cfg, x4, mu, rstd, lng, lnb, mask, dy):
    """Returns (dx_raw, dmu[B,T,1,1], drstd[B,T,1,1], dlng, dlnb) for the
    head's input-normalization stage. Statistics math in f32."""
    xn = (x4.astype(_F32) - mu) * rstd
    dy0 = dy if mask is None else dy * mask
    dy32 = dy0.astype(_F32)
    dlng = jnp.sum(dy32 * xn, axis=(0, 1))
    dlnb = jnp.sum(dy32, axis=(0, 1))
    dxn = dy32 * lng
    dx = (dxn * rstd).astype(x4.dtype)
    dmu = -_sum_vc(dxn) * rstd
    drstd = _sum_vc(dxn * (x4.astype(_F32) - mu))
    return dx, dmu, drstd, dlng, dlnb


def _head_core(cfg, x4, w):
    """tconv1 → gate → align on cv tiles; ``x4`` already
    normalized/dropped. Returns dict of intermediates."""
    c1k, c1b, gaw, gab = w
    prec = _PRECISIONS[cfg.precision]
    dot = _dot_of(cfg)
    s1 = _tconv_fwd_cv(x4, c1k, c1b, cfg.kt, prec, dot)
    xin1 = _pad_channels_cv(x4[:, cfg.kt - 1:], cfg.c0)
    a1, aux1 = _gate_fwd_cv(cfg, s1, xin1, cfg.c0, want_aux=True)
    xg = (dot(a1, gaw, prec)
          + gab.astype(_F32)[:, None]).astype(a1.dtype)
    return dict(s1=s1, xin1=xin1, a1=a1, xg=xg, aux1=aux1)


def _head_core_bwd(cfg, x4, w, fw, dxg):
    """Backward of `_head_core`; returns dict with dx4 and weight grads."""
    c1k, c1b, gaw, gab = w
    prec = _PRECISIONS[cfg.precision]
    cdt = x4.dtype
    dgaw = _bdot_sum(fw["a1"], dxg, prec)
    dgab = _fsum(dxg, (0, 1, 3))
    da1 = _bdot(dxg, gaw.T, prec).astype(cdt)
    ds1, dxin1 = _gate_bwd_cv(cfg, fw["s1"], fw["xin1"], cfg.c0, da1,
                              aux=fw.get("aux1"))
    dc1k, dc1b, dx4 = _tconv_bwd_cv(x4, ds1, c1k, cfg.kt, prec)
    dx4 = dx4 + _shift_pad_t(dxin1[:, :, : cfg.c_in, :], cfg.kt - 1,
                             cfg.t_in)
    return dict(dx4=dx4, dc1k=dc1k, dc1b=dc1b, dgaw=dgaw, dgab=dgab)


def _tail_core(cfg, xg, terms, w):
    """Weight contraction (+bias) → residual → ReLU → tconv2 → gate, on
    cv tiles. ``terms``: the graph outputs [T_1..] (cheb) or [G x]
    (graph_conv); for cheb the contraction also includes T_0 = xg."""
    gcw, gcb, c2k, c2b = w
    prec = _PRECISIONS[cfg.precision]
    dot = _dot_of(cfg)
    cterms = ([xg] + list(terms) if cfg.graph_conv_type == "cheb_graph_conv"
              else list(terms))
    out = dot(cterms[0], gcw[0], prec)
    for k in range(1, len(cterms)):
        out = out + dot(cterms[k], gcw[k], prec)
    gc = (out + gcb.astype(_F32)[:, None]).astype(xg.dtype)
    r = gc + xg
    h = jnp.maximum(r, 0)
    s2 = _tconv_fwd_cv(h, c2k, c2b, cfg.kt, prec, dot)
    xin2 = _pad_channels_cv(h[:, cfg.kt - 1:], cfg.c2)
    a2, aux2 = _gate_fwd_cv(cfg, s2, xin2, cfg.c2, want_aux=True)
    return dict(r=r, h=h, s2=s2, xin2=xin2, a2=a2, aux2=aux2,
                cterms=cterms)


def _tail_core_bwd(cfg, xg, terms, w, fw, da2):
    """Backward of `_tail_core`: returns dxg, dterms and weight grads."""
    gcw, gcb, c2k, c2b = w
    prec = _PRECISIONS[cfg.precision]
    cdt = xg.dtype
    ds2, dxin2 = _gate_bwd_cv(cfg, fw["s2"], fw["xin2"], cfg.c2, da2,
                              aux=fw.get("aux2"))
    dc2k, dc2b, dh = _tconv_bwd_cv(fw["h"], ds2, c2k, cfg.kt, prec)
    dh = dh + _shift_pad_t(dxin2[:, :, : cfg.c1, :], cfg.kt - 1, cfg.t1)
    dr = dh * _pos_mask(fw["r"])
    dgc = dr
    cterms = fw["cterms"]
    dgcw = jnp.stack([_bdot_sum(cterms[k], dgc, prec)
                      for k in range(len(cterms))])
    dgcb = _fsum(dgc, (0, 1, 3))
    dcterms = [_bdot(dgc, gcw[k].T, prec).astype(cdt)
               for k in range(len(cterms))]
    if cfg.graph_conv_type == "cheb_graph_conv":
        dxg = dr + dcterms[0]
        dterms = dcterms[1:]
    else:
        dxg = dr
        dterms = dcterms
    return dict(dxg=dxg, dterms=dterms, dgcw=dgcw, dgcb=dgcb,
                dc2k=dc2k, dc2b=dc2b)


def _drop_mask(cfg, seed, shape):
    """Pre-scaled in-kernel keep mask, regenerated identically in the
    backward (seeded by (seed, flat grid step) — Mosaic supports at most
    two seed values)."""
    pltpu.prng_seed(
        seed, pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    thr = np.uint32(round(cfg.droprate * float(2 ** 32)))
    inv_keep = 1.0 / (1.0 - cfg.droprate)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return ((bits >= thr).astype(_F32) * inv_keep).astype(
        _BF16 if cfg.precision == "bfloat16" else _F32)


def _vmask(cfg, vtrue):
    """[1, 1, 1, tile_v] f32 mask of true-vertex lanes for this grid step
    (cv layout: vertices in lanes). ``vtrue`` is a dynamic scalar
    (prefetch arg) so the same compiled kernel serves every shard of a
    vertex-partitioned mesh, where the local true-row count differs per
    shard. The grid is ``(batch tiles, vertex tiles)`` — vertex index is
    dim 1."""
    rows = pl.program_id(1) * cfg.tile_v + lax.broadcasted_iota(
        jnp.int32, (1, cfg.tile_v), 1)
    return (rows < vtrue).astype(_F32)[None, None, :, :]


def _cdt_of(cfg):
    return _BF16 if cfg.precision == "bfloat16" else _F32


# --------------------------------------------------------------------------
# head kernel: [LN-normalize + dropout →] tconv1 → gate → align
# --------------------------------------------------------------------------

def _make_head_fwd_kernel(cfg, b):
    def kernel(seed_ref, *refs):
        if cfg.apply_ln:
            (x_ref, mu_ref, rstd_ref, lng_ref, lnb_ref,
             c1k, c1b, gaw, gab, out_ref) = refs
        else:
            x_ref, c1k, c1b, gaw, gab, out_ref = refs
        x4 = x_ref[...]
        if cfg.apply_ln:
            mask = None
            if cfg.training and cfg.droprate > 0.0:
                mask = _drop_mask(cfg, seed_ref[0], x4.shape)
            x4 = _ln_drop_fwd(cfg, x4, mu_ref[...], rstd_ref[...],
                              lng_ref[...], lnb_ref[...], mask)
        fw = _head_core(cfg, x4, (c1k[...], c1b[...], gaw[...], gab[...]))
        out_ref[...] = fw["xg"]

    return kernel


def _make_head_bwd_kernel(cfg, b):
    def kernel(seed_ref, *refs):
        if cfg.apply_ln:
            (x_ref, mu_ref, rstd_ref, lng_ref, lnb_ref,
             c1k, c1b, gaw, gab, gy_ref,
             dx_ref, dmu_ref, drstd_ref, dlng_ref, dlnb_ref,
             dc1k_ref, dc1b_ref, dgaw_ref, dgab_ref) = refs
        else:
            (x_ref, c1k, c1b, gaw, gab, gy_ref,
             dx_ref, dc1k_ref, dc1b_ref, dgaw_ref, dgab_ref) = refs
        w = (c1k[...], c1b[...], gaw[...], gab[...])
        x4raw = x_ref[...]
        mask = None
        if cfg.apply_ln:
            if cfg.training and cfg.droprate > 0.0:
                mask = _drop_mask(cfg, seed_ref[0], x4raw.shape)
            x4 = _ln_drop_fwd(cfg, x4raw, mu_ref[...], rstd_ref[...],
                              lng_ref[...], lnb_ref[...], mask)
        else:
            x4 = x4raw
        fw = _head_core(cfg, x4, w)
        bw = _head_core_bwd(cfg, x4, w, fw, gy_ref[...])

        if cfg.apply_ln:
            dx, dmu, drstd, dlng, dlnb = _ln_drop_bwd(
                cfg, x4raw, mu_ref[...], rstd_ref[...], lng_ref[...],
                lnb_ref[...], mask, bw["dx4"])
            dx_ref[...] = dx
            # per-(batch tile) partials: a [tile_v] output block would be
            # revisited NON-consecutively across batch tiles, which Mosaic
            # does not re-fetch — the caller sums over the leading axis.
            # Stored in the LN arrays' dtype (bf16 in mixed precision —
            # [C, V_pad] f32 partials cost ~0.5 GB at 1M vertices).
            dlng_ref[...] = dlng[None].astype(dlng_ref.dtype)
            dlnb_ref[...] = dlnb[None].astype(dlnb_ref.dtype)

            # dmu/drstd blocks are constant over the inner (vertex) grid
            # dim, so accumulation across consecutive steps is safe.
            @pl.when(pl.program_id(1) == 0)
            def _init_stats():
                dmu_ref[...] = jnp.zeros_like(dmu_ref)
                drstd_ref[...] = jnp.zeros_like(drstd_ref)

            dmu_ref[...] += dmu
            drstd_ref[...] += drstd
        else:
            dx_ref[...] = bw["dx4"]

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init():
            dc1k_ref[...] = jnp.zeros_like(dc1k_ref)
            dc1b_ref[...] = jnp.zeros_like(dc1b_ref)
            dgaw_ref[...] = jnp.zeros_like(dgaw_ref)
            dgab_ref[...] = jnp.zeros_like(dgab_ref)

        dc1k_ref[...] += bw["dc1k"]
        dc1b_ref[...] += bw["dc1b"][None, :]
        dgaw_ref[...] += bw["dgaw"]
        dgab_ref[...] += bw["dgab"][None, :]

    return kernel


def _cspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *_: (0,) * nd)


def _grid_of(cfg, b, fwd=False):
    """(batch tiles, vertex tiles) — batch OUTER so that stat blocks
    indexed by batch tile stay resident across the inner vertex sweep.

    ``fwd=True`` (forward-only pallas_call) may use the larger
    ``cfg.b_tile_fwd`` — unless this kernel generates a dropout mask
    (training head with apply_ln), whose per-grid-step PRNG seeding
    must tile identically in the backward regeneration."""
    bt = cfg.b_tile or b
    if fwd and cfg.b_tile_fwd:
        if not (cfg.training and cfg.droprate > 0.0 and cfg.apply_ln):
            bt = cfg.b_tile_fwd
    if b % bt:
        raise ValueError(f"batch {b} not a multiple of b_tile {bt}")
    return bt, (b // bt, cfg.v_pad // cfg.tile_v)


def _head_pallas(cfg, seed, x, ln, w):
    b = x.shape[0]
    bt, grid = _grid_of(cfg, b, fwd=True)
    c1k, c1b, gaw, gab = w
    in_specs = [pl.BlockSpec((bt, cfg.t_in, cfg.c_in, cfg.tile_v),
                             lambda j, i, *_: (j, 0, 0, i))]
    args = [x]
    if cfg.apply_ln:
        mu, rstd, lng, lnb = ln
        in_specs += [pl.BlockSpec((bt, cfg.t_in, 1, 1),
                                  lambda j, i, *_: (j, 0, 0, 0)),
                     pl.BlockSpec((bt, cfg.t_in, 1, 1),
                                  lambda j, i, *_: (j, 0, 0, 0)),
                     pl.BlockSpec((cfg.c_in, cfg.tile_v),
                                  lambda j, i, *_: (0, i)),
                     pl.BlockSpec((cfg.c_in, cfg.tile_v),
                                  lambda j, i, *_: (0, i))]
        args += [mu, rstd, lng, lnb]
    in_specs += [_cspec(c1k.shape), _cspec(c1b.shape),
                 _cspec(gaw.shape), _cspec(gab.shape)]
    args += [c1k, c1b, gaw, gab]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, cfg.t1, cfg.c1, cfg.tile_v),
                               lambda j, i, *_: (j, 0, 0, i)),
    )
    return pl.pallas_call(
        _make_head_fwd_kernel(cfg, bt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cfg.t1, cfg.c1, cfg.v_pad),
                                       x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cfg.v_pad * cfg.t1
            * (cfg.kt * cfg.c_in * cfg.g1 + cfg.c0 * cfg.c1),
            bytes_accessed=(x.size + b * cfg.t1 * cfg.v_pad * cfg.c1)
            * x.dtype.itemsize,
            transcendentals=b * cfg.t1 * cfg.v_pad * cfg.g1,
        ),
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *args)


def _head_pallas_bwd(cfg, seed, x, ln, w, gy):
    b = x.shape[0]
    bt, grid = _grid_of(cfg, b)
    nbt = grid[0]
    c1k, c1b, gaw, gab = w
    in_specs = [pl.BlockSpec((bt, cfg.t_in, cfg.c_in, cfg.tile_v),
                             lambda j, i, *_: (j, 0, 0, i))]
    args = [x]
    if cfg.apply_ln:
        mu, rstd, lng, lnb = ln
        in_specs += [pl.BlockSpec((bt, cfg.t_in, 1, 1),
                                  lambda j, i, *_: (j, 0, 0, 0)),
                     pl.BlockSpec((bt, cfg.t_in, 1, 1),
                                  lambda j, i, *_: (j, 0, 0, 0)),
                     pl.BlockSpec((cfg.c_in, cfg.tile_v),
                                  lambda j, i, *_: (0, i)),
                     pl.BlockSpec((cfg.c_in, cfg.tile_v),
                                  lambda j, i, *_: (0, i))]
        args += [mu, rstd, lng, lnb]
    in_specs += [_cspec(c1k.shape), _cspec(c1b.shape),
                 _cspec(gaw.shape), _cspec(gab.shape),
                 pl.BlockSpec((bt, cfg.t1, cfg.c1, cfg.tile_v),
                              lambda j, i, *_: (j, 0, 0, i))]
    args += [c1k, c1b, gaw, gab, gy]

    out_specs = [pl.BlockSpec((bt, cfg.t_in, cfg.c_in, cfg.tile_v),
                              lambda j, i, *_: (j, 0, 0, i))]
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    if cfg.apply_ln:
        # dmu/drstd accumulate over the inner vertex sweep (block constant
        # in i); dlng/dlnb are per-batch-tile partials summed by the caller
        out_specs += [pl.BlockSpec((bt, cfg.t_in, 1, 1),
                                   lambda j, i, *_: (j, 0, 0, 0)),
                      pl.BlockSpec((bt, cfg.t_in, 1, 1),
                                   lambda j, i, *_: (j, 0, 0, 0)),
                      pl.BlockSpec((1, cfg.c_in, cfg.tile_v),
                                   lambda j, i, *_: (j, 0, i)),
                      pl.BlockSpec((1, cfg.c_in, cfg.tile_v),
                                   lambda j, i, *_: (j, 0, i))]
        out_shapes += [jax.ShapeDtypeStruct(ln[0].shape, _F32),
                       jax.ShapeDtypeStruct(ln[1].shape, _F32),
                       jax.ShapeDtypeStruct((nbt, cfg.c_in, cfg.v_pad),
                                            ln[2].dtype),
                       jax.ShapeDtypeStruct((nbt, cfg.c_in, cfg.v_pad),
                                            ln[3].dtype)]
    out_specs += [_cspec(c1k.shape), _cspec((1, cfg.g1)),
                  _cspec(gaw.shape), _cspec((1, cfg.c1))]
    out_shapes += [jax.ShapeDtypeStruct(c1k.shape, _F32),
                   jax.ShapeDtypeStruct((1, cfg.g1), _F32),
                   jax.ShapeDtypeStruct(gaw.shape, _F32),
                   jax.ShapeDtypeStruct((1, cfg.c1), _F32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=in_specs, out_specs=out_specs)
    return pl.pallas_call(
        _make_head_bwd_kernel(cfg, bt),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * cfg.v_pad * cfg.t1
            * (cfg.kt * cfg.c_in * cfg.g1 + cfg.c0 * cfg.c1),
            bytes_accessed=2 * (x.size + gy.size) * x.dtype.itemsize,
            transcendentals=2 * b * cfg.t1 * cfg.v_pad * cfg.g1,
        ),
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def head_fused(cfg, seed, x, mu, rstd, lng, lnb, c1k, c1b, gaw, gab):
    """Fused block head on ``[B, T, c_in, V_pad]`` (channel-before-vertex
    — see :func:`_cv2vc`); returns the graph operand ``xg``
    ``[B, T−kt+1, c1, V_pad]``. ``lng``/``lnb``: ``[c_in, V_pad]``. When
    ``cfg.apply_ln``, the input is first normalized with the given stats
    (the previous block's LayerNorm) and dropped out (reference order
    `model/layers.py:255-256` — LN then dropout then next block)."""
    ln = (mu, rstd, lng, lnb) if cfg.apply_ln else None
    return _head_pallas(cfg, seed, x, ln, (c1k, c1b, gaw, gab))


def _head_fused_fwd(cfg, seed, x, mu, rstd, lng, lnb, *w):
    ln = (mu, rstd, lng, lnb)
    y = _head_pallas(cfg, seed, x, ln if cfg.apply_ln else None, w)
    return y, (seed, x, ln, w)


def _head_fused_bwd(cfg, res, gy):
    seed, x, ln, w = res
    mu, rstd, lng, lnb = ln
    outs = _head_pallas_bwd(cfg, seed, x, ln if cfg.apply_ln else None, w,
                            gy.astype(x.dtype))
    seed_bar = np.zeros((), jax.dtypes.float0)
    if cfg.apply_ln:
        (dx, dmu, drstd, dlng, dlnb, dc1k, dc1b, dgaw, dgab) = outs
        dlng = jnp.sum(dlng, axis=0)  # over batch-tile partials
        dlnb = jnp.sum(dlnb, axis=0)
        return (seed_bar, dx, dmu.astype(mu.dtype), drstd.astype(rstd.dtype),
                dlng.astype(lng.dtype), dlnb.astype(lnb.dtype),
                dc1k.astype(w[0].dtype), dc1b[0].astype(w[1].dtype),
                dgaw.astype(w[2].dtype), dgab[0].astype(w[3].dtype))
    dx, dc1k, dc1b, dgaw, dgab = outs
    return (seed_bar, dx, jnp.zeros_like(mu), jnp.zeros_like(rstd),
            jnp.zeros_like(lng), jnp.zeros_like(lnb),
            dc1k.astype(w[0].dtype), dc1b[0].astype(w[1].dtype),
            dgaw.astype(w[2].dtype), dgab[0].astype(w[3].dtype))


head_fused.defvjp(_head_fused_fwd, _head_fused_bwd)


# --------------------------------------------------------------------------
# tail kernel: contraction → residual → ReLU → tconv2 → gate → LN partials
# --------------------------------------------------------------------------

def _make_tail_fwd_kernel(cfg, b):
    nt = cfg.n_terms

    def kernel(scal_ref, *refs):
        xg_ref = refs[0]
        term_refs = refs[1:1 + nt]
        gcw, gcb, c2k, c2b = refs[1 + nt:5 + nt]
        a2_ref, ps_ref, pss_ref = refs[5 + nt:]
        fw = _tail_core(cfg, xg_ref[...],
                        [t[...] for t in term_refs],
                        (gcw[...], gcb[...], c2k[...], c2b[...]))
        a2 = fw["a2"]
        a2_ref[...] = a2
        vm = _vmask(cfg, scal_ref[0])
        a32 = a2.astype(_F32) * vm
        # LN partials accumulate across the inner vertex sweep (their
        # [bt, T2, 1, 1] block is constant in the vertex grid dim)
        @pl.when(pl.program_id(1) == 0)
        def _init_stats():
            ps_ref[...] = jnp.zeros_like(ps_ref)
            pss_ref[...] = jnp.zeros_like(pss_ref)

        ps_ref[...] += _sum_vc(a32)
        pss_ref[...] += _sum_vc(a32 * a32)

    return kernel


def _make_tail_bwd_kernel(cfg, b):
    nt = cfg.n_terms

    def kernel(scal_ref, *refs):
        xg_ref = refs[0]
        term_refs = refs[1:1 + nt]
        gcw, gcb, c2k, c2b = refs[1 + nt:5 + nt]
        ga2_ref, gps_ref, gpss_ref = refs[5 + nt:8 + nt]
        dxg_ref = refs[8 + nt]
        dterm_refs = refs[9 + nt:9 + 2 * nt]
        (dgcw_ref, dgcb_ref, dc2k_ref, dc2b_ref) = refs[9 + 2 * nt:]
        w = (gcw[...], gcb[...], c2k[...], c2b[...])
        xg = xg_ref[...]
        terms = [t[...] for t in term_refs]
        fw = _tail_core(cfg, xg, terms, w)
        # fold the LN-partial cotangents into da2 (masked to true lanes):
        # ps = Σ a2, pss = Σ a2² over (tile lanes, c2) per (b, t2)
        vm = _vmask(cfg, scal_ref[0])
        da2 = (ga2_ref[...].astype(_F32)
               + (gps_ref[...]
                  + 2.0 * gpss_ref[...] * fw["a2"].astype(_F32))
               * vm).astype(xg.dtype)
        bw = _tail_core_bwd(cfg, xg, terms, w, fw, da2)
        dxg_ref[...] = bw["dxg"]
        for r, dt in zip(dterm_refs, bw["dterms"]):
            r[...] = dt

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init():
            dgcw_ref[...] = jnp.zeros_like(dgcw_ref)
            dgcb_ref[...] = jnp.zeros_like(dgcb_ref)
            dc2k_ref[...] = jnp.zeros_like(dc2k_ref)
            dc2b_ref[...] = jnp.zeros_like(dc2b_ref)

        dgcw_ref[...] += bw["dgcw"]
        dgcb_ref[...] += bw["dgcb"][None, :]
        dc2k_ref[...] += bw["dc2k"]
        dc2b_ref[...] += bw["dc2b"][None, :]

    return kernel


def _tail_pallas(cfg, vtrue, xg, terms, w):
    b = xg.shape[0]
    bt, grid = _grid_of(cfg, b, fwd=True)
    gcw, gcb, c2k, c2b = w
    vspec = pl.BlockSpec((bt, cfg.t1, cfg.c1, cfg.tile_v),
                         lambda j, i, *_: (j, 0, 0, i))
    in_specs = [vspec] + [vspec] * len(terms)
    in_specs += [_cspec(gcw.shape), _cspec(gcb.shape),
                 _cspec(c2k.shape), _cspec(c2b.shape)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bt, cfg.t2, cfg.c2, cfg.tile_v),
                         lambda j, i, *_: (j, 0, 0, i)),
            pl.BlockSpec((bt, cfg.t2, 1, 1),
                         lambda j, i, *_: (j, 0, 0, 0)),
            pl.BlockSpec((bt, cfg.t2, 1, 1),
                         lambda j, i, *_: (j, 0, 0, 0)),
        ],
    )
    return pl.pallas_call(
        _make_tail_fwd_kernel(cfg, bt),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, cfg.t2, cfg.c2, cfg.v_pad), xg.dtype),
            jax.ShapeDtypeStruct((b, cfg.t2, 1, 1), _F32),
            jax.ShapeDtypeStruct((b, cfg.t2, 1, 1), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cfg.v_pad * cfg.t1
            * ((cfg.n_terms + 1) * cfg.c1 * cfg.c1
               + cfg.kt * cfg.c1 * cfg.g2),
            bytes_accessed=((1 + len(terms)) * xg.size
                            + b * cfg.t2 * cfg.v_pad * cfg.c2)
            * xg.dtype.itemsize,
            transcendentals=b * cfg.t2 * cfg.v_pad * cfg.g2,
        ),
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(jnp.asarray(vtrue, jnp.int32).reshape(1), xg, *terms,
      gcw, gcb, c2k, c2b)


def _tail_pallas_bwd(cfg, vtrue, xg, terms, w, ga2, gps, gpss):
    b = xg.shape[0]
    bt, grid = _grid_of(cfg, b)
    gcw, gcb, c2k, c2b = w
    vspec = pl.BlockSpec((bt, cfg.t1, cfg.c1, cfg.tile_v),
                         lambda j, i, *_: (j, 0, 0, i))
    pspec = pl.BlockSpec((bt, cfg.t2, 1, 1),
                         lambda j, i, *_: (j, 0, 0, 0))
    in_specs = [vspec] + [vspec] * len(terms)
    in_specs += [_cspec(gcw.shape), _cspec(gcb.shape),
                 _cspec(c2k.shape), _cspec(c2b.shape),
                 pl.BlockSpec((bt, cfg.t2, cfg.c2, cfg.tile_v),
                              lambda j, i, *_: (j, 0, 0, i)),
                 pspec, pspec]
    out_specs = [vspec] + [vspec] * len(terms)
    out_shapes = [jax.ShapeDtypeStruct(xg.shape, xg.dtype)] * (1 + len(terms))
    out_specs += [_cspec(gcw.shape), _cspec((1, cfg.c1)),
                  _cspec(c2k.shape), _cspec((1, cfg.g2))]
    out_shapes += [jax.ShapeDtypeStruct(gcw.shape, _F32),
                   jax.ShapeDtypeStruct((1, cfg.c1), _F32),
                   jax.ShapeDtypeStruct(c2k.shape, _F32),
                   jax.ShapeDtypeStruct((1, cfg.g2), _F32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=in_specs, out_specs=out_specs)
    return pl.pallas_call(
        _make_tail_bwd_kernel(cfg, bt),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * cfg.v_pad * cfg.t1
            * ((cfg.n_terms + 1) * cfg.c1 * cfg.c1
               + cfg.kt * cfg.c1 * cfg.g2),
            bytes_accessed=2 * ((2 + 2 * len(terms)) * xg.size
                               + 2 * ga2.size) * xg.dtype.itemsize,
            transcendentals=2 * b * cfg.t2 * cfg.v_pad * cfg.g2,
        ),
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(jnp.asarray(vtrue, jnp.int32).reshape(1), xg, *terms,
      gcw, gcb, c2k, c2b, ga2, gps, gpss)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def tail_fused(cfg, vtrue, xg, t_a, t_b, gcw, gcb, c2k, c2b):
    """Fused block tail; all big operands channel-before-vertex
    (see :func:`_cv2vc`). ``t_a``/``t_b``: the graph outputs (``t_b`` is
    ignored when only one term exists — pass ``t_a`` again). Returns
    ``(a2 [B, T2, c2, V_pad], psum [B, T2, 1, 1], psumsq [B, T2, 1, 1])``
    — the pre-LN activation plus masked LayerNorm partial sums (already
    reduced over all vertex tiles). ``vtrue``: dynamic true-row count
    (per-shard under a vertex-partitioned mesh; ``cfg.v_true`` otherwise,
    see :func:`_vmask`)."""
    terms = [t_a, t_b][: cfg.n_terms]
    return _tail_pallas(cfg, vtrue, xg, terms, (gcw, gcb, c2k, c2b))


def _tail_fused_fwd(cfg, vtrue, xg, t_a, t_b, *w):
    terms = [t_a, t_b][: cfg.n_terms]
    outs = _tail_pallas(cfg, vtrue, xg, terms, w)
    return outs, (vtrue, xg, terms, w)


def _tail_fused_bwd(cfg, res, gs):
    vtrue, xg, terms, w = res
    ga2, gps, gpss = gs
    outs = _tail_pallas_bwd(cfg, vtrue, xg, terms, w, ga2.astype(xg.dtype),
                            gps.astype(_F32), gpss.astype(_F32))
    dxg = outs[0]
    dterms = list(outs[1:1 + cfg.n_terms])
    dgcw, dgcb, dc2k, dc2b = outs[1 + cfg.n_terms:]
    while len(dterms) < 2:
        dterms.append(jnp.zeros_like(xg))
    vtrue_bar = np.zeros(jnp.shape(vtrue), jax.dtypes.float0)
    return (vtrue_bar, dxg, dterms[0], dterms[1],
            dgcw.astype(w[0].dtype), dgcb[0].astype(w[1].dtype),
            dc2k.astype(w[2].dtype), dc2b[0].astype(w[3].dtype))


tail_fused.defvjp(_tail_fused_fwd, _tail_fused_bwd)


# --------------------------------------------------------------------------
# pure-jnp reference (CPU oracle; differentiable via autodiff)
# --------------------------------------------------------------------------

def head_reference(cfg, x, ln, w, drop_mask=None):
    """Whole-array jnp mirror of `head_fused` (cv-layout I/O throughout;
    drop_mask pre-scaled, cv orientation)."""
    if cfg.apply_ln:
        mu, rstd, lng, lnb = ln
        x = _ln_drop_fwd(cfg, x, mu, rstd, lng, lnb, drop_mask)
    return _head_core(cfg, x, w)["xg"]


def tail_reference(cfg, xg, terms, w):
    """Whole-array jnp mirror of `tail_fused` (cv-layout I/O)."""
    fw = _tail_core(cfg, xg, terms, w)
    a2 = fw["a2"]
    vm = (jnp.arange(cfg.v_pad) < cfg.v_true).astype(_F32)
    a32 = a2.astype(_F32) * vm
    ps = jnp.sum(a32, axis=(2, 3), keepdims=True)
    pss = jnp.sum(a32 * a32, axis=(2, 3), keepdims=True)
    return a2, ps, pss
