"""Fused output-head ('TNFF') Pallas kernels for the sparse cv path.

The reference output block (`model/layers.py:260-284`) is a short chain
— previous block's LayerNorm + dropout, a time-collapsing temporal gate,
LayerNorm over (V, C), fc1 → relu → dropout → fc2 — but at 100k vertices
its XLA lowering costs ~41 ms of the 140 ms fused training step
(measured by ablation, `_probe_ohead` round 4): every elementwise pass
and mis-oriented small-C dot crosses the full ``[B, ·, ·, V]`` activation
in HBM, forward and backward. Here the chain runs as TWO vertex-tiled
Mosaic kernels around the (V, C)-global LayerNorm statistics (which need
a cross-tile reduction and therefore one XLA hop):

    kernel A (``_ohead``):  final-ST-LN normalize + dropout → ko-tap
        temporal conv → gate (in-gate residual, `model/layers.py:105`)
        → masked LN partial sums (Σa, Σa²)
    XLA: μ/σ from the partials (a [B,1,1,1]-sized computation)
    kernel B (``_ofc``): LN normalize+affine → fc1 → relu → dropout → fc2

Both carry hand-written recompute-based backward kernels (custom VJP)
with the same accumulation patterns as the ST-block kernels
(:mod:`stgcn_tpu.kernels.vertex_fused`, whose cv primitives this module
reuses). Dropout masks use the on-core PRNG seeded per (seed, flat grid
step) and are regenerated identically in the backward — forward and
backward therefore share one batch tiling per kernel.
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

from stgcn_tpu.kernels.vertex_fused import (
    _F32,
    _PRECISIONS,
    _bdot,
    _bdot_sum,
    _compiler_params,
    _cspec,
    _gate_bwd_cv,
    _gate_fwd_cv,
    _ln_drop_bwd,
    _ln_drop_fwd,
    _pad_channels_cv,
    _pos_mask,
    _shift_pad_t,
    _sum_vc,
    _tconv_bwd_cv,
    _tconv_fwd_cv,
)


@dataclasses.dataclass(frozen=True)
class OutHeadCfg:
    """Static config for the fused output head (hashable: custom_vjp
    nondiff arg / compile-cache key)."""

    ko: int              # collapsed time steps (= kernel taps)
    c_in: int            # channels entering the head
    c0: int              # gate output channels (blocks[-2][0])
    c1: int              # fc1 output channels (blocks[-2][1])
    c_end: int           # final channels (blocks[-1][0], 1 in the ref)
    act_func: str
    droprate: float
    v_true: int
    v_pad: int
    tile_v: int
    b_tile: int
    training: bool
    interpret: object = False   # bool | pltpu.InterpretParams
    precision: str = "default"

    @property
    def gated(self) -> bool:
        return self.act_func in ("glu", "gtu")

    @property
    def g(self) -> int:
        return 2 * self.c0 if self.gated else self.c0


def _vmask_o(cfg, vtrue):
    rows = pl.program_id(1) * cfg.tile_v + lax.broadcasted_iota(
        jnp.int32, (1, cfg.tile_v), 1)
    return (rows < vtrue).astype(_F32)[None, None, :, :]


def _drop_mask_o(cfg, seed, shape):
    pltpu.prng_seed(
        seed, pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    thr = np.uint32(round(cfg.droprate * float(2 ** 32)))
    inv_keep = 1.0 / (1.0 - cfg.droprate)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return ((bits >= thr).astype(_F32) * inv_keep).astype(
        jnp.bfloat16 if cfg.precision == "bfloat16" else _F32)


def _grid_o(cfg, b):
    bt = cfg.b_tile or b
    if b % bt:
        raise ValueError(f"batch {b} not a multiple of b_tile {bt}")
    return bt, (b // bt, cfg.v_pad // cfg.tile_v)


def pick_b_tile_o(cfg: OutHeadCfg, b: int,
                  budget_bytes: int = 52 * 1024 * 1024) -> int:
    """Batch tile under the scoped-VMEM budget (worst case: kernel A's
    backward f32 intermediates)."""
    per_sample = 4 * cfg.tile_v * (
        cfg.ko * cfg.c_in * 4 + cfg.g * 3 + cfg.c0 * 4 + cfg.c1 * 3
        + cfg.c_end)
    cap = max(1, min(b, budget_bytes // per_sample))
    for d in range(cap, 0, -1):
        if b % d == 0:
            return d
    return 1


# --------------------------------------------------------------- kernel A

def _ohead_core(cfg, x4, ck, cb):
    """tconv(ko taps, t→1) → gate with in-gate residual. ``x4`` already
    normalized/dropped, [bt, ko, c_in, tv]."""
    prec = _PRECISIONS[cfg.precision]
    s = _tconv_fwd_cv(x4, ck, cb, cfg.ko, prec, _bdot)   # [bt, 1, g, tv]
    xin = _pad_channels_cv(x4[:, cfg.ko - 1:], cfg.c0)
    a, aux = _gate_fwd_cv(cfg, s, xin, cfg.c0, want_aux=True)
    return s, xin, a, aux


def _make_ohead_fwd_kernel(cfg, bt):
    def kernel(scal_ref, x_ref, mu_ref, rstd_ref, lng_ref, lnb_ref,
               ck_ref, cb_ref, a_ref, ps_ref, pss_ref):
        x4 = x_ref[...]
        mask = None
        if cfg.training and cfg.droprate > 0.0:
            mask = _drop_mask_o(cfg, scal_ref[1], x4.shape)
        x4 = _ln_drop_fwd(cfg, x4, mu_ref[...], rstd_ref[...],
                          lng_ref[...], lnb_ref[...], mask)
        _, _, a, _ = _ohead_core(cfg, x4, ck_ref[...], cb_ref[...])
        a_ref[...] = a
        vm = _vmask_o(cfg, scal_ref[0])
        a32 = a.astype(_F32) * vm

        @pl.when(pl.program_id(1) == 0)
        def _init():
            ps_ref[...] = jnp.zeros_like(ps_ref)
            pss_ref[...] = jnp.zeros_like(pss_ref)

        ps_ref[...] += _sum_vc(a32)
        pss_ref[...] += _sum_vc(a32 * a32)

    return kernel


def _make_ohead_bwd_kernel(cfg, bt):
    def kernel(scal_ref, x_ref, mu_ref, rstd_ref, lng_ref, lnb_ref,
               ck_ref, cb_ref, ga_ref, gps_ref, gpss_ref,
               dx_ref, dmu_ref, drstd_ref, dlng_ref, dlnb_ref,
               dck_ref, dcb_ref):
        x4raw = x_ref[...]
        mask = None
        if cfg.training and cfg.droprate > 0.0:
            mask = _drop_mask_o(cfg, scal_ref[1], x4raw.shape)
        mu, rstd = mu_ref[...], rstd_ref[...]
        lng, lnb = lng_ref[...], lnb_ref[...]
        ck, cb = ck_ref[...], cb_ref[...]
        x4 = _ln_drop_fwd(cfg, x4raw, mu, rstd, lng, lnb, mask)
        s, xin, a, aux = _ohead_core(cfg, x4, ck, cb)

        vm = _vmask_o(cfg, scal_ref[0])
        da = (ga_ref[...].astype(_F32)
              + (gps_ref[...] + 2.0 * gpss_ref[...] * a.astype(_F32) * vm)
              * vm).astype(x4.dtype)
        prec = _PRECISIONS[cfg.precision]
        ds, dxin = _gate_bwd_cv(cfg, s, xin, cfg.c0, da, aux=aux)
        dck, dcb, dx4 = _tconv_bwd_cv(x4, ds, ck, cfg.ko, prec)
        dx4 = dx4 + _shift_pad_t(dxin[:, :, : cfg.c_in, :], cfg.ko - 1,
                                 cfg.ko)
        dx, dmu, drstd, dlng, dlnb = _ln_drop_bwd(
            cfg, x4raw, mu, rstd, lng, lnb, mask, dx4)
        dx_ref[...] = dx
        # per-batch-tile (V, C) affine-grad partials; caller sums axis 0
        # (stored in the LN arrays' dtype — f32 partials are ~0.5 GB at
        # 1M vertices)
        dlng_ref[...] = dlng[None].astype(dlng_ref.dtype)
        dlnb_ref[...] = dlnb[None].astype(dlnb_ref.dtype)

        @pl.when(pl.program_id(1) == 0)
        def _init_stats():
            dmu_ref[...] = jnp.zeros_like(dmu_ref)
            drstd_ref[...] = jnp.zeros_like(drstd_ref)

        dmu_ref[...] += dmu
        drstd_ref[...] += drstd

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init_w():
            dck_ref[...] = jnp.zeros_like(dck_ref)
            dcb_ref[...] = jnp.zeros_like(dcb_ref)

        dck_ref[...] += dck
        dcb_ref[...] += dcb[None, :]

    return kernel


def _ohead_pallas(cfg, vtrue, seed, x, mu, rstd, lng, lnb, ck, cb):
    b = x.shape[0]
    bt, grid = _grid_o(cfg, b)
    xspec = pl.BlockSpec((bt, cfg.ko, cfg.c_in, cfg.tile_v),
                         lambda j, i, *_: (j, 0, 0, i))
    sspec = pl.BlockSpec((bt, cfg.ko, 1, 1), lambda j, i, *_: (j, 0, 0, 0))
    lspec = pl.BlockSpec((cfg.c_in, cfg.tile_v), lambda j, i, *_: (0, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[xspec, sspec, sspec, lspec, lspec,
                  _cspec(ck.shape), _cspec(cb.shape)],
        out_specs=[
            pl.BlockSpec((bt, 1, cfg.c0, cfg.tile_v),
                         lambda j, i, *_: (j, 0, 0, i)),
            pl.BlockSpec((bt, 1, 1, 1), lambda j, i, *_: (j, 0, 0, 0)),
            pl.BlockSpec((bt, 1, 1, 1), lambda j, i, *_: (j, 0, 0, 0)),
        ],
    )
    return pl.pallas_call(
        _make_ohead_fwd_kernel(cfg, bt),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, cfg.c0, cfg.v_pad), x.dtype),
            jax.ShapeDtypeStruct((b, 1, 1, 1), _F32),
            jax.ShapeDtypeStruct((b, 1, 1, 1), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cfg.v_pad * cfg.ko * cfg.c_in * cfg.g,
            bytes_accessed=(x.size + b * cfg.c0 * cfg.v_pad)
            * x.dtype.itemsize,
            transcendentals=b * cfg.v_pad * cfg.g,
        ),
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(jnp.stack([jnp.asarray(vtrue, jnp.int32),
                 jnp.asarray(seed, jnp.int32)]),
      x, mu, rstd, lng, lnb, ck, cb)


def _ohead_pallas_bwd(cfg, vtrue, seed, x, mu, rstd, lng, lnb, ck, cb,
                      ga, gps, gpss):
    b = x.shape[0]
    bt, grid = _grid_o(cfg, b)
    nbt = grid[0]
    xspec = pl.BlockSpec((bt, cfg.ko, cfg.c_in, cfg.tile_v),
                         lambda j, i, *_: (j, 0, 0, i))
    sspec = pl.BlockSpec((bt, cfg.ko, 1, 1), lambda j, i, *_: (j, 0, 0, 0))
    pspec = pl.BlockSpec((bt, 1, 1, 1), lambda j, i, *_: (j, 0, 0, 0))
    lspec = pl.BlockSpec((cfg.c_in, cfg.tile_v), lambda j, i, *_: (0, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[xspec, sspec, sspec, lspec, lspec,
                  _cspec(ck.shape), _cspec(cb.shape),
                  pl.BlockSpec((bt, 1, cfg.c0, cfg.tile_v),
                               lambda j, i, *_: (j, 0, 0, i)),
                  pspec, pspec],
        out_specs=[xspec, sspec, sspec,
                   pl.BlockSpec((1, cfg.c_in, cfg.tile_v),
                                lambda j, i, *_: (j, 0, i)),
                   pl.BlockSpec((1, cfg.c_in, cfg.tile_v),
                                lambda j, i, *_: (j, 0, i)),
                   _cspec(ck.shape), _cspec((1, cfg.g))],
    )
    return pl.pallas_call(
        _make_ohead_bwd_kernel(cfg, bt),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(mu.shape, _F32),
            jax.ShapeDtypeStruct(rstd.shape, _F32),
            jax.ShapeDtypeStruct((nbt, cfg.c_in, cfg.v_pad), lng.dtype),
            jax.ShapeDtypeStruct((nbt, cfg.c_in, cfg.v_pad), lnb.dtype),
            jax.ShapeDtypeStruct(ck.shape, _F32),
            jax.ShapeDtypeStruct((1, cfg.g), _F32),
        ],
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(jnp.stack([jnp.asarray(vtrue, jnp.int32),
                 jnp.asarray(seed, jnp.int32)]),
      x, mu, rstd, lng, lnb, ck, cb, ga, gps, gpss)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def ohead_fused(cfg, vtrue, seed, x, mu, rstd, lng, lnb, ck, cb):
    """Kernel A: previous-LN normalize + dropout → ko-tap temporal gate →
    masked LN partial sums. Returns ``(a [B,1,c0,Vp], ps, pss)``."""
    return _ohead_pallas(cfg, vtrue, seed, x, mu, rstd, lng, lnb, ck, cb)


def _ohead_fwd(cfg, vtrue, seed, x, mu, rstd, lng, lnb, ck, cb):
    outs = _ohead_pallas(cfg, vtrue, seed, x, mu, rstd, lng, lnb, ck, cb)
    return outs, (vtrue, seed, x, mu, rstd, lng, lnb, ck, cb)


def _ohead_bwd(cfg, res, gs):
    vtrue, seed, x, mu, rstd, lng, lnb, ck, cb = res
    ga, gps, gpss = gs
    outs = _ohead_pallas_bwd(cfg, vtrue, seed, x, mu, rstd, lng, lnb,
                             ck, cb, ga.astype(x.dtype),
                             gps.astype(_F32), gpss.astype(_F32))
    dx, dmu, drstd, dlng_p, dlnb_p, dck, dcb = outs
    f0 = np.zeros((), jax.dtypes.float0)
    return (f0, f0, dx, dmu.astype(mu.dtype), drstd.astype(rstd.dtype),
            jnp.sum(dlng_p, axis=0).astype(lng.dtype),
            jnp.sum(dlnb_p, axis=0).astype(lnb.dtype),
            dck.astype(ck.dtype), dcb[0].astype(cb.dtype))


ohead_fused.defvjp(_ohead_fwd, _ohead_bwd)


# --------------------------------------------------------------- kernel B

def _ofc_core(cfg, h, w1, b1):
    prec = _PRECISIONS[cfg.precision]
    s2 = _bdot(h, w1, prec)
    s2 = (s2 + b1.astype(_F32)[:, None]).astype(h.dtype)
    z = jnp.maximum(s2, 0)
    return s2, z


def _make_ofc_fwd_kernel(cfg, bt):
    def kernel(scal_ref, a_ref, mu_ref, rstd_ref, lnw_ref, lnb_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
        h = _ln_drop_fwd(cfg, a_ref[...], mu_ref[...], rstd_ref[...],
                         lnw_ref[...], lnb_ref[...], None)
        _, z = _ofc_core(cfg, h, w1_ref[...], b1_ref[...])
        if cfg.training and cfg.droprate > 0.0:
            z = z * _drop_mask_o(cfg, scal_ref[1], z.shape)
        prec = _PRECISIONS[cfg.precision]
        out = _bdot(z, w2_ref[...], prec) \
            + b2_ref[...].astype(_F32)[:, None]
        out_ref[...] = out

    return kernel


def _make_ofc_bwd_kernel(cfg, bt):
    def kernel(scal_ref, a_ref, mu_ref, rstd_ref, lnw_ref, lnb_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, gout_ref,
               da_ref, dmu_ref, drstd_ref, dlnw_ref, dlnb_ref,
               dw1_ref, db1_ref, dw2_ref, db2_ref):
        araw = a_ref[...]
        mu, rstd = mu_ref[...], rstd_ref[...]
        lnw, lnb = lnw_ref[...], lnb_ref[...]
        w1, b1 = w1_ref[...], b1_ref[...]
        w2 = w2_ref[...]
        h = _ln_drop_fwd(cfg, araw, mu, rstd, lnw, lnb, None)
        s2, z = _ofc_core(cfg, h, w1, b1)
        mask = None
        zd = z
        if cfg.training and cfg.droprate > 0.0:
            mask = _drop_mask_o(cfg, scal_ref[1], z.shape)
            zd = z * mask
        prec = _PRECISIONS[cfg.precision]
        gout = gout_ref[...].astype(h.dtype)
        dw2 = _bdot_sum(zd, gout, prec)
        db2 = jnp.sum(gout.astype(_F32), axis=(0, 1, 3))
        dzd = _bdot(gout, w2.T, prec).astype(h.dtype)
        dz = dzd if mask is None else dzd * mask
        ds2 = dz * _pos_mask(s2)
        dw1 = _bdot_sum(h, ds2, prec)
        db1 = jnp.sum(ds2.astype(_F32), axis=(0, 1, 3))
        dh = _bdot(ds2, w1.T, prec).astype(h.dtype)
        da, dmu, drstd, dlnw, dlnb = _ln_drop_bwd(
            cfg, araw, mu, rstd, lnw, lnb, None, dh)
        da_ref[...] = da
        dlnw_ref[...] = dlnw[None].astype(dlnw_ref.dtype)
        dlnb_ref[...] = dlnb[None].astype(dlnb_ref.dtype)

        @pl.when(pl.program_id(1) == 0)
        def _init_stats():
            dmu_ref[...] = jnp.zeros_like(dmu_ref)
            drstd_ref[...] = jnp.zeros_like(drstd_ref)

        dmu_ref[...] += dmu
        drstd_ref[...] += drstd

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init_w():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2_ref[...] = jnp.zeros_like(db2_ref)

        dw1_ref[...] += dw1
        db1_ref[...] += db1[None, :]
        dw2_ref[...] += dw2
        db2_ref[...] += db2[None, :]

    return kernel


def _ofc_pallas(cfg, vtrue, seed, a, mu, rstd, lnw, lnb, w1, b1, w2, b2):
    b = a.shape[0]
    bt, grid = _grid_o(cfg, b)
    aspec = pl.BlockSpec((bt, 1, cfg.c0, cfg.tile_v),
                         lambda j, i, *_: (j, 0, 0, i))
    pspec = pl.BlockSpec((bt, 1, 1, 1), lambda j, i, *_: (j, 0, 0, 0))
    lspec = pl.BlockSpec((cfg.c0, cfg.tile_v), lambda j, i, *_: (0, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[aspec, pspec, pspec, lspec, lspec,
                  _cspec(w1.shape), _cspec(b1.shape),
                  _cspec(w2.shape), _cspec(b2.shape)],
        out_specs=pl.BlockSpec((bt, 1, cfg.c_end, cfg.tile_v),
                               lambda j, i, *_: (j, 0, 0, i)),
    )
    return pl.pallas_call(
        _make_ofc_fwd_kernel(cfg, bt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, cfg.c_end, cfg.v_pad), _F32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cfg.v_pad * (cfg.c0 * cfg.c1
                                       + cfg.c1 * cfg.c_end),
            bytes_accessed=(a.size + b * cfg.c_end * cfg.v_pad * 2)
            * a.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(jnp.stack([jnp.asarray(vtrue, jnp.int32),
                 jnp.asarray(seed, jnp.int32)]),
      a, mu, rstd, lnw, lnb, w1, b1, w2, b2)


def _ofc_pallas_bwd(cfg, vtrue, seed, a, mu, rstd, lnw, lnb, w1, b1,
                    w2, b2, gout):
    b = a.shape[0]
    bt, grid = _grid_o(cfg, b)
    nbt = grid[0]
    aspec = pl.BlockSpec((bt, 1, cfg.c0, cfg.tile_v),
                         lambda j, i, *_: (j, 0, 0, i))
    pspec = pl.BlockSpec((bt, 1, 1, 1), lambda j, i, *_: (j, 0, 0, 0))
    lspec = pl.BlockSpec((cfg.c0, cfg.tile_v), lambda j, i, *_: (0, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[aspec, pspec, pspec, lspec, lspec,
                  _cspec(w1.shape), _cspec(b1.shape),
                  _cspec(w2.shape), _cspec(b2.shape),
                  pl.BlockSpec((bt, 1, cfg.c_end, cfg.tile_v),
                               lambda j, i, *_: (j, 0, 0, i))],
        out_specs=[aspec, pspec, pspec,
                   pl.BlockSpec((1, cfg.c0, cfg.tile_v),
                                lambda j, i, *_: (j, 0, i)),
                   pl.BlockSpec((1, cfg.c0, cfg.tile_v),
                                lambda j, i, *_: (j, 0, i)),
                   _cspec(w1.shape), _cspec((1, cfg.c1)),
                   _cspec(w2.shape), _cspec((1, cfg.c_end))],
    )
    return pl.pallas_call(
        _make_ofc_bwd_kernel(cfg, bt),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(a.shape, a.dtype),
            jax.ShapeDtypeStruct(mu.shape, _F32),
            jax.ShapeDtypeStruct(rstd.shape, _F32),
            jax.ShapeDtypeStruct((nbt, cfg.c0, cfg.v_pad), lnw.dtype),
            jax.ShapeDtypeStruct((nbt, cfg.c0, cfg.v_pad), lnb.dtype),
            jax.ShapeDtypeStruct(w1.shape, _F32),
            jax.ShapeDtypeStruct((1, cfg.c1), _F32),
            jax.ShapeDtypeStruct(w2.shape, _F32),
            jax.ShapeDtypeStruct((1, cfg.c_end), _F32),
        ],
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(jnp.stack([jnp.asarray(vtrue, jnp.int32),
                 jnp.asarray(seed, jnp.int32)]),
      a, mu, rstd, lnw, lnb, w1, b1, w2, b2, gout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def ofc_fused(cfg, vtrue, seed, a, mu, rstd, lnw, lnb, w1, b1, w2, b2):
    """Kernel B: LN normalize + (V, C) affine → fc1 → relu → dropout →
    fc2; returns ``[B, 1, c_end, Vp]`` f32."""
    return _ofc_pallas(cfg, vtrue, seed, a, mu, rstd, lnw, lnb,
                       w1, b1, w2, b2)


def _ofc_fwd(cfg, vtrue, seed, a, mu, rstd, lnw, lnb, w1, b1, w2, b2):
    out = _ofc_pallas(cfg, vtrue, seed, a, mu, rstd, lnw, lnb,
                      w1, b1, w2, b2)
    return out, (vtrue, seed, a, mu, rstd, lnw, lnb, w1, b1, w2, b2)


def _ofc_bwd(cfg, res, gout):
    vtrue, seed, a, mu, rstd, lnw, lnb, w1, b1, w2, b2 = res
    outs = _ofc_pallas_bwd(cfg, vtrue, seed, a, mu, rstd, lnw, lnb,
                           w1, b1, w2, b2, gout.astype(_F32))
    da, dmu, drstd, dlnw_p, dlnb_p, dw1, db1, dw2, db2 = outs
    f0 = np.zeros((), jax.dtypes.float0)
    return (f0, f0, da, dmu.astype(mu.dtype), drstd.astype(rstd.dtype),
            jnp.sum(dlnw_p, axis=0).astype(lnw.dtype),
            jnp.sum(dlnb_p, axis=0).astype(lnb.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


ofc_fused.defvjp(_ofc_fwd, _ofc_bwd)


# ------------------------------------------------------------ public entry

def output_head_fused(params: dict, a2, mu, rstd, lng_p, lnb_p, *,
                      v_true: int, act_func: str, droprate: float,
                      training: bool, seed_a, seed_b, tile_v: int = 128,
                      b_tile: int | None = None, precision: str = "default",
                      interpret=False):
    """Run the whole output head on the cv-layout pre-LN activation of
    the final ST block. ``a2`` [B, Ko, C, Vp]; ``mu``/``rstd``
    [B, Ko, 1, 1] f32; ``lng_p``/``lnb_p`` [C, Vp] f32 (the final block's
    LN affine, cv orientation, zero-padded). Returns [B, 1, Vp, c_end]
    f32 (slice vertices at the call site)."""
    b, ko, c_in, v_pad = a2.shape
    ck = jnp.squeeze(params["tmp_conv1"]["causal_conv"]["kernel"], axis=1)
    cb = params["tmp_conv1"]["causal_conv"]["bias"]
    g = ck.shape[-1]
    gated = act_func in ("glu", "gtu")
    c0 = g // 2 if gated else g
    w1 = params["fc1"]["kernel"]
    b1 = params["fc1"]["bias"]
    w2 = params["fc2"]["kernel"]
    b2 = params["fc2"]["bias"]
    cfg = OutHeadCfg(ko=ko, c_in=c_in, c0=c0, c1=w1.shape[1],
                     c_end=w2.shape[1], act_func=act_func,
                     droprate=droprate, v_true=v_true, v_pad=v_pad,
                     tile_v=tile_v, b_tile=0, training=training,
                     interpret=interpret, precision=precision)
    cfg = dataclasses.replace(cfg, b_tile=b_tile or pick_b_tile_o(cfg, b))
    cdt = a2.dtype

    # the [C, V_pad] LN-affine copies follow the inter-block LN arrays'
    # dtype (bf16 in mixed precision): at 1M vertices each f32 copy plus
    # its transpose and grad mirror costs ~0.5 GB of HBM
    ln_dt = lng_p.dtype
    pad_c = ((0, v_pad - params["ln"]["scale"].shape[0]), (0, 0))
    lnw2 = jnp.pad(params["ln"]["scale"].astype(ln_dt), pad_c).T
    lnb2 = jnp.pad(params["ln"]["bias"].astype(ln_dt), pad_c).T

    a, ps, pss = ohead_fused(cfg, jnp.int32(v_true), seed_a, a2,
                             mu, rstd, lng_p, lnb_p,
                             ck.astype(cdt), cb.astype(_F32))
    denom = float(v_true * c0)
    mu2 = ps / denom
    var = pss / denom - mu2 * mu2
    rstd2 = lax.rsqrt(jnp.maximum(var, 0.0) + 1e-12)
    out = ofc_fused(cfg, jnp.int32(v_true), seed_b, a, mu2, rstd2,
                    lnw2, lnb2, w1.astype(cdt), b1.astype(_F32),
                    w2.astype(cdt), b2.astype(_F32))
    return jnp.transpose(out, (0, 1, 3, 2))  # [B, 1, Vp, c_end]
