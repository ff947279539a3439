"""Banded SpMM / Chebyshev kernels in **nv layout** ``[N, V]``.

The vertex-fused ST-block kernels move activations in channel-before-
vertex layout ``[B, T, C, V]`` (see :mod:`vertex_fused`), whose row-major
flattening is exactly ``[N = B·T·C, V]``. The original graph kernels
(:mod:`banded_spmm`) want ``[V, N]`` — so every aggregation paid four
full-size HBM transposes (fold x, unfold t1/t2, and their backward
mirrors): measured 2.0–2.9 ms each at 100k training shapes
(scripts/probe_100k_breakdown.py), ~40 ms of a 269 ms step. These
kernels compute the SAME banded products directly on the ``[N, V]``
operand — the fused path's reshape view, zero transposes anywhere:

    y_nv[N, i·bs:(i+1)·bs] = x_nv[:, window_i] @ slab_i_nv

with slabs packed **pre-transposed** ``[nbr, w, bs]``
(:func:`pack_banded_device(transpose_slabs=True)
<stgcn_tpu.kernels.banded_spmm.pack_banded_device>`), so in-kernel dots
are natural ``[m, k] @ [k, n]`` MXU ops — no register transposes either.

One wavefront kernel builder serves three modes over a shared x block
ring (each x column block crosses HBM exactly once; the slab stream
crosses once — the same schedule as
:func:`~stgcn_tpu.kernels.banded_spmm.banded_cheb_pair_stream`):

- ``single`` — one application ``A x`` (block ring beats the window-DMA
  streaming kernel: no ``w/bs``× window refetch);
- ``pair``   — the ks=3 Chebyshev recurrence ``(A x, 2 A (A x) − x)``
  (`model/layers.py:154-161`);
- ``chain``  — its VJP ``(u = g1 + 2 Aᵀ g2, Aᵀ u − g2)`` (pass the
  transpose pack).

Requires the stream pack invariants (:func:`banded_spmm.
cheb_pair_stream_safe`): block-aligned, diagonal-containing windows.
int8 packs carry per-A-row scales — per OUTPUT COLUMN here — applied on
the VPU to the f32 accumulator. Gradients w.r.t. slab values use a
scan-based band-sampled SDDMM (no ``[nbr, w, n]`` materialization);
quantized packs freeze edge weights, as everywhere else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgcn_tpu.kernels.banded_spmm import _round_up


def _make_stream_nv_kernel(bs: int, w: int, m: int, nbr: int, nxb: int,
                           delay: int, rn: int, rs: int, rx: int,
                           precision, quantized: bool, mode: str):
    """See module docstring; ``m`` is the (padded) N row count. Mirrors
    ``banded_spmm._make_cheb_pair_stream_kernel``'s schedule with the
    operand dims swapped: x/T1/output blocks are [m, bs] LANE blocks, the
    slab block is [w, bs] and its per-k sub-blocks [bs, bs] sublane
    slices, so every dot is a natural [m, bs] @ [bs, bs]."""
    nw = w // bs
    pair = mode == "pair"
    chain = mode == "chain"
    two_stage = pair or chain

    def kernel(lo_ref, slab_ref, *rest):
        rest = list(rest)
        scale1_ref = scale2_ref = g_hbm = None
        if quantized:
            scale1_ref = rest.pop(0)
            if two_stage:
                scale2_ref = rest.pop(0)
        x_hbm = rest.pop(0)
        if chain:
            g_hbm = rest.pop(0)
        if two_stage:
            t1_ref, t2_ref, x_ring, sem = rest[:4]
            if chain:
                g_buf, gsem = rest[4:6]
                t1_ring, slab_ring = rest[6:]
            else:
                t1_ring, slab_ring = rest[4:]
        else:
            t1_ref, x_ring, sem = rest[:3]
        i = pl.program_id(0)

        def xdma(j):
            slot = pl.multiple_of((j % rx) * bs, bs)
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(j * bs, bs)],
                x_ring.at[:, pl.ds(slot, bs)], sem.at[j % rx])

        def gdma(ii, slot):
            return pltpu.make_async_copy(
                g_hbm.at[:, pl.ds(ii * bs, bs)], g_buf.at[slot],
                gsem.at[slot])

        @pl.when(i == 0)
        def _warm():
            for j in range(min(nw, nxb)):  # blocks of window 0
                xdma(j).start()
            if chain:
                gdma(0, 0).start()
            if two_stage:
                # stage-2 windows can cover T1 blocks past the last block
                # row (window clamp is v_pad, not nbr*bs); stage 1 never
                # writes those ring slots and uninitialized VMEM can hold
                # NaN bit patterns (NaN x 0 slab poisons the dot)
                t1_ring[...] = jnp.zeros_like(t1_ring)

        @pl.when((i + 1 < nbr) & (i + nw < nxb))
        def _issue_next():
            xdma(i + nw).start()

        if chain:
            @pl.when(i + 1 < nbr)
            def _issue_next_g():
                gdma(i + 1, (i + 1) % 2).start()

        @pl.when(i < nbr)
        def _stage1():
            if nxb >= nw:
                @pl.when(i + nw - 1 < nxb)
                def _wait_new():
                    xdma(i + nw - 1).wait()

            @pl.when(i == 0)
            def _wait_warm():
                for j in range(min(nw - 1, nxb)):
                    xdma(j).wait()
                if chain:
                    gdma(0, 0).wait()

            if chain:
                @pl.when(i > 0)
                def _wait_g():
                    gdma(i, i % 2).wait()

            b0 = lo_ref[i] // bs
            slab0 = slab_ref[0]
            if slab0.dtype == jnp.int8:
                slab0 = slab0.astype(x_ring.dtype)
            acc = jnp.zeros((m, bs), jnp.float32)
            for k in range(nw):  # static unroll: nw block-granular dots
                a_k = slab0[k * bs:(k + 1) * bs, :]
                x_off = pl.multiple_of(((b0 + k) % rx) * bs, bs)
                acc += jnp.dot(x_ring[:, pl.ds(x_off, bs)], a_k,
                               preferred_element_type=jnp.float32,
                               precision=precision)
            if quantized:
                acc = acc * scale1_ref[0, 0][None, :]
            if chain:
                acc = 2.0 * acc + g_buf[i % 2].astype(jnp.float32)
            t1c = acc.astype(x_ring.dtype)
            t1_ref[...] = t1c
            if two_stage:
                t1_ring[:, pl.ds(pl.multiple_of((i % rn) * bs, bs), bs)] = t1c
                slab_ring[i % rs] = slab_ref[0]

        if two_stage:
            i2 = i - delay

            @pl.when(i2 >= 0)
            def _stage2():
                i2c = jnp.maximum(i2, 0)
                b0 = lo_ref[i2c] // bs
                slab2 = slab_ring[i2c % rs]
                if slab2.dtype == jnp.int8:
                    slab2 = slab2.astype(x_ring.dtype)
                acc = jnp.zeros((m, bs), jnp.float32)
                for k in range(nw):
                    a_k = slab2[k * bs:(k + 1) * bs, :]
                    t_off = pl.multiple_of(((b0 + k) % rn) * bs, bs)
                    acc += jnp.dot(t1_ring[:, pl.ds(t_off, bs)], a_k,
                                   preferred_element_type=jnp.float32,
                                   precision=precision)
                y2 = acc if chain else 2.0 * acc
                if quantized:
                    y2 = y2 * scale2_ref[0, 0][None, :]
                xd_off = pl.multiple_of((i2c % rx) * bs, bs)
                xdiag = x_ring[:, pl.ds(xd_off, bs)]
                t2_ref[...] = (y2 - xdiag.astype(jnp.float32)).astype(
                    t2_ref.dtype)

    return kernel


def _nv_ref(slabs_nv, lo, x_nv, scales):
    """jnp oracle: y_nv[:, block i] = x_nv[:, window_i] @ slab_i."""
    nbr, w, bs = slabs_nv.shape
    n = x_nv.shape[0]

    def blk(_, inp):
        slab, lo_i, scl = inp
        slab = slab.astype(jnp.float32)
        if scl is not None:
            slab = slab * scl[None, :]
        win = jax.lax.dynamic_slice(x_nv, (0, lo_i), (n, w))
        return None, jnp.dot(win.astype(jnp.float32), slab,
                             preferred_element_type=jnp.float32)

    _, y = jax.lax.scan(blk, None, (slabs_nv, lo, scales))
    # y: [nbr, n, bs] → [n, nbr*bs]
    return jnp.transpose(y, (1, 0, 2)).reshape(n, nbr * bs).astype(
        x_nv.dtype)


def _stream_nv_call(slabs_nv, lo, x_nv, g_nv, scales, precision, mode):
    """Driver: pads, sizes rings, dispatches the kernel; falls back to the
    jnp oracle off-TPU and to per-application oracles when the rings
    would exceed VMEM."""
    from stgcn_tpu.kernels.banded_spmm import kernel_dot_precision

    precision = kernel_dot_precision(x_nv.dtype, precision)
    nbr, w, bs = slabs_nv.shape
    n, v_pad = x_nv.shape
    nw = w // bs
    two_stage = mode in ("pair", "chain")
    delay = nw + 1 if two_stage else 0
    rn = delay + nw
    rs = delay + 1
    rx = 2 * nw + 2
    m = _round_up(n, 16)
    if m != n:
        x_nv = jnp.pad(x_nv, ((0, m - n), (0, 0)))
        if g_nv is not None:
            g_nv = jnp.pad(g_nv, ((0, m - n), (0, 0)))
    x_cols = _round_up(max(v_pad, nbr * bs), bs)
    if x_cols > v_pad:
        x_nv = jnp.pad(x_nv, ((0, 0), (0, x_cols - v_pad)))
    if g_nv is not None and g_nv.shape[1] < nbr * bs:
        g_nv = jnp.pad(g_nv, ((0, 0), (0, nbr * bs - g_nv.shape[1])))
    nxb = x_cols // bs

    on_tpu = jax.default_backend() == "tpu"
    est = ((rx + rn * two_stage + 2 * (mode == "chain")) * bs * m
           + 2 * (1 + two_stage) * bs * m) * x_nv.dtype.itemsize \
        + (rs * two_stage + 2) * bs * w * slabs_nv.dtype.itemsize
    if not on_tpu or est > 110 * 1024 * 1024:
        def one(v):
            # windows read up to x_cols columns; re-pad between applications
            if v.shape[1] < x_cols:
                v = jnp.pad(v, ((0, 0), (0, x_cols - v.shape[1])))
            y = _nv_ref(slabs_nv, lo, v, scales)
            return jnp.pad(y, ((0, 0), (0, v_pad - y.shape[1]))) \
                if y.shape[1] < v_pad else y[:, :v_pad]

        xx = x_nv[:n]
        if mode == "single":
            return one(xx)
        if mode == "pair":
            t1 = one(xx)
            return t1, 2.0 * one(t1) - xx[:, :v_pad]
        u = g_nv[:n, :v_pad] + 2.0 * one(xx)
        return u, one(u) - xx[:, :v_pad]

    quantized = scales is not None
    in_specs = [pl.BlockSpec((1, w, bs),
                             lambda i, lo_ref: (jnp.minimum(i, nbr - 1), 0, 0))]
    args = [lo, slabs_nv]
    if quantized:
        in_specs.append(pl.BlockSpec(
            (1, 1, bs), lambda i, lo_ref: (jnp.minimum(i, nbr - 1), 0, 0)))
        args.append(scales.reshape(nbr, 1, bs))
        if two_stage:
            in_specs.append(pl.BlockSpec(
                (1, 1, bs),
                lambda i, lo_ref: (jnp.maximum(i - (nw + 1), 0), 0, 0)))
            args.append(scales.reshape(nbr, 1, bs))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # x stays in HBM
    args.append(x_nv)
    if mode == "chain":
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        args.append(g_nv)

    out_specs = [pl.BlockSpec((m, bs),
                              lambda i, lo_ref: (0, jnp.minimum(i, nbr - 1)))]
    out_shapes = [jax.ShapeDtypeStruct((m, nbr * bs), x_nv.dtype)]
    if two_stage:
        out_specs.append(pl.BlockSpec(
            (m, bs), lambda i, lo_ref: (0, jnp.maximum(i - (nw + 1), 0))))
        out_shapes.append(jax.ShapeDtypeStruct((m, nbr * bs), x_nv.dtype))

    scratch = [
        pltpu.VMEM((m, rx * bs), x_nv.dtype),      # x column-block ring
        pltpu.SemaphoreType.DMA((rx,)),
    ]
    if mode == "chain":
        scratch += [pltpu.VMEM((2, m, bs), x_nv.dtype),  # g diag blocks
                    pltpu.SemaphoreType.DMA((2,))]
    if two_stage:
        scratch += [
            pltpu.VMEM((m, rn * bs), x_nv.dtype),  # T1 (or u) ring
            pltpu.VMEM((rs, w, bs), slabs_nv.dtype),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr + delay,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    n_apps = 2 if two_stage else 1
    outs = pl.pallas_call(
        _make_stream_nv_kernel(bs, w, m, nbr, nxb, delay, rn, rs, rx,
                               precision, quantized, mode),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_apps * nbr * bs * w * m,
            bytes_accessed=slabs_nv.size * slabs_nv.dtype.itemsize
            + (1 + (mode == "chain")) * x_nv.size * x_nv.dtype.itemsize
            + n_apps * m * nbr * bs * x_nv.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*args)

    def fit(y):
        y = y[:n]
        if nbr * bs < v_pad:
            return jnp.pad(y, ((0, 0), (0, v_pad - nbr * bs)))
        return y[:, :v_pad]

    if mode == "single":
        return fit(outs[0])
    return fit(outs[0]), fit(outs[1])


def _nv_dslabs(lo, x_nv, g_nv, nbr, bs, w):
    """Band-sampled SDDMM for the slab gradient in nv orientation,
    scan-based (one window at a time — no [nbr, w, n] temporary):
    ``dslab[i, w, b] = Σ_n x_nv[n, lo_i + w] · g_nv[n, i·bs + b]``."""
    n = x_nv.shape[0]
    x_cols = _round_up(max(x_nv.shape[1], nbr * bs), bs)
    if x_nv.shape[1] < x_cols:  # windows may extend past v_pad
        x_nv = jnp.pad(x_nv, ((0, 0), (0, x_cols - x_nv.shape[1])))
    if g_nv.shape[1] < nbr * bs:
        g_nv = jnp.pad(g_nv, ((0, 0), (0, nbr * bs - g_nv.shape[1])))
    g_nv = g_nv[:, :nbr * bs]

    def blk(_, inp):
        lo_i, g_blk = inp
        win = jax.lax.dynamic_slice(x_nv, (0, lo_i), (n, w))
        return None, jnp.dot(win.astype(jnp.float32).T,
                             g_blk.astype(jnp.float32),
                             preferred_element_type=jnp.float32)

    g_blocks = g_nv.T.reshape(nbr, bs, n).transpose(0, 2, 1)  # [nbr, n, bs]
    _, d = jax.lax.scan(blk, None, (lo, g_blocks))
    return d


# --------------------------------------------------------------------- VJPs

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def banded_spmm_nv(slabs_nv, lo, slabs_nv_t, lo_t, x_nv, scales=None,
                   scales_t=None, precision=None):
    """``y[N, Vpad] = (A x)ᵀ`` on the nv operand; see module docstring.
    d/dx applies the transpose pack; d/dslabs is the scan SDDMM (zeros
    for int8 packs — weights frozen)."""
    return _stream_nv_call(slabs_nv, lo, x_nv, None, scales, precision,
                           "single")


def _spmm_nv_fwd(slabs_nv, lo, slabs_nv_t, lo_t, x_nv, scales, scales_t,
                 precision):
    y = _stream_nv_call(slabs_nv, lo, x_nv, None, scales, precision,
                        "single")
    return y, (slabs_nv, lo, slabs_nv_t, lo_t, x_nv, scales, scales_t)


def _spmm_nv_bwd(precision, res, g):
    slabs_nv, lo, slabs_nv_t, lo_t, x_nv, scales, scales_t = res
    v_pad = x_nv.shape[1]
    dx = _stream_nv_call(slabs_nv_t, lo_t, g, None, scales_t, precision,
                         "single")[:, :v_pad]
    if scales is not None:
        return (jnp.zeros_like(slabs_nv), None, None, None, dx, None, None)
    nbr, w, bs = slabs_nv.shape
    dslabs = _nv_dslabs(lo, x_nv, g, nbr, bs, w)
    return (dslabs.astype(slabs_nv.dtype), None, None, None, dx, None, None)


banded_spmm_nv.defvjp(_spmm_nv_fwd, _spmm_nv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def cheb_pair_nv(slabs_nv, lo, slabs_nv_t, lo_t, x_nv, scales=None,
                 scales_t=None, precision=None):
    """``(A x, 2 A (A x) − x)`` on the nv operand, one slab + one x stream
    for both applications (`model/layers.py:154-161`). Backward runs the
    chain ``(dT1 = g1 + 2 Aᵀ g2, dx = Aᵀ dT1 − g2)`` in one pass."""
    return _stream_nv_call(slabs_nv, lo, x_nv, None, scales, precision,
                           "pair")


def _pair_nv_fwd(slabs_nv, lo, slabs_nv_t, lo_t, x_nv, scales, scales_t,
                 precision):
    t1, t2 = _stream_nv_call(slabs_nv, lo, x_nv, None, scales, precision,
                             "pair")
    return (t1, t2), (slabs_nv, lo, slabs_nv_t, lo_t, x_nv, t1, scales,
                      scales_t)


def _pair_nv_bwd(precision, res, gs):
    slabs_nv, lo, slabs_nv_t, lo_t, x_nv, t1, scales, scales_t = res
    g1, g2 = gs
    v_pad = x_nv.shape[1]
    dt1, dx = _stream_nv_call(slabs_nv_t, lo_t, g2, g1, scales_t, precision,
                              "chain")
    dx = dx[:, :v_pad]
    if scales is not None:
        return (jnp.zeros_like(slabs_nv), None, None, None, dx, None, None)
    nbr, w, bs = slabs_nv.shape
    # dA = dT1 ⊛ band(x) + 2 g2 ⊛ band(t1) (both samplings on the band)
    dslabs = _nv_dslabs(lo, x_nv, dt1, nbr, bs, w) \
        + 2.0 * _nv_dslabs(lo, t1, g2, nbr, bs, w)
    return (dslabs.astype(slabs_nv.dtype), None, None, None, dx, None, None)


cheb_pair_nv.defvjp(_pair_nv_fwd, _pair_nv_bwd)
