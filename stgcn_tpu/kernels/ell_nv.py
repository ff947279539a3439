"""Blocked-ELL SpMM in **nv layout** ``[N, V]`` — the O(nnz) pack that
fits 1M-vertex training on one 16 GB chip.

Why this exists (VERDICT r4 next #2): the banded pack stores each
256-row block's full column *window*; on a road graph the RCM band is
~sqrt(V)·k wide, so banded storage scales ``V^1.5`` — 9.8 GB int8 at 1M
vertices, the dominant term of the round-4 OOM (17.12 GB needed vs
15.75 available). A 2-D road network has no 1-D ordering with o(sqrt V)
bandwidth, so *any* contiguous-window format hits this wall. Blocked-ELL
keeps only the **live** ``bs × bs`` tiles: each row block touches ~6
column blocks (the diagonal cluster + one stripe cluster per side,
measured by scripts/probe_ell_geometry.py), giving ~1.6 GiB at 1M — an
O(nnz·fill) footprint with ELL pad-waste ≤1.25×.

Kernel shape (mirrors :mod:`banded_nv`'s operand orientation and
:mod:`spmm`'s scalar-prefetched tile loop):

    y_nv[:, i·bs:(i+1)·bs] = Σ_k  x_nv[:, cols[i,k]·bs : +bs] @ tiles[i,k]

with tiles stored **pre-transposed** (``tiles[i,k] = A_tile(i,k)ᵀ``,
:func:`stgcn_tpu.graph.packing.pack_ell_nv`), so every in-kernel dot is
a natural ``[m, bs] @ [bs, bs]`` MXU op. The per-tile x column blocks
are double-buffered async DMAs from HBM overlapping the MXU. int8 packs
carry per-A-row dequant scales — per OUTPUT LANE here — applied once to
the f32 accumulator; quantized packs freeze edge weights (gradients
w.r.t. tile values are zero), as in :mod:`banded_nv`.

The Chebyshev pair (`model/layers.py:154-161`) runs as two applications:
unlike the banded stream kernels there is no wavefront window ordering
to exploit — tile columns are unordered — and at 1M vertices the pack
stream (not x residency) bounds the time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgcn_tpu.kernels.banded_spmm import _round_up, kernel_dot_precision


def ell_nv_reference(data: jax.Array, cols: jax.Array, counts: jax.Array,
                     x_nv: jax.Array, scales: jax.Array | None = None
                     ) -> jax.Array:
    """Pure-jnp oracle, scan over block rows (no [nbr·max_b, m, bs]
    temporary). Padding tiles are all-zero, so no count masking needed."""
    nbr, max_b, bs, _ = data.shape
    m = x_nv.shape[0]
    x_cols = _round_up(max(x_nv.shape[1], nbr * bs), bs)
    if x_nv.shape[1] < x_cols:
        x_nv = jnp.pad(x_nv, ((0, 0), (0, x_cols - x_nv.shape[1])))

    def blk(_, inp):
        tiles, cb = inp

        def tile(k, acc):
            win = lax.dynamic_slice(x_nv, (0, cb[k] * bs), (m, bs))
            return acc + jnp.dot(win.astype(jnp.float32),
                                 tiles[k].astype(jnp.float32),
                                 preferred_element_type=jnp.float32)

        acc = lax.fori_loop(0, max_b, tile, jnp.zeros((m, bs), jnp.float32))
        return None, acc

    _, y = lax.scan(blk, None, (data, cols))  # [nbr, m, bs]
    if scales is not None:
        y = y * scales[:, None, :]
    return jnp.transpose(y, (1, 0, 2)).reshape(m, nbr * bs).astype(x_nv.dtype)


def _make_ell_nv_kernel(bs: int, m: int, n_buf: int, precision,
                        quantized: bool):
    def kernel(cols_ref, counts_ref, data_ref, *rest):
        rest = list(rest)
        scale_ref = rest.pop(0) if quantized else None
        x_hbm, o_ref, x_buf, sem = rest
        i = pl.program_id(0)
        count = counts_ref[i]

        def get_dma(slot, k):
            col = cols_ref[i, k]
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(col * bs, bs)],
                x_buf.at[slot], sem.at[slot])

        for w in range(n_buf):
            @pl.when(w < count)
            def _start(w=w):
                get_dma(w, w).start()

        def body(k, acc):
            slot = k % n_buf
            get_dma(slot, k).wait()
            tile = data_ref[0, k]
            if tile.dtype == jnp.int8:
                tile = tile.astype(x_buf.dtype)
            acc = acc + jnp.dot(x_buf[slot], tile,
                                preferred_element_type=jnp.float32,
                                precision=precision)

            # refill only AFTER the dot consumed this slot (see
            # spmm._make_spmm_kernel: early issue races the DMA on v5e)
            @pl.when(k + n_buf < count)
            def _next():
                get_dma(slot, k + n_buf).start()

            return acc

        acc = lax.fori_loop(0, count, body, jnp.zeros((m, bs), jnp.float32),
                            unroll=False)
        if quantized:
            acc = acc * scale_ref[0, 0][None, :]
        o_ref[:] = acc.astype(o_ref.dtype)

    return kernel


def _ell_nv_pallas(data, cols, counts, x_nv, scales, *, precision,
                   n_buf: int = 4):
    nbr, max_b, bs, _ = data.shape
    m = x_nv.shape[0]
    quantized = scales is not None

    in_specs = [pl.BlockSpec((1, max_b, bs, bs),
                             lambda i, cols_ref, counts_ref: (i, 0, 0, 0))]
    args = [cols, counts, data]
    if quantized:
        in_specs.append(pl.BlockSpec(
            (1, 1, bs), lambda i, cols_ref, counts_ref: (i, 0, 0)))
        args.append(scales.reshape(nbr, 1, bs))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # x in HBM
    args.append(x_nv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbr,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bs),
                               lambda i, cols_ref, counts_ref: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((n_buf, m, bs), x_nv.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    total_tiles = int(nbr * max_b)
    return pl.pallas_call(
        _make_ell_nv_kernel(bs, m, n_buf, precision, quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, nbr * bs), x_nv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * total_tiles * bs * bs * m,
            bytes_accessed=(data.size * data.dtype.itemsize
                            + total_tiles * m * bs * x_nv.dtype.itemsize
                            + m * nbr * bs * x_nv.dtype.itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*args)


def ell_spmm_nv(data: jax.Array, cols: jax.Array, counts: jax.Array,
                x_nv: jax.Array, scales: jax.Array | None = None, *,
                use_pallas: bool = True, precision=None) -> jax.Array:
    """``y[N, Vpad] = (A x)`` on the nv operand (see module docstring).

    ``x_nv``: ``[N, W]`` with ``W >= nbr·bs`` vertex lanes; output keeps
    the operand's width (lanes past ``nbr·bs`` are zero)."""
    precision = kernel_dot_precision(x_nv.dtype, precision)
    nbr, max_b, bs, _ = data.shape
    n, w_in = x_nv.shape
    m = _round_up(max(n, 8), 8 if x_nv.dtype == jnp.float32 else 16)
    if m != n:
        x_nv = jnp.pad(x_nv, ((0, m - n), (0, 0)))
    x_cols = _round_up(max(w_in, nbr * bs), bs)
    if x_cols != w_in:
        x_nv = jnp.pad(x_nv, ((0, 0), (0, x_cols - w_in)))

    if not use_pallas or jax.default_backend() != "tpu":
        y = ell_nv_reference(data, cols, counts, x_nv, scales)
    else:
        # chunk the grid over row blocks: scalar-prefetched cols live in
        # SMEM with the minor dim padded to 128 lanes (see spmm.bcsr_spmm)
        chunk = 1024
        ys = []
        for s in range(0, nbr, chunk):
            e = min(s + chunk, nbr)
            ys.append(_ell_nv_pallas(
                data[s:e], cols[s:e], counts[s:e], x_nv,
                None if scales is None else scales[s:e],
                precision=precision))
        y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=1)
    y = y[:n]
    if y.shape[1] < w_in:
        y = jnp.pad(y, ((0, 0), (0, w_in - y.shape[1])))
    return y[:, :w_in]


def _ell_nv_ddata(cols, counts, x_nv, g_nv, *, bs: int, max_b: int):
    """Tile-sampled SDDMM for the (pre-transposed) tile gradients:
    ``dd[i, k] = x[:, cols[i,k]·bs:+bs]ᵀ @ g[:, i·bs:+bs]`` — scan over
    block rows, no [nbr, max_b, m, bs] temporary."""
    m = x_nv.shape[0]
    nbr = cols.shape[0]
    x_cols = _round_up(max(x_nv.shape[1], nbr * bs), bs)
    if x_nv.shape[1] < x_cols:
        x_nv = jnp.pad(x_nv, ((0, 0), (0, x_cols - x_nv.shape[1])))
    if g_nv.shape[1] < nbr * bs:
        g_nv = jnp.pad(g_nv, ((0, 0), (0, nbr * bs - g_nv.shape[1])))
    g_blocks = jnp.transpose(
        g_nv[:, :nbr * bs].reshape(m, nbr, bs), (1, 0, 2))  # [nbr, m, bs]

    def blk(_, inp):
        cb, cnt, g_blk = inp

        def tile(k, acc):
            win = lax.dynamic_slice(x_nv, (0, cb[k] * bs), (m, bs))
            d = jnp.dot(win.astype(jnp.float32).T,
                        g_blk.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
            return acc.at[k].set(jnp.where(k < cnt, d, 0.0))

        acc = lax.fori_loop(0, max_b, tile,
                            jnp.zeros((max_b, bs, bs), jnp.float32))
        return None, acc

    _, d = lax.scan(blk, None, (cols, counts, g_blocks))
    return d


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def ell_spmm_nv_vjp(data, cols, counts, data_t, cols_t, counts_t, x_nv,
                    scales=None, scales_t=None, use_pallas=True,
                    precision=None):
    """Differentiable nv ELL SpMM: d/dx applies the transpose pack;
    d/dtiles is the tile-sampled SDDMM (zeros for int8 packs — weights
    frozen, as for every quantized representation)."""
    return ell_spmm_nv(data, cols, counts, x_nv, scales,
                       use_pallas=use_pallas, precision=precision)


def _spmm_fwd(data, cols, counts, data_t, cols_t, counts_t, x_nv,
              scales, scales_t, use_pallas, precision):
    y = ell_spmm_nv(data, cols, counts, x_nv, scales,
                    use_pallas=use_pallas, precision=precision)
    return y, (data_t, cols_t, counts_t, cols, counts, x_nv, scales,
               scales_t)


def _spmm_bwd(use_pallas, precision, res, g):
    data_t, cols_t, counts_t, cols, counts, x_nv, scales, scales_t = res
    w_in = x_nv.shape[1]
    dx = ell_spmm_nv(data_t, cols_t, counts_t, g, scales_t,
                     use_pallas=use_pallas, precision=precision)[:, :w_in]
    bs = data_t.shape[2]
    if scales is not None:  # quantized: edge weights frozen
        ddata = jnp.zeros((cols.shape[0], cols.shape[1], bs, bs),
                          data_t.dtype)
    else:
        ddata = _ell_nv_ddata(cols, counts, x_nv, g, bs=bs,
                              max_b=cols.shape[1]).astype(data_t.dtype)
    return (ddata, None, None, None, None, None, dx, None, None)


ell_spmm_nv_vjp.defvjp(_spmm_fwd, _spmm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def ell_cheb_pair_nv(data, cols, counts, data_t, cols_t, counts_t, x_nv,
                     scales=None, scales_t=None, use_pallas=True,
                     precision=None):
    """``(A x, 2 A (A x) − x)`` on the nv operand
    (`model/layers.py:154-161`) — two kernel applications (module
    docstring explains why there is no fused wavefront here). Backward
    runs the chain ``dT1 = g1 + 2 Aᵀ g2; dx = Aᵀ dT1 − g2``."""
    t1 = ell_spmm_nv(data, cols, counts, x_nv, scales,
                     use_pallas=use_pallas, precision=precision)
    t2 = (2.0 * ell_spmm_nv(data, cols, counts, t1, scales,
                            use_pallas=use_pallas, precision=precision
                            ).astype(jnp.float32)
          - x_nv.astype(jnp.float32)).astype(x_nv.dtype)
    return t1, t2


def _pair_fwd(data, cols, counts, data_t, cols_t, counts_t, x_nv,
              scales, scales_t, use_pallas, precision):
    t1 = ell_spmm_nv(data, cols, counts, x_nv, scales,
                     use_pallas=use_pallas, precision=precision)
    t2 = (2.0 * ell_spmm_nv(data, cols, counts, t1, scales,
                            use_pallas=use_pallas, precision=precision
                            ).astype(jnp.float32)
          - x_nv.astype(jnp.float32)).astype(x_nv.dtype)
    return (t1, t2), (data, cols, counts, data_t, cols_t, counts_t, x_nv,
                      t1, scales, scales_t)


def _pair_bwd(use_pallas, precision, res, gs):
    (data, cols, counts, data_t, cols_t, counts_t, x_nv, t1, scales,
     scales_t) = res
    g1, g2 = gs
    w_in = x_nv.shape[1]
    at_g2 = ell_spmm_nv(data_t, cols_t, counts_t, g2, scales_t,
                        use_pallas=use_pallas, precision=precision)
    dt1 = (g1.astype(jnp.float32)
           + 2.0 * at_g2[:, :w_in].astype(jnp.float32)).astype(x_nv.dtype)
    dx = (ell_spmm_nv(data_t, cols_t, counts_t, dt1, scales_t,
                      use_pallas=use_pallas, precision=precision
                      )[:, :w_in].astype(jnp.float32)
          - g2.astype(jnp.float32)).astype(x_nv.dtype)
    if scales is not None:
        ddata = jnp.zeros(data.shape, data.dtype)
    else:
        bs, max_b = data.shape[2], cols.shape[1]
        # dA = dT1 ⊛ tiles(x) + 2 g2 ⊛ tiles(t1), both tile-sampled
        ddata = (_ell_nv_ddata(cols, counts, x_nv, dt1, bs=bs, max_b=max_b)
                 + 2.0 * _ell_nv_ddata(cols, counts, t1, g2, bs=bs,
                                       max_b=max_b)).astype(data.dtype)
    return (ddata, None, None, None, None, None, dx, None, None)


ell_cheb_pair_nv.defvjp(_pair_fwd, _pair_bwd)
