"""Blocked-ELL SpMM: ``y = A @ x`` with ``A`` packed into ``bs × bs`` tiles.

TPU-native sparse matmul. Kernel structure (v2):

- grid ``(n_block_rows, n_tiles_N)`` — one kernel instance produces one
  ``[bs, tile_n]`` output block;
- the instance loops over that block-row's nonzero tiles (scalar-prefetched
  ``cols``/``counts``), issuing **double-buffered async DMAs** of the needed
  ``x`` blocks straight from HBM so the gather overlaps the MXU matmuls;
- padding slots are skipped entirely via ``counts`` (the packing pads rows
  to a rectangular ELL shape for layout only).

This amortizes per-grid-step pipeline overhead over a whole block-row —
the v1 one-tile-per-step grid ran ~2000× under roofline at road-graph
sparsity because each 128³ matmul paid a full pipeline step.

Replaces the reference's dense ``torch.einsum('hi,btij->bthj', gso, x)``
(``model/layers.py:154-161,198``) at graph sizes where a dense ``[V, V]``
operand stops being viable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgcn_tpu.kernels.banded_spmm import kernel_dot_precision


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bcsr_spmm_reference(data: jax.Array, cols: jax.Array, x: jax.Array,
                        *, block_size: int) -> jax.Array:
    """Pure-jnp oracle: gather x tiles per (row, slot) and contract."""
    nbr, max_b = cols.shape
    bs = block_size
    n = x.shape[1]
    xb = x.reshape(nbr, bs, n)
    gathered = xb[cols]  # [nbr, max_b, bs, n]
    y = jnp.einsum("rkab,rkbn->ran", data, gathered,
                   preferred_element_type=jnp.float32)
    return y.reshape(nbr * bs, n).astype(x.dtype)


def _make_spmm_kernel(bs: int, tile_n: int, max_b: int, precision, n_buf: int):
    def kernel(cols_ref, counts_ref, data_ref, x_hbm, o_ref, x_buf, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        count = counts_ref[i]

        def get_dma(slot, k):
            # NOTE: this exact [i, k] in-kernel SMEM read is hardware-
            # verified; 1-D flattened and transposed variants produced
            # wrong DMA addresses on v5e. SMEM pads the minor dim to 128
            # lanes, so the wrapper chunks the grid over row blocks to
            # keep cols within the 1 MB SMEM budget at large graph sizes.
            col = cols_ref[i, k]
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(col * bs, bs), pl.ds(j * tile_n, tile_n)],
                x_buf.at[slot],
                sem.at[slot],
            )

        # warm the pipeline: up to n_buf DMAs in flight
        for w in range(n_buf):
            @pl.when(w < count)
            def _start(w=w):
                get_dma(w, w).start()

        def body(k, acc):
            slot = k % n_buf
            get_dma(slot, k).wait()
            acc = acc + jnp.dot(data_ref[0, k], x_buf[slot],
                                preferred_element_type=jnp.float32,
                                precision=precision)

            # refill this slot only AFTER its contents were consumed by the
            # dot above — issuing before the wait would race the in-flight
            # read (observed as wrong DMA data on v5e)
            @pl.when(k + n_buf < count)
            def _next():
                get_dma(slot, k + n_buf).start()

            return acc

        acc = lax.fori_loop(0, count, body,
                            jnp.zeros((bs, tile_n), jnp.float32),
                            unroll=False)
        o_ref[:] = acc.astype(o_ref.dtype)

    return kernel


def _make_spmm_resident_kernel(bs: int, tile_n: int, precision):
    def kernel(cols_ref, counts_ref, data_ref, x_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        count = counts_ref[i]

        def body(k, acc):
            col = cols_ref[i, k]
            xb = x_ref[pl.ds(pl.multiple_of(col * bs, bs), bs),
                       pl.ds(j * tile_n, tile_n)]
            return acc + jnp.dot(data_ref[0, k], xb,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)

        acc = lax.fori_loop(0, count, body,
                            jnp.zeros((bs, tile_n), jnp.float32),
                            unroll=False)
        o_ref[:] = acc.astype(o_ref.dtype)

    return kernel


def _spmm_pallas_resident(data: jax.Array, cols: jax.Array, counts: jax.Array,
                          x: jax.Array, *, block_size: int, tile_n: int,
                          precision=None) -> jax.Array:
    """Whole-x-in-VMEM ELL variant: x tiles become on-chip slices, so the
    only HBM stream is the A tiles — the same resident-x trick that took
    the banded kernel from 35% to 71% of the bandwidth roofline. Used when
    x fits the VMEM budget; the streaming variant covers the rest."""
    precision = kernel_dot_precision(x.dtype, precision)
    nbr, max_b = cols.shape
    bs = block_size
    n = x.shape[1]
    grid = (nbr, n // tile_n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, max_b, bs, bs),
                         lambda i, j, cols_ref, counts_ref: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec((bs, tile_n),
                               lambda i, j, cols_ref, counts_ref: (i, j)),
    )
    total_tiles = int(nbr * max_b)
    return pl.pallas_call(
        _make_spmm_resident_kernel(bs, tile_n, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bs, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * total_tiles * bs * bs * n,
            bytes_accessed=(data.size * data.dtype.itemsize
                            + x.size * x.dtype.itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(cols, counts, data, x)


# x + per-row A tiles + output tile must fit on-chip
_ELL_RESIDENT_X_BYTES = 80 * 1024 * 1024


def _spmm_pallas(data: jax.Array, cols: jax.Array, counts: jax.Array,
                 x: jax.Array, *, block_size: int, tile_n: int,
                 precision=None, n_buf: int = 4) -> jax.Array:
    precision = kernel_dot_precision(x.dtype, precision)
    nbr, max_b = cols.shape
    bs = block_size
    n = x.shape[1]
    grid = (nbr, n // tile_n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # cols, counts
        grid=grid,
        in_specs=[
            # whole tile-row of A resident in VMEM for the instance
            pl.BlockSpec((1, max_b, bs, bs),
                         lambda i, j, cols_ref, counts_ref: (i, 0, 0, 0)),
            # x stays in HBM; we DMA slices manually
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((bs, tile_n),
                               lambda i, j, cols_ref, counts_ref: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((n_buf, bs, tile_n), x.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    total_tiles = int(nbr * max_b)
    return pl.pallas_call(
        _make_spmm_kernel(bs, tile_n, max_b, precision, n_buf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bs, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * total_tiles * bs * bs * n,
            bytes_accessed=(data.size * data.dtype.itemsize
                            + total_tiles * bs * n * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(cols, counts, data, x)


def bcsr_spmm(data: jax.Array, cols: jax.Array, x: jax.Array, *,
              counts: jax.Array | None = None,
              block_size: int = 128, use_pallas: bool = True,
              tile_n: int = 512, precision=None, n_buf: int = 4) -> jax.Array:
    """``y[Vpad, N] = A_blocked @ x[Vpad, N]``.

    ``N`` is padded internally to a lane multiple; callers see the original
    N. ``precision`` follows `jax.lax.Precision`: the default lets the MXU
    run bf16 multiplies with f32 accumulation (speed-of-light path);
    ``'highest'`` forces full f32 for parity runs.
    """
    n = x.shape[1]
    if not use_pallas or jax.default_backend() != "tpu":
        return bcsr_spmm_reference(data, cols, x, block_size=block_size)
    if counts is None:
        counts = jnp.full((cols.shape[0],), cols.shape[1], jnp.int32)
    tile = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    # chunk row blocks so the scalar-prefetched cols (padded to 128 lanes
    # in SMEM) stay under the 1 MB SMEM budget
    chunk = 1024
    nbr = cols.shape[0]
    x_bytes = x.shape[0] * n_pad * x.dtype.itemsize
    row_bytes = 2 * cols.shape[1] * block_size * block_size * data.dtype.itemsize
    resident = x_bytes + row_bytes < _ELL_RESIDENT_X_BYTES
    ys = []
    for s in range(0, nbr, chunk):
        e = min(s + chunk, nbr)
        if resident:
            ys.append(_spmm_pallas_resident(data[s:e], cols[s:e], counts[s:e],
                                            x, block_size=block_size,
                                            tile_n=tile, precision=precision))
        else:
            ys.append(_spmm_pallas(data[s:e], cols[s:e], counts[s:e], x,
                                   block_size=block_size, tile_n=tile,
                                   precision=precision, n_buf=n_buf))
    y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=0)
    return y[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def bcsr_spmm_vjp(data, cols, counts, data_t, cols_t, counts_t, x,
                  block_size=128, use_pallas=True):
    """Differentiable SpMM.

    Forward uses the row-major pack; the backward pass w.r.t. ``x`` runs
    SpMM with the *transpose* pack (``Aᵀ g``), and w.r.t. the tile values
    runs blocked SDDMM (``g · xᵀ`` sampled at the nonzero tiles).
    """
    return bcsr_spmm(data, cols, x, counts=counts, block_size=block_size,
                     use_pallas=use_pallas)


def _vjp_fwd(data, cols, counts, data_t, cols_t, counts_t, x,
             block_size, use_pallas):
    y = bcsr_spmm(data, cols, x, counts=counts, block_size=block_size,
                  use_pallas=use_pallas)
    return y, (data_t, cols_t, counts_t, cols, counts, x)


def _vjp_bwd(block_size, use_pallas, res, g):
    from stgcn_tpu.kernels.sddmm import bcsr_sddmm

    data_t, cols_t, counts_t, cols, counts, x = res
    dx = bcsr_spmm(data_t, cols_t, g, counts=counts_t, block_size=block_size,
                   use_pallas=use_pallas)
    ddata = bcsr_sddmm(cols, g, x, counts=counts, block_size=block_size,
                       use_pallas=use_pallas)
    return ddata, None, None, None, None, None, dx


bcsr_spmm_vjp.defvjp(_vjp_fwd, _vjp_bwd)
