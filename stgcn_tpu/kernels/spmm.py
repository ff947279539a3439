"""Blocked-ELL SpMM: ``y = A @ x`` with ``A`` packed into 128×128 tiles.

TPU-native sparse matmul: each nonzero tile is a dense MXU matmul; tile
column ids are scalar-prefetched so the pipeline can compute the ``x`` DMA
source address before the step runs (``pltpu.PrefetchScalarGridSpec``).
Padding tiles are all-zero and point at block-column 0, so no masking is
needed anywhere — they simply add zero.

Replaces the reference's dense ``torch.einsum('hi,btij->bthj', gso, x)``
(``model/layers.py:154-161,198``) at graph sizes where a dense ``[V, V]``
operand stops being viable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _make_spmm_kernel(precision):
    def _spmm_kernel(cols_ref, data_ref, x_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(data_ref[0, 0], x_ref[:],
                              preferred_element_type=jnp.float32,
                              precision=precision)

        @pl.when(k == pl.num_programs(2) - 1)
        def _done():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return _spmm_kernel


def _spmm_pallas(data: jax.Array, cols: jax.Array, x: jax.Array,
                 *, block_size: int, tile_n: int, precision=None) -> jax.Array:
    nbr, max_b = cols.shape
    bs = block_size
    n = x.shape[1]
    grid = (nbr, n // tile_n, max_b)

    flops = 2 * nbr * max_b * (n // tile_n) * tile_n * bs * bs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bs, bs), lambda i, j, k, cols_ref: (i, k, 0, 0)),
            pl.BlockSpec((bs, tile_n), lambda i, j, k, cols_ref: (cols_ref[i, k], j)),
        ],
        out_specs=pl.BlockSpec((bs, tile_n), lambda i, j, k, cols_ref: (i, j)),
        scratch_shapes=[pltpu.VMEM((bs, tile_n), jnp.float32)],
    )
    return pl.pallas_call(
        _make_spmm_kernel(precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bs, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=data.size * data.dtype.itemsize + x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(cols, data, x)


def bcsr_spmm(data: jax.Array, cols: jax.Array, x: jax.Array, *,
              block_size: int = 128, use_pallas: bool = True,
              tile_n: int = 512, precision=None) -> jax.Array:
    """``y[Vpad, N] = A_blocked @ x[Vpad, N]``.

    ``N`` is padded internally to a lane multiple; callers see the original
    N. ``precision`` follows `jax.lax.Precision`: the default lets the MXU
    run bf16 multiplies with f32 accumulation (speed-of-light path);
    ``'highest'`` forces full f32 for parity runs.
    """
    n = x.shape[1]
    if not use_pallas or jax.default_backend() != "tpu":
        return bcsr_spmm_reference(data, cols, x, block_size=block_size)
    tile = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    y = _spmm_pallas(data, cols, x, block_size=block_size, tile_n=tile,
                     precision=precision)
    return y[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bcsr_spmm_vjp(data, cols, data_t, cols_t, x, block_size=128, use_pallas=True):
    """Differentiable SpMM.

    Forward uses the row-major pack; the backward pass w.r.t. ``x`` runs
    SpMM with the *transpose* pack (``Aᵀ g``), and w.r.t. the tile values
    runs blocked SDDMM (``g · xᵀ`` sampled at the nonzero tiles).
    """
    return bcsr_spmm(data, cols, x, block_size=block_size, use_pallas=use_pallas)


def _vjp_fwd(data, cols, data_t, cols_t, x, block_size, use_pallas):
    y = bcsr_spmm(data, cols, x, block_size=block_size, use_pallas=use_pallas)
    return y, (data_t, cols_t, cols, x)


def _vjp_bwd(block_size, use_pallas, res, g):
    from stgcn_tpu.kernels.sddmm import bcsr_sddmm

    data_t, cols_t, cols, x = res
    dx = bcsr_spmm(data_t, cols_t, g, block_size=block_size, use_pallas=use_pallas)
    ddata = bcsr_sddmm(cols, g, x, block_size=block_size, use_pallas=use_pallas)
    return ddata, None, None, None, dx


bcsr_spmm_vjp.defvjp(_vjp_fwd, _vjp_bwd)
