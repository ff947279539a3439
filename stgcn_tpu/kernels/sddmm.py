"""Blocked SDDMM: sample ``g @ xᵀ`` at the nonzero tiles of a blocked-ELL
pattern. This is the backward of SpMM w.r.t. the edge values (needed once
edge weights become learnable) and a building block for attention-style
edge scores.

``out[i, k] = G_block[i] @ X_block[cols[i, k]]ᵀ`` contracting the full
feature axis ``N``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bcsr_sddmm_reference(cols: jax.Array, g: jax.Array, x: jax.Array,
                         *, block_size: int) -> jax.Array:
    nbr, max_b = cols.shape
    bs = block_size
    n = g.shape[1]
    gb = g.reshape(nbr, bs, n)
    xb = x.reshape(-1, bs, n)[cols]  # [nbr, max_b, bs, n]
    return jnp.einsum("ran,rkbn->rkab", gb, xb,
                      preferred_element_type=jnp.float32).astype(g.dtype)


def _make_sddmm_kernel(precision):
    def _sddmm_kernel(cols_ref, counts_ref, g_ref, x_ref, o_ref, acc_ref):
        i = pl.program_id(0)
        k = pl.program_id(1)
        j = pl.program_id(2)
        live = k < counts_ref[i]

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(live)
        def _acc():
            acc_ref[:] += jax.lax.dot_general(
                g_ref[:], x_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),  # g [bs,N] · x [bs,N]ᵀ
                preferred_element_type=jnp.float32,
                precision=precision,
            )

        @pl.when(j == pl.num_programs(2) - 1)
        def _done():
            o_ref[0, 0] = acc_ref[:].astype(o_ref.dtype)

    return _sddmm_kernel


def _sddmm_pallas(cols: jax.Array, counts: jax.Array, g: jax.Array,
                  x: jax.Array, *, block_size: int, tile_n: int,
                  precision=None) -> jax.Array:
    nbr, max_b = cols.shape
    bs = block_size
    n = g.shape[1]
    grid = (nbr, max_b, n // tile_n)

    # cols transposed [max_b, nbr]: 2-D SMEM operands pad the minor dim to
    # 128 lanes; keeping the long axis minor fits the 1 MB SMEM budget
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, tile_n), lambda i, k, j, cols_ref, counts_ref: (i, j)),
            pl.BlockSpec((bs, tile_n),
                         lambda i, k, j, cols_ref, counts_ref: (cols_ref[k, i], j)),
        ],
        out_specs=pl.BlockSpec((1, 1, bs, bs),
                               lambda i, k, j, cols_ref, counts_ref: (i, k, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32)],
    )
    return pl.pallas_call(
        _make_sddmm_kernel(precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr, max_b, bs, bs), g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * max_b * n * bs * bs,
            bytes_accessed=g.size * g.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(cols.T, counts, g, x)


def bcsr_sddmm(cols: jax.Array, g: jax.Array, x: jax.Array, *,
               counts: jax.Array | None = None,
               block_size: int = 128, use_pallas: bool = True,
               tile_n: int = 512, precision=None) -> jax.Array:
    """``out[nbr, max_b, bs, bs]`` = tiles of ``g @ xᵀ`` at the ELL pattern.

    Padding slots (``k >= counts[i]``) come back zero. ``precision`` as in
    :func:`~stgcn_tpu.kernels.spmm.bcsr_spmm`.
    """
    if not use_pallas or jax.default_backend() != "tpu":
        out = bcsr_sddmm_reference(cols, g, x, block_size=block_size)
        if counts is not None:  # zero padding slots, like the kernel
            live = jnp.arange(cols.shape[1])[None, :] < counts[:, None]
            out = out * live[..., None, None].astype(out.dtype)
        return out

    if counts is None:
        counts = jnp.full((cols.shape[0],), cols.shape[1], jnp.int32)
    n = g.shape[1]
    tile = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        g = jnp.pad(g, ((0, 0), (0, n_pad - n)))
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    # chunk row blocks to bound the scalar-prefetch SMEM footprint
    chunk = 2048
    nbr, bs = cols.shape[0], block_size
    outs = []
    for s in range(0, nbr, chunk):
        e = min(s + chunk, nbr)
        outs.append(_sddmm_pallas(cols[s:e], counts[s:e],
                                  g[s * bs:e * bs], x,
                                  block_size=bs, tile_n=tile,
                                  precision=precision))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
