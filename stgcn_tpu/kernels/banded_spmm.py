"""Banded-slab SpMM: the fast path for RCM-reordered road graphs.

After reverse Cuthill–McKee reordering, real road networks have a narrow
band (measured: max bandwidth 748 on the 100k-vertex synthetic graph —
every nonzero of a 128-row block lies in a ≤1792-column window). That
makes the fastest TPU formulation *dense over the band*:

- pack each 128-row block as one dense slab ``[bs, W]`` over its column
  window (``W`` = max window, 128-aligned; per-block start offsets
  scalar-prefetched);
- the kernel does ONE contiguous x-window DMA and ONE ``[bs, W] @ [W, N]``
  MXU matmul per (row block, N-tile) — no scattered 32 KB fetches, no
  per-tile loop;
- x DMAs are double-buffered across grid steps (issue next step's window
  while multiplying the current one).

Compared to blocked-ELL this trades some slab zero-fill (band occupancy
is lower than tile occupancy) for perfectly coalesced DMA and a single
big matmul — a win whenever the band is narrow. `banded_viable` decides;
`ops.make_graph_op(kind='auto')` can pick between the two.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_dot_precision(dtype, precision=None):
    """Effective matmul precision for an in-kernel dot on ``dtype``
    operands. Sub-f32 operands pin ``Precision.DEFAULT`` explicitly:
    the MXU multiplies bf16 (and int8-cast-to-bf16) operands exactly
    into the f32 accumulator regardless, and the Mosaic compiler rejects
    an fp32 contract precision on bf16 operands ("Bad lhs type") — which
    an ambient ``jax_default_matmul_precision='highest'`` (the test
    suite's parity setting) would otherwise request."""
    if jnp.dtype(dtype).itemsize < 4:
        return jax.lax.Precision.DEFAULT
    return precision


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _window_meta(csr: sp.csr_matrix, block_size: int, col_align: int,
                 contain_diag: bool = False
                 ) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Per-block-row column-window metadata: aligned window starts, raw
    entry-extent ends, the common (max, aligned) window width, and the
    natural ``v_pad``.

    ``contain_diag=True`` widens each window to cover the block's own
    diagonal rows ``[i*bs, (i+1)*bs)`` — the precondition of the streaming
    cheb-pair kernel, whose T1 ring is addressed at block granularity
    (pass ``col_align=block_size`` with it so windows start on block
    boundaries)."""
    v = csr.shape[0]
    bs = block_size
    nbr = -(-v // bs)
    lo = np.zeros(nbr, np.int64)
    hi = np.zeros(nbr, np.int64)
    indptr, indices = csr.indptr, csr.indices
    for i in range(nbr):
        s, e = indptr[i * bs], indptr[min((i + 1) * bs, v)]
        if e > s:
            seg = indices[s:e]
            lo[i], hi[i] = seg.min(), seg.max() + 1
        else:
            # empty block row: park the window at the block's own diagonal
            # (a window at column 0 would inflate the sharded pack's halo)
            lo[i], hi[i] = i * bs, i * bs + 1
    if contain_diag:
        blocks = np.arange(nbr, dtype=np.int64)
        lo = np.minimum(lo, blocks * bs)
        hi = np.maximum(hi, (blocks + 1) * bs)
    lo_al = (lo // col_align) * col_align
    width = int((hi - lo_al).max())
    w = _round_up(max(width, col_align), col_align)
    if contain_diag:
        # windows must not be clamped (that would break block alignment /
        # diagonal coverage): pad x far enough to cover every window
        natural = _round_up(max(v, int(lo_al.max()) + w), col_align)
    else:
        natural = _round_up(max(v, w), col_align)
    return lo_al, hi, w, natural


def pack_banded(matrix: sp.spmatrix, *, block_size: int = 128,
                col_align: int = 128, v_pad: int | None = None
                ) -> tuple[np.ndarray, np.ndarray, int]:
    """Pack an (RCM-ordered) sparse matrix into per-block-row dense slabs.

    Returns ``(slabs [nbr, bs, W], lo [nbr] int32 element offsets, v_pad)``.
    ``lo[i]`` is clamped so ``lo[i] + W <= v_pad``. Pass ``v_pad`` to force a
    common padding with another pack (e.g. the transpose).
    """
    csr = sp.csr_matrix(matrix)
    v = csr.shape[0]
    bs = block_size
    nbr = -(-v // bs)

    lo_al, _, w, natural = _window_meta(csr, bs, col_align)
    if v_pad is None:
        v_pad = natural
    elif v_pad < max(v, w):
        raise ValueError(f"v_pad={v_pad} too small (need >= {max(v, w)})")
    lo_al = np.minimum(lo_al, v_pad - w)

    slabs = np.zeros((nbr, bs, w), np.float32)
    coo = csr.tocoo()
    br = coo.row // bs
    slabs[br, coo.row - br * bs, coo.col - lo_al[br]] = coo.data
    return slabs, lo_al.astype(np.int32), v_pad


def banded_spmm_reference(slabs: jax.Array, lo: jax.Array, x: jax.Array,
                          *, block_size: int,
                          scales: jax.Array | None = None) -> jax.Array:
    """jnp oracle: per-block dense slab × gathered x window.

    Memory-aware: when materializing every ``[w, n]`` window at once (plus
    the f32 copy of an int8 pack) would exceed ~1 GB — the 1M-vertex
    structural runs on the CPU mesh — it scans over blocks instead, holding
    one window and one dequantized slab at a time."""
    nbr, bs, w = slabs.shape
    n = x.shape[1]
    gathered_bytes = nbr * w * n * x.dtype.itemsize + slabs.size * 4
    if gathered_bytes > (1 << 30):
        def blk(_, inp):
            slab, lo_i, scl = inp
            slab = slab.astype(jnp.float32)
            if scl is not None:
                slab = slab * scl[:, None]
            win = jax.lax.dynamic_slice(x, (lo_i, 0), (w, n))
            return None, jnp.dot(slab, win.astype(jnp.float32),
                                  preferred_element_type=jnp.float32)

        _, y = jax.lax.scan(blk, None, (slabs, lo, scales))
        return y.reshape(nbr * bs, n).astype(x.dtype)
    if scales is not None:
        slabs = slabs.astype(jnp.float32) * scales[:, :, None]
    idx = lo[:, None] + jnp.arange(w)[None, :]
    windows = x[idx]  # [nbr, w, n]
    y = jnp.einsum("ibw,iwn->ibn", slabs, windows,
                   preferred_element_type=jnp.float32)
    return y.reshape(nbr * bs, n).astype(x.dtype)


def banded_sddmm_scan(lo: jax.Array, x: jax.Array, g: jax.Array,
                      nbr: int, bs: int, w: int) -> jax.Array:
    """Band-sampled SDDMM ``dslab[i, b, w'] = Σ_n g[i·bs+b, n]·x[lo_i+w', n]``
    as a scan over block rows — one ``[w, n]`` window materialized at a
    time instead of all of them at once (the whole-window gather is a
    ~10 GB temporary at 1M vertices / training widths; VERDICT r2 item 6).
    This is the gradient w.r.t. slab values — the learnable-edge-weight
    path."""
    n = x.shape[1]
    rows = _round_up(max(x.shape[0], nbr * bs), bs)
    if x.shape[0] < rows:  # windows may extend past v_pad
        x = jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))
    if g.shape[0] < nbr * bs:
        g = jnp.pad(g, ((0, nbr * bs - g.shape[0]), (0, 0)))
    g_blocks = g[:nbr * bs].reshape(nbr, bs, n)

    def blk(_, inp):
        lo_i, g_blk = inp
        win = jax.lax.dynamic_slice(x, (lo_i, 0), (w, n))
        return None, jax.lax.dot_general(
            g_blk.astype(jnp.float32), win.astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    _, d = jax.lax.scan(blk, None, (lo, g_blocks))
    return d


def _make_banded_kernel(bs: int, w: int, tile_n: int, n_tiles: int,
                        nbr: int, precision, quantized: bool = False):
    def kernel(lo_ref, slab_ref, *rest):
        if quantized:
            scale_ref, x_hbm, o_ref, x_buf, sem = rest
        else:
            x_hbm, o_ref, x_buf, sem = rest
        i = pl.program_id(0)
        j = pl.program_id(1)
        step = i * n_tiles + j

        def get_dma(slot, ii, jj):
            # lo is 128-aligned by construction (pack_banded col_align)
            start = pl.multiple_of(lo_ref[ii], 128)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, w), pl.ds(jj * tile_n, tile_n)],
                x_buf.at[slot],
                sem.at[slot],
            )

        @pl.when(step == 0)
        def _warm():
            get_dma(0, i, j).start()

        # issue next grid step's window while we compute this one
        nj = (j + 1) % n_tiles
        ni = i + (j + 1) // n_tiles

        @pl.when(ni < nbr)
        def _next():
            get_dma((step + 1) % 2, ni, nj).start()

        get_dma(step % 2, i, j).wait()
        y = jnp.dot(_slab_block(slab_ref, x_buf.dtype), x_buf[step % 2],
                    preferred_element_type=jnp.float32,
                    precision=precision)
        if quantized:
            y = y * scale_ref[0, 0][:, None]
        o_ref[:] = y.astype(o_ref.dtype)

    return kernel


def _slab_block(slab_ref, x_dtype):
    """Slab tile as an MXU operand; int8 packs dequantize on the VPU (the
    per-row scale is applied to the *output*, so only a dtype convert
    happens here — halves the dominant HBM stream)."""
    blk = slab_ref[0]
    if blk.dtype == jnp.int8:
        return blk.astype(x_dtype)
    return blk


def _make_resident_kernel(bs: int, w: int, tile_n: int, precision,
                          quantized: bool):
    def kernel(lo_ref, slab_ref, *rest):
        if quantized:
            scale_ref, x_ref, o_ref = rest
        else:
            x_ref, o_ref = rest
        i = pl.program_id(0)
        j = pl.program_id(1)
        start = pl.multiple_of(lo_ref[i], 128)
        window = x_ref[pl.ds(start, w), pl.ds(j * tile_n, tile_n)]
        y = jnp.dot(_slab_block(slab_ref, x_ref.dtype), window,
                    preferred_element_type=jnp.float32,
                    precision=precision)
        if quantized:
            y = y * scale_ref[0, 0][:, None]
        o_ref[:] = y.astype(o_ref.dtype)

    return kernel


def _banded_pallas_resident(slabs: jax.Array, lo: jax.Array, x: jax.Array, *,
                            tile_n: int, precision=None,
                            scales: jax.Array | None = None) -> jax.Array:
    """Whole-x-in-VMEM variant: v5e has 128 MB of VMEM, so for graphs up to
    ~300k vertices at n=128 bf16 the dense operand fits on-chip. Each x row
    is then read from HBM exactly once (the band windows of adjacent row
    blocks overlap ~93%, so the streaming variant refetches x ~14×)."""
    precision = kernel_dot_precision(x.dtype, precision)
    nbr, bs, w = slabs.shape
    n = x.shape[1]
    grid = (nbr, n // tile_n)
    quantized = scales is not None
    in_specs = [
        pl.BlockSpec((1, bs, w), lambda i, j, lo_ref: (i, 0, 0)),
    ]
    args = [lo, slabs]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, bs),
                        lambda i, j, lo_ref: (i, 0, 0)))
        args.append(scales)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # x resident
    args.append(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lo
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bs, tile_n), lambda i, j, lo_ref: (i, j)),
    )
    return pl.pallas_call(
        _make_resident_kernel(bs, w, tile_n, precision, quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bs, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * bs * w * n,
            bytes_accessed=(slabs.size * slabs.dtype.itemsize
                            + x.size * x.dtype.itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*args)


# x + double-buffered slab blocks + output tile must fit on-chip
_RESIDENT_X_BYTES = 96 * 1024 * 1024


def _banded_pallas(slabs: jax.Array, lo: jax.Array, x: jax.Array, *,
                   tile_n: int, precision=None,
                   scales: jax.Array | None = None) -> jax.Array:
    precision = kernel_dot_precision(x.dtype, precision)
    nbr, bs, w = slabs.shape
    n = x.shape[1]
    n_tiles = n // tile_n
    grid = (nbr, n_tiles)
    quantized = scales is not None
    in_specs = [pl.BlockSpec((1, bs, w), lambda i, j, lo_ref: (i, 0, 0))]
    args = [lo, slabs]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, bs),
                        lambda i, j, lo_ref: (i, 0, 0)))
        args.append(scales)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # x in HBM
    args.append(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lo
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bs, tile_n), lambda i, j, lo_ref: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, w, tile_n), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_banded_kernel(bs, w, tile_n, n_tiles, nbr, precision, quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bs, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * bs * w * n,
            bytes_accessed=(slabs.size * slabs.dtype.itemsize
                            + nbr * w * n * x.dtype.itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def banded_spmm(slabs: jax.Array, lo: jax.Array, x: jax.Array, *,
                block_size: int = 128, use_pallas: bool = True,
                tile_n: int = 512, precision=None,
                scales: jax.Array | None = None) -> jax.Array:
    """``y[nbr*bs, N] = A_banded @ x``; x must have ``v_pad`` rows.

    ``scales``: per-row dequant scales [nbr, bs] for int8 slabs (the slab
    holds ``round(a / scale)``; the scale multiplies the output row).
    """
    n = x.shape[1]
    if not use_pallas or jax.default_backend() != "tpu":
        return banded_spmm_reference(slabs, lo, x, block_size=block_size,
                                     scales=scales)
    # pick the N tile that minimizes padding waste (e.g. n=1280 with a
    # fixed 512 tile pads to 1536 — 20% wasted window traffic; a 640 tile
    # pads nothing), preferring bigger tiles on ties (fewer grid steps)
    cands = [c for c in (640, 512, 384, 256, 128) if c <= max(tile_n, 128)]
    tile = min(cands, key=lambda c: (_round_up(n, c), -c))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    x_bytes = x.shape[0] * n_pad * x.dtype.itemsize
    slab_bytes = 2 * slabs.shape[1] * slabs.shape[2] * slabs.dtype.itemsize
    if scales is not None:
        scales = scales.reshape(scales.shape[0], 1, scales.shape[-1])
    if x_bytes + slab_bytes < _RESIDENT_X_BYTES:
        y = _banded_pallas_resident(slabs, lo, x, tile_n=tile,
                                    precision=precision, scales=scales)
    else:
        y = _banded_pallas(slabs, lo, x, tile_n=tile, precision=precision,
                           scales=scales)
    return y[:, :n]


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def banded_spmm_vjp(slabs, lo, slabs_t, lo_t, x, scales=None, scales_t=None,
                    block_size=128, use_pallas=True):
    """Differentiable banded SpMM.

    d/dx runs the banded kernel with the *transpose* pack (``Aᵀ g``);
    d/dslabs is the banded SDDMM (``g ·ᵀ x`` sampled at the band windows) in
    jnp form — when the operator is a jit-captured constant (the training
    path) XLA dead-code-eliminates it. With int8 packs (``scales`` set) the
    edge weights are frozen: d/dslabs is not defined through quantization.
    """
    return banded_spmm(slabs, lo, x, block_size=block_size,
                       use_pallas=use_pallas, scales=scales)


def _banded_vjp_fwd(slabs, lo, slabs_t, lo_t, x, scales, scales_t,
                    block_size, use_pallas):
    y = banded_spmm(slabs, lo, x, block_size=block_size,
                    use_pallas=use_pallas, scales=scales)
    return y, (slabs, lo, slabs_t, lo_t, x, scales, scales_t)


def _banded_vjp_bwd(block_size, use_pallas, res, g):
    slabs, lo, slabs_t, lo_t, x, scales, scales_t = res
    v_pad = x.shape[0]
    g_pad = jnp.pad(g, ((0, v_pad - g.shape[0]), (0, 0))) \
        if g.shape[0] < v_pad else g
    dx = banded_spmm(slabs_t, lo_t, g_pad, block_size=block_size,
                     use_pallas=use_pallas, scales=scales_t)
    if dx.shape[0] > v_pad:  # nbr*bs overshoots v_pad on small graphs
        dx = dx[:v_pad]
    elif dx.shape[0] < v_pad:
        dx = jnp.pad(dx, ((0, v_pad - dx.shape[0]), (0, 0)))
    if scales is not None:
        dslabs = jnp.zeros_like(slabs)  # quantized pack: weights frozen
        return dslabs, None, None, None, dx, None, None
    # banded SDDMM: dslab[i] = g_block[i] @ x_window[i]^T — scan-based
    # (DCE'd unless edge weights are trainable)
    nbr, bs, w = slabs.shape
    dslabs = banded_sddmm_scan(lo, x, g, nbr, bs, w).astype(slabs.dtype)
    return dslabs, None, None, None, dx, None, None


banded_spmm_vjp.defvjp(_banded_vjp_fwd, _banded_vjp_bwd)


def pack_banded_with_transpose(matrix: sp.spmatrix, *, block_size: int = 128):
    """Forward + transpose packs (the backward's ``Aᵀ``), with a common
    ``v_pad`` so x/g buffers are shared."""
    csr = sp.csr_matrix(matrix)
    _, _, vp1 = pack_banded(csr, block_size=block_size)
    _, _, vp2 = pack_banded(csr.T.tocsr(), block_size=block_size)
    v_pad = max(vp1, vp2)
    slabs, lo, _ = pack_banded(csr, block_size=block_size, v_pad=v_pad)
    slabs_t, lo_t, _ = pack_banded(csr.T.tocsr(), block_size=block_size,
                                   v_pad=v_pad)
    return slabs, lo, slabs_t, lo_t, v_pad


def banded_viable(matrix: sp.spmatrix, *, block_size: int = 128,
                  max_width: int = 4096) -> bool:
    """Cheap check: is the post-RCM band narrow enough for the slab path?"""
    csr = sp.csr_matrix(matrix)
    v = csr.shape[0]
    nbr = -(-v // block_size)
    width = 0
    for i in range(0, nbr, max(nbr // 64, 1)):  # sample block rows
        s, e = csr.indptr[i * block_size], csr.indptr[min((i + 1) * block_size, v)]
        if e > s:
            seg = csr.indices[s:e]
            width = max(width, int(seg.max()) - int(seg.min()) + 1)
    return width <= max_width


# ---------------------------------------------------------------------------
# fused Chebyshev pair: (T1, T2) = (A x, 2 A T1 − x) in one slab pass
# ---------------------------------------------------------------------------

def _make_cheb_pair_kernel(bs: int, w: int, tile_n: int, nbr: int, delay: int,
                           precision):
    """Wavefront kernel: step i computes T1 block i (from x) and T2 block
    i − delay (from the T1 prefix, which by then covers its band window).
    The slab block for the T2 stage is replayed from a VMEM ring filled by
    the T1 stage, so A streams from HBM exactly once for BOTH applications.
    """
    n_ring = delay + 1

    def kernel(lo_ref, slab_ref, x_ref, t1_ref, t2_ref, t1_buf, ring):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _zero_tail():
            # stage 2 windows may cover T1 rows past the last block row
            # (window clamp is v_pad, not nbr*bs); those rows are never
            # written by stage 1 and uninitialized VMEM can hold NaNs
            # (NaN x 0 slab poisons the dot) — zero them once
            nrows = t1_buf.shape[0] - nbr * bs
            if nrows > 0:
                t1_buf[pl.ds(nbr * bs, nrows), :] = jnp.zeros(
                    (nrows, t1_buf.shape[1]), t1_buf.dtype)

        @pl.when(i < nbr)
        def _stage1():
            start = pl.multiple_of(lo_ref[i], 128)
            win = x_ref[pl.ds(start, w), :]
            t1 = jnp.dot(slab_ref[0], win, preferred_element_type=jnp.float32,
                         precision=precision).astype(x_ref.dtype)
            t1_buf[pl.ds(i * bs, bs), :] = t1
            t1_ref[...] = t1
            ring[i % n_ring] = slab_ref[0]

        i2 = i - delay

        @pl.when(i2 >= 0)
        def _stage2():
            start2 = pl.multiple_of(lo_ref[i2], 128)
            win1 = t1_buf[pl.ds(start2, w), :]
            x_blk = x_ref[pl.ds(i2 * bs, bs), :]
            t2_ref[...] = (
                2.0 * jnp.dot(ring[i2 % n_ring], win1,
                              preferred_element_type=jnp.float32,
                              precision=precision)
                - x_blk.astype(jnp.float32)).astype(x_ref.dtype)

    return kernel


def cheb_pair_wavefront_safe(lo, block_size: int) -> bool:
    """The wavefront schedule (delay = ceil(w/bs)+1) is only valid when
    every block's window starts at or before its own rows — ``lo[i] <=
    i*bs`` — i.e. the band contains the diagonal (true for rescaled
    Laplacians; a strictly super-diagonal window would read unwritten T1
    scratch). Checked host-side at pack time; callers with a violating
    pack must use the two-pass path."""
    lo = np.asarray(lo)
    return bool(np.all(lo <= np.arange(len(lo), dtype=np.int64) * block_size))


def banded_cheb_pair(slabs: jax.Array, lo: jax.Array, x: jax.Array, *,
                     use_pallas: bool = True,
                     precision=None) -> tuple[jax.Array, jax.Array]:
    """``(A x, 2 A (A x) − x)`` — the ks=3 Chebyshev recurrence
    (`model/layers.py:154-161`) with the operator streamed from HBM once.

    Requires x resident-viable (the T1 scratch is another x-sized buffer)
    and a wavefront-safe pack (:func:`cheb_pair_wavefront_safe` — verified
    here when ``lo`` is concrete; callers inside ``jit`` must verify at
    pack time). CPU / non-viable fallback: two applications.
    """
    precision = kernel_dot_precision(x.dtype, precision)
    nbr, bs, w = slabs.shape
    v_pad, n = x.shape
    x_bytes = x.size * x.dtype.itemsize
    viable = (use_pallas and jax.default_backend() == "tpu"
              and 2 * x_bytes + 4 * bs * w * slabs.dtype.itemsize
              < _RESIDENT_X_BYTES)
    if viable and not isinstance(lo, jax.core.Tracer):
        viable = cheb_pair_wavefront_safe(lo, bs)
    if not viable:
        single = use_pallas and jax.default_backend() == "tpu"
        t1 = banded_spmm(slabs, lo, x, block_size=bs, use_pallas=single,
                         precision=precision)
        t1p = jnp.pad(t1, ((0, v_pad - t1.shape[0]), (0, 0))) \
            if t1.shape[0] < v_pad else t1[:v_pad]
        t2 = 2.0 * banded_spmm(slabs, lo, t1p, block_size=bs,
                               use_pallas=single,
                               precision=precision)[:v_pad] - x
        return t1p, t2

    tile = _round_up(n, 128)
    if tile != n:
        x = jnp.pad(x, ((0, 0), (0, tile - n)))
    if nbr * bs != v_pad:  # bs need not divide v_pad
        x = jnp.pad(x, ((0, nbr * bs - v_pad), (0, 0)))
    delay = -(-w // bs) + 1  # T2 block i needs T1 rows < lo[i]+w <= (i+delay)*bs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr + delay,),
        in_specs=[
            pl.BlockSpec((1, bs, w),
                         lambda i, lo_ref: (jnp.minimum(i, nbr - 1), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=[
            pl.BlockSpec((bs, tile),
                         lambda i, lo_ref: (jnp.minimum(i, nbr - 1), 0)),
            # park on block 0 (no store) until the wavefront reaches it
            pl.BlockSpec((bs, tile),
                         lambda i, lo_ref: (jnp.maximum(i - delay, 0), 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbr * bs, tile), x.dtype),          # T1 prefix
            pltpu.VMEM((delay + 1, bs, w), slabs.dtype),    # slab ring
        ],
    )
    t1, t2 = pl.pallas_call(
        _make_cheb_pair_kernel(bs, w, tile, nbr, delay, precision),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nbr * bs, tile), x.dtype),
                   jax.ShapeDtypeStruct((nbr * bs, tile), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * nbr * bs * w * tile,
            bytes_accessed=(slabs.size * slabs.dtype.itemsize
                            + 3 * x.size * x.dtype.itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(lo, slabs, x)
    return t1[:v_pad, :n], t2[:v_pad, :n]


# ---------------------------------------------------------------------------
# streaming Chebyshev pair: (T1, T2) in one slab pass WITHOUT x residency
# ---------------------------------------------------------------------------


def cheb_pair_stream_safe(lo, w: int, block_size: int) -> bool:
    """Preconditions of :func:`banded_cheb_pair_stream` (checked host-side
    at pack time): block-aligned windows that contain each block's own
    diagonal rows — produced by ``pack_banded_device(contain_diag=True,
    col_align=block_size)``."""
    lo = np.asarray(lo, np.int64)
    i = np.arange(len(lo), dtype=np.int64)
    return bool(w % block_size == 0
                and (lo % block_size == 0).all()
                and (lo <= i * block_size).all()
                and (lo + w >= (i + 1) * block_size).all())


def _make_cheb_pair_stream_kernel(bs: int, w: int, n: int, nbr: int, nxb: int,
                                  delay: int, rn: int, rs: int, rx: int,
                                  precision, quantized: bool,
                                  chain: bool = False):
    """Wavefront schedule without x residency — and with each x block
    fetched from HBM exactly ONCE. Stage 1 computes T1 block i as ``nw``
    block-granular MXU dots against a VMEM ring of x blocks (the pack's
    windows are block-aligned, so no gathered window copy); the per-step
    DMA brings in only the single NEW block the next window needs —
    adjacent windows overlap by ``(w−bs)/w``, which the former
    whole-window DMA refetched ``w/bs``× from HBM. Stage 2 computes T2
    block i−delay from a ring of recent T1 blocks, replaying the slab
    block from a ring filled by stage 1, so the operator stream also
    crosses HBM exactly once for both applications.

    ``chain=True`` computes the VJP chain instead (see
    :func:`banded_chain_stream`): stage 1 stores ``u = g + 2·(A x)`` in
    the ring (streaming the extra ``g`` diagonal blocks, double-buffered)
    and emits it as out1; stage 2 emits ``A u − x_diag`` (no 2× factor).
    """
    nw = w // bs

    def kernel(lo_ref, slab_ref, *rest):
        rest = list(rest)
        scale1_ref = scale2_ref = g_hbm = None
        if quantized:
            scale1_ref, scale2_ref = rest[:2]
            rest = rest[2:]
        x_hbm = rest.pop(0)
        if chain:
            g_hbm = rest.pop(0)
        t1_ref, t2_ref, x_ring, sem = rest[:4]
        if chain:
            g_buf, gsem = rest[4:6]
            t1_ring, slab_ring = rest[6:]
        else:
            t1_ring, slab_ring = rest[4:]
        i = pl.program_id(0)

        def xdma(j):
            # fetch x block j into ring slot j % rx
            slot = pl.multiple_of((j % rx) * bs, bs)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * bs, bs), :],
                x_ring.at[pl.ds(slot, bs), :], sem.at[j % rx])

        def gdma(ii, slot):
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(ii * bs, bs), :], g_buf.at[slot],
                gsem.at[slot])

        @pl.when(i == 0)
        def _warm():
            for j in range(min(nw, nxb)):  # blocks of window 0
                xdma(j).start()
            if chain:
                gdma(0, 0).start()
            # stage 2 windows can cover T1 blocks past the last block row
            # (the pack clamps windows to v_pad, not nbr*bs); stage 1
            # never writes those ring slots, and uninitialized VMEM can
            # hold NaN bit patterns — NaN x 0 (the slab is zero there)
            # poisons the dot. Zero the ring once.
            t1_ring[...] = jnp.zeros_like(t1_ring)

        # stage 1 of step i+1 needs blocks < (lo[i+1]+w)/bs <= i+1+nw;
        # issue the one new block now (everything older is already in ring)
        @pl.when((i + 1 < nbr) & (i + nw < nxb))
        def _issue_next():
            xdma(i + nw).start()

        if chain:
            @pl.when(i + 1 < nbr)
            def _issue_next_g():
                gdma(i + 1, (i + 1) % 2).start()

        @pl.when(i < nbr)
        def _stage1():
            # first (and only) use of block i+nw−1: wait its DMA here
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
            slab0 = _slab_block(slab_ref, x_ring.dtype)
            acc = jnp.zeros((bs, n), jnp.float32)
            for k in range(nw):  # static unroll: nw block-granular dots
                a_k = slab0[:, k * bs:(k + 1) * bs]
                x_off = pl.multiple_of(((b0 + k) % rx) * bs, bs)
                acc += jnp.dot(a_k, x_ring[pl.ds(x_off, bs), :],
                               preferred_element_type=jnp.float32,
                               precision=precision)
            if quantized:
                acc = acc * scale1_ref[0, 0][:, None]
            if chain:
                acc = 2.0 * acc + g_buf[i % 2].astype(jnp.float32)
            t1c = acc.astype(x_ring.dtype)
            t1_ref[...] = t1c
            t1_ring[pl.ds(pl.multiple_of((i % rn) * bs, bs), bs), :] = t1c
            slab_ring[pl.ds(pl.multiple_of((i % rs) * bs, bs), bs), :] = \
                slab_ref[0]

        i2 = i - delay

        @pl.when(i2 >= 0)
        def _stage2():
            i2c = jnp.maximum(i2, 0)
            lo2 = lo_ref[i2c]
            b0 = lo2 // bs
            s_off = pl.multiple_of((i2c % rs) * bs, bs)
            slab2 = slab_ring[pl.ds(s_off, bs), :]
            acc = jnp.zeros((bs, n), jnp.float32)
            for k in range(nw):
                a_k = slab2[:, k * bs:(k + 1) * bs]
                if a_k.dtype == jnp.int8:
                    a_k = a_k.astype(x_ring.dtype)
                t_off = pl.multiple_of(((b0 + k) % rn) * bs, bs)
                t1_k = t1_ring[pl.ds(t_off, bs), :]
                acc += jnp.dot(a_k, t1_k,
                               preferred_element_type=jnp.float32,
                               precision=precision)
            y2 = acc if chain else 2.0 * acc
            if quantized:
                y2 = y2 * scale2_ref[0, 0][:, None]
            xdiag = x_ring[pl.ds(pl.multiple_of((i2c % rx) * bs, bs), bs), :]
            t2_ref[...] = (y2 - xdiag.astype(jnp.float32)).astype(t2_ref.dtype)

    return kernel


def _pair_stream_fallback(slabs, lo, x, g, scales, precision, bs):
    """Two/three tiled single applications — the stream kernel's math when
    its rings would not fit VMEM (wide N × f32, e.g. reference-scale
    graphs at batch 32). ``banded_spmm`` tiles N internally."""
    precision = kernel_dot_precision(x.dtype, precision)
    v_pad = x.shape[0]

    def apply(v):
        y = banded_spmm(slabs, lo, v, block_size=bs, scales=scales,
                        precision=precision)
        return jnp.pad(y, ((0, v_pad - y.shape[0]), (0, 0))) \
            if y.shape[0] < v_pad else y[:v_pad]

    if g is None:  # forward pair: (A x, 2 A (A x) − x)
        t1 = apply(x)
        return t1, 2.0 * apply(t1) - x
    # VJP chain (x := g2, g := g1): (u = g1 + 2 Aᵀ g2, Aᵀ u − g2)
    u = g[:v_pad] + 2.0 * apply(x)
    return u, apply(u) - x


def _pair_stream_call(slabs, lo, x, g, scales, precision):
    """Shared driver for :func:`banded_cheb_pair_stream` (``g=None``) and
    :func:`banded_chain_stream` (``g`` set)."""
    precision = kernel_dot_precision(x.dtype, precision)
    nbr, bs, w = slabs.shape
    v_pad, n = x.shape
    nw = w // bs
    delay = nw + 1
    rn = delay + nw   # T1 ring: oldest block needed is i2+1-nw, newest i2+nw-1
    rs = delay + 1    # slab ring
    rx = 2 * nw + 2   # x ring: block j last read (stage 2) at step j+nw+1;
    #                   slot reused by block j+nw+2
    n_pad = _round_up(n, 128)
    # VMEM estimate: x/T1 rings + double-buffered outputs + slab ring.
    # Beyond ~110 MB Mosaic rejects the kernel (the verify CLI run at
    # pemsd7-m f32 B=32 hit exactly this); fall back to tiled singles.
    est = ((rx + rn + (2 if g is not None else 0)) * bs * n_pad
           + 2 * 2 * bs * n_pad) * x.dtype.itemsize \
        + (rs + 2) * bs * w * slabs.dtype.itemsize
    if est > 110 * 1024 * 1024:
        return _pair_stream_fallback(slabs, lo, x, g, scales, precision, bs)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
        if g is not None:
            g = jnp.pad(g, ((0, 0), (0, n_pad - n)))
    # x must cover every window ([lo.max+w] <= pack v_pad) in whole blocks
    x_rows = _round_up(max(v_pad, nbr * bs), bs)
    if x_rows > v_pad:
        x = jnp.pad(x, ((0, x_rows - v_pad), (0, 0)))
    if g is not None and g.shape[0] < nbr * bs:
        g = jnp.pad(g, ((0, nbr * bs - g.shape[0]), (0, 0)))
    nxb = x_rows // bs
    chain = g is not None

    quantized = scales is not None
    in_specs = [pl.BlockSpec((1, bs, w),
                             lambda i, lo_ref: (jnp.minimum(i, nbr - 1), 0, 0))]
    args = [lo, slabs]
    if quantized:
        in_specs.append(pl.BlockSpec(
            (1, 1, bs), lambda i, lo_ref: (jnp.minimum(i, nbr - 1), 0, 0)))
        args.append(scales.reshape(nbr, 1, bs))
        in_specs.append(pl.BlockSpec(
            (1, 1, bs),
            lambda i, lo_ref: (jnp.maximum(i - (nw + 1), 0), 0, 0)))
        args.append(scales.reshape(nbr, 1, bs))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # x stays in HBM
    args.append(x)
    if chain:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        args.append(g)

    scratch = [
        pltpu.VMEM((rx * bs, n_pad), x.dtype),     # x block ring
        pltpu.SemaphoreType.DMA((rx,)),
    ]
    if chain:
        scratch += [pltpu.VMEM((2, bs, n_pad), x.dtype),  # g diag blocks
                    pltpu.SemaphoreType.DMA((2,))]
    scratch += [
        pltpu.VMEM((rn * bs, n_pad), x.dtype),     # T1 (or u) ring
        pltpu.VMEM((rs * bs, w), slabs.dtype),     # slab ring
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr + delay,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bs, n_pad),
                         lambda i, lo_ref: (jnp.minimum(i, nbr - 1), 0)),
            pl.BlockSpec((bs, n_pad),
                         lambda i, lo_ref: (jnp.maximum(i - (nw + 1), 0), 0)),
        ],
        scratch_shapes=scratch,
    )
    slab_bytes = slabs.size * slabs.dtype.itemsize
    x_bytes = x.size * x.dtype.itemsize
    t1, t2 = pl.pallas_call(
        _make_cheb_pair_stream_kernel(bs, w, n_pad, nbr, nxb, delay, rn, rs,
                                      rx, precision, quantized, chain),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nbr * bs, n_pad), x.dtype),
                   jax.ShapeDtypeStruct((nbr * bs, n_pad), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * nbr * bs * w * n_pad,
            bytes_accessed=slab_bytes + (2 if chain else 1) * x_bytes
            + 2 * nbr * bs * n_pad * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*args)
    if nbr * bs < v_pad:
        # contain_diag padding can exceed the row-block count; the missing
        # rows are all-zero A rows over all-zero x rows → t1 = t2 = 0
        # (chain: u = g = 0 there too, g being a cotangent of those rows)
        pad = ((0, v_pad - nbr * bs), (0, 0))
        return jnp.pad(t1[:, :n], pad), jnp.pad(t2[:, :n], pad)
    return t1[:v_pad, :n], t2[:v_pad, :n]


def banded_cheb_pair_stream(slabs: jax.Array, lo: jax.Array, x: jax.Array, *,
                            scales: jax.Array | None = None,
                            precision=None) -> tuple[jax.Array, jax.Array]:
    """``(A x, 2 A (A x) − x)`` with A streamed from HBM once, NO x
    residency requirement, and each x block fetched exactly once (block
    ring — adjacent band windows overlap ~(w−bs)/w, which a whole-window
    DMA would refetch w/bs× from HBM). Traffic per call ≈ one slab
    stream + one x stream + the two outputs — the same bytes a single
    resident-x application pays, for BOTH recurrence applications.

    Requires a ``contain_diag`` block-aligned pack
    (:func:`cheb_pair_stream_safe`); the caller checks at pack time.
    """
    return _pair_stream_call(slabs, lo, x, None, scales, precision)


def banded_chain_stream(slabs_t: jax.Array, lo_t: jax.Array, g2: jax.Array,
                        g1: jax.Array, *,
                        scales_t: jax.Array | None = None,
                        precision=None) -> tuple[jax.Array, jax.Array]:
    """The Chebyshev pair's VJP chain in one slab pass:
    ``(dT1, dx) = (g1 + 2 Aᵀ g2, Aᵀ dT1 − g2)``.

    Same wavefront as :func:`banded_cheb_pair_stream` (pass the TRANSPOSE
    pack): stage 1 computes ``u = g1 + 2 Aᵀ g2`` (streaming g1's diagonal
    blocks alongside the g2 ring), stage 2 applies Aᵀ to the u prefix and
    subtracts the g2 diagonal block. Halves the backward's slab traffic
    vs two single applications and fetches g2 once.
    """
    return _pair_stream_call(slabs_t, lo_t, g2, g1, scales_t, precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def banded_cheb_pair_stream_vjp(slabs, lo, slabs_t, lo_t, x,
                                scales=None, scales_t=None, use_pallas=True):
    """Differentiable streaming Chebyshev pair (int8- and bf16-capable).

    Backward mirrors :func:`banded_cheb_pair_vjp`: ``dT1 = g1 + 2 Aᵀ g2``,
    ``dx = Aᵀ dT1 − g2`` via the transpose pack; quantized packs freeze
    the edge weights (no gradient through quantization).
    """
    return _cheb_pair_stream_primal(slabs, lo, x, scales, use_pallas)


def _cheb_pair_stream_primal(slabs, lo, x, scales, use_pallas):
    nbr, bs, w = slabs.shape
    v_pad = x.shape[0]
    if use_pallas and jax.default_backend() == "tpu":
        return banded_cheb_pair_stream(slabs, lo, x, scales=scales)
    single = use_pallas and jax.default_backend() == "tpu"

    def fit(y):  # contain_diag packs can have v_pad > nbr*bs
        return jnp.pad(y, ((0, v_pad - y.shape[0]), (0, 0))) \
            if y.shape[0] < v_pad else y[:v_pad]

    t1p = fit(banded_spmm(slabs, lo, x, block_size=bs, use_pallas=single,
                          scales=scales))
    t2 = 2.0 * fit(banded_spmm(slabs, lo, t1p, block_size=bs,
                               use_pallas=single, scales=scales)) - x
    return t1p, t2


def _cheb_pair_stream_fwd(slabs, lo, slabs_t, lo_t, x, scales, scales_t,
                          use_pallas):
    t1, t2 = _cheb_pair_stream_primal(slabs, lo, x, scales, use_pallas)
    return (t1, t2), (slabs, lo, slabs_t, lo_t, x, t1, scales, scales_t)


def _cheb_pair_stream_bwd(use_pallas, res, gs):
    slabs, lo, slabs_t, lo_t, x, t1, scales, scales_t = res
    g1, g2 = gs
    v_pad = x.shape[0]

    if use_pallas and jax.default_backend() == "tpu":
        # one transpose-slab pass for the whole chain (the transpose pack
        # shares the forward pack's stream-safe window layout)
        dt1, dx = banded_chain_stream(slabs_t, lo_t, g2, g1,
                                      scales_t=scales_t)
    else:
        def apply_t(g):
            y = banded_spmm(slabs_t, lo_t, g, use_pallas=use_pallas,
                            scales=scales_t)
            if y.shape[0] > v_pad:
                y = y[:v_pad]
            elif y.shape[0] < v_pad:
                y = jnp.pad(y, ((0, v_pad - y.shape[0]), (0, 0)))
            return y

        dt1 = g1 + 2.0 * apply_t(g2)
        dx = apply_t(dt1) - g2
    if scales is not None:
        return (jnp.zeros_like(slabs), None, None, None, dx, None, None)

    nbr, bs, w = slabs.shape
    dslabs = (banded_sddmm_scan(lo, x, dt1, nbr, bs, w)
              + 2.0 * banded_sddmm_scan(lo, t1, g2, nbr, bs, w)
              ).astype(slabs.dtype)
    return dslabs, None, None, None, dx, None, None


banded_cheb_pair_stream_vjp.defvjp(_cheb_pair_stream_fwd,
                                   _cheb_pair_stream_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def banded_cheb_pair_vjp(slabs, lo, slabs_t, lo_t, x, use_pallas=True):
    """Differentiable fused Chebyshev pair.

    Backward: ``dT1 = g1 + 2 Aᵀ g2``; ``dx = Aᵀ dT1 − g2`` — two banded
    SpMMs with the transpose pack. Slab gradients are the banded SDDMMs of
    ``(dT1, x)`` and ``(2 g2, T1)`` in jnp form (DCE'd when the operator is
    a jit constant, i.e. during training).
    """
    return banded_cheb_pair(slabs, lo, x, use_pallas=use_pallas)


def _cheb_pair_fwd(slabs, lo, slabs_t, lo_t, x, use_pallas):
    t1, t2 = banded_cheb_pair(slabs, lo, x, use_pallas=use_pallas)
    return (t1, t2), (slabs, lo, slabs_t, lo_t, x, t1)


def _cheb_pair_bwd(use_pallas, res, gs):
    slabs, lo, slabs_t, lo_t, x, t1 = res
    g1, g2 = gs
    v_pad = x.shape[0]

    def apply_t(g):
        y = banded_spmm(slabs_t, lo_t, g, use_pallas=use_pallas)
        if y.shape[0] > v_pad:
            y = y[:v_pad]
        elif y.shape[0] < v_pad:
            y = jnp.pad(y, ((0, v_pad - y.shape[0]), (0, 0)))
        return y

    dt1 = g1 + 2.0 * apply_t(g2)
    dx = apply_t(dt1) - g2

    # band-sampled SDDMM for dslabs, scan-based (one window at a time).
    # T1 feeds T2, so the slab gradient through the FIRST application uses
    # the full T1 cotangent dt1 = g1 + 2 Aᵀ g2, not g1 alone:
    #   dA = dt1 · xᵀ + 2 g2 · T1ᵀ   (sampled at the band windows)
    nbr, bs, w = slabs.shape
    dslabs = (banded_sddmm_scan(lo, x, dt1, nbr, bs, w)
              + 2.0 * banded_sddmm_scan(lo, t1, g2, nbr, bs, w)
              ).astype(slabs.dtype)
    return dslabs, None, None, None, dx


banded_cheb_pair_vjp.defvjp(_cheb_pair_fwd, _cheb_pair_bwd)


def pack_banded_device(matrix: sp.spmatrix, *, block_size: int = 256,
                       col_align: int = 128, dtype=jnp.bfloat16,
                       v_pad: int | None = None, contain_diag: bool = False,
                       transpose_slabs: bool = False):
    """Device-side slab construction: only the COO triplets travel to the
    chip (~12 B/edge); the ~GB-scale zero-filled slabs are scattered on
    device. At 1M vertices this turns a ~90 s pack upload through the
    tunnel into ~2 s. Returns ``(slabs jnp, lo np, v_pad)``.

    ``contain_diag=True`` (with ``col_align=block_size``) produces a
    streaming-cheb-pair-compatible pack: block-aligned windows that cover
    each block's own diagonal (see :func:`banded_cheb_pair_stream`).

    ``transpose_slabs=True`` scatters each slab transposed —
    ``[nbr, w, bs]`` — the operand layout of the nv kernels
    (:mod:`stgcn_tpu.kernels.banded_nv`), whose dots then need no
    register transposes.
    """
    csr = sp.csr_matrix(matrix)
    v = csr.shape[0]
    bs = block_size
    nbr = -(-v // bs)
    lo_al, _, w, natural = _window_meta(csr, bs, col_align,
                                        contain_diag=contain_diag)
    if v_pad is None:
        v_pad = natural
    elif v_pad < natural:
        raise ValueError(f"v_pad={v_pad} too small (need >= {natural})")
    if not contain_diag:  # diag windows are never clamped (alignment)
        lo_al = np.minimum(lo_al, v_pad - w)
    lo_al = lo_al.astype(np.int64)

    coo = csr.tocoo()
    br = (coo.row // bs).astype(np.int64)
    r = (coo.row - br * bs).astype(np.int32)
    c = (coo.col - lo_al[br]).astype(np.int32)

    vals = coo.data.astype(np.float32)
    scales = None
    if dtype == jnp.int8:
        # per-matrix-row scale, applied to the output rows by the kernel
        row_max = np.zeros(nbr * bs, np.float32)
        np.maximum.at(row_max, coo.row, np.abs(vals))
        row_scale = np.where(row_max > 0, row_max / 127.0, 1.0)
        vals = np.clip(np.round(vals / row_scale[coo.row]), -127, 127)
        scales = jnp.asarray(row_scale.reshape(nbr, bs))

    # chunk the scatter: TPU scatters on narrow types upcast internally, so
    # a whole-array scatter would transiently need ~8x the slab bytes
    chunk_blocks = max(1, int(2e9 / (bs * w * 4)))
    parts = []
    order = np.argsort(br, kind="stable")
    br_s, r_s, c_s, v_s = br[order], r[order], c[order], vals[order]
    bounds = np.searchsorted(br_s, np.arange(0, nbr + chunk_blocks,
                                             chunk_blocks))

    @functools.partial(jax.jit, static_argnums=(4,))
    def scatter(brj, rj, cj, v, nb):
        if transpose_slabs:
            part = jnp.zeros((nb, w, bs), dtype)
            return part.at[brj, cj, rj].set(v.astype(dtype))
        part = jnp.zeros((nb, bs, w), dtype)
        return part.at[brj, rj, cj].set(v.astype(dtype))

    for ci, b0 in enumerate(range(0, nbr, chunk_blocks)):
        nb = min(chunk_blocks, nbr - b0)
        s, e = bounds[ci], bounds[ci + 1]
        parts.append(scatter(jnp.asarray((br_s[s:e] - b0).astype(np.int32)),
                             jnp.asarray(r_s[s:e]), jnp.asarray(c_s[s:e]),
                             jnp.asarray(v_s[s:e]), nb))
    slabs = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    if dtype == jnp.int8:
        return slabs, lo_al.astype(np.int32), v_pad, scales
    return slabs, lo_al.astype(np.int32), v_pad
