"""Sparse packing of the GSO for TPU kernels.

TPUs have no efficient gather/scatter into the MXU; the winning sparse
format is *blocked*: cut the ``[V, V]`` operator into ``bs × bs`` dense
tiles and keep only nonzero tiles. Road graphs (near-banded after a good
vertex ordering) pack densely. The format here is blocked-ELL: every block
row is padded to the same number of tiles so the Pallas grid is rectangular
and block indices can be scalar-prefetched.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def pack_bcsr(matrix: sp.spmatrix, *, block_size: int = 128,
              use_native: bool = True
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack a sparse matrix into blocked-ELL tiles.

    Returns:
      data:   ``[n_block_rows, max_blocks_per_row, bs, bs]`` float array;
              padding tiles are all-zero (and point at block-column 0, which
              keeps fallback paths mask-free — zero tiles contribute nothing).
      cols:   ``[n_block_rows, max_blocks_per_row]`` int32 block-column ids.
      counts: ``[n_block_rows]`` int32 — real (non-padding) tiles per row;
              the Pallas kernel loops only this far.
    """
    csr = sp.csr_matrix(matrix)
    v = csr.shape[0]
    bs = block_size
    nbr = -(-v // bs)
    vpad = nbr * bs

    if use_native:
        from stgcn_tpu import native

        packed = native.pack_bcsr_native(csr.indptr, csr.indices,
                                         csr.data, v, csr.shape[1], bs)
        if packed is not None:
            return packed
    if vpad != v:
        csr = sp.csr_matrix((csr.data, csr.indices, csr.indptr), shape=(v, csr.shape[1]))
        csr.resize((vpad, vpad))

    bsr = csr.tobsr(blocksize=(bs, bs))
    indptr, indices, blocks = bsr.indptr, bsr.indices, bsr.data
    counts = np.diff(indptr)
    max_b = max(int(counts.max()), 1) if len(counts) else 1

    data = np.zeros((nbr, max_b, bs, bs), dtype=np.asarray(blocks).dtype if blocks.size else np.float32)
    cols = np.zeros((nbr, max_b), dtype=np.int32)
    for i in range(nbr):
        s, e = indptr[i], indptr[i + 1]
        k = e - s
        if k:
            data[i, :k] = blocks[s:e]
            cols[i, :k] = indices[s:e]
    return data, cols, np.asarray(counts, np.int32)


def pack_ell_nv(matrix: sp.spmatrix, *, block_size: int = 256,
                quantize: bool = False, dtype=np.float32
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                           np.ndarray | None]:
    """Blocked-ELL pack with tiles stored **pre-transposed** for the nv
    ``[N, V]`` kernels (:mod:`stgcn_tpu.kernels.ell_nv`), assembled one
    block row at a time — the peak host temporary is a single
    ``[max_b, bs, bs]`` slab, never the whole-matrix dense tile array
    (``pack_bcsr`` goes through scipy BSR, whose f32 ``.data`` would be
    ~6 GB at 1M vertices).

    Returns ``(data, cols, counts, scales)``:
      data:   ``[nbr, max_b, bs, bs]`` with ``data[i, k] = A_tile(i,k)ᵀ``
              (int8 when ``quantize`` else ``dtype``); padding tiles are
              all-zero and point at block-column 0.
      cols:   ``[nbr, max_b]`` int32 block-column ids.
      counts: ``[nbr]`` int32 live tiles per block row.
      scales: ``[nbr, bs]`` f32 per-A-row dequant factors (``A[r, :] =
              scales[r] · q[r, :]``) when ``quantize``, else None.
    """
    csr = sp.csr_matrix(matrix)
    v = csr.shape[0]
    bs = block_size
    nbr = -(-v // bs)
    vpad = nbr * bs

    indptr, indices, vals = csr.indptr, csr.indices, csr.data
    scales_rows = None
    if quantize:
        absmax = np.zeros(vpad, np.float64)
        # per-row abs max without a dense temporary
        absmax[:v] = np.maximum.reduceat(
            np.abs(np.concatenate([vals, [0.0]])),
            np.minimum(indptr[:-1], len(vals)))
        absmax[:v][np.diff(indptr) == 0] = 0.0
        scales_rows = (absmax / 127.0).astype(np.float32)
        scales_rows[scales_rows == 0.0] = 1.0

    counts = np.zeros(nbr, np.int32)
    per_block = []
    for i in range(nbr):
        lo, hi = indptr[i * bs], indptr[min((i + 1) * bs, v)]
        cb = np.unique(indices[lo:hi] // bs) if hi > lo else \
            np.zeros(0, np.int64)
        per_block.append(cb)
        counts[i] = len(cb)
    max_b = max(int(counts.max()), 1)

    out_dt = np.int8 if quantize else dtype
    data = np.zeros((nbr, max_b, bs, bs), out_dt)
    cols = np.zeros((nbr, max_b), np.int32)
    # global row of each nnz
    row_of = np.repeat(np.arange(v, dtype=np.int32), np.diff(indptr))
    for i in range(nbr):
        lo, hi = indptr[i * bs], indptr[min((i + 1) * bs, v)]
        if hi == lo:
            continue
        cb = per_block[i]
        cols[i, :len(cb)] = cb
        r_loc = row_of[lo:hi] - i * bs
        c = indices[lo:hi]
        vv = vals[lo:hi].astype(np.float64)
        if quantize:
            vv = np.rint(vv / scales_rows[row_of[lo:hi]])
        slot = np.searchsorted(cb, c // bs)
        # transposed tiles: [col-local, row-local]
        data[i, slot, c % bs, r_loc] = vv.astype(out_dt)
    scales = None
    if quantize:
        scales = scales_rows.reshape(nbr, bs)
    return data, cols, counts, scales


def bcsr_density(cols: np.ndarray, data: np.ndarray) -> float:
    """Fraction of packed tile slots that are genuinely nonzero."""
    nonzero_tiles = (np.abs(data).sum(axis=(-1, -2)) > 0).sum()
    return float(nonzero_tiles) / cols.size
