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


def bcsr_density(cols: np.ndarray, data: np.ndarray) -> float:
    """Fraction of packed tile slots that are genuinely nonzero."""
    nonzero_tiles = (np.abs(data).sum(axis=(-1, -2)) > 0).sum()
    return float(nonzero_tiles) / cols.size
