"""Vertex ordering and partitioning for multi-chip graph parallelism.

The reference has no distributed support at all (SURVEY §2.9); this module
is net-new design. Strategy: 1-D contiguous vertex partition after a
bandwidth-reducing reorder (reverse Cuthill–McKee), which

- concentrates edges near the diagonal ⇒ denser BCSR tiles for the Pallas
  SpMM (fewer, fuller 128×128 blocks), and
- makes each shard's neighbourhood mostly local ⇒ small halos for the
  cross-chip exchange.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp


def rcm_ordering(matrix: sp.spmatrix) -> np.ndarray:
    """Reverse Cuthill–McKee permutation (bandwidth-minimizing)."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(reverse_cuthill_mckee(sp.csr_matrix(matrix), symmetric_mode=True))


def permute_matrix(matrix: sp.spmatrix, perm: np.ndarray) -> sp.csr_matrix:
    m = sp.csr_matrix(matrix)
    return m[perm][:, perm].tocsr()


@dataclasses.dataclass(frozen=True)
class GraphPartition:
    """A 1-D vertex partition of a (possibly reordered) GSO.

    ``perm``      — vertex permutation applied before partitioning
                    (``new_index = position of old index in perm``).
    ``part_size`` — padded per-shard vertex count (uniform across shards).
    ``n_parts``   — number of shards.
    ``blocks``    — dense per-shard row blocks ``[n_parts, part_size, V_pad]``
                    of the permuted GSO (the operand of the ring SpMM).
    """

    perm: np.ndarray
    n_parts: int
    part_size: int
    n_vertex: int

    @property
    def n_vertex_pad(self) -> int:
        return self.n_parts * self.part_size

    def inverse_perm(self) -> np.ndarray:
        inv = np.empty_like(self.perm)
        inv[self.perm] = np.arange(len(self.perm))
        return inv


def make_partition(matrix: sp.spmatrix, n_parts: int, *, reorder: bool = True,
                   align: int = 8) -> tuple[GraphPartition, sp.csr_matrix]:
    """Reorder + pad + partition. Returns (partition, permuted_matrix)."""
    n = matrix.shape[0]
    perm = rcm_ordering(matrix) if reorder else np.arange(n)
    pm = permute_matrix(matrix, perm)
    part_size = -(-n // n_parts)
    part_size = -(-part_size // align) * align  # lane-friendly
    vpad = part_size * n_parts
    if vpad != n:
        pm = sp.csr_matrix(pm)
        pm.resize((vpad, vpad))
    return GraphPartition(perm=perm, n_parts=n_parts, part_size=part_size,
                          n_vertex=n), pm.tocsr()


def partition_row_blocks(pm: sp.csr_matrix, part: GraphPartition) -> np.ndarray:
    """Dense row-block operands ``[P, part_size, V_pad]`` for ring SpMM.

    Each shard owns rows ``[p·s, (p+1)·s)`` of the permuted GSO. For very
    large graphs the per-shard block should itself be BCSR-packed; at the
    sizes where ring SpMM is first needed (≈100k vertices / 8 chips) the
    dense row block is ~``s × V_pad`` and is further split by the ring step
    into ``s × s`` tiles on the fly.
    """
    s, vpad = part.part_size, part.n_vertex_pad
    blocks = np.zeros((part.n_parts, s, vpad), np.float32)
    dense = pm.toarray()
    for p in range(part.n_parts):
        blocks[p] = dense[p * s:(p + 1) * s]
    return blocks


def halo_stats(pm: sp.csr_matrix, part: GraphPartition) -> dict:
    """Edge-cut / halo diagnostics for a partition."""
    s = part.part_size
    coo = pm.tocoo()
    src_part = coo.row // s
    dst_part = coo.col // s
    cut = int((src_part != dst_part).sum())
    return {
        "n_edges": int(coo.nnz),
        "edge_cut": cut,
        "cut_fraction": cut / max(coo.nnz, 1),
    }
