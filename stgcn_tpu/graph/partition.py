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


@dataclasses.dataclass(frozen=True)
class BandedShardPack:
    """Per-shard banded slabs for the halo-exchange sharded SpMM.

    Shard ``p`` owns rows ``[p·s, (p+1)·s)`` of the permuted GSO, packed as
    ``nbr_s = s/bs`` dense ``[bs, W]`` slabs over per-block column windows
    (exactly the single-chip banded representation, re-partitioned). All
    window offsets are *relative to the shard's extended feature buffer*
    ``[halo + s + halo, N]`` — the shard's own vertex block plus a
    ``halo``-row boundary strip from each neighbour. This makes per-shard
    communication ``2·halo·N`` per application (the edge-cut boundary),
    independent of the number of shards — unlike the ring, whose volume is
    ``(P−1)·s·N`` regardless of cut (the reference has no distributed
    support at all; SURVEY §2.9 mandates this design).

    ``interior = (a, b)``: block rows ``[a, b)`` have windows entirely
    inside the local vertex range *in every shard* — they multiply against
    the local features only and can overlap with the halo exchange.
    """

    slabs: np.ndarray            # [P, nbr_s, bs, W]
    lo: np.ndarray               # [P, nbr_s] int32, 128-aligned, ext-relative
    halo: int                    # rows exchanged with each neighbour (128-aligned)
    interior: tuple[int, int]    # [a, b) interior block-row range
    block_size: int
    scales: np.ndarray | None = None   # [P, nbr_s, bs] per-row dequant (int8)


@dataclasses.dataclass(frozen=True)
class BandedShardPlan:
    """Window/halo geometry of a banded shard pack — everything except the
    scattered slab values. Cheap to compute at any scale (row extents
    only); :func:`scatter_banded_shard` fills one shard's slabs at a time
    so the host never holds the whole ``[P, nbr_s, bs, W]`` array (the
    1M-vertex pack is ~5-20 GB; building it shard-wise caps host peak at
    ``1/P`` of that)."""

    lo_f: np.ndarray             # [nbr] absolute window starts (clamped)
    lo: np.ndarray               # [P, nbr_s] ext-relative, 128-aligned
    halo: int
    interior: tuple[int, int]
    block_size: int
    w: int
    n_parts: int
    nbr_s: int


def plan_banded_shards(pm: sp.csr_matrix, part: GraphPartition, *,
                       block_size: int = 256,
                       max_halo: int | None = None) -> BandedShardPlan:
    """Window/halo plan for per-shard banded slabs (see
    :class:`BandedShardPack`).

    Requires ``part.part_size % block_size == 0`` (use
    ``make_partition(..., align=block_size)``). Raises if the band is so
    wide that the halo would exceed the shard size (single-hop neighbour
    exchange impossible — fall back to the ring)."""
    from stgcn_tpu.kernels.banded_spmm import _round_up, _window_meta

    s, p_n = part.part_size, part.n_parts
    bs = block_size
    if s % bs:
        raise ValueError(f"part_size {s} not a multiple of block_size {bs}")
    nbr_s = s // bs
    nbr = p_n * nbr_s
    csr = sp.csr_matrix(pm)
    assert csr.shape[0] == part.n_vertex_pad, (csr.shape, part.n_vertex_pad)

    lo_al, hi, w, _ = _window_meta(csr, bs, 128)
    blk_part = np.arange(nbr) // nbr_s
    own_lo = blk_part * s
    own_hi = (blk_part + 1) * s
    overhang = np.maximum(np.maximum(own_lo - lo_al, hi - own_hi), 0)
    halo = int(_round_up(int(overhang.max()), 128)) if overhang.max() > 0 else 0
    # the uniform window width must fit in the extended buffer s + 2*halo
    if w > s + 2 * halo:
        halo = int(_round_up(-(-(w - s) // 2), 128))
    limit = max_halo if max_halo is not None else s
    if halo > limit:
        raise ValueError(
            f"halo {halo} exceeds limit {limit} (band too wide for "
            f"single-hop exchange at {p_n} shards of {s} rows)")

    # final window starts: prefer the natural aligned start, clamped into
    # the extended range [own_lo - halo, own_hi + halo - w] (coverage of
    # the true entry extent is guaranteed by the halo definition)
    lo_f = np.clip(lo_al, own_lo - halo, own_hi + halo - w)

    # ext-relative offsets: lo_rel = lo_f - (own_lo - halo); 128-aligned
    # because lo_f, own_lo (s mult of bs>=128) and halo all are
    lo_rel = (lo_f - (own_lo - halo)).astype(np.int32)
    assert (lo_rel % 128 == 0).all()
    assert (lo_rel >= 0).all() and (lo_rel + w <= s + 2 * halo).all()

    # interior block rows (windows local in EVERY shard): longest
    # contiguous run of all-shard-interior block indices
    lo2 = lo_rel.reshape(p_n, nbr_s)
    is_int = ((lo2 >= halo) & (lo2 + w <= halo + s)).all(axis=0)
    a = b = 0
    run_a = run_len = 0
    i = 0
    while i < nbr_s:
        if is_int[i]:
            j = i
            while j < nbr_s and is_int[j]:
                j += 1
            if j - i > run_len:
                run_a, run_len = i, j - i
            i = j
        else:
            i += 1
    a, b = run_a, run_a + run_len

    return BandedShardPlan(lo_f=lo_f, lo=lo2, halo=halo, interior=(a, b),
                           block_size=bs, w=w, n_parts=p_n, nbr_s=nbr_s)


def scatter_banded_shard(csr: sp.csr_matrix, plan: BandedShardPlan, p: int,
                         *, quantize: bool = False
                         ) -> tuple[np.ndarray, np.ndarray | None]:
    """Fill shard ``p``'s slabs ``[nbr_s, bs, w]`` (+ int8 scales) from the
    permuted+padded CSR — only rows ``[p·s, (p+1)·s)`` are touched."""
    bs, w, nbr_s = plan.block_size, plan.w, plan.nbr_s
    s = nbr_s * bs
    sub = csr[p * s:(p + 1) * s].tocoo()
    vals = sub.data.astype(np.float32)
    scales = None
    if quantize:
        row_max = np.zeros(s, np.float32)
        np.maximum.at(row_max, sub.row, np.abs(vals))
        row_scale = np.where(row_max > 0, row_max / 127.0, 1.0)
        vals = np.clip(np.round(vals / row_scale[sub.row]), -127, 127)
        scales = row_scale.reshape(nbr_s, bs)
    slabs = np.zeros((nbr_s, bs, w), np.int8 if quantize else np.float32)
    br = sub.row // bs
    cols_rel = sub.col - plan.lo_f[p * nbr_s + br]
    assert (cols_rel >= 0).all() and (cols_rel < w).all()
    slabs[br, sub.row - br * bs, cols_rel] = vals
    return slabs, scales


def pack_banded_shards(pm: sp.csr_matrix, part: GraphPartition, *,
                       block_size: int = 256, quantize: bool = False,
                       max_halo: int | None = None) -> BandedShardPack:
    """Pack the permuted+padded GSO into per-shard banded slabs with a
    boundary halo (see :class:`BandedShardPack`): plan + scatter of every
    shard at once. Large graphs should iterate :func:`scatter_banded_shard`
    per shard instead (host peak = one shard)."""
    plan = plan_banded_shards(pm, part, block_size=block_size,
                              max_halo=max_halo)
    csr = sp.csr_matrix(pm)
    parts = [scatter_banded_shard(csr, plan, p, quantize=quantize)
             for p in range(plan.n_parts)]
    slabs = np.stack([s for s, _ in parts])
    scales = np.stack([sc for _, sc in parts]) if quantize else None
    return BandedShardPack(slabs=slabs, lo=plan.lo, halo=plan.halo,
                           interior=plan.interior, block_size=plan.block_size,
                           scales=scales)


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
