"""Vertex-partitioned SpMM over the ``graph`` mesh axis.

Two sharded operators, both net-new design (the reference is single-device,
`main.py:70-77`; SURVEY §2.9 mandates these):

1. :class:`BandedShardedGraphOp` — the production path. Each shard owns a
   contiguous row block of the RCM-reordered GSO as *banded slabs* (the
   same representation as the single-chip fast path) plus a boundary
   **halo exchange**: only ``halo`` rows of features cross each
   neighbouring ICI/DCN link per application (``2·halo·N`` bytes/shard,
   the edge cut — independent of shard count). Interior blocks — whose
   column windows lie entirely in the local vertex range — multiply
   against local features only, so XLA's latency-hiding scheduler overlaps
   the two ``ppermute``s with the interior SpMM.

2. :class:`ShardedGraphOp` — dense row-block ring (kept for small graphs
   and as the fallback when the band is wider than a shard). Per-shard
   communication is ``(P−1)·s·N`` regardless of cut; memory is O(V²/P) —
   it cannot reach the 100k/1M-vertex configs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API
    from jax import shard_map as _shard_map_new

    def shard_map(f, *, mesh, in_specs, out_specs):
        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # annotation, which the checker (jax >= 0.8) rejects inside shard_map
        return _shard_map_new(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from stgcn_tpu.graph.gso import GraphShiftOperator
from stgcn_tpu.graph.partition import (BandedShardPack, GraphPartition,
                                       make_partition, pack_banded_shards,
                                       partition_row_blocks,
                                       plan_banded_shards,
                                       scatter_banded_shard)
from stgcn_tpu.ops.graph_op import _fold_to_vn, _unfold_from_vn


def _ring_spmm_local(a_block: jax.Array, x_local: jax.Array, *, axis: str,
                     precision=None) -> jax.Array:
    """Per-shard body (inside shard_map): ``y_p = A[rows p, :] @ x``.

    ``a_block``: ``[s, P*s]`` — this shard's row block over all columns.
    ``x_local``: ``[s, N]``   — this shard's vertex block of features.
    """
    n_parts = lax.axis_size(axis)
    p = lax.axis_index(axis)
    s, n = x_local.shape
    perm = [(i, (i - 1) % n_parts) for i in range(n_parts)]

    def _tile_dot(k, x_cur):
        owner = (p + k) % n_parts
        a_tile = lax.dynamic_slice(a_block, (0, owner * s), (s, s))
        return jnp.dot(a_tile, x_cur, preferred_element_type=jnp.float32,
                       precision=precision)

    def body(k, carry):
        y, x_cur = carry
        # forward the block first so the permute overlaps the matmul
        x_next = lax.ppermute(x_cur, axis, perm)
        return y + _tile_dot(k, x_cur), x_next

    zeros = jnp.zeros((s, n), jnp.float32)
    if hasattr(lax, "pcast"):
        y0 = lax.pcast(zeros, (axis,), to="varying")
    else:  # older jax
        y0 = lax.pvary(zeros, (axis,))
    # the last step's dot runs outside the loop: its permute result would
    # be discarded, so looping to n_parts would ship one wasted [s, N]
    # block around the ring per call
    y, x_last = lax.fori_loop(0, n_parts - 1, body, (y0, x_local))
    y = y + _tile_dot(n_parts - 1, x_last)
    return y.astype(x_local.dtype)


def ring_spmm(blocks: jax.Array, x: jax.Array, mesh: Mesh, *,
              axis: str = "graph", precision=None) -> jax.Array:
    """``y[Vpad, N] = A @ x[Vpad, N]`` with ``A`` given as per-shard row
    blocks ``[P, s, Vpad]`` and both operands sharded over ``axis``."""

    fn = shard_map(
        lambda a, xx: _ring_spmm_local(a[0], xx, axis=axis, precision=precision),
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    return fn(blocks, x)


class ShardedGraphOp(struct.PyTreeNode):
    """Mesh-sharded GSO operator with the :class:`~stgcn_tpu.ops.GraphOp`
    interface — drop-in for dense/BCSR ops inside the model.

    ``blocks`` is ``[P, s, Vpad]``, sharded ``P('graph', None, None)``.
    Vertex indices refer to the *permuted* (RCM) ordering; callers permute
    features once at data-prep time via ``partition.perm``.
    """

    blocks: jax.Array
    mesh: Mesh = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default="graph")
    n_vertex: int = struct.field(pytree_node=False, default=0)
    precision: str | None = struct.field(pytree_node=False, default=None)

    @property
    def n_vertex_pad(self) -> int:
        return self.blocks.shape[0] * self.blocks.shape[1]

    def __call__(self, x: jax.Array, *, scale: float | jax.Array = 1.0) -> jax.Array:
        blocks = self.blocks if isinstance(scale, float) and scale == 1.0 \
            else self.blocks * scale
        x_vn, lead_c = _fold_to_vn(x)
        v = x_vn.shape[0]
        pad = self.n_vertex_pad - v
        if pad:
            x_vn = jnp.pad(x_vn, ((0, pad), (0, 0)))
        y = ring_spmm(blocks, x_vn, self.mesh, axis=self.axis,
                      precision=self.precision)
        return _unfold_from_vn(y[:v], lead_c)


def sharded_graph_op(gso: GraphShiftOperator, mesh: Mesh, *, axis: str = "graph",
                     reorder: bool = True, precision=None
                     ) -> tuple[ShardedGraphOp, GraphPartition]:
    """Partition a GSO across the mesh's graph axis. Returns the operator
    and the partition metadata (vertex permutation, shard sizes)."""
    n_parts = mesh.shape[axis]
    part, pm = make_partition(gso.matrix, n_parts, reorder=reorder)
    blocks = partition_row_blocks(pm, part)
    sharding = NamedSharding(mesh, P(axis, None, None))
    blocks_dev = jax.device_put(jnp.asarray(blocks), sharding)
    return (ShardedGraphOp(blocks=blocks_dev, mesh=mesh, axis=axis,
                           n_vertex=part.n_vertex, precision=precision), part)


# ---------------------------------------------------------------------------
# banded sharded operator: per-shard slab packs + boundary halo exchange
# ---------------------------------------------------------------------------


class _HaloCfg(NamedTuple):
    """Hashable static config for the custom-VJP halo SpMM (a custom_vjp
    nondiff argument)."""

    mesh: Mesh
    axis: str
    halo: int
    halo_t: int
    interior: tuple[int, int]
    interior_t: tuple[int, int]
    block_size: int
    use_pallas: bool


def _exchange_halo(x_p: jax.Array, halo: int, axis: str) -> jax.Array:
    """Per-shard boundary exchange: returns ``[halo + s + halo, N]`` —
    the left neighbour's last ``halo`` rows, the local block, the right
    neighbour's first ``halo`` rows. Edge shards receive zeros (harmless:
    no slab entry references columns outside the padded matrix)."""
    if halo == 0:
        return x_p
    n_parts = lax.axis_size(axis)
    fwd = [(i, i + 1) for i in range(n_parts - 1)]
    bwd = [(i + 1, i) for i in range(n_parts - 1)]
    halo_l = lax.ppermute(x_p[-halo:], axis, fwd)
    halo_r = lax.ppermute(x_p[:halo], axis, bwd)
    return jnp.concatenate([halo_l, x_p, halo_r], axis=0)


def _local_halo_spmm(slabs_p, lo_p, scales_p, x_p, *, axis, halo, interior,
                     block_size, use_pallas):
    """Per-shard body: halo exchange + banded SpMM, interior blocks first
    (they depend only on local features, so the ppermutes run concurrently
    with their matmul under XLA's latency-hiding scheduler)."""
    from stgcn_tpu.kernels.banded_spmm import banded_spmm

    nbr_s = slabs_p.shape[0]
    a, b = interior
    segs = []  # (block range, needs extended buffer)
    if a > 0:
        segs.append((0, a, True))
    if b > a:
        segs.append((a, b, False))
    if nbr_s > b:
        segs.append((b, nbr_s, True))
    if not segs:
        segs = [(0, nbr_s, True)]

    def run(s0, s1, xx, off):
        return banded_spmm(slabs_p[s0:s1], lo_p[s0:s1] - off, xx,
                           block_size=block_size, use_pallas=use_pallas,
                           scales=None if scales_p is None
                           else scales_p[s0:s1])

    ys = {}
    for s0, s1, ext in segs:  # interior first: independent of the exchange
        if not ext:
            ys[s0] = run(s0, s1, x_p, halo)
    x_ext = _exchange_halo(x_p, halo, axis)
    for s0, s1, ext in segs:
        if ext:
            ys[s0] = run(s0, s1, x_ext, 0)
    return jnp.concatenate([ys[s0] for s0, _, _ in segs], axis=0)


def _local_sddmm_body(g_, x_, lo_, *, halo, axis, block_size, w):
    """Per-shard band-sampled SDDMM (slab gradient): ``dslab[i, b, w] =
    Σ_n g[i·bs+b, n] · x_ext[lo_i + w, n]`` — scan-based (one window at a
    time: the whole-window gather was a ~10 GB temporary at 1M vertices /
    training widths, VERDICT r2 item 6). This is the learnable-edge-weight
    gradient path at scale."""
    from stgcn_tpu.kernels.banded_spmm import banded_sddmm_scan

    x_ext = _exchange_halo(x_, halo, axis)
    nbr_s = lo_.shape[0]
    return banded_sddmm_scan(lo_, x_ext, g_, nbr_s, block_size, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def halo_spmm_local(cfg: _HaloCfg, slabs_p, lo_p, slabs_tp, lo_tp, x_p,
                    scales_p=None, scales_tp=None):
    """Per-shard halo SpMM for use INSIDE an existing ``shard_map`` over
    ``cfg.axis`` (the module-level :func:`halo_banded_spmm` opens its own
    shard_map and cannot nest — e.g. the vertex-fused sharded blocks,
    `nn/fused_sparse.py`). Operands carry NO leading shard dim. Forward =
    boundary exchange + banded SpMM; d/dx runs the transpose pack through
    the same exchange; d/dslabs is the band-sampled SDDMM (zeros for
    quantized packs — weights frozen)."""
    return _local_halo_spmm(slabs_p, lo_p, scales_p, x_p, axis=cfg.axis,
                            halo=cfg.halo, interior=cfg.interior,
                            block_size=cfg.block_size,
                            use_pallas=cfg.use_pallas)


def _local_spmm_vjp_fwd(cfg, slabs_p, lo_p, slabs_tp, lo_tp, x_p,
                        scales_p, scales_tp):
    y = _local_halo_spmm(slabs_p, lo_p, scales_p, x_p, axis=cfg.axis,
                         halo=cfg.halo, interior=cfg.interior,
                         block_size=cfg.block_size,
                         use_pallas=cfg.use_pallas)
    return y, (slabs_p, lo_p, slabs_tp, lo_tp, x_p, scales_p, scales_tp)


def _local_spmm_vjp_bwd(cfg, res, g):
    slabs_p, lo_p, slabs_tp, lo_tp, x_p, scales_p, scales_tp = res
    dx = _local_halo_spmm(slabs_tp, lo_tp, scales_tp, g, axis=cfg.axis,
                          halo=cfg.halo_t, interior=cfg.interior_t,
                          block_size=cfg.block_size,
                          use_pallas=cfg.use_pallas)
    if scales_p is not None:  # quantized pack: weights frozen
        return jnp.zeros_like(slabs_p), None, None, None, dx, None, None
    dslabs = _local_sddmm_body(g, x_p, lo_p, halo=cfg.halo, axis=cfg.axis,
                               block_size=cfg.block_size,
                               w=slabs_p.shape[-1]).astype(slabs_p.dtype)
    return dslabs, None, None, None, dx, None, None


halo_spmm_local.defvjp(_local_spmm_vjp_fwd, _local_spmm_vjp_bwd)


def _halo_apply(cfg: _HaloCfg, slabs, lo, scales, x, *, transpose: bool):
    halo = cfg.halo_t if transpose else cfg.halo
    interior = cfg.interior_t if transpose else cfg.interior

    def local(sl, lo_, x_, scl=None):
        return _local_halo_spmm(sl[0], lo_[0],
                                None if scl is None else scl[0], x_,
                                axis=cfg.axis, halo=halo, interior=interior,
                                block_size=cfg.block_size,
                                use_pallas=cfg.use_pallas)

    ax = cfg.axis
    if scales is None:
        fn = shard_map(local, mesh=cfg.mesh,
                       in_specs=(P(ax), P(ax), P(ax)),
                       out_specs=P(ax))
        return fn(slabs, lo, x)
    fn = shard_map(lambda sl, lo_, x_, scl: local(sl, lo_, x_, scl),
                   mesh=cfg.mesh,
                   in_specs=(P(ax), P(ax), P(ax), P(ax)),
                   out_specs=P(ax))
    return fn(slabs, lo, x, scales)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def halo_banded_spmm(cfg: _HaloCfg, slabs, lo, slabs_t, lo_t, x,
                     scales=None, scales_t=None):
    """``y[Vpad, N] = A @ x`` with ``A`` as per-shard banded packs and
    boundary-only halo exchange (comm = 2·halo·N per shard per call).

    d/dx runs the transpose pack through the same exchange; d/dslabs is
    the band-sampled SDDMM per shard (jnp; DCE'd when the operator is a
    jit constant). int8 packs (``scales`` set) freeze the edge weights.
    """
    return _halo_apply(cfg, slabs, lo, scales, x, transpose=False)


def _halo_vjp_fwd(cfg, slabs, lo, slabs_t, lo_t, x, scales, scales_t):
    y = _halo_apply(cfg, slabs, lo, scales, x, transpose=False)
    return y, (slabs, lo, slabs_t, lo_t, x, scales, scales_t)


def _halo_vjp_bwd(cfg, res, g):
    slabs, lo, slabs_t, lo_t, x, scales, scales_t = res
    dx = _halo_apply(cfg, slabs_t, lo_t, scales_t, g, transpose=True)
    if scales is not None:  # quantized pack: weights frozen
        return jnp.zeros_like(slabs), None, None, None, dx, None, None

    def local_sddmm(g_, x_, lo_):
        return _local_sddmm_body(g_, x_, lo_[0], halo=cfg.halo,
                                 axis=cfg.axis, block_size=cfg.block_size,
                                 w=slabs.shape[-1])[None]

    ax = cfg.axis
    fn = shard_map(local_sddmm, mesh=cfg.mesh,
                   in_specs=(P(ax), P(ax), P(ax)), out_specs=P(ax))
    dslabs = fn(g, x, lo).astype(slabs.dtype)
    return dslabs, None, None, None, dx, None, None


halo_banded_spmm.defvjp(_halo_vjp_fwd, _halo_vjp_bwd)


class BandedShardedGraphOp(struct.PyTreeNode):
    """Sparse (banded) mesh-sharded GSO with boundary halo exchange —
    drop-in for the :class:`~stgcn_tpu.ops.GraphOp` interface; the sparse
    multi-chip path for the 100k/1M-vertex configs (BASELINE configs[3-4]).

    ``slabs [P, nbr_s, bs, W]`` / ``lo [P, nbr_s]`` sharded over ``axis``;
    offsets are ext-buffer-relative (see
    :class:`stgcn_tpu.graph.partition.BandedShardPack`). Vertex indices
    refer to the permuted (RCM) ordering."""

    slabs: jax.Array
    lo: jax.Array
    slabs_t: jax.Array
    lo_t: jax.Array
    scales: jax.Array | None
    scales_t: jax.Array | None
    mesh: Mesh = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False)
    halo: int = struct.field(pytree_node=False)
    halo_t: int = struct.field(pytree_node=False)
    interior: tuple = struct.field(pytree_node=False)
    interior_t: tuple = struct.field(pytree_node=False)
    block_size: int = struct.field(pytree_node=False)
    n_vertex: int = struct.field(pytree_node=False)
    use_pallas: bool = struct.field(pytree_node=False, default=True)

    @property
    def n_vertex_pad(self) -> int:
        return self.slabs.shape[0] * self.slabs.shape[1] * self.slabs.shape[2]

    @property
    def _cfg(self) -> _HaloCfg:
        return _HaloCfg(mesh=self.mesh, axis=self.axis, halo=self.halo,
                        halo_t=self.halo_t, interior=self.interior,
                        interior_t=self.interior_t,
                        block_size=self.block_size,
                        use_pallas=self.use_pallas)

    def _scaled(self, scale):
        unit = isinstance(scale, float) and scale == 1.0
        if self.scales is not None:
            scl = self.scales if unit else self.scales * scale
            scl_t = self.scales_t if unit else self.scales_t * scale
            return self.slabs, self.slabs_t, scl, scl_t
        slabs = self.slabs if unit else self.slabs * scale
        slabs_t = self.slabs_t if unit else self.slabs_t * scale
        return slabs, slabs_t, None, None

    def apply_vn(self, x_vn: jax.Array, *,
                 scale: float | jax.Array = 1.0) -> jax.Array:
        """Apply to an already-folded ``[V, N]`` operand (V rows ≤ pad)."""
        slabs, slabs_t, scl, scl_t = self._scaled(scale)
        v = x_vn.shape[0]
        pad = self.n_vertex_pad - v
        if pad:
            x_vn = jnp.pad(x_vn, ((0, pad), (0, 0)))
        y = halo_banded_spmm(self._cfg, slabs, self.lo, slabs_t, self.lo_t,
                             x_vn, scl, scl_t)
        return y[:v]

    def __call__(self, x: jax.Array, *, scale: float | jax.Array = 1.0) -> jax.Array:
        x_vn, lead_c = _fold_to_vn(x)
        return _unfold_from_vn(self.apply_vn(x_vn, scale=scale), lead_c)

    def cheb_pair_vn(self, x_vn: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Folded-operand form of :meth:`cheb_pair` (``[V, N]`` in/out)."""
        t1 = self.apply_vn(x_vn)
        return t1, self.apply_vn(t1, scale=2.0) - x_vn

    def cheb_pair(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """ks=3 Chebyshev recurrence; T2's aggregation needs T1's halo, so
        this is two halo applications (the single-chip wavefront fusion
        cannot cross shard boundaries)."""
        x_vn, lead_c = _fold_to_vn(x)
        t1, t2 = self.cheb_pair_vn(x_vn)
        return _unfold_from_vn(t1, lead_c), _unfold_from_vn(t2, lead_c)


def _put_banded_shardwise(csr, plan, mesh: Mesh, axis: str, *,
                          quantize: bool, dtype):
    """Assemble the global ``[P, nbr_s, bs, w]`` slab array (+ int8 scales)
    on the mesh ONE SHARD AT A TIME: scatter shard p on the host, place it
    on every device owning shard p, free the host copy, move on. Host peak
    is one shard's pack instead of the whole thing (~5-20 GB at 1M
    vertices — the round-2 sweep crashed exactly here)."""
    p_n, nbr_s, bs, w = plan.n_parts, plan.nbr_s, plan.block_size, plan.w
    shape = (p_n, nbr_s, bs, w)
    slab_dt = jnp.int8 if quantize else dtype
    sharding = NamedSharding(mesh, P(axis, None, None, None))
    idx_map = sharding.addressable_devices_indices_map(shape)
    by_p: dict[int, list] = {}
    for dev, idx in idx_map.items():
        by_p.setdefault(idx[0].start or 0, []).append(dev)

    slab_bufs, scl_bufs = [], []
    for p in sorted(by_p):
        block, scl = scatter_banded_shard(csr, plan, p, quantize=quantize)
        block = block[None].astype(slab_dt, copy=False)
        for dev in by_p[p]:
            slab_bufs.append(jax.device_put(block, dev))
            if scl is not None:
                scl_bufs.append(jax.device_put(
                    scl[None].astype(np.float32, copy=False), dev))
        del block, scl  # free the host copy before the next shard

    slabs = jax.make_array_from_single_device_arrays(shape, sharding, slab_bufs)
    scales = None
    if scl_bufs:
        scales = jax.make_array_from_single_device_arrays(
            (p_n, nbr_s, bs), NamedSharding(mesh, P(axis, None, None)),
            scl_bufs)
    return slabs, scales


def banded_sharded_graph_op(gso: GraphShiftOperator, mesh: Mesh, *,
                            axis: str = "graph", block_size: int = 256,
                            quantize: bool = False, dtype=jnp.float32,
                            use_pallas: bool = True, reorder: bool = True
                            ) -> tuple[BandedShardedGraphOp, GraphPartition]:
    """Partition a GSO into per-shard banded packs with boundary halos.
    Returns the operator and the partition metadata. Raises ValueError when
    the post-RCM band is too wide for single-hop exchange at this shard
    count (callers may fall back to :func:`sharded_graph_op`).

    Symmetric GSOs (every ``sym_*`` normalization — equal to their
    transpose up to float64 rounding noise, see
    :func:`stgcn_tpu.graph.gso.effectively_symmetric`) reuse the forward
    pack for the backward's transpose application, halving pack memory
    and build time."""
    import scipy.sparse as sp

    n_parts = mesh.shape[axis]
    part, pm = make_partition(gso.matrix, n_parts, reorder=reorder,
                              align=block_size)
    csr = sp.csr_matrix(pm)
    plan = plan_banded_shards(pm, part, block_size=block_size)
    slabs, scales = _put_banded_shardwise(csr, plan, mesh, axis,
                                          quantize=quantize, dtype=dtype)
    sh = lambda ndim: NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
    put = lambda a: jax.device_put(jnp.asarray(a), sh(a.ndim))
    lo = put(plan.lo)

    from stgcn_tpu.graph.gso import effectively_symmetric

    symmetric = effectively_symmetric(csr)
    if symmetric:
        slabs_t, scales_t, lo_t = slabs, scales, lo
        plan_t = plan
    else:
        csr_t = csr.T.tocsr()
        plan_t = plan_banded_shards(csr_t, part, block_size=block_size)
        slabs_t, scales_t = _put_banded_shardwise(
            csr_t, plan_t, mesh, axis, quantize=quantize, dtype=dtype)
        lo_t = put(plan_t.lo)

    op = BandedShardedGraphOp(
        slabs=slabs, lo=lo, slabs_t=slabs_t, lo_t=lo_t,
        scales=scales, scales_t=scales_t,
        mesh=mesh, axis=axis, halo=plan.halo, halo_t=plan_t.halo,
        interior=plan.interior, interior_t=plan_t.interior,
        block_size=block_size, n_vertex=part.n_vertex,
        use_pallas=use_pallas)
    return op, part
