"""Vertex-partitioned SpMM with ring halo exchange.

Each of the P shards on the ``graph`` mesh axis owns a contiguous row block
of the (RCM-reordered) GSO and the matching vertex slice of the feature
tensor. Aggregation runs as a P-step ring: at step k a shard multiplies its
``A`` columns belonging to the block currently in hand while the block is
simultaneously forwarded to the left neighbour with ``ppermute`` — XLA
overlaps the collective-permute with the local matmul, which is the
interior-compute/halo-communication overlap called for by the design brief
(SURVEY §2.9). After P steps every shard has consumed every vertex block
exactly once; no full ``all_gather`` of the feature tensor is ever
materialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from stgcn_tpu.graph.gso import GraphShiftOperator
from stgcn_tpu.graph.partition import GraphPartition, make_partition, partition_row_blocks
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

    def body(k, carry):
        y, x_cur = carry
        owner = (p + k) % n_parts
        a_tile = lax.dynamic_slice(a_block, (0, owner * s), (s, s))
        # forward the block first so the permute overlaps the matmul
        x_next = lax.ppermute(x_cur, axis, perm)
        y = y + jnp.dot(a_tile, x_cur, preferred_element_type=jnp.float32,
                        precision=precision)
        return y, x_next

    zeros = jnp.zeros((s, n), jnp.float32)
    if hasattr(lax, "pcast"):
        y0 = lax.pcast(zeros, (axis,), to="varying")
    else:  # older jax
        y0 = lax.pvary(zeros, (axis,))
    y, _ = lax.fori_loop(0, n_parts, body, (y0, x_local))
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
        pad = self.n_vertex_pad - x_vn.shape[0]
        if pad:
            x_vn = jnp.pad(x_vn, ((0, pad), (0, 0)))
        y = ring_spmm(blocks, x_vn, self.mesh, axis=self.axis,
                      precision=self.precision)
        if pad:
            y = y[:x_vn.shape[0] - pad]
        return _unfold_from_vn(y, lead_c)


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
