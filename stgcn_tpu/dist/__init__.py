"""Distributed execution: device meshes, sharding specs, and the
graph-partitioned ring SpMM with halo exchange over ICI/DCN.

The reference is strictly single-device (SURVEY §2.9-2.10); everything here
is net-new TPU-native design: ``jax.sharding.Mesh`` + ``NamedSharding`` for
data parallelism (XLA inserts the grad ``psum``), ``shard_map`` +
``ppermute`` for vertex-partitioned graph aggregation.
"""

from stgcn_tpu.dist.mesh import (  # noqa: F401
    make_mesh,
    named_sharding,
    replicated,
)
from stgcn_tpu.dist.halo import (  # noqa: F401
    BandedShardedGraphOp,
    ShardedGraphOp,
    banded_sharded_graph_op,
    halo_banded_spmm,
    ring_spmm,
    sharded_graph_op,
)
