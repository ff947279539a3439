"""On-device graph operators and compute-path ops.

The `GraphOp` family gives every graph-convolution layer a single interface
(`op(x)` applies the GSO along the vertex axis) with interchangeable
implementations: dense MXU matmul for road-scale graphs, Pallas
block-sparse SpMM for large graphs, and mesh-sharded variants with halo
exchange for multi-chip runs.
"""

from stgcn_tpu.ops.graph_op import (  # noqa: F401
    BandedGraphOp,
    BcsrGraphOp,
    DenseGraphOp,
    EllGraphOp,
    GraphOp,
    banded_graph_op,
    bcsr_graph_op,
    dense_graph_op,
    ell_graph_op,
    make_graph_op,
)
