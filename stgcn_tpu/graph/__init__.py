"""Graph preprocessing: GSO construction, normalization, Chebyshev rescale,
partitioning and sparse packing for TPU kernels."""

from stgcn_tpu.graph.gso import (  # noqa: F401
    GSO_TYPES,
    GraphShiftOperator,
    build_gso,
    calc_chebynet_gso,
    calc_gso,
    lambda_max,
    symmetrize,
)
