"""Neural-network layers and model architectures (flax.linen, channels-last)."""

from stgcn_tpu.nn.layers import (  # noqa: F401
    Align,
    CausalConv,
    ChebGraphConv,
    GraphConv,
    GraphConvLayer,
    OutputBlock,
    STConvBlock,
    TemporalConvLayer,
)
from stgcn_tpu.nn.model import STGCN, build_blocks, compute_ko  # noqa: F401
