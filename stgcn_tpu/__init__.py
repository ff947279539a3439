"""stgcn_tpu — a TPU-native spatio-temporal graph convolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference STGCN implementation (hazdzz/STGCN): Chebyshev / 1st-order
graph convolutions fused with gated temporal causal convolutions,
trained on road-traffic forecasting datasets.

Design stance (TPU-first, not a port):

- Activations live in ``[batch, time, vertex, channel]`` layout everywhere —
  channels-last feeds the MXU/VPU lane dimension directly; the reference's
  ``[b, c, t, v]`` + permute churn is gone.
- The graph-shift operator (GSO) is a first-class typed artifact
  (:mod:`stgcn_tpu.graph`) with dense, block-sparse (Pallas) and
  mesh-sharded on-device representations (:mod:`stgcn_tpu.ops`).
- Models are pure functions over parameter pytrees (flax.linen); the
  train step is a single ``jit``-compiled pure function.
- Parallelism is expressed with ``jax.sharding.Mesh`` + ``NamedSharding`` /
  ``shard_map`` (:mod:`stgcn_tpu.dist`): data-parallel over the batch axis,
  graph-partition-parallel over the vertex axis with halo exchange.
"""

__version__ = "0.1.0"

from stgcn_tpu.graph import gso as gso  # noqa: F401
