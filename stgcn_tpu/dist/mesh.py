"""Device-mesh construction and sharding helpers.

Axes convention:

- ``data``  — batch/window data parallelism; gradients reduce with an
  XLA-inserted ``psum`` over this axis.
- ``graph`` — vertex-partition parallelism; activations shard their vertex
  axis here and graph aggregation runs the ring SpMM (halo exchange over
  ICI within a host, DCN across hosts).

Multi-host bootstrap: call ``jax.distributed.initialize()`` before building
the mesh; ``jax.devices()`` then spans all hosts and the same code runs
unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, graph: int = 1, *, devices=None) -> Mesh:
    """Build a ``(data, graph)`` mesh from the available devices.

    The graph axis is laid out innermost so its ring rides neighbouring ICI
    links.
    """
    if devices is None:
        devices = jax.devices()
    n = data * graph
    if len(devices) < n:
        raise ValueError(f"need {n} devices for mesh (data={data}, graph={graph}), "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, graph)
    return Mesh(arr, ("data", "graph"))


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put(mesh: Mesh, x, *spec):
    """Device-put with a named sharding."""
    return jax.device_put(x, named_sharding(mesh, *spec))
