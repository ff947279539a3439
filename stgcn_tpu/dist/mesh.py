"""Device-mesh construction and sharding helpers.

Axes convention:

- ``data``  — batch/window data parallelism; gradients reduce with an
  XLA-inserted ``psum`` over this axis.
- ``graph`` — vertex-partition parallelism; activations shard their vertex
  axis here and graph aggregation runs the ring SpMM (halo exchange over
  ICI within a host, DCN across hosts).
- ``model`` — optional channel tensor-parallelism: wide weight matrices
  shard their output-channel dim here (GSPMD inserts the all-gathers /
  reduce-scatters). At STGCN's widths (<=128) this is a completeness
  feature, not a perf lever (SURVEY §2.9).

Multi-host bootstrap: call ``jax.distributed.initialize()`` before building
the mesh; ``jax.devices()`` then spans all hosts and the same code runs
unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, graph: int = 1, model: int = 1, *,
              devices=None) -> Mesh:
    """Build a ``(data, graph[, model])`` mesh from the available devices.

    The graph axis is laid out innermost (of data/graph) so its ring rides
    neighbouring ICI links; a ``model`` axis, when >1, is innermost overall.
    """
    if devices is None:
        devices = jax.devices()
    n = data * graph * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices for mesh (data={data}, "
                         f"graph={graph}, model={model}), have {len(devices)}")
    if model > 1:
        arr = np.asarray(devices[:n]).reshape(data, graph, model)
        return Mesh(arr, ("data", "graph", "model"))
    arr = np.asarray(devices[:n]).reshape(data, graph)
    return Mesh(arr, ("data", "graph"))


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put(mesh: Mesh, x, *spec):
    """Device-put with a named sharding."""
    return jax.device_put(x, named_sharding(mesh, *spec))


def tp_param_specs(params, mesh: Mesh, *, axis: str = "model"):
    """Output-channel tensor-parallel shardings for an STGCN param tree.

    Shards the last (output-channel) dim of every kernel whose width is
    divisible by the axis size — in practice the temporal-conv kernels
    (g = 128/256 wide) and the output head's fc1 — and replicates
    everything else. GSPMD propagates the activations' channel sharding
    and inserts the collectives; no model-code changes are needed.
    """
    size = mesh.shape[axis]

    def spec_for(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if leaf.ndim >= 2 and name.endswith("kernel")                 and leaf.shape[-1] % size == 0 and leaf.shape[-1] >= size * 8:
            return NamedSharding(
                mesh, P(*([None] * (leaf.ndim - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
