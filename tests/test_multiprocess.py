"""Multi-process (multi-host / DCN code path) validation on localhost.

Spawns two python processes that join a ``jax.distributed`` coordination
service, build one global 8-device mesh (2 processes × 4 virtual CPU
devices), run the ring-SpMM halo exchange across the process boundary, and
check the result against the dense oracle. This exercises exactly the code
that runs across hosts on a real pod (mesh construction from global
devices + shard_map collectives); only the transport differs.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.partition import make_partition, partition_row_blocks
from stgcn_tpu.dist.halo import ring_spmm

devs = np.asarray(jax.devices()).reshape(1, 8)   # global view
mesh = Mesh(devs, ("data", "graph"))

art = build_gso(random_road_graph(256, k_neighbors=5, seed=0), "sym_norm_lap", cheb=True)
part, pm = make_partition(art.matrix, 8)
blocks = partition_row_blocks(pm, part)
vpad = part.n_vertex_pad
rng = np.random.default_rng(1)
x_np = rng.standard_normal((vpad, 16)).astype(np.float32)

with mesh:
    blocks_j = jax.make_array_from_callback(
        blocks.shape, NamedSharding(mesh, P("graph", None, None)),
        lambda idx: blocks[idx])
    x_j = jax.make_array_from_callback(
        x_np.shape, NamedSharding(mesh, P("graph", None)),
        lambda idx: x_np[idx])
    y = ring_spmm(blocks_j, x_j, mesh)
    expect = pm.toarray() @ x_np
    # each process checks its addressable shards against the dense oracle
    err = 0.0
    for shard in y.addressable_shards:
        sl = shard.index
        err = max(err, float(np.abs(np.asarray(shard.data) - expect[sl]).max()))

print(f"RING_SPMM_ERR={err:.3e} (process {pid})")
assert err < 2e-4, err
"""


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(os.environ.get("STGCN_TEST_MULTIPROCESS") == "0",
                    reason="disabled via STGCN_TEST_MULTIPROCESS=0")
def test_two_process_ring_spmm(tmp_path):
    # runs by default on a dynamically-allocated coordinator port; the only
    # skip paths are an explicit opt-out or a sandbox that forbids sockets
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover - sandboxed environments
        pytest.skip(f"cannot bind localhost sockets here: {e}")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd="/root/repo")
             for i in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "RING_SPMM_ERR=" in outs[0]
