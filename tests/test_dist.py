"""Distributed-path tests on the virtual 8-device CPU mesh: ring SpMM vs
dense, partition/reordering integrity, and sharded-vs-single-device
training equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from stgcn_tpu.data import datasets as D
from stgcn_tpu.data.synthetic import generate_synthetic_vel, random_road_graph
from stgcn_tpu.dist import make_mesh, ring_spmm, sharded_graph_op
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.partition import halo_stats, make_partition, partition_row_blocks
from stgcn_tpu.ops import dense_graph_op

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def art():
    return build_gso(random_road_graph(300, k_neighbors=5, seed=0),
                     "sym_norm_lap", cheb=True)


def test_make_mesh_shapes():
    mesh = make_mesh(data=2, graph=4)
    assert mesh.shape == {"data": 2, "graph": 4}
    with pytest.raises(ValueError):
        make_mesh(data=4, graph=4)


def test_partition_reassembles(art):
    part, pm = make_partition(art.matrix, 4)
    blocks = partition_row_blocks(pm, part)
    assert blocks.shape == (4, part.part_size, part.n_vertex_pad)
    np.testing.assert_allclose(np.vstack(list(blocks)),
                               pm.toarray(), atol=0)
    # permutation is a bijection over the real vertices
    assert sorted(part.perm.tolist()) == list(range(300))


def test_rcm_reduces_edge_cut(art):
    part_r, pm_r = make_partition(art.matrix, 8, reorder=True)
    part_n, pm_n = make_partition(art.matrix, 8, reorder=False)
    cut_r = halo_stats(pm_r, part_r)["cut_fraction"]
    cut_n = halo_stats(pm_n, part_n)["cut_fraction"]
    assert cut_r <= cut_n  # RCM should not make locality worse


@pytest.mark.parametrize("graph_ax", [2, 4, 8])
def test_ring_spmm_matches_dense(art, graph_ax):
    mesh = make_mesh(data=1, graph=graph_ax)
    sop, part = sharded_graph_op(art, mesh)
    rng = np.random.default_rng(1)
    n = 300
    x = rng.standard_normal((2, 3, n, 8)).astype(np.float32)
    xp = jnp.asarray(x[:, :, part.perm, :])
    y = np.asarray(sop(xp))[:, :, :n, :]
    y_dense = np.asarray(dense_graph_op(art)(jnp.asarray(x)))[:, :, part.perm, :]
    np.testing.assert_allclose(y, y_dense, atol=2e-5)


def test_ring_spmm_raw(art):
    mesh = make_mesh(data=1, graph=4)
    part, pm = make_partition(art.matrix, 4)
    blocks = jnp.asarray(partition_row_blocks(pm, part))
    vpad = part.n_vertex_pad
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((vpad, 16)).astype(np.float32))
    y = np.asarray(ring_spmm(blocks, x, mesh))
    expect = pm.toarray() @ np.asarray(x)
    np.testing.assert_allclose(y, expect, atol=2e-4)


def test_sharded_training_matches_single_device(tmp_path):
    """One epoch on a (2 data × 4 graph) mesh must match single-device
    training up to collective reduction-order drift."""
    from stgcn_tpu.cli.main import build_trainer
    from stgcn_tpu.train.loop import TrainConfig

    v, t = 48, 220
    ds_dir = tmp_path / "toy"
    ds_dir.mkdir()
    adj = random_road_graph(v, k_neighbors=4, seed=3)
    sp.save_npz(ds_dir / "adj.npz", adj.tocoo())
    vel = generate_synthetic_vel(adj, t, seed=4)
    header = ",".join(str(i) for i in range(v))
    np.savetxt(ds_dir / "vel.csv", vel, delimiter=",", header=header,
               comments="", fmt="%.6f")

    def run(mesh, tag):
        cfg = TrainConfig(n_his=12, n_pred=3, batch_size=8, epochs=1,
                          droprate=0.0, seed=7,
                          ckpt_dir=str(tmp_path / f"ckpt_{tag}"),
                          dataset_name="toy")
        tr = build_trainer(cfg, dataset="toy", data_root=str(tmp_path), mesh=mesh)
        loss = tr.train_epoch()
        val = tr.validate()
        return loss, val

    loss_s, val_s = run(None, "single")
    mesh = make_mesh(data=2, graph=4)
    loss_m, val_m = run(mesh, "mesh")
    np.testing.assert_allclose(loss_m, loss_s, rtol=1e-4)
    np.testing.assert_allclose(val_m, val_s, rtol=1e-4)


def test_banded_trainer_end_to_end(tmp_path):
    """build_trainer with graph_op='banded' (RCM reorder + fallback kernel)
    trains and evaluates finitely, matching the dense-op run closely."""
    from stgcn_tpu.cli.main import build_trainer
    from stgcn_tpu.train.loop import TrainConfig

    v, t = 40, 220
    ds_dir = tmp_path / "toy"
    ds_dir.mkdir()
    adj = random_road_graph(v, k_neighbors=4, seed=5)
    sp.save_npz(ds_dir / "adj.npz", adj.tocoo())
    vel = generate_synthetic_vel(adj, t, seed=6)
    header = ",".join(str(i) for i in range(v))
    np.savetxt(ds_dir / "vel.csv", vel, delimiter=",", header=header,
               comments="", fmt="%.6f")

    def run(kind, tag):
        cfg = TrainConfig(n_his=12, n_pred=3, batch_size=8, epochs=1,
                          droprate=0.0, seed=9,
                          ckpt_dir=str(tmp_path / f"ck_{tag}"), dataset_name="toy")
        tr = build_trainer(cfg, dataset="toy", data_root=str(tmp_path),
                           graph_op_kind=kind)
        return tr.train_epoch(), tr.validate()

    l_dense, v_dense = run("dense", "dense")
    l_band, v_band = run("banded", "banded")
    l_bcsr, v_bcsr = run("bcsr", "bcsr")
    assert np.isfinite([l_dense, l_band, l_bcsr]).all()
    # banded path permutes vertices; batch losses are permutation-invariant
    np.testing.assert_allclose(l_band, l_dense, rtol=1e-4)
    np.testing.assert_allclose(v_band, v_dense, rtol=1e-4)
    np.testing.assert_allclose(l_bcsr, l_dense, rtol=1e-4)


def test_scaling_harness_runs_on_virtual_mesh():
    """The edges/s scaling harness runs end-to-end on the 8-device CPU
    mesh and produces finite efficiencies (validates the measurement path;
    absolute CPU numbers are not meaningful)."""
    from stgcn_tpu.bench.scaling import measure_ring_spmm

    out = measure_ring_spmm(n_vertex=2048, n_feat=32, parts=(1, 2, 4),
                            reps=2)
    assert set(out["parts"]) == {"1", "2", "4"}
    for rec in out["parts"].values():
        assert rec["edges_per_s"] > 0 and rec["efficiency"] > 0


def test_channel_tensor_parallel_matches_replicated(tmp_path):
    """A (1 data × 1 graph × 2 model) mesh sharding output channels of the
    wide kernels trains to the same loss as the replicated run (GSPMD
    inserts the collectives; numerics match at f32 tolerance)."""
    import numpy as np
    import scipy.sparse as sp

    from stgcn_tpu.cli.main import build_trainer
    from stgcn_tpu.data.synthetic import generate_synthetic_vel, random_road_graph
    from stgcn_tpu.dist import make_mesh
    from stgcn_tpu.train.loop import TrainConfig

    ds = tmp_path / "toy"
    ds.mkdir()
    adj = random_road_graph(24, k_neighbors=4, seed=0)
    sp.save_npz(str(ds / "adj.npz"), sp.csc_matrix(adj))
    vel = generate_synthetic_vel(adj, 160, seed=1)
    np.savetxt(str(ds / "vel.csv"), vel, delimiter=",", fmt="%.4f")

    def run(mesh):
        cfg = TrainConfig(batch_size=8, epochs=1, droprate=0.0,
                          ckpt_dir=str(tmp_path / f"m{mesh is None}"),
                          dataset_name="toy", seed=3)
        tr = build_trainer(cfg, dataset="toy", data_root=str(tmp_path),
                           mesh=mesh)
        return tr.train_epoch()

    l_rep = run(None)
    l_tp = run(make_mesh(data=1, graph=1, model=2))
    assert abs(l_rep - l_tp) < 1e-4 * max(abs(l_rep), 1.0)
