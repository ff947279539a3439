"""Training-subsystem tests: early-stopping semantics vs the reference,
metric math, checkpoint/resume determinism, and fixed-seed *training
trajectory* parity against the reference torch loop."""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgcn_tpu.data import datasets as D
from stgcn_tpu.data import synthetic as S
from stgcn_tpu.graph import build_gso
from stgcn_tpu.nn.model import STGCN, build_blocks, compute_ko
from stgcn_tpu.ops import dense_graph_op
from stgcn_tpu.train import metrics as M
from stgcn_tpu.train.earlystop import EarlyStopping
from stgcn_tpu.train.loop import TrainConfig, Trainer
from tests.parity_utils import output_params, stblock_params

torch = pytest.importorskip("torch")

V, T_STEPS, N_HIS, N_PRED = 24, 140, 12, 3


@pytest.fixture(scope="module")
def toy_problem():
    adj = S.random_road_graph(V, k_neighbors=4, seed=11)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    vel = S.generate_synthetic_vel(adj, T_STEPS, seed=12)
    scaler = D.ZScoreScaler()
    series = scaler.fit_transform(vel).astype(np.float32)
    return art, series, scaler


def make_trainer(toy_problem, tmp_path, *, droprate=0.0, opt="adamw",
                 epochs=50, patience=10, seed=42) -> Trainer:
    art, series, scaler = toy_problem
    cfg = TrainConfig(n_his=N_HIS, n_pred=N_PRED, droprate=droprate, opt=opt,
                      epochs=epochs, patience=patience, seed=seed,
                      ckpt_dir=str(tmp_path / "ckpt"), dataset_name="toy")
    model = STGCN(n_his=N_HIS, droprate=droprate)
    gop = dense_graph_op(art)
    ds = lambda a: D.ForecastDataset(jnp.asarray(a), N_HIS, N_PRED)  # noqa: E731
    # train/val/test all on the same tiny series: fine for mechanics tests
    return Trainer(cfg, model, gop, ds(series), ds(series[:60]), ds(series[:60]), scaler)


# --------------------------------------------------------------- early stop
def test_early_stopping_matches_reference(reference_modules):
    sys.path.insert(0, "/root/reference")
    try:
        from script.earlystopping import EarlyStopping as RefES  # type: ignore
    finally:
        sys.path.pop(0)

    val_seq = [1.0, 0.9, 0.95, 0.9, 0.89, 0.89, 0.91, 0.92, 0.93, 0.94, 0.95]
    saves = []
    ours = EarlyStopping(patience=3, verbose=False,
                         on_improvement=lambda v: saves.append(v))

    class DummyModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.p = torch.nn.Parameter(torch.zeros(1))

    ref_saves = []
    ref = RefES(delta=0.0, patience=3, verbose=False, path="/tmp/_es_test.pt")
    ref.save_checkpoint = lambda vl, m: ref_saves.append(vl)  # intercept

    for vl in val_seq:
        if not ours.early_stop:
            ours(vl)
        if not ref.early_stop:
            ref(vl, DummyModel())

    assert ours.early_stop == ref.early_stop
    assert ours.counter == ref.counter
    assert saves == ref_saves
    assert ours.best_score == pytest.approx(float(ref.best_score))


def test_early_stopping_tie_counts_as_no_improvement():
    es = EarlyStopping(patience=2, verbose=False)
    es(1.0)
    assert es(1.0) is False and es.counter == 1  # tie → counter++
    assert es(1.0) is False and es.early_stop


# ------------------------------------------------------------------ metrics
def test_masked_mse_equals_unpadded():
    rng = np.random.default_rng(0)
    pred = rng.standard_normal((8, 5)).astype(np.float32)
    y = rng.standard_normal((8, 5)).astype(np.float32)
    full = float(M.masked_mse(jnp.asarray(pred), jnp.asarray(y), jnp.asarray(8)))
    np.testing.assert_allclose(full, ((pred - y) ** 2).mean(), rtol=1e-6)
    part = float(M.masked_mse(jnp.asarray(pred), jnp.asarray(y), jnp.asarray(5)))
    np.testing.assert_allclose(part, ((pred[:5] - y[:5]) ** 2).mean(), rtol=1e-6)


def test_evaluate_metrics_formulas():
    """MAE/RMSE/WMAPE/MAPE accumulation equals the whole-split formulas
    (`utility.py:103-121`)."""
    rng = np.random.default_rng(1)
    t, v = 60, 6
    series = rng.random((t, v)).astype(np.float32) + 1.0
    ds = D.ForecastDataset(jnp.asarray(series), N_HIS, N_PRED)
    scaler = D.ZScoreScaler()
    scaler.mean_, scaler.scale_ = np.full(v, 2.0), np.full(v, 3.0)

    def predict_fn(starts):
        _, y = D.gather_windows(ds.series, starts, N_HIS, N_PRED)
        return y * 0.9, y  # fake predictions

    res = M.evaluate_metrics(predict_fn, ds, scaler, batch_size=16)

    starts = D.window_starts(t, N_HIS, N_PRED)
    y = series[starts + N_HIS + N_PRED - 1] * 3.0 + 2.0
    pred = (series[starts + N_HIS + N_PRED - 1] * 0.9) * 3.0 + 2.0
    d = np.abs(y - pred)
    np.testing.assert_allclose(res["MAE"], d.mean(), rtol=1e-5)
    np.testing.assert_allclose(res["RMSE"], np.sqrt((d ** 2).mean()), rtol=1e-5)
    np.testing.assert_allclose(res["WMAPE"], d.sum() / y.sum(), rtol=1e-5)
    np.testing.assert_allclose(res["MAPE"], (d / y).mean(), rtol=1e-5)


# ------------------------------------------------------- trajectory parity
def torch_reference_train(ref_model, x, y, *, epochs, batch_size=32, lr=1e-3,
                          wd=1e-3, step_size=10, gamma=0.95):
    """The reference train loop (`main.py:160-182`), inlined as an oracle."""
    optimizer = torch.optim.AdamW(ref_model.parameters(), lr=lr, weight_decay=wd)
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, step_size=step_size,
                                                gamma=gamma)
    loss_fn = torch.nn.MSELoss()
    epoch_losses = []
    for _ in range(epochs):
        ref_model.train()
        l_sum, n = 0.0, 0
        for i in range(0, len(x), batch_size):
            xb, yb = x[i:i + batch_size], y[i:i + batch_size]
            optimizer.zero_grad()
            pred = ref_model(xb).view(len(xb), -1)
            l = loss_fn(pred, yb)
            l.backward()
            optimizer.step()
            l_sum += l.item() * len(xb)
            n += len(xb)
        scheduler.step()
        epoch_losses.append(l_sum / n)
    return epoch_losses


def test_training_trajectory_parity(reference_modules, toy_problem, tmp_path):
    """Same init, same data, no dropout ⇒ per-epoch train losses match the
    reference within float32 drift across 3 epochs."""
    art, series, scaler = toy_problem
    gso_np = art.to_dense()

    args = argparse.Namespace(Kt=3, Ks=3, act_func="glu",
                              graph_conv_type="cheb_graph_conv",
                              gso=torch.from_numpy(gso_np), enable_bias=True,
                              droprate=0.0, n_his=N_HIS)
    blocks = build_blocks(2, compute_ko(N_HIS, 3, 2))
    ref = reference_modules["models"].STGCNChebGraphConv(args, blocks, V)

    tr = make_trainer(toy_problem, tmp_path, droprate=0.0)
    params = {}
    for i in range(2):
        params[f"st_block_{i}"] = stblock_params(ref.st_blocks[i], blocks[i][-1], blocks[i + 1])
    params["output"] = output_params(ref.output, blocks[-3][-1], blocks[-2])
    tr.params = jax.tree.map(jnp.asarray, params)
    tr.opt_state = tr.tx.init(tr.params)

    x_np, y_np = D.make_windows(series, N_HIS, N_PRED)
    xt = torch.from_numpy(x_np[:, None].astype(np.float32))  # [num,1,n_his,V]
    yt = torch.from_numpy(y_np.astype(np.float32))
    ref_losses = torch_reference_train(ref, xt, yt, epochs=3)

    ours = [tr.train_epoch() for _ in range(3)]
    for e in range(3):
        tr.epoch = e + 1
    np.testing.assert_allclose(ours, ref_losses, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------- resume
def test_checkpoint_resume_exact(toy_problem, tmp_path):
    """fit(2) → resume → fit(2 more) must equal an uninterrupted fit(4)."""
    tr1 = make_trainer(toy_problem, tmp_path / "a", droprate=0.5)
    tr1.fit(epochs=2, log=False)

    tr2 = make_trainer(toy_problem, tmp_path / "a", droprate=0.5)
    assert tr2.resume()
    assert tr2.epoch == 2
    for ours, theirs in zip(jax.tree.leaves(tr1.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))
    tr2.fit(epochs=4, log=False)

    tr3 = make_trainer(toy_problem, tmp_path / "b", droprate=0.5)
    tr3.fit(epochs=4, log=False)
    for ours, theirs in zip(jax.tree.leaves(tr2.params), jax.tree.leaves(tr3.params)):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-6)


def test_fit_early_stops(toy_problem, tmp_path):
    tr = make_trainer(toy_problem, tmp_path, droprate=0.0, epochs=50, patience=2)
    out = tr.fit(log=False)
    assert out["stopped_epoch"] <= 50
    res = tr.test(log=False)
    for k in ["test_mse", "MAE", "RMSE", "WMAPE", "MAPE"]:
        assert np.isfinite(res[k])


def test_bf16_mixed_precision_trains(toy_problem, tmp_path):
    """bf16 compute path: finite losses, close to the f32 trajectory."""
    art, series, scaler = toy_problem
    import jax.numpy as jnp_

    def run(dtype):
        cfg = TrainConfig(n_his=N_HIS, n_pred=N_PRED, droprate=0.0, epochs=2,
                          seed=3, compute_dtype=None,
                          ckpt_dir=str(tmp_path / f"ckpt_{dtype or 'f32'}"),
                          dataset_name="toy")
        model = STGCN(n_his=N_HIS, droprate=0.0,
                      dtype=jnp_.bfloat16 if dtype == "bfloat16" else None)
        gop = dense_graph_op(art)
        ds = lambda a: D.ForecastDataset(jnp.asarray(a), N_HIS, N_PRED)  # noqa: E731
        tr = Trainer(cfg, model, gop, ds(series), ds(series[:60]),
                     ds(series[:60]), scaler)
        return [tr.train_epoch() for _ in range(2)]

    l32 = run(None)
    l16 = run("bfloat16")
    assert all(np.isfinite(l16))
    np.testing.assert_allclose(l16, l32, rtol=0.08)  # bf16-level agreement


def test_frozen_trajectory_regression(toy_problem, tmp_path):
    """Golden regression: fixed-seed 2-epoch losses on the toy problem.

    Frozen in round 1 (CPU, matmul precision 'highest'); any change means
    the numerics changed — intentional changes must update these values.
    """
    tr = make_trainer(toy_problem, tmp_path, droprate=0.5, seed=42)
    losses = [tr.train_epoch() for _ in range(2)]
    val = tr.validate()
    np.testing.assert_allclose(losses, [1.56773288, 0.69186213], rtol=1e-5)
    np.testing.assert_allclose(val, 0.53161915, rtol=1e-5)


def test_on_device_shuffle_covers_all_windows(tmp_path):
    """With lr=0 and no dropout, the batch-weighted epoch loss is the mean
    over all windows — permutation-invariant — so the on-device-shuffled
    epoch must equal the unshuffled one exactly if (and only if) the device
    permutation covers every window exactly once."""
    from stgcn_tpu.cli.main import build_trainer
    from stgcn_tpu.train.loop import TrainConfig

    import numpy as np
    import scipy.sparse as sp

    from stgcn_tpu.data.synthetic import generate_synthetic_vel, random_road_graph

    ds = tmp_path / "toy"
    ds.mkdir()
    adj = random_road_graph(24, k_neighbors=4, seed=0)
    sp.save_npz(str(ds / "adj.npz"), sp.csc_matrix(adj))
    vel = generate_synthetic_vel(adj, 160, seed=1)
    np.savetxt(str(ds / "vel.csv"), vel, delimiter=",", fmt="%.4f")

    def run(shuffle):
        cfg = TrainConfig(batch_size=8, epochs=1, shuffle=shuffle, lr=0.0,
                          droprate=0.0, ckpt_dir=str(tmp_path / f"s{shuffle}"),
                          dataset_name="toy", seed=7)
        tr = build_trainer(cfg, dataset="toy", data_root=str(tmp_path))
        return tr.train_epoch()

    l_plain = run(False)
    l_shuf = run(True)
    assert abs(l_plain - l_shuf) < 1e-5 * max(abs(l_plain), 1.0)
