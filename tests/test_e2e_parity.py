"""End-to-end parity: train this framework and the reference PyTorch
implementation from identical initial weights on the same synthetic
dataset, then compare the resulting test-set MAE / RMSE / WMAPE.

This is the full-pipeline analogue of the per-layer and trajectory parity
tests: GSO prep, windowing, z-score, training dynamics, checkpointing of
best weights, and metric computation all have to agree for the final
numbers to match.
"""

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
from stgcn_tpu.train.loop import TrainConfig, Trainer
from tests.parity_utils import output_params, stblock_params

torch = pytest.importorskip("torch")

N_HIS, N_PRED = 12, 3


@pytest.mark.parametrize("V,T,K,EPOCHS", [
    (20, 400, 4, 2),       # fast CI config
    (325, 250, 8, 1),      # reference scale: PEMS-BAY vertex count
])
def test_end_to_end_metric_parity(reference_modules, tmp_path, V, T, K,
                                  EPOCHS):
    adj = S.random_road_graph(V, k_neighbors=K, seed=31)
    vel = S.generate_synthetic_vel(adj, T, seed=32)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    gso_np = art.to_dense()

    # ----- reference pipeline (mirrors main.py:96-203) -----
    train_np, val_np, test_np = D.chrono_split(vel)
    scaler = D.ZScoreScaler()
    train_n = scaler.fit_transform(train_np)
    val_n = scaler.transform(val_np)
    test_n = scaler.transform(test_np)

    args = argparse.Namespace(Kt=3, Ks=3, act_func="glu",
                              graph_conv_type="cheb_graph_conv",
                              gso=torch.from_numpy(gso_np), enable_bias=True,
                              droprate=0.0, n_his=N_HIS)
    blocks = build_blocks(2, compute_ko(N_HIS, 3, 2))

    def windows_t(data):
        x, y = D.make_windows(data, N_HIS, N_PRED)
        return (torch.from_numpy(x[:, None].astype(np.float32)),
                torch.from_numpy(y.astype(np.float32)))

    xt, yt = windows_t(train_n)
    xs, ys = windows_t(test_n)
    loss_fn = torch.nn.MSELoss()
    truth = scaler.inverse_transform(ys.numpy()).reshape(-1)

    # ----- our pipeline, initialized from the SAME torch weights -----
    cfg = TrainConfig(n_his=N_HIS, n_pred=N_PRED, droprate=0.0, epochs=EPOCHS,
                      seed=5, ckpt_dir=str(tmp_path / "ck"), dataset_name="toy")
    model = STGCN(n_his=N_HIS, droprate=0.0)
    torch.manual_seed(0)
    ref0 = reference_modules["models"].STGCNChebGraphConv(args, blocks, V)
    # transfer ref0's INITIAL weights to our model before either side trains
    params = {}
    for i in range(2):
        params[f"st_block_{i}"] = stblock_params(ref0.st_blocks[i],
                                                 blocks[i][-1], blocks[i + 1])
    params["output"] = output_params(ref0.output, blocks[-3][-1], blocks[-2])

    opt0 = torch.optim.AdamW(ref0.parameters(), lr=1e-3, weight_decay=1e-3)
    ref0.train()
    for _ in range(EPOCHS):
        for i in range(0, len(xt), 32):
            opt0.zero_grad()
            loss_fn(ref0(xt[i:i + 32]).view(len(xt[i:i + 32]), -1),
                    yt[i:i + 32]).backward()
            opt0.step()
    ref0.eval()
    with torch.no_grad():
        pred0 = ref0(xs).view(len(xs), -1).numpy()
    pred0 = scaler.inverse_transform(pred0).reshape(-1)
    d0 = np.abs(truth - pred0)
    ref_metrics = {"MAE": d0.mean(), "RMSE": np.sqrt((d0 ** 2).mean()),
                   "WMAPE": d0.sum() / truth.sum()}

    ds = lambda a: D.ForecastDataset(jnp.asarray(a, jnp.float32), N_HIS, N_PRED)  # noqa: E731
    tr = Trainer(cfg, model, dense_graph_op(gso_np), ds(train_n), ds(val_n),
                 ds(test_n), scaler)
    tr.params = jax.tree.map(jnp.asarray, params)
    tr.opt_state = tr.tx.init(tr.params)
    for _ in range(EPOCHS):
        tr.train_epoch()
    ours = tr.test(use_best=False, log=False)

    for k in ["MAE", "RMSE", "WMAPE"]:
        np.testing.assert_allclose(ours[k], ref_metrics[k], rtol=2e-3,
                                   err_msg=f"{k} diverged")
