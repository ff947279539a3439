"""Data pipeline tests: scaler vs sklearn, windowing vs the reference
`data_transform`, split semantics, synthetic generation."""

import numpy as np
import pytest

from stgcn_tpu.data import datasets as D
from stgcn_tpu.data import synthetic as S


def test_zscore_matches_sklearn():
    sklearn_pre = pytest.importorskip("sklearn.preprocessing")
    rng = np.random.default_rng(0)
    train = rng.random((100, 7)) * 50
    test = rng.random((30, 7)) * 50
    ours = D.ZScoreScaler()
    ref = sklearn_pre.StandardScaler()
    np.testing.assert_allclose(ours.fit_transform(train), ref.fit_transform(train), atol=1e-12)
    np.testing.assert_allclose(ours.transform(test), ref.transform(test), atol=1e-12)
    np.testing.assert_allclose(ours.inverse_transform(ours.transform(test)), test, atol=1e-9)


def test_zscore_constant_column():
    data = np.ones((10, 3))
    data[:, 1] = np.arange(10)
    sc = D.ZScoreScaler().fit(data)
    out = sc.transform(data)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, 0], 0.0)


def test_split_lengths_floor_semantics():
    # `main.py:110-114`: val = test = floor(0.15*T), train = rest
    for t in [100, 101, 12672, 52116]:
        tr, va, te = D.split_lengths(t)
        assert va == te == int(np.floor(t * 0.15))
        assert tr + va + te == t


def test_make_windows_matches_reference_indexing():
    """y[i] = data[i + n_his + n_pred - 1]; num = T - n_his - n_pred
    (`dataloader.py:32-48`)."""
    t, v, n_his, n_pred = 50, 4, 12, 3
    data = np.arange(t * v, dtype=np.float64).reshape(t, v)
    x, y = D.make_windows(data, n_his, n_pred)
    assert x.shape == (t - n_his - n_pred, n_his, v)
    np.testing.assert_array_equal(x[0], data[0:n_his])
    np.testing.assert_array_equal(y[0], data[n_his + n_pred - 1])
    np.testing.assert_array_equal(x[-1], data[t - n_his - n_pred - 1:t - n_pred - 1])
    np.testing.assert_array_equal(y[-1], data[t - n_pred - 2 + n_pred])


def test_gather_windows_matches_make_windows():
    import jax.numpy as jnp

    t, v, n_his, n_pred = 40, 5, 12, 3
    rng = np.random.default_rng(1)
    data = rng.random((t, v)).astype(np.float32)
    x_ref, y_ref = D.make_windows(data, n_his, n_pred)
    starts = D.window_starts(t, n_his, n_pred)
    x, y = D.gather_windows(jnp.asarray(data), jnp.asarray(starts), n_his, n_pred)
    np.testing.assert_allclose(np.asarray(x)[..., 0], x_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-7)


def test_windows_parity_with_reference(reference_modules):
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from script import dataloader as ref_dl  # type: ignore
    finally:
        sys.path.pop(0)
    rng = np.random.default_rng(2)
    data = rng.random((60, 6))
    xt, yt = ref_dl.data_transform(data, 12, 3, "cpu")
    x, y = D.make_windows(data, 12, 3)
    np.testing.assert_allclose(x, xt.numpy()[:, 0], atol=1e-6)
    np.testing.assert_allclose(y, yt.numpy(), atol=1e-6)


def test_batches_padding_and_shapes():
    import jax.numpy as jnp

    ds = D.ForecastDataset(series=jnp.zeros((50, 4)), n_his=12, n_pred=3)
    assert ds.num_windows == 35
    batches = list(ds.batches(16))
    assert len(batches) == 3
    for starts, n_valid in batches:
        assert starts.shape == (16,)
    assert batches[-1][1] == 35 - 32


def test_synthetic_vel_properties(tmp_path):
    import scipy.sparse as sp

    a = S.random_road_graph(64, seed=0)
    vel = S.generate_synthetic_vel(a, 600, seed=1)
    assert vel.shape == (600, 64)
    assert (vel >= 0).all() and (vel <= 80).all()
    assert vel.std() > 1.0  # nontrivial variation
    # deterministic
    vel2 = S.generate_synthetic_vel(a, 600, seed=1)
    np.testing.assert_array_equal(vel, vel2)


def test_ensure_vel_roundtrip(tmp_path):
    import scipy.sparse as sp

    d = tmp_path / "toy"
    d.mkdir()
    a = S.random_road_graph(32, seed=3)
    sp.save_npz(d / "adj.npz", a.tocoo())
    path = S.ensure_vel("toy", str(tmp_path), n_steps=100)
    vel = D.load_vel("toy", str(tmp_path))
    assert vel.shape == (100, 32)
    # idempotent
    assert S.ensure_vel("toy", str(tmp_path)) == path


def test_random_road_graph_structure():
    a = S.random_road_graph(500, k_neighbors=6, seed=4)
    assert a.shape == (500, 500)
    assert (a != a.T).nnz == 0  # symmetric
    assert a.diagonal().min() == 1.0
    deg = np.asarray((a > 0).sum(axis=1)).ravel()
    assert deg.mean() > 3
