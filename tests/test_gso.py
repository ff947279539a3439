"""GSO preprocessing tests: golden values on the shipped road graphs and
exact equivalence with the reference scipy pipeline (`script/utility.py:6-76`)."""

import numpy as np
import pytest
import scipy.sparse as sp

from stgcn_tpu.graph import gso as gso_mod

DATASETS = {
    "metr-la": (207, 22167),
    "pems-bay": (325, 38887),
    "pemsd7-m": (228, 19118),
}

GOLDEN_LAMBDA_MAX = {  # sym_norm_lap, measured from the shipped graphs
    "metr-la": 1.0120,
    "pems-bay": 1.0130,
    "pemsd7-m": 1.0151,
}


def load_adj(name):
    return sp.load_npz(f"data/{name}/adj.npz").tocsc()


@pytest.mark.parametrize("name", DATASETS)
def test_graph_stats(name):
    adj = load_adj(name)
    n, nnz = DATASETS[name]
    assert adj.shape == (n, n)
    assert adj.nnz == nnz


def test_symmetrize_is_elementwise_max():
    rng = np.random.default_rng(0)
    a = sp.random(50, 50, density=0.1, random_state=0, data_rvs=rng.random)
    sym = gso_mod.symmetrize(a).toarray()
    expect = np.maximum(a.toarray(), a.toarray().T)
    np.testing.assert_allclose(sym, expect, rtol=0, atol=1e-15)
    np.testing.assert_allclose(sym, sym.T, atol=1e-15)


@pytest.mark.parametrize("gso_type", gso_mod.GSO_TYPES)
def test_gso_formulas(gso_type):
    """Check each normalization against a dense-numpy re-derivation."""
    rng = np.random.default_rng(1)
    a = sp.random(40, 40, density=0.15, random_state=1, data_rvs=rng.random)
    g = gso_mod.calc_gso(a, gso_type).toarray()

    adj = np.maximum(a.toarray(), a.toarray().T)
    if "renorm" in gso_type:
        adj = adj + np.eye(40)
    deg = adj.sum(axis=1)
    if gso_type.startswith("sym"):
        d = np.where(deg > 0, deg ** -0.5, 0.0)
        norm = d[:, None] * adj * d[None, :]
    else:
        d = np.where(deg > 0, 1.0 / deg, 0.0)
        norm = d[:, None] * adj
    expect = np.eye(40) - norm if gso_type.endswith("lap") else norm
    np.testing.assert_allclose(g, expect, atol=1e-12)


def test_gso_zero_degree_rows():
    a = sp.csr_matrix(np.diag([0.0, 0.0, 1.0, 0.0]) @ np.ones((4, 4)))
    g = gso_mod.calc_gso(a, "sym_norm_adj").toarray()
    assert np.isfinite(g).all()


@pytest.mark.parametrize("name", GOLDEN_LAMBDA_MAX)
def test_lambda_max_golden(name):
    adj = load_adj(name)
    g = gso_mod.calc_gso(adj, "sym_norm_lap")
    lmax = gso_mod.lambda_max(g, method="exact")
    assert lmax == pytest.approx(GOLDEN_LAMBDA_MAX[name], abs=5e-4)


def test_lambda_max_lanczos_matches_exact():
    g = gso_mod.calc_gso(load_adj("pems-bay"), "sym_norm_lap")
    exact = gso_mod.lambda_max(g, method="exact")
    lanczos = gso_mod.lambda_max(g, method="lanczos")
    assert abs(exact - lanczos) < 1e-8 * max(1.0, exact)


def test_lambda_max_power_matches_exact():
    adj = load_adj("pemsd7-m")
    g = gso_mod.calc_gso(adj, "sym_norm_lap")
    exact = gso_mod.lambda_max(g, method="exact")
    power = gso_mod.lambda_max(g, method="power")
    assert power == pytest.approx(exact, rel=1e-6)


def test_lambda_max_power_scales():
    # large random sparse graph — power iteration must not densify
    n, nnz = 20000, 80000
    rng = np.random.default_rng(3)
    rows, cols = rng.integers(0, n, nnz), rng.integers(0, n, nnz)
    a = sp.coo_matrix((rng.random(nnz), (rows, cols)), shape=(n, n)).tocsr()
    g = gso_mod.calc_gso(a, "sym_norm_lap")
    lmax = gso_mod.lambda_max(g, method="power")
    assert 0.5 < lmax <= 2.0 + 1e-9


@pytest.mark.parametrize("name", DATASETS)
def test_cheb_rescale_branch(name):
    adj = load_adj(name)
    g = gso_mod.calc_gso(adj, "sym_norm_lap")
    lmax = gso_mod.lambda_max(g, method="exact")
    res = gso_mod.calc_chebynet_gso(g).toarray()
    assert lmax < 2  # live branch on all shipped graphs
    expect = 2 * g.toarray() / lmax - np.eye(g.shape[0])
    np.testing.assert_allclose(res, expect, atol=1e-12)


def test_cheb_rescale_large_lambda_branch():
    g = sp.identity(8, format="csr") * 3.0
    res = gso_mod.calc_chebynet_gso(g).toarray()
    np.testing.assert_allclose(res, np.eye(8) * 2.0, atol=1e-12)


def test_build_gso_artifact():
    adj = load_adj("pemsd7-m")
    art = gso_mod.build_gso(adj, "sym_norm_lap", cheb=True)
    assert art.n_vertex == 228
    assert art.cheb_rescaled
    assert art.lam_max == pytest.approx(1.0151, abs=5e-4)
    dense = art.to_dense()
    assert dense.dtype == np.float32
    assert dense.shape == (228, 228)


@pytest.mark.parametrize("gso_type", ["sym_norm_lap", "sym_renorm_adj",
                                      "sym_norm_adj", "sym_renorm_lap"])
def test_parity_with_reference(gso_type, reference_modules):
    """Exact parity with `script/utility.py:6-76` on a shipped graph.

    Only the sym types can be oracle-checked: the reference's rw path calls
    ``np.diag(...).dot(sparse)`` (`utility.py:44-46`), which under
    numpy 2.x / scipy 1.17 dispatches into object arrays and then raises
    ``NotImplementedError`` in ``id - rw_norm_adj`` — the reference itself
    cannot run its rw branch in this environment. rw semantics are instead
    validated against the dense-numpy re-derivation in
    :func:`test_gso_formulas`.
    """
    ref_u = reference_modules["utility"]
    adj = load_adj("pemsd7-m")
    ours = gso_mod.calc_gso(adj, gso_type).toarray()
    theirs = sp.csr_matrix(ref_u.calc_gso(adj, gso_type)).toarray()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)

    ours_c = gso_mod.calc_chebynet_gso(gso_mod.calc_gso(adj, gso_type),
                                       lambda_max_method="exact").toarray()
    theirs_c = sp.csr_matrix(ref_u.calc_chebynet_gso(ref_u.calc_gso(adj, gso_type))).toarray()
    np.testing.assert_allclose(ours_c, theirs_c, atol=1e-9)
