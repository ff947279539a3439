"""Blocked-ELL nv-layout kernel + operator tests (the O(nnz) pack that
fits 1M-vertex single-chip training; kernels/ell_nv.py).

CPU: jnp fallback path; the Pallas kernels run on TPU via
STGCN_TEST_TPU=1 (tests/test_kernels_tpu.py has the hardware twins).
Correctness oracle: dense matmul of the unpacked matrix — the same
recurrence as the reference's `model/layers.py:154-165` einsums.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.packing import pack_ell_nv
from stgcn_tpu.kernels.ell_nv import (ell_cheb_pair_nv, ell_nv_reference,
                                      ell_spmm_nv, ell_spmm_nv_vjp)
from stgcn_tpu.ops.graph_op import dense_graph_op, ell_graph_op, make_graph_op


def make_gso(n, seed=0, k=6):
    adj = random_road_graph(n, k_neighbors=k, seed=seed)
    return build_gso(adj, "sym_norm_lap", cheb=True)


@pytest.mark.parametrize("n,bs", [(100, 32), (300, 64), (300, 128)])
def test_pack_ell_nv_roundtrip(n, bs):
    art = make_gso(n)
    data, cols, counts, scales = pack_ell_nv(art.matrix, block_size=bs)
    assert scales is None
    nbr = -(-n // bs)
    vpad = nbr * bs
    dense = np.zeros((vpad, vpad))
    for i in range(nbr):
        for k_ in range(counts[i]):
            c = cols[i, k_]
            # tiles are stored transposed for the nv kernels
            dense[i * bs:(i + 1) * bs, c * bs:(c + 1) * bs] += data[i, k_].T
    np.testing.assert_allclose(dense[:n, :n], art.matrix.toarray(),
                               atol=1e-12)
    # padding slots are all-zero
    for i in range(nbr):
        assert np.all(data[i, counts[i]:] == 0)


def test_pack_ell_nv_int8_dequant_close():
    art = make_gso(200, seed=3)
    data, cols, counts, scales = pack_ell_nv(art.matrix, block_size=64,
                                             quantize=True)
    assert data.dtype == np.int8 and scales.shape == (cols.shape[0], 64)
    nbr, bs = cols.shape[0], 64
    dense = np.zeros((nbr * bs, nbr * bs))
    for i in range(nbr):
        for k_ in range(counts[i]):
            c = cols[i, k_]
            dense[i * bs:(i + 1) * bs, c * bs:(c + 1) * bs] += \
                data[i, k_].T.astype(np.float64) \
                * scales[i][:, None]
    ref = art.matrix.toarray()
    # per-row max-abs int8: worst-case error is scale/2 per entry
    err = np.abs(dense[:200, :200] - ref)
    bound = np.repeat(scales.reshape(-1)[:200, None] / 2, 200, axis=1)
    assert np.all(err <= bound + 1e-12)


@pytest.mark.parametrize("nfeat", [16, 160])
def test_ell_spmm_nv_matches_dense(nfeat):
    art = make_gso(300, seed=1)
    data, cols, counts, _ = pack_ell_nv(art.matrix, block_size=64)
    vpad = cols.shape[0] * 64
    rng = np.random.default_rng(2)
    x = rng.standard_normal((nfeat, vpad)).astype(np.float32)
    x[:, 300:] = 0.0
    y = ell_spmm_nv(jnp.asarray(data), jnp.asarray(cols),
                    jnp.asarray(counts), jnp.asarray(x), use_pallas=False)
    ref = x[:, :300] @ art.matrix.toarray().T
    np.testing.assert_allclose(np.asarray(y)[:, :300], ref, atol=1e-4)


def test_ell_graph_op_matches_dense_op():
    art = make_gso(300, seed=4)
    gop = ell_graph_op(art, block_size=64, use_pallas=False)
    dop = dense_graph_op(art)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 3, 300, 8)), jnp.float32)
    np.testing.assert_allclose(np.asarray(gop(x)), np.asarray(dop(x)),
                               atol=1e-4)
    t1, t2 = gop.cheb_pair(x)
    r1, r2 = dop(x), None
    r2 = dop(r1, scale=2.0) - x
    np.testing.assert_allclose(np.asarray(t1), np.asarray(r1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(r2), atol=1e-4)
    # scaled application (the recurrence's 2·G·T1 uses scale=2.0)
    np.testing.assert_allclose(np.asarray(gop(x, scale=2.0)),
                               np.asarray(dop(x, scale=2.0)), atol=1e-4)


def test_ell_int8_graph_op_close_to_dense():
    art = make_gso(300, seed=6)
    gop = ell_graph_op(art, block_size=64, quantize=True, use_pallas=False)
    # symmetric GSO: transpose pack is the SAME device buffer
    assert gop.data_t is gop.data and gop.scales_t is gop.scales
    dop = dense_graph_op(art)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 300, 8)), jnp.float32)
    y, yd = np.asarray(gop(x)), np.asarray(dop(x))
    # int8 per-row quantization: relative tolerance ~1/127
    assert np.max(np.abs(y - yd)) < 0.05 * max(1.0, np.max(np.abs(yd)))


def test_ell_spmm_nv_vjp_grads_match_dense():
    art = make_gso(200, seed=8)
    data, cols, counts, _ = pack_ell_nv(art.matrix, block_size=64)
    vpad = cols.shape[0] * 64
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((8, vpad)), jnp.float32)
    dense = jnp.asarray(art.matrix.toarray())

    def f_ell(xx):
        return jnp.sum(jnp.sin(ell_spmm_nv_vjp(
            jnp.asarray(data), jnp.asarray(cols), jnp.asarray(counts),
            jnp.asarray(data), jnp.asarray(cols), jnp.asarray(counts),
            xx, None, None, False)))

    def f_dense(xx):
        return jnp.sum(jnp.sin(
            (xx[:, :200] @ dense.T)))

    gx = jax.grad(f_ell)(x)
    gx_ref = jax.grad(lambda xx: f_dense(xx))(x)
    np.testing.assert_allclose(np.asarray(gx)[:, :200],
                               np.asarray(gx_ref)[:, :200], atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx)[:, 200:], 0.0, atol=1e-6)

    # tile-value gradients against autodiff of the jnp oracle
    def f_data(dd):
        return jnp.sum(jnp.cos(ell_spmm_nv_vjp(
            dd, jnp.asarray(cols), jnp.asarray(counts),
            dd, jnp.asarray(cols), jnp.asarray(counts),
            x, None, None, False)))

    def f_data_ref(dd):
        return jnp.sum(jnp.cos(ell_nv_reference(
            dd, jnp.asarray(cols), jnp.asarray(counts), x)))

    gd = jax.grad(f_data)(jnp.asarray(data))
    gd_ref = jax.grad(f_data_ref)(jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref), atol=1e-4)


def test_ell_cheb_pair_grads_match_dense():
    art = make_gso(200, seed=10)
    gop = ell_graph_op(art, block_size=64, use_pallas=False)
    dop = dense_graph_op(art)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 3, 200, 8)), jnp.float32)

    def f(gg, xx):
        t1, t2 = gg.cheb_pair(xx)
        return jnp.sum(jnp.sin(t1) + jnp.cos(t2))

    def f_dense(xx):
        t1 = dop(xx)
        t2 = dop(t1, scale=2.0) - xx
        return jnp.sum(jnp.sin(t1) + jnp.cos(t2))

    gx = jax.grad(lambda xx: f(gop, xx))(x)
    gx_ref = jax.grad(f_dense)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4)


def test_make_graph_op_ell_kinds():
    art = make_gso(300, seed=12)
    gop = make_graph_op(art, "ell", banded_block_size=64, use_pallas=False)
    assert gop.scales is None and gop.v_pad % 64 == 0
    gop8 = make_graph_op(art, "ell_int8", banded_block_size=64,
                         use_pallas=False)
    assert gop8.scales is not None and gop8.data.dtype == jnp.int8


def test_fused_sparse_forward_with_ell_matches_unfused():
    from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
    from stgcn_tpu.nn.model import STGCN

    art = make_gso(300, seed=13)
    gop = ell_graph_op(art, block_size=64, use_pallas=False)
    dop = dense_graph_op(art)
    model = STGCN(n_his=12)
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 12, 300, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, dop,
                        deterministic=True)["params"]
    y_ref = model.apply({"params": params}, x, dop, deterministic=True)
    # use_pallas=False routes to the unfused model with the ELL op: this
    # checks the op's generic surface end-to-end
    y_ell = fused_sparse_forward(params, x, gop, model, deterministic=True,
                                 use_pallas=False)
    np.testing.assert_allclose(np.asarray(y_ell), np.asarray(y_ref),
                               atol=2e-4)
    # interpret mode drives the REAL fused path (head/tail Mosaic kernels
    # in interpret + the nv ELL aggregation) through _graph_terms' has_nv
    # branch
    y_int = fused_sparse_forward(params, x, gop, model, deterministic=True,
                                 interpret=True)
    scale = float(np.max(np.abs(np.asarray(y_ref)))) or 1.0
    assert float(np.max(np.abs(np.asarray(y_int) - np.asarray(y_ref)))) \
        < 2e-4 * max(scale, 1.0)
