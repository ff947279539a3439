"""Sparse-kernel tests (CPU: jnp fallback path; the Pallas path is
exercised on TPU via STGCN_TEST_TPU=1 and in bench/kernel_bench.py).

Correctness oracle: dense matmul of the unpacked matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.packing import bcsr_density, pack_bcsr
from stgcn_tpu.kernels.sddmm import bcsr_sddmm_reference
from stgcn_tpu.kernels.spmm import bcsr_spmm, bcsr_spmm_vjp
from stgcn_tpu.ops.graph_op import BcsrGraphOp, bcsr_graph_op, dense_graph_op


def make_gso(n, seed=0, k=6):
    adj = random_road_graph(n, k_neighbors=k, seed=seed)
    return build_gso(adj, "sym_norm_lap", cheb=True)


@pytest.mark.parametrize("n,bs", [(100, 32), (128, 32), (300, 64), (300, 128)])
def test_pack_bcsr_roundtrip(n, bs):
    art = make_gso(n)
    data, cols, counts = pack_bcsr(art.matrix, block_size=bs)
    nbr = -(-n // bs)
    assert data.shape[0] == nbr and data.shape[2:] == (bs, bs)
    assert cols.shape == data.shape[:2]
    # reassemble dense
    vpad = nbr * bs
    dense = np.zeros((vpad, vpad))
    for i in range(nbr):
        for k_ in range(cols.shape[1]):
            dense[i * bs:(i + 1) * bs, cols[i, k_] * bs:(cols[i, k_] + 1) * bs] += data[i, k_]
    np.testing.assert_allclose(dense[:n, :n], art.matrix.toarray(), atol=1e-12)
    assert 0 < bcsr_density(cols, data) <= 1


@pytest.mark.parametrize("n,bs,nfeat", [(100, 32, 16), (257, 64, 48)])
def test_bcsr_spmm_matches_dense(n, bs, nfeat):
    art = make_gso(n, seed=1)
    data, cols, counts = pack_bcsr(art.matrix, block_size=bs)
    vpad = data.shape[0] * bs
    rng = np.random.default_rng(2)
    x = rng.standard_normal((vpad, nfeat)).astype(np.float32)
    x[n:] = 0.0
    y = bcsr_spmm(jnp.asarray(data, jnp.float32), jnp.asarray(cols),
                  jnp.asarray(x), block_size=bs, use_pallas=False)
    expect = art.matrix.toarray().astype(np.float32) @ x[:n]
    np.testing.assert_allclose(np.asarray(y)[:n], expect, atol=1e-4)


def test_bcsr_graph_op_matches_dense_op():
    art = make_gso(200, seed=3)
    dense_op = dense_graph_op(art)
    bcsr_op = bcsr_graph_op(art, block_size=64, use_pallas=False)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 5, 200, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(bcsr_op(x)), np.asarray(dense_op(x)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(bcsr_op(x, scale=2.0)),
                               np.asarray(dense_op(x, scale=2.0)), atol=1e-4)


def test_bcsr_sddmm_matches_dense():
    n, bs, nfeat = 120, 32, 24
    art = make_gso(n, seed=5)
    data, cols, counts = pack_bcsr(art.matrix, block_size=bs)
    vpad = data.shape[0] * bs
    rng = np.random.default_rng(6)
    g = rng.standard_normal((vpad, nfeat)).astype(np.float32)
    x = rng.standard_normal((vpad, nfeat)).astype(np.float32)
    out = bcsr_sddmm_reference(jnp.asarray(cols), jnp.asarray(g), jnp.asarray(x),
                               block_size=bs)
    full = g @ x.T  # [vpad, vpad]
    for i in range(cols.shape[0]):
        for k in range(cols.shape[1]):
            tile = full[i * bs:(i + 1) * bs, cols[i, k] * bs:(cols[i, k] + 1) * bs]
            np.testing.assert_allclose(np.asarray(out)[i, k], tile, atol=1e-4)


def test_bcsr_spmm_vjp_grads_match_dense():
    """d/dx and d/ddata of the sparse path vs autodiff through dense matmul."""
    n, bs, nfeat = 96, 32, 8
    art = make_gso(n, seed=7)
    a_dense = jnp.asarray(art.matrix.toarray(), jnp.float32)
    data, cols, counts = pack_bcsr(art.matrix, block_size=bs)
    data_t, cols_t, counts_t = pack_bcsr(art.matrix.T.tocsr(), block_size=bs)
    data, cols = jnp.asarray(data, jnp.float32), jnp.asarray(cols)
    data_t, cols_t = jnp.asarray(data_t, jnp.float32), jnp.asarray(cols_t)
    counts_j, counts_t_j = jnp.asarray(counts), jnp.asarray(counts_t)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((n, nfeat)).astype(np.float32))

    def f_sparse(d, xx):
        y = bcsr_spmm_vjp(d, cols, counts_j, data_t, cols_t, counts_t_j, xx, bs, False)
        return (y[:n] ** 2).sum()

    def f_dense(a, xx):
        return ((a @ xx) ** 2).sum()

    gd, gx = jax.grad(f_sparse, argnums=(0, 1))(data, x)
    ga, gx_dense = jax.grad(f_dense, argnums=(0, 1))(a_dense, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_dense), atol=1e-3)
    # data-grad: compare per-tile against the dense A-grad at packed positions
    ga_np = np.asarray(ga)
    gd_np = np.asarray(gd)
    cols_np = np.asarray(cols)
    nbr = cols_np.shape[0]
    padded = np.zeros((nbr * bs, nbr * bs), np.float32)
    padded[:n, :n] = ga_np
    counts_np = np.asarray(counts)
    for i in range(nbr):
        for k in range(cols_np.shape[1]):
            if k >= counts_np[i]:  # padding slot: grad masked to zero
                np.testing.assert_array_equal(gd_np[i, k], 0.0)
                continue
            c = cols_np[i, k]
            tile = padded[i * bs:(i + 1) * bs, c * bs:(c + 1) * bs]
            np.testing.assert_allclose(gd_np[i, k], tile, atol=1e-3)


def test_large_graph_pack_and_spmm():
    """100k-node synthetic road graph packs and multiplies (fallback path)."""
    n = 20000  # CI-sized stand-in for the 100k config
    art = make_gso(n, seed=9, k=4)
    data, cols, counts = pack_bcsr(art.matrix, block_size=128)
    assert data.shape[0] == -(-n // 128)
    x = jnp.ones((data.shape[0] * 128, 8), jnp.float32)
    y = bcsr_spmm(jnp.asarray(data, jnp.float32), jnp.asarray(cols), x,
                  block_size=128, use_pallas=False)
    row_sums = np.asarray(art.matrix.sum(axis=1)).ravel()
    np.testing.assert_allclose(np.asarray(y)[:n, 0], row_sums, atol=1e-3)


def test_banded_pack_and_spmm_matches_dense():
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.kernels.banded_spmm import banded_spmm, banded_viable, pack_banded

    art = make_gso(600, seed=11)
    m = permute_matrix(art.matrix, rcm_ordering(art.matrix))
    assert banded_viable(m)
    slabs, lo, v_pad = pack_banded(m)
    assert (np.asarray(lo) % 128 == 0).all()
    rng = np.random.default_rng(12)
    x = np.zeros((v_pad, 24), np.float32)
    x[:600] = rng.standard_normal((600, 24))
    y = banded_spmm(jnp.asarray(slabs), jnp.asarray(lo), jnp.asarray(x),
                    use_pallas=False)
    expect = m.toarray() @ x[:600]
    np.testing.assert_allclose(np.asarray(y)[:600], expect, atol=1e-4)


def test_banded_graph_op_matches_dense_op():
    from stgcn_tpu.graph import build_gso as _bg
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.ops.graph_op import banded_graph_op

    art = make_gso(500, seed=13)
    # banded op assumes a narrow band: reorder first
    perm_m = permute_matrix(art.matrix, rcm_ordering(art.matrix))
    art_p = type(art)(matrix=perm_m, gso_type=art.gso_type,
                      cheb_rescaled=art.cheb_rescaled, lam_max=art.lam_max)
    bop = banded_graph_op(art_p, use_pallas=False)
    dop = dense_graph_op(art_p)
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 3, 500, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(bop(x)), np.asarray(dop(x)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(bop(x, scale=2.0)),
                               np.asarray(dop(x, scale=2.0)), atol=1e-4)


def test_make_graph_op_auto_selection():
    from stgcn_tpu.ops.graph_op import make_graph_op

    small = make_gso(200, seed=15)
    assert type(make_graph_op(small)).__name__ == "DenseGraphOp"


def test_graph_op_grads_match_dense():
    """d/dx through BCSR and banded ops vs dense autodiff — on a
    NON-symmetric GSO (rw_norm_lap) so the transpose pack is exercised."""
    from stgcn_tpu.graph import build_gso as _bg
    from stgcn_tpu.graph.gso import GraphShiftOperator
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.ops.graph_op import banded_graph_op

    adj = random_road_graph(300, k_neighbors=5, seed=21)
    art = _bg(adj, "rw_norm_lap", cheb=True)
    assert (art.matrix != art.matrix.T).nnz > 0  # genuinely non-symmetric
    pm = permute_matrix(art.matrix, rcm_ordering(art.matrix))
    art_p = GraphShiftOperator(matrix=pm, gso_type=art.gso_type,
                               cheb_rescaled=True, lam_max=art.lam_max)

    dense_op = dense_graph_op(art_p)
    ops = {
        "bcsr": bcsr_graph_op(art_p, block_size=64, use_pallas=False),
        "banded": banded_graph_op(art_p, use_pallas=False),
    }
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((2, 300, 8)).astype(np.float32))

    def loss(op):
        return lambda xx: (op(xx, scale=2.0) ** 2).sum()

    g_dense = jax.grad(loss(dense_op))(x)
    for name, op in ops.items():
        g = jax.grad(loss(op))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_dense),
                                   atol=2e-2, rtol=1e-4,
                                   err_msg=f"grad mismatch for {name}")


def test_cheb_pair_slab_grads_match_dense():
    """d/dslabs of the fused cheb pair vs autodiff through the dense
    recurrence — catches the dT1 = g1 + 2 Aᵀ g2 chain term (T1 feeds T2),
    which the x-grad alone cannot see."""
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.kernels.banded_spmm import (banded_cheb_pair_vjp,
                                               pack_banded_with_transpose)

    art = make_gso(400, seed=23)
    m = permute_matrix(art.matrix, rcm_ordering(art.matrix))
    slabs, lo, slabs_t, lo_t, v_pad = pack_banded_with_transpose(m)
    slabs = jnp.asarray(slabs, jnp.float32)
    slabs_t = jnp.asarray(slabs_t, jnp.float32)
    lo_j, lo_t_j = jnp.asarray(lo), jnp.asarray(lo_t)
    rng = np.random.default_rng(24)
    x = np.zeros((v_pad, 8), np.float32)
    x[:400] = rng.standard_normal((400, 8))
    x = jnp.asarray(x)
    a_dense = jnp.zeros((v_pad, v_pad), jnp.float32).at[:400, :400].set(
        jnp.asarray(m.toarray(), jnp.float32))

    def f_sparse(s, st, xx):
        t1, t2 = banded_cheb_pair_vjp(s, lo_j, st, lo_t_j, xx, False)
        return (t1 ** 2).sum() + 3.0 * (t2 ** 2).sum()

    def f_dense(a, xx):
        t1 = a @ xx
        t2 = 2.0 * (a @ t1) - xx
        return (t1 ** 2).sum() + 3.0 * (t2 ** 2).sum()

    ds, dst, dx = jax.grad(f_sparse, argnums=(0, 1, 2))(slabs, slabs_t, x)
    da, dx_dense = jax.grad(f_dense, argnums=(0, 1))(a_dense, x)

    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_dense),
                               atol=1e-3, rtol=1e-4)
    # slab grads: band-sampled SDDMM over the FULL window must equal the
    # dense dA at the same positions (windows cover every nonzero)
    da_np = np.asarray(da)
    ds_np = np.asarray(ds)
    nbr, bs, w = ds_np.shape
    scale = np.abs(da_np).max()
    for i in range(nbr):
        rows = slice(i * bs, min((i + 1) * bs, v_pad))
        cols = slice(lo[i], lo[i] + w)
        np.testing.assert_allclose(
            ds_np[i, :rows.stop - rows.start], da_np[rows, cols],
            atol=1e-4 * scale, rtol=1e-3,
            err_msg=f"dslabs mismatch at block row {i}")


def test_cheb_pair_stream_pack_and_fallback():
    """The contain_diag block-aligned pack satisfies the streaming-pair
    preconditions; the vjp wrapper's CPU fallback matches the dense
    recurrence, forward and d/dx."""
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.kernels.banded_spmm import (banded_cheb_pair_stream_vjp,
                                               cheb_pair_stream_safe,
                                               pack_banded_device)

    art = make_gso(500, seed=31)
    m = permute_matrix(art.matrix, rcm_ordering(art.matrix))
    slabs, lo, v_pad = pack_banded_device(m, block_size=128, col_align=128,
                                          contain_diag=True,
                                          dtype=jnp.float32)
    assert cheb_pair_stream_safe(lo, slabs.shape[-1], 128)
    slabs_t, lo_t, _ = pack_banded_device(m.T.tocsr(), block_size=128,
                                          col_align=128, contain_diag=True,
                                          dtype=jnp.float32, v_pad=v_pad)
    lo_j, lo_t_j = jnp.asarray(lo), jnp.asarray(lo_t)
    rng = np.random.default_rng(32)
    x = np.zeros((v_pad, 8), np.float32)
    x[:500] = rng.standard_normal((500, 8))
    x = jnp.asarray(x)
    a = jnp.zeros((v_pad, v_pad), jnp.float32).at[:500, :500].set(
        jnp.asarray(m.toarray(), jnp.float32))

    t1, t2 = banded_cheb_pair_stream_vjp(slabs, lo_j, slabs_t, lo_t_j, x,
                                         None, None, False)
    t1d = a @ x
    t2d = 2.0 * (a @ t1d) - x
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t1d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t2d), atol=1e-4)

    def f_s(xx):
        o1, o2 = banded_cheb_pair_stream_vjp(slabs, lo_j, slabs_t, lo_t_j,
                                             xx, None, None, False)
        return (o1 ** 2).sum() + 3.0 * (o2 ** 2).sum()

    def f_d(xx):
        o1 = a @ xx
        o2 = 2.0 * (a @ o1) - xx
        return (o1 ** 2).sum() + 3.0 * (o2 ** 2).sum()

    gx = jax.grad(f_s)(x)
    gx_d = jax.grad(f_d)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_d),
                               atol=1e-3, rtol=1e-4)


def test_banded_int8_cheb_pair_uses_stream_pack():
    """banded_graph_op(quantize=True) builds a stream-pair-capable pack and
    its cheb_pair matches the dense recurrence to quantization tolerance."""
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.ops.graph_op import banded_graph_op, dense_graph_op

    art = make_gso(700, seed=33)
    art = type(art)(matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)),
                    gso_type=art.gso_type, cheb_rescaled=art.cheb_rescaled,
                    lam_max=art.lam_max)
    gq = banded_graph_op(art, use_pallas=False, quantize=True)
    assert gq.pair_stream
    gd = dense_graph_op(art)
    rng = np.random.default_rng(34)
    x = jnp.asarray(rng.standard_normal((2, 700, 8)).astype(np.float32))
    t1q, t2q = gq.cheb_pair(x)
    t1d = gd(x)
    t2d = 2.0 * gd(t1d) - x
    for got, want in ((t1q, t1d), (t2q, t2d)):
        rel = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        assert rel < 0.03, rel
    # d/dx through the stream vjp (weights frozen for int8)
    gq_x = jax.grad(lambda xx: jnp.sum(jnp.cos(sum(gq.cheb_pair(xx)))))(x)
    gd_x = jax.grad(lambda xx: jnp.sum(jnp.cos(
        gd(xx) + 2.0 * gd(gd(xx)) - xx)))(x)
    rel = float(jnp.max(jnp.abs(gq_x - gd_x))
                / (jnp.max(jnp.abs(gd_x)) + 1e-9))
    assert rel < 0.05, rel


def test_banded_int8_graph_op_close_to_dense():
    """int8 banded operator (per-row scales) matches the dense operator to
    quantization tolerance, forward and d/dx."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.ops.graph_op import banded_graph_op, dense_graph_op

    adj = random_road_graph(700, k_neighbors=6, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = type(art)(matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)),
                    gso_type=art.gso_type, cheb_rescaled=art.cheb_rescaled,
                    lam_max=art.lam_max)
    g_q = banded_graph_op(art, use_pallas=False, quantize=True)
    g_d = dense_graph_op(art)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 4, 700, 8)).astype(np.float32))

    y_q, y_d = g_q(x), g_d(x)
    rel = float(jnp.max(jnp.abs(y_q - y_d)) / (jnp.max(jnp.abs(y_d)) + 1e-9))
    assert rel < 0.02

    gq = jax.grad(lambda xx: jnp.sum(jnp.cos(g_q(xx))))(x)
    gd = jax.grad(lambda xx: jnp.sum(jnp.cos(g_d(xx))))(x)
    rel = float(jnp.max(jnp.abs(gq - gd)) / (jnp.max(jnp.abs(gd)) + 1e-9))
    assert rel < 0.03

    # the scale=2.0 Chebyshev step folds into the dequant scales
    y2q, y2d = g_q(x, scale=2.0), g_d(x, scale=2.0)
    rel = float(jnp.max(jnp.abs(y2q - y2d)) / (jnp.max(jnp.abs(y2d)) + 1e-9))
    assert rel < 0.02


def test_nv_layout_matches_vn_and_dense():
    """nv-layout kernels (kernels/banded_nv.py): apply/pair on the [N, V]
    operand must match the vn path transposed, and grads (incl. the slab
    SDDMM) must match dense autodiff. Runs the jnp fallback on CPU; the
    Pallas kernels are covered by tests/test_kernels_tpu.py."""
    import numpy as np

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.ops.graph_op import banded_graph_op, dense_graph_op

    adj = random_road_graph(700, k_neighbors=6, seed=3)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = type(art)(matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)),
                    gso_type=art.gso_type, cheb_rescaled=art.cheb_rescaled,
                    lam_max=art.lam_max)
    gop = banded_graph_op(art, use_pallas=False, nv=True)
    assert gop.has_nv and gop.slabs_nv is gop.slabs_nv_t  # symmetric reuse
    rng = np.random.default_rng(1)
    n = 96
    x_nv = jnp.asarray(rng.standard_normal((n, gop.v_pad)).astype(np.float32))

    y = gop.apply_nv(x_nv)
    y_vn = gop.apply_vn(x_nv.T)
    np.testing.assert_allclose(np.asarray(y)[:, :y_vn.shape[0]],
                               np.asarray(y_vn).T, atol=2e-5)
    t1, t2 = gop.cheb_pair_nv(x_nv)
    r1, r2 = gop.cheb_pair_vn(x_nv.T)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(r1).T, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(r2).T, atol=2e-5)

    # d/dx of the pair vs dense autodiff
    g_d = dense_graph_op(art)
    xd = x_nv[:, :700].T[None]  # [1, V, n] -> dense op wants [..., V, C]

    def loss_nv(xx):
        a, b = gop.cheb_pair_nv(xx)
        return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(b))

    def loss_dense(xx):
        t1d = g_d(xx)
        t2d = g_d(t1d, scale=2.0) - xx
        pad = gop.v_pad - 700
        f = lambda t: jnp.pad(t[0].T, ((0, 0), (0, pad)))
        return jnp.sum(jnp.sin(f(t1d))) + jnp.sum(jnp.cos(f(t2d)))

    gnv = jax.grad(loss_nv)(x_nv)
    gd = jax.grad(loss_dense)(xd)
    np.testing.assert_allclose(np.asarray(gnv)[:, :700],
                               np.asarray(gd)[0].T, atol=3e-5)


def test_nv_slab_gradient_matches_dense():
    """d/dslabs through cheb_pair_nv (the scan-based band SDDMM) must match
    autodiff through a dense formulation of the same pack."""
    import numpy as np

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.kernels.banded_nv import _nv_ref, cheb_pair_nv
    from stgcn_tpu.ops.graph_op import banded_graph_op

    adj = random_road_graph(520, k_neighbors=5, seed=7)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = type(art)(matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)),
                    gso_type=art.gso_type, cheb_rescaled=art.cheb_rescaled,
                    lam_max=art.lam_max)
    gop = banded_graph_op(art, use_pallas=False, nv=True)
    rng = np.random.default_rng(2)
    x_nv = jnp.asarray(rng.standard_normal((32, gop.v_pad)).astype(np.float32))

    def loss(slabs):
        t1, t2 = cheb_pair_nv(slabs, gop.lo, slabs, gop.lo_t, x_nv)
        return jnp.sum(jnp.sin(t1)) + jnp.sum(jnp.cos(t2))

    def loss_auto(slabs):
        def one(v):
            y = _nv_ref(slabs, gop.lo, v, None)
            k = min(y.shape[1], gop.v_pad)
            out = jnp.zeros((y.shape[0], gop.v_pad), y.dtype)
            return out.at[:, :k].set(y[:, :k])

        xc = jnp.pad(x_nv, ((0, 0), (0, max(0, slabs.shape[0]
                                            * slabs.shape[2] - gop.v_pad))))
        t1 = one(xc)
        t1c = jnp.pad(t1, ((0, 0), (0, xc.shape[1] - t1.shape[1])))
        t2 = 2.0 * one(t1c) - x_nv
        return jnp.sum(jnp.sin(t1)) + jnp.sum(jnp.cos(t2))

    g_vjp = jax.grad(loss)(gop.slabs_nv)
    g_auto = jax.grad(loss_auto)(gop.slabs_nv)
    np.testing.assert_allclose(np.asarray(g_vjp), np.asarray(g_auto),
                               atol=3e-5)
