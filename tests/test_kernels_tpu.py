"""On-TPU Pallas kernel tests. Skipped unless STGCN_TEST_TPU=1 (the default
test run uses the virtual CPU mesh; the driver's bench exercises this path
on hardware every round).

Run: ``STGCN_TEST_TPU=1 python -m pytest tests/test_kernels_tpu.py -q``
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(os.environ.get("STGCN_TEST_TPU") != "1",
                                reason="TPU kernel tests need STGCN_TEST_TPU=1")


@pytest.fixture(scope="module")
def tpu_setup():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    import jax.numpy as jnp

    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.packing import pack_bcsr

    n, bs = 1024, 128
    art = build_gso(random_road_graph(n, k_neighbors=6, seed=0),
                    "sym_norm_lap", cheb=True)
    data, cols, counts = pack_bcsr(art.matrix, block_size=bs)
    return {
        "n": n, "bs": bs, "art": art,
        "data": jnp.asarray(data, jnp.float32),
        "cols": jnp.asarray(cols),
        "counts": jnp.asarray(counts),
        "data_np": data, "cols_np": cols, "counts_np": counts,
    }


def test_spmm_highest_precision_exact(tpu_setup):
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.kernels.spmm import bcsr_spmm

    s = tpu_setup
    rng = np.random.default_rng(1)
    x_np = rng.standard_normal((s["data"].shape[0] * s["bs"], 64)).astype(np.float32)
    y = bcsr_spmm(s["data"], s["cols"], jnp.asarray(x_np), counts=s["counts"],
                  block_size=s["bs"], precision=jax.lax.Precision.HIGHEST)
    expect = s["art"].matrix.toarray() @ x_np[:s["n"]].astype(np.float64)
    # compare via on-device reduction (bulk device->host is slow through the tunnel)
    err = float(jnp.abs(y[:s["n"]] - jnp.asarray(expect, jnp.float32)).max())
    assert err < 1e-4


def test_spmm_default_precision_bf16_level(tpu_setup):
    import jax.numpy as jnp

    from stgcn_tpu.kernels.spmm import bcsr_spmm

    s = tpu_setup
    rng = np.random.default_rng(2)
    x_np = rng.standard_normal((s["data"].shape[0] * s["bs"], 64)).astype(np.float32)
    y = bcsr_spmm(s["data"], s["cols"], jnp.asarray(x_np), counts=s["counts"],
                  block_size=s["bs"])
    expect = s["art"].matrix.toarray() @ x_np[:s["n"]].astype(np.float64)
    err = float(jnp.abs(y[:s["n"]] - jnp.asarray(expect, jnp.float32)).max())
    assert err < 0.05  # bf16 multiplies, f32 accumulate


def test_sddmm_highest_precision(tpu_setup):
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.kernels.sddmm import bcsr_sddmm

    s = tpu_setup
    bs = s["bs"]
    rng = np.random.default_rng(3)
    vpad = s["data"].shape[0] * bs
    g_np = rng.standard_normal((vpad, 64)).astype(np.float32)
    x_np = rng.standard_normal((vpad, 64)).astype(np.float32)
    out = bcsr_sddmm(s["cols"], jnp.asarray(g_np), jnp.asarray(x_np),
                     counts=s["counts"], block_size=bs,
                     precision=jax.lax.Precision.HIGHEST)
    gb = g_np.reshape(-1, bs, 64)
    xb = x_np.reshape(-1, bs, 64)
    cols_np, counts_np = s["cols_np"], s["counts_np"]
    expect = np.zeros(out.shape, np.float32)
    for i in range(cols_np.shape[0]):
        for k in range(counts_np[i]):
            expect[i, k] = gb[i] @ xb[cols_np[i, k]].T
    err = float(jnp.abs(out - jnp.asarray(expect)).max())
    assert err < 1e-3


def test_banded_resident_matches_reference(tpu_setup):
    """The whole-x-in-VMEM banded kernel (taken automatically when x fits
    on-chip) matches the jnp oracle, including its gradient path."""
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.kernels.banded_spmm import (banded_spmm,
                                               banded_spmm_reference,
                                               pack_banded,
                                               pack_banded_with_transpose,
                                               banded_spmm_vjp)

    s = tpu_setup
    m = permute_matrix(s["art"].matrix, rcm_ordering(s["art"].matrix))
    slabs, lo, slabs_t, lo_t, v_pad = pack_banded_with_transpose(
        m, block_size=256)
    rng = np.random.default_rng(4)
    x_np = rng.standard_normal((v_pad, 64)).astype(np.float32)
    x = jnp.asarray(x_np)
    sj, loj = jnp.asarray(slabs), jnp.asarray(lo)

    y = banded_spmm(sj, loj, x, precision=jax.lax.Precision.HIGHEST)
    y_ref = banded_spmm_reference(sj, loj, x, block_size=256)
    err = float(jnp.abs(y[:s["n"]] - y_ref[:s["n"]]).max())
    assert err < 1e-4

    stj, lotj = jnp.asarray(slabs_t), jnp.asarray(lo_t)

    def loss(xx):
        return jnp.sum(banded_spmm_vjp(sj, loj, stj, lotj, xx,
                                       None, None, 256, True)
                       [:s["n"]] ** 2)

    gx = jax.grad(loss)(x)
    # dx = 2 A^T (A x) on the true rows
    a = m.toarray()
    expect = 2.0 * a.T @ (a @ x_np[:s["n"]])
    err = float(jnp.abs(gx[:s["n"]] - jnp.asarray(expect, jnp.float32)).max()
                / (np.abs(expect).max() + 1e-9))
    assert err < 0.05  # default-precision bf16 multiplies in the bwd


def test_cheb_pair_stream_on_tpu(tpu_setup):
    """Streaming Chebyshev pair (no x residency) matches two applications
    on hardware, bf16 and int8."""
    import jax.numpy as jnp

    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.kernels.banded_spmm import (banded_cheb_pair_stream,
                                               banded_spmm,
                                               cheb_pair_stream_safe,
                                               pack_banded_device)

    import jax

    s = tpu_setup
    m = permute_matrix(s["art"].matrix, rcm_ordering(s["art"].matrix))
    rng = np.random.default_rng(6)
    # conftest pins matmul precision to 'highest' for parity tests; Mosaic
    # cannot lower highest-precision bf16 dots — use the production path
    for dtype in (jnp.bfloat16, jnp.int8):
        out = pack_banded_device(m, block_size=256, col_align=256,
                                 contain_diag=True, dtype=dtype)
        if dtype == jnp.int8:
            slabs, lo, v_pad, scales = out
        else:
            slabs, lo, v_pad = out
            scales = None
        assert cheb_pair_stream_safe(lo, slabs.shape[-1], 256)
        lo_j = jnp.asarray(lo)
        # rows past the true vertex count are window padding — zero them
        # (the kernel zero-pads its outputs there; A rows there are zero)
        x_np = np.zeros((v_pad, 64), np.float32)
        x_np[:s["n"]] = rng.standard_normal((s["n"], 64))
        x = jnp.asarray(x_np).astype(jnp.bfloat16)
        with jax.default_matmul_precision("bfloat16"):
            t1, t2 = banded_cheb_pair_stream(slabs, lo_j, x, scales=scales)
            # oracle: two single applications, same t1 rounding
            t1o = banded_spmm(slabs, lo_j, x, scales=scales)
            t1o = jnp.pad(t1o, ((0, v_pad - t1o.shape[0]), (0, 0))) \
                if t1o.shape[0] < v_pad else t1o[:v_pad]
            b = banded_spmm(slabs, lo_j, t1o,
                            scales=scales).astype(jnp.float32)
        b = jnp.pad(b, ((0, v_pad - b.shape[0]), (0, 0))) \
            if b.shape[0] < v_pad else b[:v_pad]
        t2o = 2.0 * b - x.astype(jnp.float32)
        e1 = float(jnp.abs(t1.astype(jnp.float32)
                           - t1o[:t1.shape[0]].astype(jnp.float32)).max())
        scale = float(jnp.abs(t2o).max()) + 1e-9
        e2 = float(jnp.abs(t2.astype(jnp.float32)
                           - t2o[:t2.shape[0]]).max()) / scale
        assert e1 == 0.0, (dtype, e1)   # t1 path is identical math
        assert e2 < 2e-2, (dtype, e2)   # t2 differs by accumulation order


def test_ell_resident_on_tpu(tpu_setup):
    """The resident-x ELL variant (taken when x fits VMEM) matches the
    dense oracle on hardware with 256x256 tiles."""
    import jax
    import jax.numpy as jnp

    from stgcn_tpu.graph.packing import pack_bcsr
    from stgcn_tpu.kernels.spmm import bcsr_spmm

    s = tpu_setup
    data, cols, counts = pack_bcsr(s["art"].matrix, block_size=256)
    rng = np.random.default_rng(7)
    x_np = rng.standard_normal((data.shape[0] * 256, 64)).astype(np.float32)
    y = bcsr_spmm(jnp.asarray(data, jnp.float32), jnp.asarray(cols),
                  jnp.asarray(x_np), counts=jnp.asarray(counts),
                  block_size=256, precision=jax.lax.Precision.HIGHEST)
    expect = s["art"].matrix.toarray() @ x_np[:s["n"]].astype(np.float64)
    err = float(jnp.abs(y[:s["n"]] - jnp.asarray(expect, jnp.float32)).max())
    assert err < 1e-4


def test_banded_sharded_p1_on_tpu(tpu_setup):
    """The halo-exchange sharded operator at P=1 on the real chip (pallas
    inside shard_map) matches the single-chip banded operator bit-for-bit."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stgcn_tpu.dist import banded_sharded_graph_op, make_mesh
    from stgcn_tpu.graph.gso import GraphShiftOperator
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.ops.graph_op import banded_graph_op

    s = tpu_setup
    art = s["art"]
    mesh = make_mesh(data=1, graph=1)
    op, part = banded_sharded_graph_op(art, mesh, dtype=jnp.bfloat16)
    pm = permute_matrix(art.matrix, rcm_ordering(art.matrix))
    art_p = GraphShiftOperator(matrix=pm, gso_type=art.gso_type,
                               cheb_rescaled=art.cheb_rescaled,
                               lam_max=art.lam_max)
    bop = banded_graph_op(art_p, dtype=jnp.bfloat16)
    rng = np.random.default_rng(8)
    n = s["n"]
    x = jnp.asarray(rng.standard_normal((op.n_vertex_pad, 64))
                    .astype(np.float32)).astype(jnp.bfloat16)
    x = jax.device_put(x, NamedSharding(mesh, P("graph", None)))
    with jax.default_matmul_precision("bfloat16"):
        f = jax.jit(lambda g, xx: g(xx))
        y = f(op, x)
        yb = f(bop, x[:n])
    err = float(jnp.abs(y[:n].astype(jnp.float32)
                        - yb.astype(jnp.float32)).max())
    assert err == 0.0, err


def test_banded_int8_on_tpu(tpu_setup):
    """int8 slabs with per-row output scales match the f32 reference to
    quantization tolerance on hardware (device-side packed)."""
    import jax.numpy as jnp

    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.kernels.banded_spmm import (banded_spmm,
                                               pack_banded_device)

    s = tpu_setup
    m = permute_matrix(s["art"].matrix, rcm_ordering(s["art"].matrix))
    slabs, lo, v_pad, scales = pack_banded_device(m, block_size=256,
                                                  dtype=jnp.int8)
    rng = np.random.default_rng(5)
    x_np = rng.standard_normal((v_pad, 64)).astype(np.float32)
    y = banded_spmm(slabs, jnp.asarray(lo), jnp.asarray(x_np),
                    block_size=256, scales=scales)
    expect = m[: s["n"]] @ x_np[: s["n"]].astype(np.float64)
    rel = float(jnp.abs(y[: s["n"]] - jnp.asarray(expect, jnp.float32)).max()) \
        / (abs(expect).max() + 1e-9)
    assert rel < 0.02


def test_vertex_fused_on_tpu(tpu_setup):
    """Vertex-fused sparse path on real TPU: deterministic parity vs the
    unfused model, and in-kernel PRNG dropout statistics (the CPU
    interpreter's prng stub can't check these)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
    from stgcn_tpu.nn.model import STGCN
    from stgcn_tpu.ops.graph_op import banded_graph_op

    s = tpu_setup
    art = dataclasses.replace(
        s["art"], matrix=permute_matrix(s["art"].matrix,
                                        rcm_ordering(s["art"].matrix)))
    gop = banded_graph_op(art, block_size=128)
    model = STGCN(n_his=12)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 12, s["n"], 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, gop,
                        deterministic=True)["params"]
    y_ref = jax.jit(lambda p, xx: model.apply(
        {"params": p}, xx, gop, deterministic=True))(params, x)
    y_f = jax.jit(lambda p, xx: fused_sparse_forward(
        p, xx, gop, model, deterministic=True))(params, x)
    err = float(jnp.abs(y_f - y_ref).max())
    assert err < 2e-4, err

    # dropout statistics: hidden-layer masks come from the on-core PRNG
    y_tr = jax.jit(lambda p, xx: fused_sparse_forward(
        p, xx, gop, model, deterministic=False,
        rng=jax.random.PRNGKey(5)))(params, x)
    assert bool(jnp.all(jnp.isfinite(y_tr)))
    ratio = float(jnp.mean(jnp.abs(y_tr)) / (jnp.mean(jnp.abs(y_ref)) + 1e-9))
    assert 0.3 < ratio < 3.0, ratio

    # grads run end-to-end on hardware
    def loss(p):
        y = fused_sparse_forward(p, x, gop, model, deterministic=False,
                                 rng=jax.random.PRNGKey(5))
        return jnp.mean(y ** 2)

    g = jax.jit(jax.grad(loss))(params)
    import jax.flatten_util

    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert bool(jnp.all(jnp.isfinite(flat)))


def test_sharded_fused_p1_on_tpu(tpu_setup):
    """Vertex-fused blocks through the sharded (shard_map + halo) path on
    the real chip at P=1: shard_map-wrapped Pallas kernels + the local
    halo SpMM must match the single-chip fused path exactly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stgcn_tpu.dist import banded_sharded_graph_op
    from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
    from stgcn_tpu.nn.model import STGCN

    s = tpu_setup
    mesh = Mesh(np.array(jax.devices()[:1]), ("graph",))
    sop, part = banded_sharded_graph_op(s["art"], mesh, block_size=128)
    model = STGCN(n_his=12)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 12, s["n"], 1)), jnp.float32)
    xp = x[:, :, part.perm, :]
    params = model.init(jax.random.PRNGKey(0), xp, sop,
                        deterministic=True)["params"]
    y_ref = jax.jit(lambda p: model.apply(
        {"params": p}, xp, sop, deterministic=True))(params)
    y_sh = jax.jit(lambda p: fused_sparse_forward(
        p, xp, sop, model, deterministic=True))(params)
    err = float(jnp.abs(y_sh - y_ref).max())
    assert err < 2e-4, err

    def loss(p):
        y = fused_sparse_forward(p, xp, sop, model, deterministic=False,
                                 rng=jax.random.PRNGKey(5))
        return jnp.mean(y ** 2)

    g = jax.jit(jax.grad(loss))(params)
    import jax.flatten_util

    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert bool(jnp.all(jnp.isfinite(flat)))


def test_nv_kernels_match_vn_on_tpu():
    """nv-layout stream kernels (single/pair/chain) vs the vn kernels on
    hardware: values and grads, bf16 and int8 packs."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    from stgcn_tpu.data.synthetic import random_road_graph
    from stgcn_tpu.graph import build_gso
    from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
    from stgcn_tpu.ops.graph_op import banded_graph_op

    adj = random_road_graph(4000, k_neighbors=8, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = type(art)(matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)),
                    gso_type=art.gso_type, cheb_rescaled=art.cheb_rescaled,
                    lam_max=art.lam_max)
    rng = np.random.default_rng(1)
    for quantize, dt in ((False, jnp.bfloat16), (True, jnp.bfloat16)):
        gop = banded_graph_op(art, quantize=quantize, dtype=dt,
                              block_size=256, nv=True)
        x_nv = jnp.asarray(rng.standard_normal((256, gop.v_pad)), dt)
        y = jax.jit(lambda g, xx: g.apply_nv(xx))(gop, x_nv)
        yr = jax.jit(lambda g, xx: g.apply_vn(xx))(gop, x_nv.T)
        k = yr.shape[0]
        np.testing.assert_allclose(
            np.asarray(y[:, :k], np.float32), np.asarray(yr.T, np.float32),
            atol=1e-5)
        assert float(jnp.max(jnp.abs(y[:, k:]))) == 0.0

        t1, t2 = jax.jit(lambda g, xx: g.cheb_pair_nv(xx))(gop, x_nv)
        r1, r2 = jax.jit(lambda g, xx: g.cheb_pair_vn(xx))(gop, x_nv.T)
        np.testing.assert_allclose(np.asarray(t1, np.float32),
                                   np.asarray(r1.T, np.float32), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t2, np.float32),
                                   np.asarray(r2.T, np.float32), atol=1e-5)

        def loss_nv(xx):
            a, b = gop.cheb_pair_nv(xx)
            return (jnp.sum(a.astype(jnp.float32) * 0.3)
                    + jnp.sum(b.astype(jnp.float32) * 0.7))

        def loss_vn(xx):
            a, b = gop.cheb_pair_vn(xx)
            return (jnp.sum(a.astype(jnp.float32) * 0.3)
                    + jnp.sum(b.astype(jnp.float32) * 0.7))

        g_nv = jax.jit(jax.grad(loss_nv))(x_nv)
        g_vn = jax.jit(jax.grad(loss_vn))(x_nv.T)
        np.testing.assert_allclose(np.asarray(g_nv, np.float32),
                                   np.asarray(g_vn.T, np.float32), atol=1e-5)
