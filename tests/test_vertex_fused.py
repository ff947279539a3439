"""Vertex-tiled fused sparse-path tests (CPU: Pallas interpret mode +
banded reference ops). Real-TPU perf/parity is covered by
scripts/bench_100k.py and tests/test_kernels_tpu.py."""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
from stgcn_tpu.nn.model import STGCN
from stgcn_tpu.ops.graph_op import banded_graph_op

V, B, T = 150, 3, 12


def _setup(gct="cheb_graph_conv", ks=3, act="glu", n_his=T, seed=0):
    adj = random_road_graph(V, k_neighbors=4, seed=seed)
    art = build_gso(adj, "sym_norm_lap", cheb=(gct == "cheb_graph_conv"))
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = banded_graph_op(art, block_size=128, use_pallas=False)
    model = STGCN(n_his=n_his, ks=ks, graph_conv_type=gct, act_func=act)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, n_his, V, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), x, gop,
                        deterministic=True)["params"]
    return model, gop, x, params


@pytest.mark.parametrize("gct,ks,act", [
    ("cheb_graph_conv", 3, "glu"),
    ("cheb_graph_conv", 2, "gtu"),
    ("cheb_graph_conv", 1, "glu"),
    ("graph_conv", 3, "silu"),
])
def test_forward_parity(gct, ks, act):
    model, gop, x, params = _setup(gct, ks, act)
    y_ref = model.apply({"params": params}, x, gop, deterministic=True)
    y_f = fused_sparse_forward(params, x, gop, model, deterministic=True,
                               interpret=True)
    np.testing.assert_allclose(y_f, y_ref, atol=2e-4, rtol=2e-4)


def test_backward_matches_autodiff():
    """Hand-written head/tail VJPs + LN-stat stitching equal JAX autodiff
    of the unfused model (deterministic, nontrivial cotangent)."""
    model, gop, x, params = _setup()

    def loss_ref(p, xx):
        y = model.apply({"params": p}, xx, gop, deterministic=True)
        return jnp.sum(y * jnp.cos(y))

    def loss_fused(p, xx):
        y = fused_sparse_forward(p, xx, gop, model, deterministic=True,
                                 interpret=True)
        return jnp.sum(y * jnp.cos(y))

    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    ff, _ = jax.flatten_util.ravel_pytree(gf)
    rel = float(jnp.linalg.norm(ff - fr) / (jnp.linalg.norm(fr) + 1e-12))
    assert rel < 1e-4, rel
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=2e-4,
                                                         rtol=2e-3),
                 gr[0], gf[0])


def test_training_mode_dropout():
    """Training mode runs end-to-end (fwd + grads finite, output differs
    from deterministic). The CPU HLO interpreter lacks the on-core PRNG,
    so this uses the Mosaic TPU interpreter — whose prng stub returns
    zero bits (mask ≡ drop); mask *statistics* are asserted on real TPU
    (tests/test_kernels_tpu.py)."""
    from jax.experimental.pallas import tpu as pltpu

    ip = pltpu.InterpretParams()
    model, gop, x, params = _setup()
    y_det = fused_sparse_forward(params, x, gop, model, deterministic=True,
                                 interpret=ip)
    y_tr = fused_sparse_forward(params, x, gop, model, deterministic=False,
                                rng=jax.random.PRNGKey(5), interpret=ip)
    assert np.all(np.isfinite(y_tr))
    assert float(jnp.max(jnp.abs(y_tr - y_det))) > 1e-6

    def loss(p):
        y = fused_sparse_forward(p, x, gop, model, deterministic=False,
                                 rng=jax.random.PRNGKey(5), interpret=ip)
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.all(np.isfinite(flat))


@pytest.mark.parametrize("b_tile", [1, 2])
def test_batch_tiling_and_padding(b_tile):
    """Explicit batch tiles — including B=3 % b_tile=2 (zero-padded rows)
    — must not change outputs or gradients vs the whole-batch kernels."""
    model, gop, x, params = _setup()
    y_whole = fused_sparse_forward(params, x, gop, model, deterministic=True,
                                   interpret=True)
    y_tiled = fused_sparse_forward(params, x, gop, model, deterministic=True,
                                   interpret=True, b_tile=b_tile)
    np.testing.assert_allclose(y_tiled, y_whole, atol=1e-5, rtol=1e-5)

    def loss(p, bt):
        y = fused_sparse_forward(p, x, gop, model, deterministic=True,
                                 interpret=True, b_tile=bt)
        return jnp.sum(y * jnp.cos(y))

    gw = jax.grad(lambda p: loss(p, None))(params)
    gt = jax.grad(lambda p: loss(p, b_tile))(params)
    jax.tree.map(lambda a_, b_: np.testing.assert_allclose(
        a_, b_, atol=2e-5, rtol=2e-4), gw, gt)


def test_remat_matches_unremat():
    """jax.checkpoint-wrapped blocks give identical values and grads."""
    model, gop, x, params = _setup()

    def loss(p, rm):
        y = fused_sparse_forward(p, x, gop, model, deterministic=True,
                                 interpret=True, remat=rm)
        return jnp.sum(y * jnp.cos(y))

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert abs(float(l0 - l1)) < 1e-6
    jax.tree.map(lambda a_, b_: np.testing.assert_allclose(
        a_, b_, atol=1e-6, rtol=1e-6), g0, g1)


@pytest.mark.parametrize("graph_ax,quantize", [(2, False), (4, False),
                                               (4, True)])
def test_sharded_fused_matches_single_device(graph_ax, quantize):
    """Vertex-fused blocks under a vertex-partitioned mesh (shard_map +
    per-shard halo SpMM + psum'd LN stats) == the single-device unfused
    model, values and gradients (virtual CPU mesh)."""
    from stgcn_tpu.dist import banded_sharded_graph_op, make_mesh

    adj = random_road_graph(V, k_neighbors=4, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    mesh = make_mesh(data=1, graph=graph_ax)
    sop, part = banded_sharded_graph_op(art, mesh, block_size=128,
                                        use_pallas=False,
                                        quantize=quantize)
    model = STGCN(n_his=T)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, T, V, 1)), jnp.float32)
    xp = x[:, :, part.perm, :]
    # oracle: single-device dense op on the SAME (permuted) vertex order
    dart = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, part.perm))
    dop = banded_graph_op(dart, block_size=128, use_pallas=False)
    params = model.init(jax.random.PRNGKey(3), xp, dop,
                        deterministic=True)["params"]

    y_ref = model.apply({"params": params}, xp, dop, deterministic=True)
    y_sh = fused_sparse_forward(params, xp, sop, model, deterministic=True,
                                interpret=True)
    atol = 2e-2 if quantize else 2e-4
    np.testing.assert_allclose(y_sh, y_ref, atol=atol, rtol=1e-2)

    def loss_ref(p):
        y = model.apply({"params": p}, xp, dop, deterministic=True)
        return jnp.sum(y * jnp.cos(y))

    def loss_sh(p):
        # remat=True also covers checkpoint-wrapped sharded blocks
        y = fused_sparse_forward(p, xp, sop, model, deterministic=True,
                                 interpret=True, remat=True)
        return jnp.sum(y * jnp.cos(y))

    gr = jax.grad(loss_ref)(params)
    gs = jax.grad(loss_sh)(params)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    fs, _ = jax.flatten_util.ravel_pytree(gs)
    rel = float(jnp.linalg.norm(fs - fr) / (jnp.linalg.norm(fr) + 1e-12))
    assert rel < (3e-2 if quantize else 1e-4), rel


def test_sharded_fused_training_mode():
    """Sharded fused blocks run in training mode (dropout via the on-core
    PRNG per shard) with finite grads, under a data x graph mesh.
    remat stays off here: the Mosaic TPU interpreter's ordered-IO effect
    cannot live under jax.checkpoint (real-TPU lowering has no such
    effect; remat x sharded is covered by the equivalence test above)."""
    from jax.experimental.pallas import tpu as pltpu

    from stgcn_tpu.dist import banded_sharded_graph_op, make_mesh

    adj = random_road_graph(V, k_neighbors=4, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    mesh = make_mesh(data=2, graph=2)
    sop, part = banded_sharded_graph_op(art, mesh, block_size=128,
                                        use_pallas=False)
    model = STGCN(n_his=T)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, T, V, 1)), jnp.float32)
    xp = x[:, :, part.perm, :]
    params = model.init(jax.random.PRNGKey(3), xp, sop,
                        deterministic=True)["params"]
    ip = pltpu.InterpretParams()

    def loss(p):
        y = fused_sparse_forward(p, xp, sop, model, deterministic=False,
                                 rng=jax.random.PRNGKey(5), interpret=ip)
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.all(np.isfinite(flat))


def test_bf16_forward_close():
    """bf16 compute tracks the f32 reference to bf16 tolerance."""
    model, gop, x, params = _setup()
    y_ref = model.apply({"params": params}, x, gop, deterministic=True)
    model_bf = STGCN(n_his=T, dtype=jnp.bfloat16)
    y_f = fused_sparse_forward(params, x, gop, model_bf, deterministic=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(y_f, np.float32), y_ref,
                               atol=0.1, rtol=0.05)


def test_dense_nv_op_matches_dense_call():
    """DenseGraphOp's nv surface (`apply_nv`/`cheb_pair_nv`) equals the
    einsum `__call__` / explicit Chebyshev recurrence."""
    from stgcn_tpu.ops import dense_graph_op

    adj = random_road_graph(V, k_neighbors=4, seed=2)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    gop = dense_graph_op(art)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, 5, V, 16)), jnp.float32)
    # nv operand: [N, v_pad] from the cv layout view
    x_cv = jnp.transpose(
        jnp.pad(x, ((0, 0),) * 2 + ((0, gop.v_pad - V), (0, 0))),
        (0, 1, 3, 2))
    x_nv = x_cv.reshape(-1, gop.v_pad)
    y_nv = gop.apply_nv(x_nv)
    y_ref = gop(x)
    y_back = jnp.transpose(y_nv.reshape(x_cv.shape), (0, 1, 3, 2))[:, :, :V]
    np.testing.assert_allclose(y_back, y_ref, atol=1e-5, rtol=1e-5)

    t1, t2 = gop.cheb_pair_nv(x_nv)
    t1_ref, t2_ref = gop(x), 2.0 * gop(gop(x)) - x
    for got, ref in ((t1, t1_ref), (t2, t2_ref)):
        got4 = jnp.transpose(got.reshape(x_cv.shape), (0, 1, 3, 2))[:, :, :V]
        np.testing.assert_allclose(got4, ref, atol=1e-5, rtol=1e-5)


def test_fused_with_dense_op_parity():
    """Vertex-fused blocks over the dense nv aggregation (the configs[2]
    production routing) == the unfused model."""
    from stgcn_tpu.ops import dense_graph_op

    model, _, x, params = _setup()
    adj = random_road_graph(V, k_neighbors=4, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    dgop = dense_graph_op(art)
    y_ref = model.apply({"params": params}, x, dgop, deterministic=True)
    y_f = fused_sparse_forward(params, x, dgop, model, deterministic=True,
                               interpret=True)
    np.testing.assert_allclose(y_f, y_ref, atol=2e-4, rtol=2e-4)


def test_xla_backend_parity_and_grads():
    """use_pallas='xla' (whole-array cv-layout jnp blocks) matches the
    unfused model in values and autodiff gradients — no Pallas involved,
    so this runs natively on CPU."""
    model, gop, x, params = _setup()
    y_ref = model.apply({"params": params}, x, gop, deterministic=True)
    y_x = fused_sparse_forward(params, x, gop, model, deterministic=True,
                               use_pallas="xla")
    np.testing.assert_allclose(y_x, y_ref, atol=2e-4, rtol=2e-4)

    def loss_ref(p):
        y = model.apply({"params": p}, x, gop, deterministic=True)
        return jnp.sum(y * jnp.cos(y))

    def loss_x(p):
        y = fused_sparse_forward(p, x, gop, model, deterministic=True,
                                 use_pallas="xla")
        return jnp.sum(y * jnp.cos(y))

    gr = jax.grad(loss_ref)(params)
    gx = jax.grad(loss_x)(params)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    fx, _ = jax.flatten_util.ravel_pytree(gx)
    rel = float(jnp.linalg.norm(fx - fr) / (jnp.linalg.norm(fr) + 1e-12))
    assert rel < 1e-4, rel

    # training mode runs with finite grads (jax.random dropout masks)
    def loss_tr(p):
        y = fused_sparse_forward(p, x, gop, model, deterministic=False,
                                 rng=jax.random.PRNGKey(5),
                                 use_pallas="xla")
        return jnp.mean(y ** 2)

    flat, _ = jax.flatten_util.ravel_pytree(jax.grad(loss_tr)(params))
    assert np.all(np.isfinite(flat))


def test_ks4_transparent_fallback():
    """cheb Ks=4 exceeds the vertex-fused kernels' two-term contraction;
    fused_sparse_forward must transparently run the unfused model (same
    result), not raise (VERDICT r3 #8)."""
    model, gop, x, params = _setup(ks=4)
    y_ref = model.apply({"params": params}, x, gop, deterministic=True)
    y_f = fused_sparse_forward(params, x, gop, model, deterministic=True,
                               interpret=True)
    np.testing.assert_allclose(y_f, y_ref, atol=2e-4, rtol=2e-4)


def test_xla_backend_rejects_b_tile():
    model, gop, x, params = _setup()
    with pytest.raises(ValueError, match="b_tile"):
        fused_sparse_forward(params, x, gop, model, deterministic=True,
                             use_pallas="xla", b_tile=2)


def test_dense_nv_wider_tile_pad():
    """A kernel tile pad wider than DenseGraphOp.v_pad (tile_v > 128) must
    round-trip through apply_nv/cheb_pair_nv with zero lanes intact
    (ADVICE r3 item 2)."""
    from stgcn_tpu.ops import dense_graph_op

    adj = random_road_graph(V, k_neighbors=4, seed=2)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    gop = dense_graph_op(art)
    w = gop.v_pad + 128  # wider than the op's own pad
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, 5, V, 16)), jnp.float32)
    x_cv = jnp.transpose(
        jnp.pad(x, ((0, 0),) * 2 + ((0, w - V), (0, 0))), (0, 1, 3, 2))
    x_nv = x_cv.reshape(-1, w)
    y_nv = gop.apply_nv(x_nv)
    assert y_nv.shape == x_nv.shape
    y_back = jnp.transpose(y_nv.reshape(x_cv.shape), (0, 1, 3, 2))[:, :, :V]
    np.testing.assert_allclose(y_back, gop(x), atol=1e-5, rtol=1e-5)
    assert float(jnp.abs(y_nv[:, gop.v_pad:]).max()) == 0.0

    with pytest.raises(ValueError, match="vertex lanes"):
        gop.apply_nv(x_nv[:, :V - 7])


def test_nv_only_pack_and_minimal_remat():
    """nv_only banded ops (the 1M-vertex memory configuration: only the
    pre-transposed nv slab family is carried) must (a) serve the vn
    surfaces through the nv fallback for the unfused model, and (b) run
    the fused path under remat_policy='minimal' (full backward
    recompute) with parity and finite grads."""
    from stgcn_tpu.ops.graph_op import banded_graph_op as bgo

    model, gop_full, x, params = _setup()
    adj = random_road_graph(V, k_neighbors=4, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = bgo(art, block_size=128, use_pallas=False, nv=True, nv_only=True)
    assert gop.slabs.shape[0] == 0 and gop.has_nv

    y_ref = model.apply({"params": params}, x, gop_full, deterministic=True)
    y_nvo = model.apply({"params": params}, x, gop, deterministic=True)
    np.testing.assert_allclose(y_nvo, y_ref, atol=2e-5, rtol=2e-5)

    y_f = fused_sparse_forward(params, x, gop, model, deterministic=True,
                               interpret=True, remat=True,
                               remat_policy="minimal")
    np.testing.assert_allclose(y_f, y_ref, atol=2e-4, rtol=2e-4)

    def loss(p):
        y = fused_sparse_forward(p, x, gop, model, deterministic=True,
                                 interpret=True, remat=True,
                                 remat_policy="minimal")
        return jnp.sum(y * jnp.cos(y))

    gr = jax.grad(loss)(params)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    assert np.all(np.isfinite(fr))
