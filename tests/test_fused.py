"""Fused ST-block kernel tests (CPU: jnp reference path + Pallas interpret
mode). Real-TPU parity is covered by tests/test_kernels_tpu.py."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from stgcn_tpu.kernels.fused_stblock import fused_st_block
from stgcn_tpu.nn.fused import fused_forward
from stgcn_tpu.nn.layers import STConvBlock
from stgcn_tpu.nn.model import STGCN
from stgcn_tpu.ops.graph_op import DenseGraphOp

V, B, T, KT, KS = 24, 5, 12, 3, 3


def _setup(act, gct, seed=1):
    rng = np.random.default_rng(0)
    gso = jnp.asarray(rng.standard_normal((V, V)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((B, T, V, 1)).astype(np.float32))
    blk = STConvBlock(kt=KT, ks=KS, channels=(64, 16, 64), act_func=act,
                      graph_conv_type=gct, droprate=0.5)
    gop = DenseGraphOp(matrix=gso)
    params = blk.init(jax.random.PRNGKey(seed), x, gop,
                      deterministic=True)["params"]
    return blk, gop, gso, x, params


@pytest.mark.parametrize("act", ["glu", "gtu", "relu", "silu"])
@pytest.mark.parametrize("gct", ["cheb_graph_conv", "graph_conv"])
def test_forward_parity(act, gct):
    blk, gop, gso, x, params = _setup(act, gct)
    y_ref = blk.apply({"params": params}, x, gop, deterministic=True)
    # pure-jnp reference path
    y_jnp = fused_st_block(x, gso, params, kt=KT, ks=KS, act_func=act,
                           graph_conv_type=gct, droprate=0.5,
                           deterministic=True, use_pallas=False)
    np.testing.assert_allclose(y_jnp, y_ref, atol=1e-4, rtol=1e-4)
    # pallas kernel via interpreter (exercises the actual kernel code path)
    y_pal = fused_st_block(x, gso, params, kt=KT, ks=KS, act_func=act,
                           graph_conv_type=gct, droprate=0.5,
                           deterministic=True, interpret=True,
                           use_pallas=True)
    np.testing.assert_allclose(y_pal, y_ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("act", ["glu", "gtu"])
@pytest.mark.parametrize("gct", ["cheb_graph_conv", "graph_conv"])
def test_backward_matches_autodiff(act, gct):
    """The hand-written backward kernel equals JAX autodiff of the flax
    block (deterministic mode, nontrivial downstream cotangent)."""
    blk, gop, gso, x, params = _setup(act, gct)

    def loss_ref(p, xx):
        y = blk.apply({"params": p}, xx, gop, deterministic=True)
        return jnp.sum(y * jnp.cos(y))

    def loss_fused(p, xx):
        y = fused_st_block(xx, gso, p, kt=KT, ks=KS, act_func=act,
                           graph_conv_type=gct, droprate=0.5,
                           deterministic=True, interpret=True,
                           use_pallas=True)
        return jnp.sum(y * jnp.cos(y))

    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4,
                                                         rtol=1e-3),
                 gp_r, gp_f)
    np.testing.assert_allclose(gx_r, gx_f, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("act", ["glu", "gtu", "relu", "silu"])
@pytest.mark.parametrize("gct", ["cheb_graph_conv", "graph_conv"])
def test_bf16_forward_close(act, gct):
    """precision='bfloat16' (bf16 storage/MXU operands, f32 accumulation +
    LN statistics) tracks the f32 reference to bf16 rounding tolerance on
    both the jnp and the Pallas-interpret path."""
    blk, gop, gso, x, params = _setup(act, gct)
    y_ref = blk.apply({"params": params}, x, gop, deterministic=True)
    kw = dict(kt=KT, ks=KS, act_func=act, graph_conv_type=gct,
              droprate=0.5, deterministic=True, precision="bfloat16")
    y_jnp = fused_st_block(x, gso, params, use_pallas=False, **kw)
    assert y_jnp.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y_jnp, np.float32), y_ref,
                               atol=0.08, rtol=0.05)
    y_pal = fused_st_block(x, gso, params, interpret=True, use_pallas=True,
                           **kw)
    np.testing.assert_allclose(np.asarray(y_pal, np.float32), y_ref,
                               atol=0.08, rtol=0.05)


def test_bf16_backward_close():
    """bf16 hand-written backward tracks f32 autodiff in relative norm."""
    blk, gop, gso, x, params = _setup("glu", "cheb_graph_conv")

    def loss_ref(p, xx):
        y = blk.apply({"params": p}, xx, gop, deterministic=True)
        return jnp.sum(y * jnp.cos(y))

    def loss_bf16(p, xx):
        y = fused_st_block(xx, gso, p, kt=KT, ks=KS, act_func="glu",
                           graph_conv_type="cheb_graph_conv", droprate=0.5,
                           deterministic=True, interpret=True,
                           use_pallas=True, precision="bfloat16")
        return jnp.sum(y.astype(jnp.float32)
                       * jnp.cos(y.astype(jnp.float32)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gb = jax.grad(loss_bf16, argnums=(0, 1))(params, x)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    fb, _ = jax.flatten_util.ravel_pytree(gb)
    rel = float(jnp.linalg.norm(fb.astype(jnp.float32) - fr)
                / (jnp.linalg.norm(fr) + 1e-12))
    assert rel < 0.03, rel


def test_batch_tile_padding():
    """B not divisible by the tile: padded rows must not leak into outputs
    or weight gradients."""
    blk, gop, gso, x, params = _setup("glu", "cheb_graph_conv")

    def loss(p, tb):
        y = fused_st_block(x, gso, p, kt=KT, ks=KS, act_func="glu",
                           graph_conv_type="cheb_graph_conv", droprate=0.5,
                           deterministic=True, interpret=True,
                           use_pallas=True, batch_tile=tb)
        return jnp.sum(y ** 2), y

    (l2, y2), g2 = jax.value_and_grad(loss, has_aux=True)(params, 2)  # 5 % 2 != 0
    (l1, y1), g1 = jax.value_and_grad(loss, has_aux=True)(params, 1)
    np.testing.assert_allclose(y2, y1, atol=1e-5, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4,
                                                         rtol=1e-4), g2, g1)


def test_reference_dropout_stats():
    """Training-mode jnp path: dropout zeros ~droprate of outputs and is
    unbiased in expectation."""
    blk, gop, gso, x, params = _setup("glu", "cheb_graph_conv")
    y_det = fused_st_block(x, gso, params, kt=KT, ks=KS, act_func="glu",
                           graph_conv_type="cheb_graph_conv", droprate=0.5,
                           deterministic=True, use_pallas=False)
    y_tr = fused_st_block(x, gso, params, kt=KT, ks=KS, act_func="glu",
                          graph_conv_type="cheb_graph_conv", droprate=0.5,
                          deterministic=False, use_pallas=False,
                          drop_rng=jax.random.PRNGKey(3))
    zero_frac = float(jnp.mean(y_tr == 0.0))
    assert 0.4 < zero_frac < 0.6
    ratio = float(jnp.mean(jnp.abs(y_tr)) / jnp.mean(jnp.abs(y_det)))
    assert 0.8 < ratio < 1.25


def test_full_model_fused_forward():
    """fused_forward over the whole STGCN equals model.apply (deterministic),
    for both output-head variants."""
    rng = np.random.default_rng(0)
    gso = jnp.asarray(rng.standard_normal((V, V)).astype(np.float32) * 0.1)
    gop = DenseGraphOp(matrix=gso)
    model = STGCN(n_his=12)
    x = jnp.asarray(rng.standard_normal((4, 12, V, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, gop,
                        deterministic=True)["params"]
    y_ref = model.apply({"params": params}, x, gop, deterministic=True)
    y_f = fused_forward(params, x, gop, model, deterministic=True,
                        use_pallas=False)
    np.testing.assert_allclose(y_f, y_ref, atol=1e-4, rtol=1e-4)

    def loss_ref(p):
        return jnp.mean(model.apply({"params": p}, x, gop,
                                    deterministic=True) ** 2)

    def loss_f(p):
        return jnp.mean(fused_forward(p, x, gop, model, deterministic=True,
                                      use_pallas=False) ** 2)

    gr = jax.grad(loss_ref)(params)
    gf = jax.grad(loss_f)(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5,
                                                         rtol=1e-3), gr, gf)


def test_full_model_fused_ko0_head():
    """Ko == 0 config exercises the inline fc head (`models.py:38-42`)."""
    rng = np.random.default_rng(0)
    gso = jnp.asarray(rng.standard_normal((V, V)).astype(np.float32) * 0.1)
    gop = DenseGraphOp(matrix=gso)
    model = STGCN(n_his=8, kt=3, stblock_num=2)  # Ko = 8 - 2*2*2 = 0
    x = jnp.asarray(rng.standard_normal((4, 8, V, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, gop,
                        deterministic=True)["params"]
    y_ref = model.apply({"params": params}, x, gop, deterministic=True)
    y_f = fused_forward(params, x, gop, model, deterministic=True,
                        use_pallas=False)
    np.testing.assert_allclose(y_f, y_ref, atol=1e-4, rtol=1e-4)
