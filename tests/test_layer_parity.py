"""Per-layer numerics parity vs the reference PyTorch implementation.

For each layer we build the reference torch module (CPU, eval mode), copy
its weights into the corresponding flax layer, run both on the same input,
and require allclose. The reference is used strictly as a black-box oracle
(`model/layers.py`, `model/models.py`).

Layout note: reference activations are ``[B, C, T, V]``; ours are
``[B, T, V, C]`` — ``t2j``/``j2t`` convert.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from stgcn_tpu.graph import build_gso, calc_gso
from stgcn_tpu.nn import layers as L
from stgcn_tpu.nn import model as M
from stgcn_tpu.ops import dense_graph_op
from tests.parity_utils import (align_params, cheb_params, conv2d_params,
    dense_params, gcl_params, ln_params, output_params, stblock_params,
    temporal_params)

torch = pytest.importorskip("torch")

ATOL = 2e-5
B, T, V = 4, 12, 37  # deliberately non-aligned V


@pytest.fixture(scope="module")
def gso_dense():
    rng = np.random.default_rng(7)
    a = sp.csr_matrix(rng.random((V, V)) * (rng.random((V, V)) < 0.3))
    art = build_gso(a, "sym_norm_lap", cheb=True)
    return art.to_dense()


def t2j_act(x_torch):
    """[B,C,T,V] torch activation -> [B,T,V,C] jax array."""
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def j2t_act(shape, seed=0):
    """Make a random input pair (torch BCTV, jax BTVC)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape).astype(np.float32)  # [B,C,T,V]
    return torch.from_numpy(x), jnp.asarray(x.transpose(0, 2, 3, 1))


@pytest.mark.parametrize("c_in,c_out", [(64, 16), (16, 64), (32, 32)])
def test_align_parity(reference_modules, c_in, c_out):
    ref = reference_modules["layers"].Align(c_in, c_out).eval()
    xt, xj = j2t_act((B, c_in, T, V), seed=1)
    yt = ref(xt)
    yj = L.Align(c_out).apply({"params": align_params(ref, c_in, c_out)}, xj)
    np.testing.assert_allclose(np.asarray(yj), yt.detach().numpy().transpose(0, 2, 3, 1), atol=ATOL)


@pytest.mark.parametrize("causal_pad", [False, True])
def test_causal_conv_parity(reference_modules, causal_pad):
    kt, c_in, c_out = 3, 8, 12
    ref = reference_modules["layers"].CausalConv2d(
        c_in, c_out, (kt, 1), enable_padding=causal_pad).eval()
    xt, xj = j2t_act((B, c_in, T, V), seed=2)
    yt = ref(xt)
    yj = L.CausalConv(c_out, kt, causal_pad=causal_pad).apply(
        {"params": conv2d_params(ref)}, xj)
    np.testing.assert_allclose(np.asarray(yj), yt.detach().numpy().transpose(0, 2, 3, 1),
                               atol=ATOL)


@pytest.mark.parametrize("act", ["glu", "gtu", "relu", "silu"])
@pytest.mark.parametrize("c_in,c_out", [(1, 64), (64, 16), (16, 16)])
def test_temporal_conv_parity(reference_modules, act, c_in, c_out):
    kt = 3
    ref = reference_modules["layers"].TemporalConvLayer(kt, c_in, c_out, V, act).eval()
    xt, xj = j2t_act((B, c_in, T, V), seed=3)
    with torch.no_grad():
        yt = ref(xt)
    yj = L.TemporalConvLayer(kt, c_out, act).apply(
        {"params": temporal_params(ref, c_in, c_out)}, xj)
    np.testing.assert_allclose(np.asarray(yj), yt.numpy().transpose(0, 2, 3, 1),
                               atol=ATOL)


@pytest.mark.parametrize("ks", [1, 2, 3, 4])
@pytest.mark.parametrize("bias", [True, False])
def test_cheb_graph_conv_parity(reference_modules, gso_dense, ks, bias):
    c = 16
    gso_t = torch.from_numpy(gso_dense)
    ref = reference_modules["layers"].ChebGraphConv(c, c, ks, gso_t, bias).eval()
    xt, xj = j2t_act((B, c, T, V), seed=4)
    with torch.no_grad():
        yt = ref(xt)  # [B,T,V,C] already
    gop = dense_graph_op(gso_dense)
    yj = L.ChebGraphConv(c, ks, bias).apply({"params": cheb_params(ref)}, xj, gop)
    np.testing.assert_allclose(np.asarray(yj), yt.numpy(), atol=ATOL)


@pytest.mark.parametrize("bias", [True, False])
def test_graph_conv_parity(reference_modules, gso_dense, bias):
    c = 16
    gso_t = torch.from_numpy(gso_dense)
    ref = reference_modules["layers"].GraphConv(c, c, gso_t, bias).eval()
    xt, xj = j2t_act((B, c, T, V), seed=5)
    with torch.no_grad():
        yt = ref(xt)
    gop = dense_graph_op(gso_dense)
    yj = L.GraphConv(c, bias).apply({"params": cheb_params(ref)}, xj, gop)
    np.testing.assert_allclose(np.asarray(yj), yt.numpy(), atol=ATOL)


@pytest.mark.parametrize("conv_type", ["cheb_graph_conv", "graph_conv"])
def test_graph_conv_layer_parity(reference_modules, gso_dense, conv_type):
    c_in, c_out, ks = 64, 16, 3
    gso_t = torch.from_numpy(gso_dense)
    ref = reference_modules["layers"].GraphConvLayer(conv_type, c_in, c_out, ks, gso_t, True).eval()
    xt, xj = j2t_act((B, c_in, T, V), seed=6)
    with torch.no_grad():
        yt = ref(xt)
    gop = dense_graph_op(gso_dense)
    yj = L.GraphConvLayer(conv_type, c_out, ks, True).apply(
        {"params": gcl_params(ref, c_in, c_out)}, xj, gop)
    np.testing.assert_allclose(np.asarray(yj), yt.numpy().transpose(0, 2, 3, 1), atol=ATOL)


@pytest.mark.parametrize("act", ["glu", "gtu"])
@pytest.mark.parametrize("conv_type", ["cheb_graph_conv", "graph_conv"])
def test_st_conv_block_parity(reference_modules, gso_dense, act, conv_type):
    kt, ks, last_c, channels = 3, 3, 1, [64, 16, 64]
    gso_t = torch.from_numpy(gso_dense)
    ref = reference_modules["layers"].STConvBlock(
        kt, ks, V, last_c, channels, act, conv_type, gso_t, True, 0.5).eval()
    xt, xj = j2t_act((B, last_c, T, V), seed=7)
    with torch.no_grad():
        yt = ref(xt)
    gop = dense_graph_op(gso_dense)
    yj = L.STConvBlock(kt, ks, tuple(channels), act, conv_type, True, 0.5).apply(
        {"params": stblock_params(ref, last_c, channels)}, xj, gop, deterministic=True)
    np.testing.assert_allclose(np.asarray(yj), yt.numpy().transpose(0, 2, 3, 1), atol=ATOL)


def test_output_block_parity(reference_modules):
    ko, last_c, channels, end_c = 4, 64, [128, 128], 1
    ref = reference_modules["layers"].OutputBlock(
        ko, last_c, channels, end_c, V, "glu", True, 0.5).eval()
    xt, xj = j2t_act((B, last_c, ko, V), seed=8)
    with torch.no_grad():
        yt = ref(xt)  # [B, end_c, T=1, V]
    yj = L.OutputBlock(ko, tuple(channels), end_c, "glu", True, 0.5).apply(
        {"params": output_params(ref, last_c, channels)}, xj, deterministic=True)
    np.testing.assert_allclose(np.asarray(yj), yt.numpy().transpose(0, 2, 3, 1), atol=ATOL)


@pytest.mark.parametrize("conv_type", ["cheb_graph_conv", "graph_conv"])
@pytest.mark.parametrize("act", ["glu", "gtu"])
def test_full_model_parity(reference_modules, conv_type, act):
    """End-to-end forward parity of the full STGCN on a shipped graph."""
    n_his, kt, ks, stb = 12, 3, 3, 2
    adj = sp.load_npz("data/pemsd7-m/adj.npz")
    nv = 228
    gso = calc_gso(adj, "sym_norm_lap")
    if conv_type == "cheb_graph_conv":
        art = build_gso(adj, "sym_norm_lap", cheb=True)
        gso_np = art.to_dense()
    else:
        gso_np = gso.toarray().astype(np.float32)

    args = argparse.Namespace(Kt=kt, Ks=ks, act_func=act, graph_conv_type=conv_type,
                              gso=torch.from_numpy(gso_np), enable_bias=True,
                              droprate=0.5, n_his=n_his)
    ko = M.compute_ko(n_his, kt, stb)
    blocks = M.build_blocks(stb, ko)
    ref_cls = (reference_modules["models"].STGCNChebGraphConv
               if conv_type == "cheb_graph_conv"
               else reference_modules["models"].STGCNGraphConv)
    ref = ref_cls(args, blocks, nv).eval()

    params = {}
    for i in range(stb):
        params[f"st_block_{i}"] = stblock_params(ref.st_blocks[i], blocks[i][-1], blocks[i + 1])
    params["output"] = output_params(ref.output, blocks[-3][-1], blocks[-2])

    rng = np.random.default_rng(9)
    x = rng.standard_normal((B, 1, n_his, nv)).astype(np.float32)
    with torch.no_grad():
        yt = ref(torch.from_numpy(x))  # [B,1,1,V]

    model = M.STGCN(n_his=n_his, kt=kt, ks=ks, stblock_num=stb, act_func=act,
                    graph_conv_type=conv_type)
    gop = dense_graph_op(gso_np)
    yj = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     gop, deterministic=True)
    np.testing.assert_allclose(np.asarray(yj), yt.numpy().transpose(0, 2, 3, 1), atol=ATOL)


def test_param_count_matches_reference(reference_modules):
    """Same trainable parameter count as the reference default config."""
    n_his, kt, ks, stb, nv = 12, 3, 3, 2, 228
    args = argparse.Namespace(Kt=kt, Ks=ks, act_func="glu",
                              graph_conv_type="cheb_graph_conv",
                              gso=torch.zeros(nv, nv), enable_bias=True,
                              droprate=0.5, n_his=n_his)
    blocks = M.build_blocks(stb, M.compute_ko(n_his, kt, stb))
    ref = reference_modules["models"].STGCNChebGraphConv(args, blocks, nv)
    # exclude the never-called Align conv params the reference allocates
    # even when align is identity/zero-pad (torch creates them eagerly;
    # flax only materializes parameters that are used)
    used = sum(p.numel() for n, p in ref.named_parameters()
               if not _is_dead_align(ref, n))

    model = M.STGCN(n_his=n_his, kt=kt, ks=ks, stblock_num=stb)
    gop = dense_graph_op(np.zeros((nv, nv), np.float32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, n_his, nv, 1)),
                        gop, deterministic=True)
    ours = sum(p.size for p in jax.tree.leaves(params))
    assert ours == used


def _is_dead_align(ref, name):
    """True for align_conv params on paths where c_in <= c_out (unused)."""
    if "align" not in name or "align_conv" not in name:
        return False
    parts = name.split(".")
    mod = ref
    for p in parts[:-1]:
        mod = getattr(mod, p) if not p.isdigit() else mod[int(p)]
    # we walked to the Conv2d; its parent Align knows c_in/c_out
    parent = ref
    for p in parts[:-2]:
        parent = getattr(parent, p) if not p.isdigit() else parent[int(p)]
    return parent.c_in <= parent.c_out
