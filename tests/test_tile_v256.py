"""tile_v=256 / explicit b_tile parity (the round-5 100k step lever:
halved vertex-grid step count, 95.3 -> 88.2 ms measured on TPU —
BASELINE.md r5). CPU: Pallas interpret mode against the unfused oracle,
plus config plumbing through TrainConfig/CLI."""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering
from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
from stgcn_tpu.nn.model import STGCN
from stgcn_tpu.ops.graph_op import banded_graph_op

B, T = 2, 12


def _setup(v=300):
    adj = random_road_graph(v, k_neighbors=4, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    art = dataclasses.replace(
        art, matrix=permute_matrix(art.matrix, rcm_ordering(art.matrix)))
    gop = banded_graph_op(art, block_size=128, use_pallas=False)
    model = STGCN(n_his=T)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, v, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), x, gop,
                        deterministic=True)["params"]
    return model, gop, x, params


def test_tile_v256_forward_parity():
    model, gop, x, params = _setup()
    y_ref = model.apply({"params": params}, x, gop, deterministic=True)
    y_f = fused_sparse_forward(params, x, gop, model, deterministic=True,
                               interpret=True, tile_v=256, b_tile=B)
    np.testing.assert_allclose(y_f, y_ref, atol=2e-4, rtol=2e-4)


def test_tile_v256_grads_match_autodiff():
    model, gop, x, params = _setup()

    def loss_ref(p):
        y = model.apply({"params": p}, x, gop, deterministic=True)
        return jnp.sum(y * jnp.cos(y))

    def loss_f(p):
        y = fused_sparse_forward(p, x, gop, model, deterministic=True,
                                 interpret=True, tile_v=256, b_tile=B)
        return jnp.sum(y * jnp.cos(y))

    g_ref = jax.grad(loss_ref)(params)
    g_f = jax.grad(loss_f)(params)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_f)
    np.testing.assert_allclose(flat_f, flat_r, atol=5e-3, rtol=5e-3)


def test_train_config_threads_tiling():
    """TrainConfig.fused_tile_v/fused_b_tile reach fused_sparse_forward
    (and default to the kernel's own choices when None)."""
    from stgcn_tpu.train.loop import TrainConfig

    cfg = TrainConfig(fused=True, fused_tile_v=256, fused_b_tile=4)
    assert cfg.fused_tile_v == 256 and cfg.fused_b_tile == 4
    assert TrainConfig().fused_tile_v is None


def test_cli_flags_parse():
    from stgcn_tpu.cli.main import config_from_args, get_parameters

    args = get_parameters(["--dataset", "metr-la", "--fused", "true",
                           "--fused_tile_v", "256", "--fused_b_tile", "8"])
    cfg = config_from_args(args)
    assert cfg.fused_tile_v == 256
    assert cfg.fused_b_tile == 8
    cfg0 = config_from_args(get_parameters(["--dataset", "metr-la"]))
    assert cfg0.fused_tile_v is None and cfg0.fused_b_tile is None
