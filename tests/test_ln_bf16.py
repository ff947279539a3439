"""bf16 LayerNorm-affine parameter mode (VERDICT r4 next #7).

At 1M vertices the per-vertex [V, C] LN affine params are 99.9% of all
parameters (2.06 GB f32; `model/layers.py:246` is the reference design
that creates this cost). ``STGCN(ln_param_dtype=bf16)`` halves them.
These tests pin (a) the dtype plumbing end-to-end through init / apply /
grads / the fused path, and (b) that the short-horizon loss trajectory
tracks the f32-param trajectory closely (the production-mode evidence;
the measured memory delta lives in BASELINE.md r5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.nn.model import STGCN
from stgcn_tpu.ops import dense_graph_op


def _setup(ln_dtype):
    adj = random_road_graph(120, k_neighbors=4, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    gop = dense_graph_op(art)
    model = STGCN(n_his=12, ln_param_dtype=ln_dtype)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 12, 120, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 120)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, gop,
                        deterministic=True)["params"]
    return model, gop, params, x, y


def test_ln_param_dtype_plumbing():
    model, gop, params, x, _ = _setup(jnp.bfloat16)
    for path in ("st_block_0", "st_block_1"):
        assert params[path]["ln"]["scale"].dtype == jnp.bfloat16
        assert params[path]["ln"]["bias"].dtype == jnp.bfloat16
    assert params["output"]["ln"]["scale"].dtype == jnp.bfloat16
    # non-LN params stay f32 (mixed precision keeps master weights f32)
    assert params["st_block_0"]["tmp_conv1"]["causal_conv"]["kernel"].dtype \
        == jnp.float32
    g = jax.grad(lambda p: jnp.mean(model.apply(
        {"params": p}, x, gop, deterministic=True) ** 2))(params)
    assert g["st_block_0"]["ln"]["scale"].dtype == jnp.bfloat16


def test_ln_bf16_loss_trajectory_tracks_f32():
    traj = {}
    for dt in (jnp.float32, jnp.bfloat16):
        model, gop, params, x, y = _setup(dt)
        tx = optax.adamw(1e-3, weight_decay=1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, s):
            def loss(pp):
                pred = model.apply({"params": pp}, x, gop,
                                   deterministic=True)
                return jnp.mean((pred.reshape(len(x), -1) - y) ** 2)

            l, grads = jax.value_and_grad(loss)(p)
            up, s2 = tx.update(grads, s, p)
            return optax.apply_updates(p, up), s2, l

        losses = []
        for _ in range(12):
            params, opt, l = step(params, opt)
            losses.append(float(l))
        traj[dt.__name__] = np.asarray(losses)

    f32, bf16 = traj["float32"], traj["bfloat16"]
    assert np.all(np.isfinite(bf16))
    # same decreasing shape, small relative drift over a short horizon
    assert bf16[-1] < bf16[0]
    np.testing.assert_allclose(bf16, f32, rtol=0.05)


def test_ln_bf16_fused_sparse_forward():
    from stgcn_tpu.nn.fused_sparse import fused_sparse_forward
    from stgcn_tpu.ops.graph_op import ell_graph_op

    adj = random_road_graph(300, k_neighbors=4, seed=2)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    dop = dense_graph_op(art)
    gop = ell_graph_op(art, block_size=64, use_pallas=False)
    model = STGCN(n_his=12, ln_param_dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 12, 300, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, dop,
                        deterministic=True)["params"]
    y_ref = model.apply({"params": params}, x, dop, deterministic=True)
    y_f = fused_sparse_forward(params, x, gop, model, deterministic=True,
                               interpret=True)
    scale = float(np.max(np.abs(np.asarray(y_ref)))) or 1.0
    assert float(np.max(np.abs(np.asarray(y_f) - np.asarray(y_ref)))) \
        < 5e-3 * max(scale, 1.0)
