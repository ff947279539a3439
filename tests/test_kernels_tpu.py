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
