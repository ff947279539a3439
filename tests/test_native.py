"""Native C++ packer: exact equality with the Python/scipy packer."""

import numpy as np
import pytest

from stgcn_tpu import native
from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.packing import pack_bcsr


@pytest.mark.skipif(not native.available(), reason="native build unavailable")
@pytest.mark.parametrize("n,bs", [(100, 32), (300, 64), (1000, 128), (999, 128)])
def test_native_pack_matches_python(n, bs):
    art = build_gso(random_road_graph(n, k_neighbors=5, seed=1),
                    "sym_norm_lap", cheb=True)
    d_py, c_py, n_py = pack_bcsr(art.matrix, block_size=bs, use_native=False)
    d_na, c_na, n_na = pack_bcsr(art.matrix, block_size=bs, use_native=True)
    np.testing.assert_array_equal(n_py, n_na)
    # slot order is not canonical in the scipy path (tobsr doesn't sort
    # block columns); compare after sorting live slots per row
    for i in range(c_py.shape[0]):
        k = n_py[i]
        o_py, o_na = np.argsort(c_py[i, :k]), np.argsort(c_na[i, :k])
        np.testing.assert_array_equal(c_py[i, o_py], c_na[i, o_na])
        np.testing.assert_allclose(d_py[i, o_py].astype(np.float32),
                                   d_na[i, o_na], atol=1e-7)
        np.testing.assert_array_equal(d_na[i, k:], 0.0)


@pytest.mark.skipif(not native.available(), reason="native build unavailable")
def test_native_pack_speed():
    import time

    art = build_gso(random_road_graph(20000, k_neighbors=6, seed=2),
                    "sym_norm_lap", cheb=True)
    t0 = time.time()
    pack_bcsr(art.matrix, block_size=128, use_native=True)
    dt_native = time.time() - t0
    t0 = time.time()
    pack_bcsr(art.matrix, block_size=128, use_native=False)
    dt_python = time.time() - t0
    # native should never be slower; typically ~10x faster
    assert dt_native <= dt_python * 1.5
