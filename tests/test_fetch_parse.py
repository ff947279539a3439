"""Offline fixture tests for the real-dataset fetch pipeline's parse and
write stages (scripts/fetch_datasets.py).

Zero egress blocks the actual downloads (the only reference capability
not yet demonstrably matched — SURVEY §6); these tests keep the path
warm so the parity oracle lands the moment a network exists: the zip
and h5 decode stages run against synthetic fixtures shaped like the
upstream artifacts, and the written vel.csv round-trips through
``stgcn_tpu.data.datasets.load_vel`` losslessly.
"""

import importlib.util
import io
import os
import sys
import zipfile

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "fetch_datasets", os.path.join(ROOT, "scripts", "fetch_datasets.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_sources_match_reference_readme():
    """The URLs/ids must track the reference README (`README.md:40-44`)."""
    readme = os.path.join("/root/reference", "README.md")
    if not os.path.exists(readme):
        pytest.skip("reference not mounted")
    txt = open(readme).read()
    m = _mod()
    assert m.SOURCES["metr-la"]["gdrive_id"] in txt
    assert m.SOURCES["pems-bay"]["gdrive_id"] in txt
    assert "data_loader/PeMS-M.zip" in txt
    assert m.SOURCES["pemsd7-m"]["url"].endswith("data_loader/PeMS-M.zip")


def test_parse_zip_fixture_roundtrip(tmp_path):
    """PeMSD7(M) path: zip(V_228.csv) → parse → vel.csv → load_vel."""
    from stgcn_tpu.data import datasets as D

    m = _mod()
    rng = np.random.default_rng(0)
    series = np.round(rng.uniform(3.0, 80.0, size=(24, 228)), 4)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("V_228.csv",
                   "\n".join(",".join(f"{v:.4f}" for v in row)
                             for row in series))
    data = m.parse_blob(buf.getvalue(), kind="zip", n_vertex=228,
                        member="V_228.csv")
    np.testing.assert_allclose(data, series, atol=1e-12)

    m.write_vel(data, "pemsd7-m", str(tmp_path))
    back = D.load_vel("pemsd7-m", str(tmp_path))
    assert back.shape == (24, 228)  # header row NOT eaten from the data
    np.testing.assert_allclose(back, series, rtol=1e-5)


def test_parse_h5_fixture_roundtrip(tmp_path):
    """METR-LA/PEMS-BAY path: pandas h5 speed dataframe → parse."""
    pd = pytest.importorskip("pandas")
    pytest.importorskip("tables")
    m = _mod()
    rng = np.random.default_rng(1)
    series = rng.uniform(0.0, 70.0, size=(16, 207))
    df = pd.DataFrame(series)
    h5 = tmp_path / "metr-la.h5"
    df.to_hdf(str(h5), key="df")
    data = m.parse_blob(h5.read_bytes(), kind="h5", n_vertex=207)
    np.testing.assert_allclose(data, series, atol=1e-12)


def test_parse_blob_rejects_wrong_sensor_count():
    m = _mod()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("V_228.csv", "1.0,2.0\n3.0,4.0")
    with pytest.raises(AssertionError):
        m.parse_blob(buf.getvalue(), kind="zip", n_vertex=228,
                     member="V_228.csv")
