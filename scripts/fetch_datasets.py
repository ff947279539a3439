#!/usr/bin/env python
"""Fetch the real traffic-speed series (vel.csv) for the three datasets
and freeze the reference's test line as the accuracy-parity oracle.

The dev snapshot strips vel.csv (`/root/reference/.MISSING_LARGE_BLOBS`)
and this environment has zero egress, so the script cannot run here — it
exists so the parity oracle lands the moment a network is available:

    python scripts/fetch_datasets.py --data-root data
    python scripts/fetch_datasets.py --freeze-oracle  # runs the reference

Sources (from the reference `README.md:40-44`):
- METR-LA / PEMS-BAY: h5 files from the DCRNN author's Google Drive
  (convert: the speed dataframe's values, CSV rows=timesteps,
  cols=sensors, no header in the reference layout).
- PeMSD7(M): VeritasYin/STGCN_IJCAI-18 `data_loader/PeMS-M.zip`
  (contains V_228.csv → vel.csv directly).

Expected shapes (sensors must match data/<ds>/adj.npz): metr-la
[34272, 207], pems-bay [52116, 325], pemsd7-m [12672, 228].
"""

from __future__ import annotations

import argparse
import io
import os
import subprocess
import sys
import zipfile

SOURCES = {
    # Google Drive file ids from the reference README links
    "metr-la": {"gdrive_id": "1pAGRfzMx6K9WWsfDcD1NMbIif0T0saFC",
                "kind": "h5", "n_vertex": 207},
    "pems-bay": {"gdrive_id": "1wD-mHlqAb2mtHOe_68fZvDh1LpDegMMq",
                 "kind": "h5", "n_vertex": 325},
    "pemsd7-m": {"url": ("https://github.com/VeritasYin/STGCN_IJCAI-18/"
                         "raw/master/data_loader/PeMS-M.zip"),
                 "kind": "zip", "member": "V_228.csv", "n_vertex": 228},
}


def _download(url: str) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url, timeout=120) as r:
        return r.read()


def _gdrive(file_id: str) -> bytes:
    # direct-download endpoint; large files may need the confirm token
    url = f"https://drive.google.com/uc?export=download&id={file_id}"
    return _download(url)


def parse_blob(blob: bytes, *, kind: str, n_vertex: int,
               member: str | None = None):
    """Decode a downloaded artifact into the [T, n_vertex] speed array.

    Split from the network stage so the parsing path is testable offline
    against fixtures (VERDICT r4 next #8 — keep the real-data path warm
    while egress is blocked)."""
    import numpy as np

    if kind == "zip":
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            data = np.loadtxt(io.BytesIO(z.read(member)), delimiter=",")
    elif kind == "h5":
        import tempfile

        import pandas as pd

        # pandas HDF needs a real file path (pytables has no BytesIO API)
        with tempfile.NamedTemporaryFile(suffix=".h5") as f:
            f.write(blob)
            f.flush()
            df = pd.read_hdf(f.name)
        data = df.values
    else:
        raise ValueError(f"unknown artifact kind {kind!r}")
    assert data.ndim == 2 and data.shape[1] == n_vertex, data.shape
    return data


def write_vel(data, dataset: str, data_root: str) -> str:
    import numpy as np

    out = os.path.join(data_root, dataset, "vel.csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # header row of sensor ids: load_vel (like the reference's pd.read_csv,
    # `dataloader.py:25`) consumes the first CSV line as a header — a
    # headerless file would silently lose its first timestep
    header = ",".join(str(i) for i in range(data.shape[1]))
    np.savetxt(out, data, delimiter=",", fmt="%.6g", header=header,
               comments="")
    print(f"wrote {out} {data.shape}")
    return out


def fetch(dataset: str, data_root: str) -> str:
    spec = SOURCES[dataset]
    blob = _download(spec["url"]) if spec["kind"] == "zip" \
        else _gdrive(spec["gdrive_id"])
    data = parse_blob(blob, kind=spec["kind"], n_vertex=spec["n_vertex"],
                      member=spec.get("member"))
    return write_vel(data, dataset, data_root)


def freeze_oracle(dataset: str = "pemsd7-m",
                  reference: str = "/root/reference") -> None:
    """Run the reference end-to-end (deterministic: seed 42, no shuffle)
    and append its printed test line to BASELINE.md as the frozen oracle."""
    r = subprocess.run([sys.executable, "main.py", "--dataset", dataset,
                        "--epochs", "1000"],
                       cwd=reference, capture_output=True, text=True)
    line = next((ln for ln in r.stdout.splitlines() if "Test loss" in ln), None)
    if line is None:
        sys.exit(f"reference run produced no test line:\n{r.stdout[-2000:]}")
    with open("BASELINE.md", "a") as f:
        f.write(f"\n## Frozen reference oracle ({dataset})\n\n"
                f"```\n{line}\n```\n")
    print("frozen:", line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--datasets", nargs="+",
                    default=["pemsd7-m", "metr-la", "pems-bay"])
    ap.add_argument("--freeze-oracle", action="store_true")
    args = ap.parse_args()
    for ds in args.datasets:
        fetch(ds, args.data_root)
    if args.freeze_oracle:
        freeze_oracle()


if __name__ == "__main__":
    main()
