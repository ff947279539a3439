"""Dataset loading and window supervision.

Mirrors the reference semantics (`script/dataloader.py`, `main.py:96-133`)
with a TPU-first batching design: instead of materializing every sliding
window up front (the reference copies the series 12× into a
``[num, 1, n_his, V]`` tensor, `dataloader.py:39-46`), the raw series lives
on device once and windows are *gathered inside the jitted step* from batch
start indices — ~``n_his``× less HBM traffic and no host→device transfer in
the hot loop.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

# Reference hard-codes these (`script/dataloader.py:13-18`).
KNOWN_DATASETS = {"metr-la": 207, "pems-bay": 325, "pemsd7-m": 228}


def load_adj(dataset: str, data_root: str = "data") -> tuple[sp.csr_matrix, int]:
    """Load ``<root>/<dataset>/adj.npz``; returns (csr_matrix, n_vertex)."""
    path = os.path.join(data_root, dataset, "adj.npz")
    adj = sp.load_npz(path).tocsr()
    n_vertex = adj.shape[0]
    expect = KNOWN_DATASETS.get(dataset)
    if expect is not None and n_vertex != expect:
        raise ValueError(f"{dataset}: adjacency has {n_vertex} vertices, expected {expect}")
    return adj, n_vertex


def load_vel(dataset: str, data_root: str = "data") -> np.ndarray:
    """Load the speed series ``[T, V]`` from ``vel.csv``.

    Uses the same pandas semantics as the reference (`dataloader.py:25`):
    the first CSV line is consumed as a header.
    """
    import pandas as pd

    path = os.path.join(data_root, dataset, "vel.csv")
    return pd.read_csv(path).to_numpy(dtype=np.float64)


def split_lengths(n_total: int, val_rate: float = 0.15, test_rate: float = 0.15
                  ) -> tuple[int, int, int]:
    """70/15/15 chronological split with floor semantics (`main.py:110-114`)."""
    len_val = int(math.floor(n_total * val_rate))
    len_test = int(math.floor(n_total * test_rate))
    return n_total - len_val - len_test, len_val, len_test


def chrono_split(data: np.ndarray, val_rate: float = 0.15, test_rate: float = 0.15):
    n_train, n_val, _ = split_lengths(len(data), val_rate, test_rate)
    return data[:n_train], data[n_train:n_train + n_val], data[n_train + n_val:]


@dataclasses.dataclass
class ZScoreScaler:
    """Per-sensor standardization, numerically equal to sklearn
    ``StandardScaler`` (fit on train only, `main.py:117-120`): mean and
    population std (ddof=0); constant columns get scale 1."""

    mean_: np.ndarray | None = None
    scale_: np.ndarray | None = None

    def fit(self, data: np.ndarray) -> "ZScoreScaler":
        self.mean_ = data.mean(axis=0)
        std = data.std(axis=0)
        self.scale_ = np.where(std == 0.0, 1.0, std)
        return self

    def fit_transform(self, data: np.ndarray) -> np.ndarray:
        return self.fit(data).transform(data)

    def transform(self, data):
        return (data - self.mean_) / self.scale_

    def inverse_transform(self, data):
        return data * self.scale_ + self.mean_


def window_starts(n_steps: int, n_his: int, n_pred: int) -> np.ndarray:
    """Valid window start indices.

    ``num = T − n_his − n_pred`` windows (`dataloader.py:37` — note the
    reference drops one extra valid window; mirrored for parity)."""
    num = n_steps - n_his - n_pred
    return np.arange(max(num, 0), dtype=np.int32)


def make_windows(data: np.ndarray, n_his: int, n_pred: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Materialized windows ``x [num, n_his, V]``, ``y [num, V]``
    (`dataloader.py:32-48`): ``y[i] = data[i + n_his + n_pred − 1]``."""
    starts = window_starts(len(data), n_his, n_pred)
    x = np.stack([data[s:s + n_his] for s in starts]) if len(starts) else \
        np.zeros((0, n_his, data.shape[1]), data.dtype)
    y = data[starts + n_his + n_pred - 1] if len(starts) else \
        np.zeros((0, data.shape[1]), data.dtype)
    return x, y


def gather_windows(series: jax.Array, starts: jax.Array, n_his: int, n_pred: int
                   ) -> tuple[jax.Array, jax.Array]:
    """In-jit window gather: ``x [b, n_his, V, 1]``, ``y [b, V]``."""
    idx = starts[:, None] + jnp.arange(n_his)[None, :]
    x = series[idx][..., None]
    y = series[starts + n_his + n_pred - 1]
    return x, y


@dataclasses.dataclass
class ForecastDataset:
    """A split's series on device plus its window index set."""

    series: jax.Array  # [T, V] normalized
    n_his: int
    n_pred: int

    @property
    def num_windows(self) -> int:
        return max(int(self.series.shape[0]) - self.n_his - self.n_pred, 0)

    @property
    def n_vertex(self) -> int:
        return int(self.series.shape[1])

    def batches(self, batch_size: int, *, shuffle: bool = False,
                rng: np.random.Generator | None = None):
        """Yield ``(starts [batch_size], n_valid)`` index batches.

        Every batch has identical shape (the tail batch is padded by
        repeating its first index; ``n_valid`` masks the padding in the
        loss) so the jitted step compiles exactly once. ``shuffle=False``
        matches the reference's reproducibility quirk (`main.py:127`).
        """
        starts = window_starts(int(self.series.shape[0]), self.n_his, self.n_pred)
        if shuffle:
            if rng is None:
                rng = np.random.default_rng(0)
            starts = rng.permutation(starts)
        for i in range(0, len(starts), batch_size):
            chunk = starts[i:i + batch_size]
            n_valid = len(chunk)
            if n_valid < batch_size:
                chunk = np.concatenate(
                    [chunk, np.full(batch_size - n_valid, chunk[0], np.int32)])
            yield jnp.asarray(chunk), n_valid
