"""Checkpoint / resume.

The reference persists only ``model.state_dict()`` at val-loss improvements
(`script/earlystopping.py:44-48`) — no optimizer state, no resume. Here a
checkpoint is the *full* training state: params, optimizer state, epoch,
early-stop state, PRNG key, and scaler statistics, saved with Orbax
(sharded-array aware, multi-host safe), with true resume.

Layout: ``<dir>/best`` (weights at best val loss — what `test` reloads,
`main.py:198`) and ``<dir>/latest`` (full state for resume).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_abs(path: str) -> str:
    return os.path.abspath(path)


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = _to_abs(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- best weights (early-stopping checkpoint) -------------------------
    def save_best(self, params: Any) -> None:
        path = os.path.join(self.directory, "best")
        self._ckptr.save(path, params, force=True)
        self._ckptr.wait_until_finished()

    def restore_best(self, template: Any) -> Any:
        path = os.path.join(self.directory, "best")
        return self._ckptr.restore(path, template)

    def has_best(self) -> bool:
        return os.path.exists(os.path.join(self.directory, "best"))

    # -- full train state (resume) ----------------------------------------
    def save_state(self, pytree_state: Any, host_state: dict) -> None:
        path = os.path.join(self.directory, "latest")
        self._ckptr.save(path, pytree_state, force=True)
        self._ckptr.wait_until_finished()
        with open(os.path.join(self.directory, "host_state.json"), "w") as f:
            json.dump(host_state, f)

    def restore_state(self, template: Any) -> tuple[Any, dict]:
        path = os.path.join(self.directory, "latest")
        state = self._ckptr.restore(path, template)
        with open(os.path.join(self.directory, "host_state.json")) as f:
            host = json.load(f)
        return state, host

    def has_state(self) -> bool:
        return (os.path.exists(os.path.join(self.directory, "latest"))
                and os.path.exists(os.path.join(self.directory, "host_state.json")))


def params_histogram(params: Any) -> dict:
    """Small debug summary (per-leaf norms) for checkpoint sanity checks."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {jax.tree_util.keystr(k): float(np.linalg.norm(np.asarray(v)))
            for k, v in flat}
