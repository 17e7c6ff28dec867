"""Checkpointing (orbax) for the mean-teacher training state.

Replaces Lightning's ModelCheckpoint + the reference's side-channel raw
state_dict embedding (train_pretrained.py:498-505, sed_trainer_pretrained.py
:823-826) with orbax checkpoints carrying the FULL state: student + teacher
params, BN stats for both, optimizer state, step, fitted scaler stats, and
the label-encoder state_dict — everything needed for exact resume
(SURVEY.md §5 checkpoint/resume).

Keeps top-1 (by objective metric, mode max) + last, like the reference.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np


def _tree_to_numpy(tree):
    # device_get starts async copies for every leaf before blocking, so the
    # fetch pipelines across the device link (per-leaf np.asarray costs one
    # round-trip each — seconds per save through the tunneled TPU)
    return jax.tree_util.tree_map(
        np.asarray, jax.device_get(tree)
    )


class CheckpointManager:
    def __init__(self, directory, top_k: int = 1, mode: str = "max"):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.mode = mode
        self._ckptr = ocp.PyTreeCheckpointer()
        self._scores: dict[str, float] = {}
        self._meta_path = self.directory / "manager.json"
        if self._meta_path.exists():
            self._scores = json.loads(self._meta_path.read_text()).get("scores", {})

    def _is_better(self, a: float, b: float) -> bool:
        return a > b if self.mode == "max" else a < b

    def save(self, state, metadata: dict | None = None, name: str = "last"):
        """Save a full state under `name` (overwrites)."""
        path = self.directory / name
        if path.exists():
            import shutil

            shutil.rmtree(path)
        payload = {"state": _tree_to_numpy(state)}
        self._ckptr.save(path, payload)
        if metadata is not None:
            (self.directory / f"{name}.meta.json").write_text(
                json.dumps(metadata, default=float)
            )

    def save_if_best(self, state, score: float, metadata: dict | None = None) -> bool:
        """Keep the single best checkpoint by score. Returns True if saved."""
        best = self._scores.get("best")
        if best is None or self._is_better(score, best):
            self._scores["best"] = float(score)
            self._meta_path.write_text(json.dumps({"scores": self._scores}))
            meta = dict(metadata or {})
            meta["score"] = float(score)
            self.save(state, meta, name="best")
            return True
        return False

    def restore(self, name: str = "last", template: Any = None):
        """Restore a state; pass `template` (a matching pytree) to get proper
        dtypes/structure back. Only the template's structure/shapes/dtypes are
        used, so donated (deleted) arrays are fine as templates."""
        path = self.directory / name
        if template is not None:
            skeleton = jax.tree_util.tree_map(
                lambda x: (
                    np.zeros(x.shape, x.dtype)
                    if hasattr(x, "shape") and hasattr(x, "dtype")
                    else x
                ),
                template,
            )
            payload = self._ckptr.restore(path, item={"state": skeleton})
        else:
            payload = self._ckptr.restore(path)
        return payload["state"]

    def metadata(self, name: str = "last") -> dict:
        p = self.directory / f"{name}.meta.json"
        return json.loads(p.read_text()) if p.exists() else {}

    def exists(self, name: str = "last") -> bool:
        return (self.directory / name).exists()
