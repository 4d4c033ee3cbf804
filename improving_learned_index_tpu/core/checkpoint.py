"""Checkpointing with latest/step/best/final semantics + training resume.

TPU-native replacement for the reference's torch.save monolith
(src/utils/checkpoint.py:11-139): parameters and optimizer state serialize as
flax msgpack; step and batch_size metadata ride along so resume can rescale
the step when the global batch changes (reference training/trainer.py:63-66).

Snapshot suffixes match the reference: ``<name>_latest``, ``<name>_<step>``,
``<name>_best`` (lowest metric), ``<name>_final``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np
from flax import serialization

from .logging import get_logger

logger = get_logger("checkpoint", stream=False)

EXTENSION = "msgpack"
LATEST_SNAPSHOT_SUFFIX = "latest"


def save_params(path: Union[str, Path], params: Any) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_params))


def _unwrap_payload(restored: Any) -> Any:
    """Unwrap a CheckpointManager payload ({'params', 'opt_state'?}) to bare
    params, so trainer-produced checkpoints feed index/rank/rerank CLIs the
    way the reference's ModelCheckpoint.load unwraps model_state_dict
    (src/utils/checkpoint.py:86-139)."""
    if (
        isinstance(restored, dict)
        and "params" in restored
        and set(restored) <= {"params", "opt_state"}
    ):
        return restored["params"]
    return restored


def load_params(path: Union[str, Path], like: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if like is None:
        return _unwrap_payload(serialization.msgpack_restore(data))
    template = jax.device_get(like)
    try:
        return serialization.from_bytes(template, data)
    except ValueError:
        # Structure mismatch: likely a wrapped CheckpointManager payload.
        restored = _unwrap_payload(serialization.msgpack_restore(data))
        return serialization.from_state_dict(template, restored)


class CheckpointManager:
    """Save/restore (params, opt_state, step, batch_size) snapshots."""

    def __init__(
        self,
        checkpoint_dir: Union[str, Path],
        name: str = "DeepImpact",
        save_every: int = 1,
        save_best: bool = False,
        save_latest_snapshot: bool = True,
        batch_size: int = 0,
    ):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.name = name
        self.save_every = save_every
        self.save_best = save_best
        self.save_latest_snapshot = save_latest_snapshot
        self.batch_size = batch_size
        self.step = 0
        self.best_metric = float("inf")

    # -- paths ---------------------------------------------------------------
    def _path(self, suffix: str) -> Path:
        return self.checkpoint_dir / f"{self.name}_{suffix}.{EXTENSION}"

    def _meta_path(self, suffix: str) -> Path:
        return self.checkpoint_dir / f"{self.name}_{suffix}.meta.json"

    @property
    def latest_path(self) -> Path:
        return self._path(LATEST_SNAPSHOT_SUFFIX)

    def exists(self) -> bool:
        return self.latest_path.exists()

    # -- save ------------------------------------------------------------------
    def save(
        self,
        suffix: str,
        params: Any,
        opt_state: Any = None,
        metric: Optional[float] = None,
    ) -> None:
        payload = {"params": jax.device_get(params)}
        if opt_state is not None:
            payload["opt_state"] = jax.device_get(opt_state)
        with open(self._path(suffix), "wb") as f:
            f.write(serialization.to_bytes(payload))
        meta = {
            "step": self.step,
            "batch_size": self.batch_size,
            "has_opt_state": opt_state is not None,
        }
        if metric is not None:
            meta["metric"] = metric
        with open(self._meta_path(suffix), "w") as f:
            json.dump(meta, f)
        logger.info(f"saved checkpoint {self._path(suffix).name}")

    def on_step(
        self, params: Any, opt_state: Any = None, metric: Optional[float] = None
    ) -> None:
        """Per-step callback (reference checkpoint.py:55-66)."""
        self.step += 1
        if self.step % self.save_every == 0:
            self.save(str(self.step), params, opt_state, metric)
            if self.save_latest_snapshot:
                self.save(LATEST_SNAPSHOT_SUFFIX, params, opt_state, metric)
        if self.save_best and metric is not None and metric < self.best_metric:
            self.best_metric = metric
            self.save("best", params, opt_state, metric)

    # -- load ------------------------------------------------------------------
    def load(
        self,
        like_params: Any,
        like_opt_state: Any = None,
        suffix: str = LATEST_SNAPSHOT_SUFFIX,
    ) -> Dict[str, Any]:
        with open(self._path(suffix), "rb") as f:
            data = f.read()
        template = {"params": jax.device_get(like_params)}
        meta = {}
        mp = self._meta_path(suffix)
        if mp.exists():
            with open(mp) as f:
                meta = json.load(f)
        if like_opt_state is not None and meta.get("has_opt_state", True):
            template["opt_state"] = jax.device_get(like_opt_state)
        restored = serialization.from_bytes(template, data)
        self.step = int(meta.get("step", 0))
        self.batch_size = int(meta.get("batch_size", self.batch_size))
        if "metric" in meta:
            self.best_metric = float(meta["metric"])
        logger.info(f"restored checkpoint {self._path(suffix).name} at step {self.step}")
        return {
            "params": restored["params"],
            "opt_state": restored.get("opt_state"),
            "step": self.step,
            "batch_size": self.batch_size,
        }

    def rescale_step_for_batch(self, new_global_batch: int) -> int:
        """Resume step rescaling when the global batch size changed
        (reference trainer.py:63-66)."""
        if self.batch_size:
            self.step = (self.step * self.batch_size) // new_global_batch
        self.batch_size = new_global_batch
        return self.step
