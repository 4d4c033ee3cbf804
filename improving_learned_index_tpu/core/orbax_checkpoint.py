"""Orbax-backed checkpointing (optional backend).

The default backend (core.checkpoint) writes msgpack snapshots; this variant
uses orbax for **async** saves of sharded param/optimizer trees — the
TPU-idiomatic equivalent of the reference's torch.save monolith
(SURVEY.md §5 checkpoint/resume), keeping the same latest/step/best/final
semantics.  Device-to-host transfer overlaps training; ``wait()`` (or the
next save) joins the in-flight write.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax

from .logging import get_logger

logger = get_logger("orbax_checkpoint", stream=False)

LATEST = "latest"


class OrbaxCheckpointManager:
    """Async sharded checkpointing with latest/step/best/final snapshots."""

    def __init__(
        self,
        checkpoint_dir: Union[str, Path],
        name: str = "DeepImpact",
        save_every: int = 1,
        save_best: bool = False,
        batch_size: int = 0,
    ):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.checkpoint_dir = Path(checkpoint_dir).resolve()
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.name = name
        self.save_every = save_every
        self.save_best = save_best
        self.batch_size = batch_size
        self.step = 0
        self.best_metric = float("inf")
        self._checkpointer = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def _path(self, suffix: str) -> Path:
        return self.checkpoint_dir / f"{self.name}_{suffix}"

    def _meta_path(self, suffix: str) -> Path:
        return self.checkpoint_dir / f"{self.name}_{suffix}.meta.json"

    def exists(self) -> bool:
        return self._path(LATEST).exists()

    def wait(self) -> None:
        self._checkpointer.wait_until_finished()

    def save(
        self,
        suffix: str,
        params: Any,
        opt_state: Any = None,
        metric: Optional[float] = None,
    ) -> None:
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        self._checkpointer.save(self._path(suffix), payload, force=True)
        meta = {
            "step": self.step,
            "batch_size": self.batch_size,
            "has_opt_state": opt_state is not None,
        }
        if metric is not None:
            meta["metric"] = metric
        with open(self._meta_path(suffix), "w") as f:
            json.dump(meta, f)
        logger.info(f"async checkpoint started: {self._path(suffix).name}")

    def on_step(self, params, opt_state=None, metric: Optional[float] = None) -> None:
        self.step += 1
        if self.step % self.save_every == 0:
            self.save(str(self.step), params, opt_state, metric)
            self.save(LATEST, params, opt_state, metric)
        if self.save_best and metric is not None and metric < self.best_metric:
            self.best_metric = metric
            self.save("best", params, opt_state, metric)

    def load(
        self, like_params: Any, like_opt_state: Any = None, suffix: str = LATEST
    ) -> Dict[str, Any]:
        self.wait()
        template = {"params": like_params}
        mp = self._meta_path(suffix)
        meta = {}
        if mp.exists():
            with open(mp) as f:
                meta = json.load(f)
        if like_opt_state is not None and meta.get("has_opt_state", True):
            template["opt_state"] = like_opt_state
        restored = self._checkpointer.restore(self._path(suffix), args=self._ocp.args.StandardRestore(template))
        self.step = int(meta.get("step", 0))
        self.batch_size = int(meta.get("batch_size", self.batch_size))
        if "metric" in meta:
            self.best_metric = float(meta["metric"])
        return {
            "params": restored["params"],
            "opt_state": restored.get("opt_state"),
            "step": self.step,
            "batch_size": self.batch_size,
        }

    def rescale_step_for_batch(self, new_global_batch: int) -> int:
        if self.batch_size:
            self.step = (self.step * self.batch_size) // new_global_batch
        self.batch_size = new_global_batch
        return self.step
