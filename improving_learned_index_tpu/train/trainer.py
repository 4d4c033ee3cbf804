"""Data-parallel training loop.

TPU-native redesign of the reference Trainer hierarchy
(src/deep_impact/training/trainer.py and its 4 subclasses): one jitted
``train_step`` covering every objective, with parallelism expressed as
sharding constraints instead of process groups:

- DDP gradient all-reduce (reference trainer.py:79,183-186) -> the batch is
  sharded over the mesh ``data`` axis and XLA inserts the gradient psum over
  ICI during the jit of ``value_and_grad``;
- AMP autocast + GradScaler (trainer.py:89,101,107) -> bf16 matmul policy in
  the model; fp32 master params and loss, no scaler needed;
- grad-accumulation, clip-norm 2.0, periodic evaluator runs, JSON-lines
  metrics, latest/step/best/final checkpoints, and resume-with-skip-replay
  keep the reference semantics (trainer.py:92-150).
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import CheckpointManager
from ..core.config import TrainConfig
from ..core.logging import get_logger
from ..parallel.mesh import data_sharding, replicated, single_device_mesh
from .losses import distil_kl, distil_margin_mse, pairwise_ce

logger = get_logger("trainer")


def masked_doc_scores(token_scores: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Per-document score: sum of impact scores at query-matching first-token
    positions (reference trainer.py:158-163)."""
    return jnp.sum(masks * token_scores[..., 0], axis=-1)


def packed_doc_scores(token_scores: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """Per-document scores from a sequence-packed batch (train/packed.py):
    the same sum of mask * token_score per document, recovered with one
    scatter-add over the packed doc_index map (padding slots land on the
    dummy trailing row of doc_base and are sliced off)."""
    vals = batch["masks"] * token_scores[..., 0]  # [R, S]
    base = jnp.zeros(batch["doc_base"].shape[0], vals.dtype)  # static [N+1]
    return base.at[jnp.ravel(batch["doc_index"])].add(jnp.ravel(vals))[:-1]


def make_loss_fn(module, loss_name: str) -> Callable:
    """Build loss_fn(params, batch) -> scalar for the given objective.

    Batches carrying ``segment_ids`` (sequence-packed, train/packed.py) take
    the packed forward — block-diagonal attention, per-segment positions —
    for the objectives whose mask is per-document (pairwise_ce, distil_*);
    packed and unpacked losses/gradients agree to fp tolerance
    (tests/test_packed_training.py)."""

    def forward(params, batch):
        if "segment_ids" in batch:
            return module.apply(
                {"params": params},
                batch["input_ids"],
                (batch["segment_ids"] > 0).astype(jnp.int32),
                batch["type_ids"],
                deterministic=True,
                segment_ids=batch["segment_ids"],
            )
        return module.apply(
            {"params": params},
            batch["input_ids"],
            batch["attention_mask"],
            batch["type_ids"],
            deterministic=True,
        )

    def doc_scores(token_scores, batch):
        if "segment_ids" in batch:
            return packed_doc_scores(token_scores, batch)
        return masked_doc_scores(token_scores, batch["masks"])

    if loss_name == "pairwise_ce":

        def loss_fn(params, batch):
            token_scores = forward(params, batch)
            scores = doc_scores(token_scores, batch)
            return pairwise_ce(scores.reshape(-1, 2))

    elif loss_name in ("distil_kl", "distil_mse"):
        loss = distil_kl if loss_name == "distil_kl" else distil_margin_mse

        def loss_fn(params, batch):
            token_scores = forward(params, batch)
            scores = doc_scores(token_scores, batch)
            scores = scores.reshape(batch["scores"].shape)
            return loss(scores, batch["scores"])

    elif loss_name == "in_batch_negatives":

        def loss_fn(params, batch):
            token_scores = forward(params, batch)[..., 0]  # [2B, L]
            two_b, seq = token_scores.shape
            b = two_b // 2
            ts = token_scores.reshape(b, 2, seq)
            pos = ts[:, 0:1, :]
            negs = jnp.broadcast_to(ts[None, :, 1, :], (b, b, seq))
            combined = jnp.concatenate([pos, negs], axis=1).reshape(b * (b + 1), seq)
            scores = jnp.sum(batch["masks"] * combined, axis=-1).reshape(b, b + 1)
            return pairwise_ce(scores)

    elif loss_name == "pairwise_impact":

        def loss_fn(params, batch):
            single, pair_scores, pair_attn = module.apply(
                {"params": params},
                batch["input_ids"],
                batch["attention_mask"],
                batch["type_ids"],
                batch["pair_indices"],
                batch["pair_mask"],
                deterministic=True,
            )
            doc_scores = masked_doc_scores(single, batch["masks"])
            # attention-weighted pairwise contribution per doc
            # (reference training/pairwise_trainer.py:26-36)
            pair_contrib = jnp.sum(pair_scores * pair_attn, axis=-1)
            scores = (doc_scores + pair_contrib).reshape(
                batch["masks"].shape[0] // 2, -1
            )
            return pairwise_ce(scores)

    elif loss_name == "cross_encoder":

        def loss_fn(params, batch):
            scores = forward(params, batch)  # [2B, 1]
            scores = scores.reshape(-1, 2)
            return pairwise_ce(scores)

    else:
        raise ValueError(f"unknown loss {loss_name}")

    return loss_fn


class Trainer:
    """Owns the optimizer/step/checkpoint lifecycle around a jitted step."""

    def __init__(
        self,
        model,  # models.DeepImpact (or CrossEncoder) wrapper
        config: TrainConfig,
        checkpoint_dir,
        mesh=None,
        evaluator=None,
        metrics_logger=None,  # core.metrics_log.MetricsLogger
    ):
        self.model = model
        self.config = config
        self.mesh = mesh or single_device_mesh()
        self.evaluator = evaluator
        self.checkpoint_dir = Path(checkpoint_dir)
        self.metrics_logger = metrics_logger

        tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip_norm),
            optax.adamw(config.lr, weight_decay=config.weight_decay),
        )
        self.tx = tx
        self.params = model.params
        self.opt_state = tx.init(self.params)

        n_data = self.mesh.shape["data"]
        self.n_data = n_data
        global_batch = config.batch_size  # query groups per step (global)
        self.manager = CheckpointManager(
            checkpoint_dir,
            name=type(model).__name__,
            save_every=config.save_every,
            save_best=config.save_best,
            batch_size=global_batch,
        )
        loss_fn = make_loss_fn(model.module, config.loss)

        @jax.jit
        def grad_step(params, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            grad_norm = optax.global_norm(grads)
            return (loss, grad_norm), grads

        @jax.jit
        def apply_grads(params, opt_state, grads):
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state

        @jax.jit
        def add_grads(a, b):
            return jax.tree_util.tree_map(jnp.add, a, b)

        self._grad_step = grad_step
        self._apply_grads = apply_grads
        self._add_grads = add_grads

    # -- device placement -------------------------------------------------------
    def _put_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for k, v in batch.items():
            if k == "group_size":
                continue  # static metadata; jit sees only arrays
            arr = np.asarray(v)
            if k == "doc_base":
                # packed-batch scatter target [N+1]: replicated by design
                # (N+1 is deliberately not row-aligned; the scatter output
                # is tiny and XLA reduces it across shards).
                out[k] = jax.device_put(arr, replicated(self.mesh))
                continue
            if arr.shape[0] % self.n_data == 0:
                out[k] = jax.device_put(arr, data_sharding(self.mesh, arr.ndim))
            else:
                # Batch rows don't divide the data axis (e.g. 2 query groups
                # on 8 devices): replicate — correct, just not sharded.
                if not getattr(self, "_warned_replicate", False):
                    logger.warning(
                        f"batch dim {arr.shape[0]} (key '{k}') not divisible by "
                        f"data axis {self.n_data}; replicating instead of sharding. "
                        f"Use a global batch with docs-per-step divisible by "
                        f"{self.n_data} for data parallelism."
                    )
                    self._warned_replicate = True
                out[k] = jax.device_put(arr, replicated(self.mesh))
        return out

    # -- resume ------------------------------------------------------------------
    def maybe_resume(self) -> int:
        """Restore latest snapshot; returns the number of *batches* already
        consumed (manager.step counts optimizer steps, so micro-batches =
        step x accum; rescaled if the global batch changed — reference
        trainer.py:63-66)."""
        if not self.manager.exists():
            return 0
        restored = self.manager.load(self.params, self.opt_state)
        self.params = restored["params"]
        if restored["opt_state"] is not None:
            self.opt_state = restored["opt_state"]
        self.manager.rescale_step_for_batch(self.config.batch_size)
        self.model.params = self.params
        return self.manager.step * max(1, self.config.grad_accumulation_steps)

    # -- training loop -----------------------------------------------------------
    def train(
        self,
        batches: Iterable[Dict[str, Any]],
        total_steps: Optional[int] = None,
        skip: Optional[int] = None,
    ):
        """``batches``: iterable of collated batches (one micro-batch each).
        Resumes by skipping already-seen batches, like the reference's
        dataloader skip-replay (trainer.py:92-96,169-181).  ``skip`` overrides
        the resume-derived count (multi-epoch callers pass the within-epoch
        offset; a fresh epoch passes 0).

        Accumulation semantics: the window counter starts at 0 *after* the
        skipped batches (so a resume with skip % accum != 0 still fills a full
        window before stepping), a trailing partial window is flushed as the
        mean of its gradients, and ``manager.on_step`` / metrics count
        optimizer steps, not micro-batches — matching the reference where one
        dataloader iteration is one optimizer step (trainer.py:105-117)."""
        cfg = self.config
        if skip is None:
            skip = self.maybe_resume()
        accum = max(1, cfg.grad_accumulation_steps)

        accum_grads = None
        window = 0  # micro-batches in the current accumulation window
        train_loss = 0.0
        start = time.time()
        micro = 0  # processed micro-batches this call (excludes skipped)
        loss_val = 0.0

        def apply_window():
            nonlocal accum_grads, window
            grads = accum_grads
            if window != accum:
                # Partial (trailing/flush) window: grads were pre-divided by
                # accum; rescale so the update is the mean over `window`.
                grads = jax.tree_util.tree_map(
                    lambda g: g * (accum / window), grads
                )
            self.params, self.opt_state = self._apply_grads(
                self.params, self.opt_state, grads
            )
            accum_grads = None
            window = 0

        for i, batch in enumerate(batches):
            if i < skip:
                continue
            if total_steps is not None and micro >= total_steps:
                break
            batch = self._put_batch(batch)
            (loss, grad_norm), grads = self._grad_step(self.params, batch)
            loss_val = float(loss)
            train_loss += loss_val
            micro += 1

            stepped = False
            if accum > 1:
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
                accum_grads = (
                    grads if accum_grads is None else self._add_grads(accum_grads, grads)
                )
                window += 1
                if window == accum:
                    apply_window()
                    stepped = True
            else:
                self.params, self.opt_state = self._apply_grads(
                    self.params, self.opt_state, grads
                )
                stepped = True

            self.model.params = self.params

            if self.evaluator is not None and i % cfg.eval_every == 0:
                # The eval is a full training stall (all requested NanoBEIR
                # datasets re-encode their corpora); record its cost next to
                # its results so operators can tune the cadence trade-off
                # (--eval_every / --eval_datasets): at 10k-doc scale all 13
                # datasets cost ~82s per firing vs ~40-80s of packed
                # training per 500-step interval (NANO_BEIR_10K.json).
                t_eval = time.time()
                metrics = self.evaluator.evaluate_all(self.model)
                eval_s = round(time.time() - t_eval, 2)
                record = {"iteration": i, "metrics": metrics,
                          "eval_stall_seconds": eval_s}
                logger.info(f"eval at iteration {i} ({eval_s}s stall): {metrics}")
                with open(self.checkpoint_dir / "metrics.txt", "a") as f:
                    f.write(json.dumps(record, default=str) + "\n")
                if self.metrics_logger is not None:
                    self.metrics_logger.log(
                        {"eval": metrics, "eval/stall_seconds": eval_s},
                        step=self.manager.step,
                    )

            if stepped:
                self.manager.on_step(self.params, self.opt_state, metric=loss_val)
                if self.metrics_logger is not None:
                    self.metrics_logger.log(
                        {
                            "train/loss": loss_val,
                            "train/avg_loss": train_loss / micro,
                            "train/grad_norm": float(grad_norm),
                            "train/lr": cfg.lr,
                        },
                        step=self.manager.step,
                    )
            if micro % 50 == 0:
                rate = micro / (time.time() - start)
                logger.info(
                    f"batch {micro} loss {loss_val:.4f} avg {train_loss / micro:.4f} "
                    f"[{rate:.2f} batches/s]"
                )

        if accum_grads is not None:
            # Flush the trailing partial accumulation window.
            apply_window()
            self.model.params = self.params
            self.manager.on_step(self.params, self.opt_state, metric=loss_val)

        self.manager.save("final", self.params, self.opt_state)
        return train_loss / max(micro, 1)
