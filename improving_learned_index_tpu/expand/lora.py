"""LoRA: low-rank adapters for the doc2query decoder.

Capability parity with the reference's peft usage
(src/llama2/finetune/finetune.py:100-121: r=16, alpha=32 on the 7 projection
matrices; src/llama2/finetune/merge.py:26-31: merge_and_unload).  Functional
design: adapters are a separate param tree; ``apply_lora`` returns merged
weights (W + (alpha/r) * B @ A) so the base forward stays unchanged —
merging is a tree-map, not a model surgery, and the merged tree jits/shards
exactly like the base.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = (
    "q_proj",
    "k_proj",
    "v_proj",
    "o_proj",
    "gate_proj",
    "up_proj",
    "down_proj",
)


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    alpha: int = 32
    targets: Sequence[str] = DEFAULT_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def _target_paths(params: Dict[str, Any], targets: Sequence[str]) -> List[Tuple]:
    paths = []

    def visit(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if names and names[-1] == "kernel" and any(t in names for t in targets):
            paths.append(tuple(names))
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return paths


def _factor_dims(shape: Sequence[int]) -> Tuple[int, int]:
    """(in_dim, out_dim) for the 2-D matrix view of a possibly >2-D kernel.

    Fused-head layouts differ in how many leading axes are contracted:
    q/k/v kernels are [hidden, heads, head_dim] (one input axis), o_proj is
    [heads, head_dim, hidden] (two).  The matrix view is the split that
    BALANCES the factorization — picking axis 0 unconditionally turned
    o_proj adapters into [heads, r] x [r, head_dim*hidden] (rank-16 across
    32 heads, 64x the parameters: 1.1 GB of r=16 adapters at 7B, 4.3 GB at
    r=64, which with AdamW state OOMed the fine-tune bench).  Minimizing
    in_dim + out_dim recovers peft's [in_features, out_features] view for
    every standard layout and keeps 2-D kernels unchanged."""
    best = min(
        range(1, len(shape)),
        key=lambda k: int(np.prod(shape[:k])) + int(np.prod(shape[k:])),
    )
    return int(np.prod(shape[:best])), int(np.prod(shape[best:]))


def init_lora_params(
    params: Dict[str, Any], config: LoraConfig, rng: jax.Array
) -> Dict[str, Any]:
    """A zero-initialized-B / gaussian-A adapter per target kernel.  Kernel
    shapes may be >2-D (fused head layouts); LoRA factors operate on the
    2-D flattening [in, out] (see ``_factor_dims``)."""
    lora: Dict[str, Any] = {}
    for path in _target_paths(params, config.targets):
        leaf = params
        for k in path:
            leaf = leaf[k]
        in_dim, out_dim = _factor_dims(leaf.shape)
        rng, a_rng = jax.random.split(rng)
        node = lora
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node["kernel"] = {
            "lora_a": jax.random.normal(a_rng, (in_dim, config.r), jnp.float32) * 0.01,
            "lora_b": jnp.zeros((config.r, out_dim), jnp.float32),
        }
    return lora


def merge_lora(
    params: Dict[str, Any], lora: Dict[str, Any], config: LoraConfig
) -> Dict[str, Any]:
    """W' = W + scaling * A @ B (peft merge_and_unload semantics)."""

    def merge(path, leaf):
        names = tuple(str(getattr(p, "key", p)) for p in path)
        node = lora
        for k in names:
            if not isinstance(node, dict) or k not in node:
                return leaf
            node = node[k]
        delta = (node["lora_a"] @ node["lora_b"]) * config.scaling
        return leaf + delta.reshape(leaf.shape).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def lora_forward_params(params, lora, config: LoraConfig):
    """Merged params for a forward/train step: differentiable w.r.t. ``lora``
    (base ``params`` held constant) — the QLoRA-style training path where
    only adapters get gradients."""
    return merge_lora(jax.lax.stop_gradient(params), lora, config)
