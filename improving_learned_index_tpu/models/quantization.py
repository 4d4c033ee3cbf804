"""Weight-only int8/int4 quantization for decoder params.

The TPU answer to the reference's NF4 4-bit Llama load
(src/llama2/generate.py:37-45, bitsandbytes): a 7B-class doc2query decoder
must fit a 16GB v5e chip.  Per-output-channel symmetric int8 — W ~=
q_int8 * scale — halves HBM residency vs bf16 (4x vs fp32) and, because
autoregressive decode is weight-bandwidth-bound, halves the bytes each
decode step streams from HBM.  Dequantization happens inside the jitted
step (``int8 -> bf16 multiply by scale``); XLA fuses it into the consuming
matmul's operand read, so no full-precision copy is materialized.

Quantized leaves are stored as ``{"q": int8[...], "s": f32[out...]}`` dicts;
scales reduce over axis 0 (the contracted/input axis of every flax Dense /
DenseGeneral kernel), keeping one scale per output channel.  1-D leaves
(norm scales, biases) and embeddings stay full precision — they are a
rounding error of total bytes but matter most for quality.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_quantizable(path: Tuple, leaf) -> bool:
    names = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
    if leaf.ndim < 2:
        return False
    if "embed" in names.lower():
        return False
    return True


def _quantize_leaf_int8(leaf: np.ndarray) -> dict:
    """Per-output-channel symmetric int8 for one 2-D+ leaf — the single
    definition used by quantize_params_int8 AND int4's odd-dim fallback."""
    amax = np.max(np.abs(leaf), axis=0)  # per output channel
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(leaf / scale), -127, 127).astype(np.int8)
    return {"q": q, "s": scale}


def quantize_params_int8(params: Any) -> Any:
    """fp param tree -> tree with quantized {"q", "s"} dict leaves."""

    def quant(path, leaf):
        leaf = np.asarray(leaf)
        if not _is_quantizable(path, leaf):
            return leaf
        return _quantize_leaf_int8(leaf)

    return jax.tree_util.tree_map_with_path(quant, params)


def quantize_params_int4(params: Any) -> Any:
    """fp param tree -> tree with packed int4 {"q4", "s"} dict leaves.

    The TPU counterpart of the reference's NF4 4-bit load
    (src/llama2/generate.py:37-45): per-output-channel symmetric 4-bit
    (q in [-7, 7]), two values packed per int8 along the contracted axis 0
    — 4x smaller HBM residency than bf16.  Coarser than int8; intended for
    generation workloads (doc2query sampling), like the reference's NF4.
    """

    def quant(path, leaf):
        leaf = np.asarray(leaf)
        if not _is_quantizable(path, leaf):
            return leaf
        if leaf.shape[0] % 2:
            # odd contracted dim (never true for transformer geometries):
            # fall back to int8 for this leaf; dequantize handles mixed trees
            return _quantize_leaf_int8(leaf)
        amax = np.max(np.abs(leaf), axis=0)
        scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
        # Biased nibbles (q+7 in [0, 14]) with SPLIT-HALF packing: low
        # nibbles hold rows [0, K/2), high nibbles rows [K/2, K) of the
        # contracted axis.  Both choices are for decode speed on the VPU:
        # - split-half makes unpacking a CONCATENATE of two elementwise-
        #   decoded chunks, which XLA splits the consuming dot across
        #   (even/odd interleaving needs a stack+reshape shuffle XLA cannot
        #   fuse — it materialized a bf16 weight copy per decode step and
        #   ran 7B at 14 seqs/s vs 52 for int8);
        # - biased-unsigned storage lets the decode run in bf16 float math
        #   (widen, floor-divide, two fused multiply-subs) instead of int8
        #   shift/sign-extend ops, which the TPU VPU executes ~1.4x slower
        #   (530us -> 374us per 4096x11008 matmul, benchmarked).
        q = (np.clip(np.round(leaf / scale), -7, 7) + 7).astype(np.uint8)
        half = leaf.shape[0] // 2
        return {"q4": (q[:half] | (q[half:] << 4)).astype(np.uint8), "s": scale}

    return jax.tree_util.tree_map_with_path(quant, params)


def _is_q4leaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q4", "s"}


def _unpack_int4(x, dtype):
    packed = x["q4"]
    s = jnp.asarray(x["s"], dtype)
    # Float-math nibble decode of the biased split-half layout (see
    # quantize_params_int4): all ops are bf16 VPU ops that fuse into the
    # consuming dot's operand read; the concat splits that dot in two.
    f = packed.astype(jnp.uint8).astype(dtype)
    hi = jnp.floor(f * (1.0 / 16.0))  # high nibble, biased [0, 14]
    lo = f - hi * 16.0                # low nibble, biased [0, 14]
    return jnp.concatenate(
        [((lo - 7.0) * s).astype(dtype), ((hi - 7.0) * s).astype(dtype)],
        axis=0,
    )


def _is_qleaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q", "s"}


def dequantize_params(qparams: Any, dtype=jnp.bfloat16) -> Any:
    """Quantized tree (int8 or packed int4 leaves) -> fp tree.  Call INSIDE
    jit: XLA fuses the dequantization into each weight's consuming matmul."""

    def is_leaf(x):
        return _is_qleaf(x) or _is_q4leaf(x)

    def dq(x):
        if _is_qleaf(x):
            return (x["q"].astype(dtype) * x["s"].astype(dtype)).astype(dtype)
        if _is_q4leaf(x):
            return _unpack_int4(x, dtype)
        return x

    return jax.tree_util.tree_map(dq, qparams, is_leaf=is_leaf)


def random_quantized_like_config(config, rng: np.random.Generator) -> Any:
    """Build a random int8 Llama param tree directly (no fp parent) — for
    memory/throughput validation of geometries whose fp32 weights would not
    fit anywhere.  Values are plausible-scale; decode quality is meaningless
    but shapes, bytes, and speed are real."""
    from .llama import LlamaConfig  # local import to avoid cycles

    assert isinstance(config, LlamaConfig)
    c = config
    hd = c.head_dim

    def qmat(*shape):
        return {
            "q": rng.integers(-127, 128, shape, dtype=np.int8),
            "s": np.full(shape[1:], 0.01 / np.sqrt(shape[0]), dtype=np.float32),
        }

    params = {
        "embed_tokens": {
            "embedding": (rng.standard_normal((c.vocab_size, c.hidden_size)) * 0.02).astype(
                np.float32
            )
        },
        "norm": {"scale": np.ones(c.hidden_size, np.float32)},
    }
    for i in range(c.num_layers):
        params[f"layer_{i}"] = {
            "input_norm": {"scale": np.ones(c.hidden_size, np.float32)},
            "post_attn_norm": {"scale": np.ones(c.hidden_size, np.float32)},
            "attention": {
                "q_proj": {"kernel": qmat(c.hidden_size, c.num_heads, hd)},
                "k_proj": {"kernel": qmat(c.hidden_size, c.num_kv_heads, hd)},
                "v_proj": {"kernel": qmat(c.hidden_size, c.num_kv_heads, hd)},
                "o_proj": {"kernel": qmat(c.num_heads, hd, c.hidden_size)},
            },
            "mlp": {
                "gate_proj": {"kernel": qmat(c.hidden_size, c.intermediate_size)},
                "up_proj": {"kernel": qmat(c.hidden_size, c.intermediate_size)},
                "down_proj": {"kernel": qmat(c.intermediate_size, c.hidden_size)},
            },
        }
    if not c.tie_word_embeddings:
        params["lm_head"] = {"kernel": qmat(c.hidden_size, c.vocab_size)}
    return params
