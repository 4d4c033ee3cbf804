"""Llama-family decoder in JAX — the doc2query expansion model.

TPU-first replacement for the reference's 4-bit torch Llama-2-7B generator
(src/llama2/generate.py:27-79: bitsandbytes NF4 + peft LoRA + HF generate).
Here the decoder is a pure-functional flax module designed for pjit:

- GQA attention with rotary embeddings, one einsum per projection;
- a static-shape KV cache (prefill + single-token decode paths share the
  module; decode runs under ``lax.while_loop`` in expand.sampling);
- tensor-parallel layout over the mesh ``model`` axis: attention heads and
  MLP hidden dim column/row-sharded (partition specs in ``llama_param_specs``)
  so XLA emits all-reduces over ICI — replacing nothing in the reference,
  which had no TP at all;
- optional LoRA deltas applied functionally (expand.lora).

HF ``LlamaForCausalLM`` checkpoints import via ``hf_llama_to_flax``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 11008
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    dtype: str = "bfloat16"
    # KV-cache storage: "none" keeps compute-dtype caches; "int8" stores
    # per-(token, head) symmetrically-quantized int8 K/V with fp32 scales —
    # half the cache HBM (the decode-batch ceiling at 7B; see
    # benchmarks/LLAMA7B_INT4.json).  Scales fold into the attention
    # einsums, so no dequantized cache is ever materialized.
    kv_quant: str = "none"
    # Full-sequence (no-cache) attention via the Pallas flash kernel with
    # online softmax: the XLA path materializes fp32 [B, H, S, S] logits +
    # probs (537 MB each at B=1/H=32/S=2048) — the peak-HBM term of the 7B
    # QLoRA backward on a 16 GB chip.  Opt-in: TPU-only kernel, and the
    # caller must pass ``segment_ids`` (causal + padding-segment semantics
    # replace the additive bias).  Decode/cached paths are unaffected.
    use_flash_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny(vocab_size: int = 256) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            intermediate_size=128,
            max_position_embeddings=128,
        )

    @staticmethod
    def llama2_7b() -> "LlamaConfig":
        return LlamaConfig()


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions [B, L] -> cos/sin [B, L, head_dim] (HF rotate-half layout:
    frequencies repeated across the two halves)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, L, H, D]; cos/sin: [B, L, D]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, :, None, :] + rotated * sin[:, :, None, :]


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        norm = x32 * jax.lax.rsqrt(jnp.mean(x32**2, axis=-1, keepdims=True) + self.eps)
        return (norm * scale).astype(x.dtype)


def _kv_quantize(x):
    """Per-(batch, token, head) symmetric int8 quantization of [B, L, H, D].

    Returns (int8 values, fp32 scales [B, L, H]).  fp32 math keeps the
    round-trip deterministic across compute dtypes."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


class LlamaAttention(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, attention_bias, kv_cache=None, cache_index=None,
                 segment_ids=None):
        c = self.config
        dt = jnp.dtype(c.dtype)
        hd = c.head_dim
        q = nn.DenseGeneral((c.num_heads, hd), use_bias=False, dtype=dt, name="q_proj")(x)
        k = nn.DenseGeneral((c.num_kv_heads, hd), use_bias=False, dtype=dt, name="k_proj")(x)
        v = nn.DenseGeneral((c.num_kv_heads, hd), use_bias=False, dtype=dt, name="v_proj")(x)

        cos, sin = rope_cos_sin(positions, hd, c.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        k_scale = v_scale = None
        rep = c.num_heads // c.num_kv_heads

        def upd(cache, new):
            return jax.lax.dynamic_update_slice_in_dim(
                cache, new.astype(cache.dtype), cache_index, axis=1
            )

        if kv_cache is not None and len(kv_cache) == 4:
            # int8 KV: quantize this step's K/V post-RoPE, attend over the
            # quantized cache.  Scales are per (token, head), constant along
            # the head_dim contraction, so they factor OUT of the QK dot and
            # fold INTO probs before the PV dot — the cache is never
            # dequantized as a whole.
            kq, ks, vq, vs = kv_cache  # [B,S,n_kv,hd] int8, [B,S,n_kv] fp32
            nk_q, nk_s = _kv_quantize(k)
            nv_q, nv_s = _kv_quantize(v)
            kq, ks = upd(kq, nk_q), upd(ks, nk_s)
            vq, vs = upd(vq, nv_q), upd(vs, nv_s)
            new_cache = (kq, ks, vq, vs)
            k, v = kq.astype(dt), vq.astype(dt)
            k_scale, v_scale = ks, vs
            if rep > 1:
                k_scale = jnp.repeat(k_scale, rep, axis=2)
                v_scale = jnp.repeat(v_scale, rep, axis=2)
        elif kv_cache is not None:
            # decode: write this step's K/V at cache_index, attend over cache.
            ck, cv = kv_cache  # [B, S, n_kv, hd]
            ck, cv = upd(ck, k), upd(cv, v)
            k, v = ck, cv
            new_cache = (ck, cv)
        else:
            new_cache = None

        # GQA: repeat kv heads to match q heads.
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        if (c.use_flash_attention and kv_cache is None
                and segment_ids is not None
                and jax.default_backend() == "tpu"):
            # Pallas flash path: fp32 [S, S] tiles live only in VMEM.
            # segment_ids carry the padding structure (pad rows attend only
            # pads — their outputs are garbage the loss never reads, exactly
            # like the additive-bias path); causal=True replaces the tril.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            seg = segment_ids.astype(jnp.int32)
            ctx = flash_attention(
                jnp.transpose(q, (0, 2, 1, 3)).astype(dt),
                jnp.transpose(k, (0, 2, 1, 3)).astype(dt),
                jnp.transpose(v, (0, 2, 1, 3)).astype(dt),
                segment_ids=SegmentIds(q=seg, kv=seg),
                causal=True,
                sm_scale=float(1.0 / np.sqrt(hd)),
            )
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).astype(dt)
            out = nn.DenseGeneral(
                c.hidden_size, axis=(-2, -1), use_bias=False, dtype=dt, name="o_proj"
            )(ctx)
            return out, new_cache

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        if k_scale is not None:
            logits = logits * jnp.transpose(k_scale, (0, 2, 1))[:, :, None, :]
        logits = logits / np.sqrt(hd) + attention_bias
        probs = jax.nn.softmax(logits, axis=-1)
        if v_scale is not None:
            probs = probs * jnp.transpose(v_scale, (0, 2, 1))[:, :, None, :]
        probs = probs.astype(dt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = nn.DenseGeneral(
            c.hidden_size, axis=(-2, -1), use_bias=False, dtype=dt, name="o_proj"
        )(ctx)
        return out, new_cache


class LlamaMLP(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        dt = jnp.dtype(c.dtype)
        gate = nn.Dense(c.intermediate_size, use_bias=False, dtype=dt, name="gate_proj")(x)
        up = nn.Dense(c.intermediate_size, use_bias=False, dtype=dt, name="up_proj")(x)
        return nn.Dense(c.hidden_size, use_bias=False, dtype=dt, name="down_proj")(
            nn.silu(gate) * up
        )


class LlamaLayer(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, attention_bias, kv_cache=None, cache_index=None,
                 segment_ids=None):
        c = self.config
        h, new_cache = LlamaAttention(c, name="attention")(
            RMSNorm(c.rms_norm_eps, name="input_norm")(x),
            positions,
            attention_bias,
            kv_cache,
            cache_index,
            segment_ids,
        )
        x = x + h
        x = x + LlamaMLP(c, name="mlp")(RMSNorm(c.rms_norm_eps, name="post_attn_norm")(x))
        return x, new_cache


class LlamaModel(nn.Module):
    """Decoder producing logits.  Two modes:

    - prefill: ``kv_caches=None`` — causal mask over the padded prompt,
      optionally returns freshly-built caches when ``max_cache_len`` is set;
    - decode : ``kv_caches`` given, x is the single next token per sequence.
    """

    config: LlamaConfig

    @nn.compact
    def __call__(
        self,
        input_ids,  # [B, L]
        attention_mask,  # [B, L] (prefill) or [B, S] over cache (decode)
        positions=None,  # [B, L]
        kv_caches=None,  # list of per-layer (k, v) or None
        cache_index=None,  # scalar int: write offset during decode
    ):
        c = self.config
        dt = jnp.dtype(c.dtype)
        x = nn.Embed(c.vocab_size, c.hidden_size, name="embed_tokens")(input_ids).astype(dt)
        bsz, qlen = input_ids.shape

        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(qlen, dtype=jnp.int32)[None], (bsz, qlen))

        if kv_caches is None:
            # causal mask + padding mask over the prompt
            causal = jnp.tril(jnp.ones((qlen, qlen), dtype=bool))
            mask = causal[None, None] & attention_mask[:, None, None, :].astype(bool)
        else:
            # cache mode: attention_mask [B, S] marks valid cache slots
            # (including this step's writes); causality comes from slot ids —
            # query i (written at cache_index + i) sees slots <= its own.
            s_len = kv_caches[0][0].shape[1]
            slot_ids = jnp.arange(s_len, dtype=jnp.int32)[None, None, None, :]
            q_ids = (cache_index + jnp.arange(qlen, dtype=jnp.int32))[None, None, :, None]
            mask = attention_mask[:, None, None, :].astype(bool) & (slot_ids <= q_ids)
        bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min).astype(jnp.float32)

        seg_ids = (attention_mask if c.use_flash_attention and kv_caches is None
                   else None)
        new_caches = []
        for i in range(c.num_layers):
            cache_i = kv_caches[i] if kv_caches is not None else None
            x, new_cache = LlamaLayer(c, name=f"layer_{i}")(
                x, positions, bias, cache_i, cache_index, seg_ids
            )
            new_caches.append(new_cache)
        x = RMSNorm(c.rms_norm_eps, name="norm")(x)

        if c.tie_word_embeddings:
            embed = self.variables["params"]["embed_tokens"]["embedding"]
            logits = jnp.einsum("blh,vh->blv", x.astype(jnp.float32), embed.astype(jnp.float32))
        else:
            logits = nn.Dense(
                c.vocab_size, use_bias=False, dtype=jnp.float32, name="lm_head"
            )(x.astype(jnp.float32))
        return logits, (new_caches if kv_caches is not None else None)


def init_llama_params(config: LlamaConfig, rng: jax.Array, seq: int = 8) -> Dict[str, Any]:
    model = LlamaModel(config)
    ids = jnp.ones((1, seq), dtype=jnp.int32)
    return model.init({"params": rng}, ids, jnp.ones_like(ids))["params"]


def make_kv_caches(config: LlamaConfig, batch: int, max_len: int, dtype=None) -> list:
    """KV caches in the model's compute dtype (bf16 in production — half the
    HBM traffic of fp32 during decode; fp32 models get fp32 caches).  With
    ``config.kv_quant == "int8"`` each layer's cache is the 4-tuple
    (k int8, k_scale fp32, v int8, v_scale fp32) — half the bytes again."""
    shape = (batch, max_len, config.num_kv_heads, config.head_dim)
    if config.kv_quant == "int8":
        sshape = shape[:-1]
        return [
            (
                jnp.zeros(shape, dtype=jnp.int8),
                jnp.zeros(sshape, dtype=jnp.float32),
                jnp.zeros(shape, dtype=jnp.int8),
                jnp.zeros(sshape, dtype=jnp.float32),
            )
            for _ in range(config.num_layers)
        ]
    if dtype is None:
        dtype = jnp.dtype(config.dtype)
    return [
        (jnp.zeros(shape, dtype=dtype), jnp.zeros(shape, dtype=dtype))
        for _ in range(config.num_layers)
    ]


# ---------------------------------------------------------------------------
# Tensor-parallel partition specs (mesh axis: "model")
# ---------------------------------------------------------------------------
def llama_param_specs(params: Dict[str, Any], model_parallel_size: int = 0):
    """PartitionSpec tree: attention heads + MLP hidden column-parallel,
    output projections row-parallel, embeddings vocab-sharded.  When
    ``model_parallel_size`` is given, axes that don't divide evenly fall back
    to replication (e.g. 2 KV heads on a 4-way model axis)."""
    from jax.sharding import PartitionSpec as P

    def fits(leaf, axis):
        return model_parallel_size <= 0 or leaf.shape[axis] % model_parallel_size == 0

    def spec(path, leaf):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if "embed_tokens" in names and fits(leaf, 0):
            return P("model", None)
        if "lm_head" in names and fits(leaf, 1):
            return P(None, "model")
        if any(k in names for k in ("q_proj", "k_proj", "v_proj")) and fits(leaf, 1):
            return P(None, "model", None)  # [H, heads, hd]: shard heads
        if "o_proj" in names and fits(leaf, 0):
            return P("model", None, None)  # [heads, hd, H]: shard heads (row)
        if ("gate_proj" in names or "up_proj" in names) and fits(leaf, 1):
            return P(None, "model")  # column parallel
        if "down_proj" in names and fits(leaf, 0):
            return P("model", None)  # row parallel
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------
def hf_llama_to_flax(state_dict: Dict[str, Any], config: LlamaConfig) -> Dict[str, Any]:
    """Convert an HF LlamaForCausalLM state dict (torch tensors or arrays)."""

    def get(name):
        t = state_dict[name]
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    H, heads, kv_heads, hd = (
        config.hidden_size,
        config.num_heads,
        config.num_kv_heads,
        config.head_dim,
    )
    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": get("model.embed_tokens.weight").astype(np.float32)},
        "norm": {"scale": get("model.norm.weight").astype(np.float32)},
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": get("lm_head.weight").T.astype(np.float32)}
    for i in range(config.num_layers):
        p = f"model.layers.{i}"
        params[f"layer_{i}"] = {
            "input_norm": {"scale": get(f"{p}.input_layernorm.weight").astype(np.float32)},
            "post_attn_norm": {
                "scale": get(f"{p}.post_attention_layernorm.weight").astype(np.float32)
            },
            "attention": {
                "q_proj": {
                    "kernel": get(f"{p}.self_attn.q_proj.weight").T.reshape(H, heads, hd).astype(np.float32)
                },
                "k_proj": {
                    "kernel": get(f"{p}.self_attn.k_proj.weight").T.reshape(H, kv_heads, hd).astype(np.float32)
                },
                "v_proj": {
                    "kernel": get(f"{p}.self_attn.v_proj.weight").T.reshape(H, kv_heads, hd).astype(np.float32)
                },
                "o_proj": {
                    "kernel": get(f"{p}.self_attn.o_proj.weight").T.reshape(heads, hd, H).astype(np.float32)
                },
            },
            "mlp": {
                "gate_proj": {"kernel": get(f"{p}.mlp.gate_proj.weight").T.astype(np.float32)},
                "up_proj": {"kernel": get(f"{p}.mlp.up_proj.weight").T.astype(np.float32)},
                "down_proj": {"kernel": get(f"{p}.mlp.down_proj.weight").T.astype(np.float32)},
            },
        }
    return params
