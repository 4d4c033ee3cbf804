"""T5 / mT5 encoder-decoder in JAX — the second doc2query model family.

Capability parity with the reference T5QueryGenerator
(src/llama2/generate.py:82-101 and generate_t5.py: the
``doc2query/msmarco-vietnamese-mt5-base-v1`` expansion path).  Architecture
follows HF T5 v1.1 / mT5: RMS-style LayerNorm (no mean subtraction, no
bias), bucketed relative position bias shared from the first layer,
**unscaled** attention logits (T5 folds the 1/sqrt(d) into init), gated-GELU
feed-forward (plain ReLU for v1.0), optional tied embeddings with the
d_model**-0.5 logit scaling of v1.0.

Decode-friendly: the decoder exposes a static-shape self-attention KV cache
plus precomputed cross-attention K/V so expand.sampling-style loops run as
jitted while-loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 250112  # mT5
    d_model: int = 768
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 2048
    num_encoder_layers: int = 12
    num_decoder_layers: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    gated_act: bool = True  # v1.1/mT5 gated-gelu; False = v1.0 relu
    tie_word_embeddings: bool = False  # True = v1.0 (scales logits)
    dtype: str = "bfloat16"

    @staticmethod
    def tiny(vocab_size: int = 256) -> "T5Config":
        return T5Config(
            vocab_size=vocab_size,
            d_model=64,
            d_kv=16,
            num_heads=4,
            d_ff=128,
            num_encoder_layers=2,
            num_decoder_layers=2,
        )

    @staticmethod
    def mt5_base() -> "T5Config":
        return T5Config()


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """HF T5 bucketing (t5 relative attention)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32**2, axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


class T5Attention(nn.Module):
    config: T5Config

    def setup(self):
        c = self.config
        dt = jnp.dtype(c.dtype)
        self.q = nn.DenseGeneral((c.num_heads, c.d_kv), use_bias=False, dtype=dt)
        self.k = nn.DenseGeneral((c.num_heads, c.d_kv), use_bias=False, dtype=dt)
        self.v = nn.DenseGeneral((c.num_heads, c.d_kv), use_bias=False, dtype=dt)
        self.o = nn.DenseGeneral(c.d_model, axis=(-2, -1), use_bias=False, dtype=dt)

    def __call__(
        self,
        x,
        kv_source,  # self-attn: x; cross-attn: encoder output
        attention_bias,  # [B or 1, heads, Lq, Lk] additive (incl. pos bias)
        kv_cache=None,  # (k, v) [B, S, heads, d_kv] for decode self-attn
        cache_index=None,
        static_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # cross K/V
    ):
        c = self.config
        dt = jnp.dtype(c.dtype)
        q = self.q(x)
        if static_kv is not None:
            k, v = static_kv
        else:
            k = self.k(kv_source)
            v = self.v(kv_source)
            if kv_cache is not None:
                ck, cv = kv_cache
                ck = jax.lax.dynamic_update_slice_in_dim(
                    ck, k.astype(ck.dtype), cache_index, axis=1
                )
                cv = jax.lax.dynamic_update_slice_in_dim(
                    cv, v.astype(cv.dtype), cache_index, axis=1
                )
                k, v = ck, cv
                kv_cache = (ck, cv)
        # T5: NO 1/sqrt(d) scaling
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits + attention_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(dt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return self.o(ctx), kv_cache

    def compute_kv(self, kv_source):
        """Precompute cross-attention K/V from the encoder output."""
        return self.k(kv_source), self.v(kv_source)


class T5FF(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x):
        c = self.config
        dt = jnp.dtype(c.dtype)
        if c.gated_act:
            g = nn.Dense(c.d_ff, use_bias=False, dtype=dt, name="wi_0")(x)
            u = nn.Dense(c.d_ff, use_bias=False, dtype=dt, name="wi_1")(x)
            h = nn.gelu(g, approximate=True) * u
        else:
            h = nn.relu(nn.Dense(c.d_ff, use_bias=False, dtype=dt, name="wi")(x))
        return nn.Dense(c.d_model, use_bias=False, dtype=dt, name="wo")(h)


class T5EncoderLayer(nn.Module):
    config: T5Config

    def setup(self):
        c = self.config
        self.self_attention = T5Attention(c)
        self.self_norm = T5LayerNorm(c.layer_norm_eps)
        self.ff = T5FF(c)
        self.ff_norm = T5LayerNorm(c.layer_norm_eps)

    def __call__(self, x, attention_bias):
        normed = self.self_norm(x)
        h, _ = self.self_attention(normed, normed, attention_bias)
        x = x + h
        x = x + self.ff(self.ff_norm(x))
        return x


class T5DecoderLayer(nn.Module):
    config: T5Config

    def setup(self):
        c = self.config
        self.self_attention = T5Attention(c)
        self.self_norm = T5LayerNorm(c.layer_norm_eps)
        self.cross_attention = T5Attention(c)
        self.cross_norm = T5LayerNorm(c.layer_norm_eps)
        self.ff = T5FF(c)
        self.ff_norm = T5LayerNorm(c.layer_norm_eps)

    def __call__(
        self,
        x,
        self_bias,
        cross_bias,
        encoder_output=None,
        kv_cache=None,
        cache_index=None,
        cross_kv=None,
    ):
        normed = self.self_norm(x)
        h, kv_cache = self.self_attention(
            normed, normed, self_bias, kv_cache=kv_cache, cache_index=cache_index
        )
        x = x + h
        h, _ = self.cross_attention(
            self.cross_norm(x), encoder_output, cross_bias, static_kv=cross_kv
        )
        x = x + h
        x = x + self.ff(self.ff_norm(x))
        return x, kv_cache


class T5Model(nn.Module):
    """Full encoder-decoder.  Methods:

    - ``encode(input_ids, mask)`` -> encoder hidden states
    - ``decode(decoder_ids, encoder_output, enc_mask, dec_mask, caches...)``
      -> logits (+ updated caches)
    - ``__call__`` = encode + decode (teacher forcing / training).
    """

    config: T5Config

    def setup(self):
        c = self.config
        self.shared = nn.Embed(c.vocab_size, c.d_model, name="shared")
        self.enc_layers = [
            T5EncoderLayer(c, name=f"encoder_layer_{i}")
            for i in range(c.num_encoder_layers)
        ]
        self.enc_final_norm = T5LayerNorm(c.layer_norm_eps, name="encoder_final_norm")
        self.enc_rel_bias = nn.Embed(
            c.relative_attention_num_buckets, c.num_heads, name="encoder_rel_bias"
        )
        self.dec_layers = [
            T5DecoderLayer(c, name=f"decoder_layer_{i}")
            for i in range(c.num_decoder_layers)
        ]
        self.dec_final_norm = T5LayerNorm(c.layer_norm_eps, name="decoder_final_norm")
        self.dec_rel_bias = nn.Embed(
            c.relative_attention_num_buckets, c.num_heads, name="decoder_rel_bias"
        )
        if not c.tie_word_embeddings:
            self.lm_head = nn.Dense(
                c.vocab_size, use_bias=False, dtype=jnp.float32, name="lm_head"
            )

    def _rel_bias(self, q_pos, k_pos, embed, bidirectional):
        c = self.config
        rel = k_pos[None, :] - q_pos[:, None]  # [Lq, Lk]
        buckets = relative_position_bucket(
            rel,
            bidirectional,
            c.relative_attention_num_buckets,
            c.relative_attention_max_distance,
        )
        bias = embed(buckets)  # [Lq, Lk, heads]
        return bias.transpose(2, 0, 1)[None].astype(jnp.float32)  # [1, h, Lq, Lk]

    def encode(self, input_ids, attention_mask):
        c = self.config
        x = self.shared(input_ids).astype(jnp.dtype(c.dtype))
        L = input_ids.shape[1]
        pos = jnp.arange(L, dtype=jnp.int32)
        bias = self._rel_bias(pos, pos, self.enc_rel_bias, bidirectional=True)
        pad = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, jnp.finfo(jnp.float32).min
        )
        bias = bias + pad
        for layer in self.enc_layers:
            x = layer(x, bias)
        return self.enc_final_norm(x).astype(jnp.float32)

    def _logits(self, x):
        c = self.config
        x = x.astype(jnp.float32)
        if c.tie_word_embeddings:
            x = x * (c.d_model**-0.5)  # v1.0 scaling
            emb = self.shared.embedding.astype(jnp.float32)
            return jnp.einsum("bld,vd->blv", x, emb)
        return self.lm_head(x)

    def decode(
        self,
        decoder_input_ids,
        encoder_output,
        encoder_mask,
        decoder_positions=None,
        kv_caches=None,
        cache_index=None,
        cross_kvs=None,
    ):
        c = self.config
        x = self.shared(decoder_input_ids).astype(jnp.dtype(c.dtype))
        bsz, qlen = decoder_input_ids.shape

        if kv_caches is None:
            q_pos = jnp.arange(qlen, dtype=jnp.int32)
            k_pos = q_pos
            self_bias = self._rel_bias(q_pos, k_pos, self.dec_rel_bias, bidirectional=False)
            causal = jnp.tril(jnp.ones((qlen, qlen), dtype=bool))[None, None]
            self_bias = jnp.where(causal, self_bias, jnp.finfo(jnp.float32).min)
        else:
            s_len = kv_caches[0][0].shape[1]
            q_pos = cache_index + jnp.arange(qlen, dtype=jnp.int32)
            k_pos = jnp.arange(s_len, dtype=jnp.int32)
            self_bias = self._rel_bias(q_pos, k_pos, self.dec_rel_bias, bidirectional=False)
            valid = k_pos[None, None, None, :] <= q_pos[None, None, :, None]
            self_bias = jnp.where(valid, self_bias, jnp.finfo(jnp.float32).min)

        cross_bias = jnp.where(
            encoder_mask[:, None, None, :].astype(bool), 0.0, jnp.finfo(jnp.float32).min
        ).astype(jnp.float32)

        new_caches = []
        for i, layer in enumerate(self.dec_layers):
            cache_i = kv_caches[i] if kv_caches is not None else None
            cross_kv_i = cross_kvs[i] if cross_kvs is not None else None
            x, new_cache = layer(
                x,
                self_bias,
                cross_bias,
                encoder_output=encoder_output,
                kv_cache=cache_i,
                cache_index=cache_index,
                cross_kv=cross_kv_i,
            )
            new_caches.append(new_cache)
        x = self.dec_final_norm(x)
        logits = self._logits(x)
        return logits, (new_caches if kv_caches is not None else None)

    def compute_cross_kvs(self, encoder_output):
        """Precompute per-layer cross-attention K/V once per prompt."""
        return [
            layer.cross_attention.compute_kv(encoder_output) for layer in self.dec_layers
        ]

    def __call__(self, input_ids, attention_mask, decoder_input_ids):
        enc = self.encode(input_ids, attention_mask)
        logits, _ = self.decode(decoder_input_ids, enc, attention_mask)
        return logits


def init_t5_params(config: T5Config, rng: jax.Array, seq: int = 8) -> Dict[str, Any]:
    model = T5Model(config)
    ids = jnp.ones((1, seq), dtype=jnp.int32)
    return model.init({"params": rng}, ids, jnp.ones_like(ids), ids)["params"]


def make_t5_kv_caches(config: T5Config, batch: int, max_len: int, dtype=None) -> list:
    if dtype is None:
        dtype = jnp.dtype(config.dtype)
    shape = (batch, max_len, config.num_heads, config.d_kv)
    return [
        (jnp.zeros(shape, dtype=dtype), jnp.zeros(shape, dtype=dtype))
        for _ in range(config.num_decoder_layers)
    ]


# ---------------------------------------------------------------------------
# HF weight import (T5ForConditionalGeneration / MT5)
# ---------------------------------------------------------------------------
def hf_t5_to_flax(state_dict: Dict[str, Any], config: T5Config) -> Dict[str, Any]:
    def get(name):
        t = state_dict[name]
        return (t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)).astype(
            np.float32
        )

    H, heads, dkv = config.d_model, config.num_heads, config.d_kv

    def attn(prefix):
        return {
            "q": {"kernel": get(f"{prefix}.q.weight").T.reshape(H, heads, dkv)},
            "k": {"kernel": get(f"{prefix}.k.weight").T.reshape(H, heads, dkv)},
            "v": {"kernel": get(f"{prefix}.v.weight").T.reshape(H, heads, dkv)},
            "o": {"kernel": get(f"{prefix}.o.weight").T.reshape(heads, dkv, H)},
        }

    def ff(prefix):
        if config.gated_act:
            return {
                "wi_0": {"kernel": get(f"{prefix}.wi_0.weight").T},
                "wi_1": {"kernel": get(f"{prefix}.wi_1.weight").T},
                "wo": {"kernel": get(f"{prefix}.wo.weight").T},
            }
        return {
            "wi": {"kernel": get(f"{prefix}.wi.weight").T},
            "wo": {"kernel": get(f"{prefix}.wo.weight").T},
        }

    params: Dict[str, Any] = {
        "shared": {"embedding": get("shared.weight")},
        "encoder_final_norm": {"scale": get("encoder.final_layer_norm.weight")},
        "decoder_final_norm": {"scale": get("decoder.final_layer_norm.weight")},
        "encoder_rel_bias": {
            "embedding": get(
                "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
            )
        },
        "decoder_rel_bias": {
            "embedding": get(
                "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
            )
        },
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": get("lm_head.weight").T}
    for i in range(config.num_encoder_layers):
        p = f"encoder.block.{i}.layer"
        params[f"encoder_layer_{i}"] = {
            "self_attention": attn(f"{p}.0.SelfAttention"),
            "self_norm": {"scale": get(f"{p}.0.layer_norm.weight")},
            "ff": ff(f"{p}.1.DenseReluDense"),
            "ff_norm": {"scale": get(f"{p}.1.layer_norm.weight")},
        }
    for i in range(config.num_decoder_layers):
        p = f"decoder.block.{i}.layer"
        params[f"decoder_layer_{i}"] = {
            "self_attention": attn(f"{p}.0.SelfAttention"),
            "self_norm": {"scale": get(f"{p}.0.layer_norm.weight")},
            "cross_attention": attn(f"{p}.1.EncDecAttention"),
            "cross_norm": {"scale": get(f"{p}.1.layer_norm.weight")},
            "ff": ff(f"{p}.2.DenseReluDense"),
            "ff_norm": {"scale": get(f"{p}.2.layer_norm.weight")},
        }
    return params
