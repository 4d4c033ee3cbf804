"""Transformer encoder trunk + impact heads (flax).

TPU-first re-design of the reference encoder stack
(src/deep_impact/models/original.py:41-94, xlmr_original.py:31-85): a
BERT/RoBERTa/XLM-R geometry trunk whose last hidden state feeds a
``Linear(hidden, 1)`` impact head with ReLU (DeepImpact) or Softplus
(XLM-R variant).  Differences from the torch reference are deliberate:

- parameters stay fp32, matmuls run in bfloat16 via the ``dtype`` policy so
  the MXU is fed natively (replacing CUDA AMP autocast);
- everything is a pure function of (params, batch) so it jits/pjits; no
  module state, no device placement in the model;
- attention uses one fused ``jnp.einsum`` per projection over [B, L, H] —
  XLA tiles these onto the MXU.

HF checkpoints import via models.hf_import (geometry is kept identical).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderConfig


def _dtype(config: EncoderConfig):
    return jnp.dtype(config.dtype)


def make_position_ids(input_ids: jnp.ndarray, config: EncoderConfig) -> jnp.ndarray:
    """BERT: arange.  RoBERTa-family (position_offset > 0): positions count
    only non-pad tokens and are offset past the pad id, matching HF
    ``create_position_ids_from_input_ids`` so imported position embeddings
    line up."""
    bsz, seq = input_ids.shape
    if config.position_offset == 0:
        return jnp.broadcast_to(jnp.arange(seq, dtype=jnp.int32)[None, :], (bsz, seq))
    mask = (input_ids != config.pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + config.pad_token_id


def make_packed_position_ids(
    segment_ids: jnp.ndarray, config: EncoderConfig
) -> jnp.ndarray:
    """Position ids for sequence-packed rows: positions restart at every
    segment boundary so each packed document sees the same position
    embeddings it would unpacked.  BERT (position_offset == 0): 0..L-1 within
    the segment.  RoBERTa-family: pad_id + 1 + within-segment index on real
    tokens, pad_id on padding (matching make_position_ids for a document
    starting at column 0)."""
    bsz, seq = segment_ids.shape
    idx = jnp.broadcast_to(jnp.arange(seq, dtype=jnp.int32)[None, :], (bsz, seq))
    boundary = jnp.concatenate(
        [
            jnp.ones((bsz, 1), dtype=bool),
            segment_ids[:, 1:] != segment_ids[:, :-1],
        ],
        axis=1,
    )
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, idx, 0), axis=1
    )
    within = idx - start
    if config.position_offset == 0:
        return within
    real = segment_ids > 0
    return jnp.where(real, within + 1 + config.pad_token_id, config.pad_token_id)


class Embeddings(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(
        self, input_ids, type_ids, deterministic: bool = True, position_ids=None
    ):
        c = self.config
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
        pos_ids = position_ids if position_ids is not None else make_position_ids(input_ids, c)
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )(pos_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size, name="token_type_embeddings")(
            type_ids
        )
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)
        x = nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)
        return x.astype(_dtype(c))


def _can_use_short_attn(config: EncoderConfig, seq_len: int, head_dim: int,
                        deterministic: bool, output_attentions: bool) -> bool:
    """The VMEM-resident short-sequence kernel handles S <= 512 when nothing
    needs attention maps or attention-prob dropout (its backward recomputes
    via the XLA math, so training through it is fine)."""
    if not config.use_short_attention or output_attentions:
        return False
    if not deterministic and config.attention_dropout > 0:
        return False
    from ..ops.short_attention import can_use_short_attention

    return can_use_short_attention(seq_len, head_dim)


def _can_use_flash(config: EncoderConfig, seq_len: int, deterministic: bool,
                   output_attentions: bool) -> bool:
    """Flash attention is used on the TPU backend when the shape fits the
    kernel's 128-lane tiling and nothing needs the full attention maps."""
    if not config.use_flash_attention or output_attentions:
        return False
    if not deterministic and config.attention_dropout > 0:
        return False  # the fused kernel has no attention-prob dropout
    if seq_len % 128 != 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class HeadProjection(nn.Module):
    """Per-head projection with DenseGeneral's param tree (kernel
    [H, heads, hd], bias [heads, hd]) that can emit the attention kernels'
    [B, heads, S, hd] layout straight out of the contraction — XLA writes
    the matmul result in that layout for free, where a separate transpose
    op costs a full HBM read+write of the tensor per projection."""

    heads: int
    head_dim: int
    dtype: Any
    transposed_out: bool

    @nn.compact
    def __call__(self, x):
        h = x.shape[-1]
        # fan_in must be the contracted axis (h) like the nn.DenseGeneral this
        # replaces — plain lecun_normal on a 3-D kernel would count heads*h
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", in_axis=0, out_axis=(1, 2)
            ),
            (h, self.heads, self.head_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.heads, self.head_dim))
        xb = x.astype(self.dtype)
        kb = kernel.astype(self.dtype)
        if self.transposed_out:
            return (
                jnp.einsum("bsh,hnd->bnsd", xb, kb)
                + bias.astype(self.dtype)[None, :, None, :]
            )
        return jnp.einsum("bsh,hnd->bsnd", xb, kb) + bias.astype(self.dtype)


class HeadOutputProjection(nn.Module):
    """DenseGeneral(axis=(-2,-1)) equivalent (kernel [heads, hd, H], bias
    [H]) accepting either context layout without a separate transpose."""

    hidden: int
    dtype: Any
    from_transposed: bool

    @nn.compact
    def __call__(self, ctx):
        n, d = (ctx.shape[1], ctx.shape[3]) if self.from_transposed else ctx.shape[2:]
        # contracted axes are (n, d): fan_in = n*d, matching DenseGeneral
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", in_axis=(0, 1), out_axis=2
            ),
            (n, d, self.hidden),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.hidden,))
        kb = kernel.astype(self.dtype)
        eq = "bnsd,ndh->bsh" if self.from_transposed else "bsnd,ndh->bsh"
        return jnp.einsum(eq, ctx.astype(self.dtype), kb) + bias.astype(self.dtype)


class SelfAttention(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        x,
        attention_bias,
        deterministic: bool = True,
        attention_mask=None,
        output_attentions: bool = False,
        packed: bool = False,
    ):
        c = self.config
        head_dim = c.hidden_size // c.num_heads
        dt = _dtype(c)
        use_short = attention_mask is not None and _can_use_short_attn(
            c, x.shape[1], head_dim, deterministic, output_attentions
        )
        use_flash = (
            not use_short
            and attention_mask is not None
            and _can_use_flash(c, x.shape[1], deterministic, output_attentions)
        )
        transposed = use_short or use_flash
        dense = lambda name: HeadProjection(
            c.num_heads, head_dim, dt, transposed_out=transposed, name=name
        )
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)

        if use_short:
            # Short-sequence Pallas attention: the whole [S, S] matrix for
            # one (batch, head) stays VMEM-resident — no fp32 logits in HBM
            # (profiled as ~half the forward at S=256/B=512), none of the
            # long-sequence flash kernel's streaming overhead (which measured
            # SLOWER than XLA here).  ops/short_attention.py.
            from ..ops.short_attention import short_attention

            ctx = short_attention(
                q, k, v,  # already [B, H, S, hd] from the projections
                attention_mask.astype(jnp.int32),
                float(1.0 / np.sqrt(head_dim)),
                packed,
            )
            probs = None
        elif use_flash:
            # Pallas flash attention for longer sequences.  Its SegmentIds
            # masking is equality-based, so packed segment ids work natively.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            seg = attention_mask.astype(jnp.int32)
            ctx = flash_attention(
                q, k, v,
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=float(1.0 / np.sqrt(head_dim)),
            )
            probs = None
        else:
            # [B, H, Lq, Lk] logits in fp32 for a stable softmax.
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            logits = logits / jnp.sqrt(head_dim).astype(jnp.float32)
            logits = logits + attention_bias
            probs = jax.nn.softmax(logits, axis=-1).astype(dt)
            probs = nn.Dropout(c.attention_dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = HeadOutputProjection(
            c.hidden_size, dt, from_transposed=transposed, name="output_dense"
        )(ctx)
        return out, probs


class EncoderLayer(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        x,
        attention_bias,
        deterministic: bool = True,
        attention_mask=None,
        output_attentions: bool = False,
        packed: bool = False,
    ):
        c = self.config
        dt = _dtype(c)
        attn_out, probs = SelfAttention(c, name="attention")(
            x, attention_bias, deterministic, attention_mask, output_attentions, packed
        )
        attn_out = nn.Dropout(c.hidden_dropout)(attn_out, deterministic=deterministic)
        # fp32 LayerNorm (a Pallas LN measured no faster: the cost here is
        # residual-stream traffic, not the reduction)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="attention_norm")(
            (x + attn_out).astype(jnp.float32)
        ).astype(dt)

        h = nn.Dense(c.intermediate_size, dtype=dt, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=dt, name="output")(h)
        h = nn.Dropout(c.hidden_dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="output_norm")(
            (x + h).astype(jnp.float32)
        ).astype(dt)
        return x, probs


class TransformerEncoder(nn.Module):
    """BERT-family trunk returning the last hidden state [B, L, H] (fp32)."""

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        type_ids=None,
        deterministic: bool = True,
        output_attentions: bool = False,
        segment_ids=None,
    ):
        c = self.config
        if type_ids is None:
            type_ids = jnp.zeros_like(input_ids)
        if segment_ids is not None:
            # sequence-packed batch (text/packing.py): block-diagonal
            # attention within each packed document, positions restart per
            # segment.  The kernels get the raw segment ids; the additive
            # bias encodes segment equality for the XLA path.
            pos_ids = make_packed_position_ids(segment_ids, c)
            x = Embeddings(c, name="embeddings")(
                input_ids, type_ids, deterministic, position_ids=pos_ids
            )
            allowed = (
                segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
            )
            bias = jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min).astype(
                jnp.float32
            )
            kernel_mask = segment_ids
        else:
            x = Embeddings(c, name="embeddings")(input_ids, type_ids, deterministic)
            # additive attention bias: 0 for real tokens, large negative for pads.
            bias = jnp.where(
                attention_mask[:, None, None, :].astype(bool), 0.0, jnp.finfo(jnp.float32).min
            ).astype(jnp.float32)
            kernel_mask = attention_mask
        attentions = []
        for i in range(c.num_layers):
            x, probs = EncoderLayer(c, name=f"layer_{i}")(
                x,
                bias,
                deterministic,
                kernel_mask,
                output_attentions,
                packed=segment_ids is not None,
            )
            if output_attentions:
                attentions.append(probs.astype(jnp.float32))
        x = x.astype(jnp.float32)
        if output_attentions:
            return x, attentions
        return x


class ImpactHead(nn.Module):
    """Linear(hidden, 1) + ReLU | Softplus — one scalar impact per token
    (reference original.py:44-47, xlmr_original.py:34-38)."""

    activation: str = "relu"

    @nn.compact
    def __call__(self, hidden_states):
        score = nn.Dense(1, dtype=jnp.float32, name="dense")(hidden_states)
        if self.activation == "relu":
            return nn.relu(score)
        if self.activation == "softplus":
            return nn.softplus(score)
        raise ValueError(f"unknown impact activation {self.activation}")


class DeepImpactModel(nn.Module):
    """Trunk + per-token impact head -> [B, L, 1] impact scores."""

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        type_ids=None,
        deterministic=True,
        segment_ids=None,
    ):
        hidden = TransformerEncoder(self.config, name="encoder")(
            input_ids, attention_mask, type_ids, deterministic,
            segment_ids=segment_ids,
        )
        return ImpactHead(self.config.impact_activation, name="impact_head")(hidden)


class CrossEncoderModel(nn.Module):
    """Trunk + head on the [CLS] hidden state -> [B, 1] relevance score
    (reference models/cross_encoder.py:9-37)."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, type_ids=None, deterministic=True):
        hidden = TransformerEncoder(self.config, name="encoder")(
            input_ids, attention_mask, type_ids, deterministic
        )
        return ImpactHead(self.config.impact_activation, name="impact_head")(
            hidden[:, 0, :]
        )


def init_params(
    model: nn.Module, config: EncoderConfig, rng: jax.Array, max_length: int = 16
) -> Dict[str, Any]:
    dummy = jnp.ones((1, max_length), dtype=jnp.int32)
    return model.init(
        {"params": rng}, dummy, jnp.ones_like(dummy), jnp.zeros_like(dummy)
    )["params"]
