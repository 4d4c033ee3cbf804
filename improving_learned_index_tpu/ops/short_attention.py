"""Pallas attention kernel for short sequences (the retrieval encode path).

At the encoder's geometry (S=256, bert-base, B=512) the XLA attention path
materializes fp32 [B, H, S, S] logits in HBM and runs softmax over them —
profiled at ~165ms of a 259ms forward (the ``convert_reduce`` fusions), more
than every matmul combined.  The stock Pallas flash kernel is built for long
sequences (streaming KV blocks, online softmax) and measured SLOWER here
(1289 vs 1778 docs/s): its blocking machinery costs more than it saves when
S is tiny.

For S <= 512 the whole [S, S] attention matrix for one (batch, head) fits
VMEM with room to spare, so this kernel does the obvious thing: grid over
(batch, head), one program computes q@k^T, a masked fp32 softmax, and
probs@v entirely on-chip.  HBM traffic collapses to the q/k/v reads and the
context write (~131KB per (b, h) at S=256 vs ~1MB of fp32 logits traffic).

Numerics match the XLA path: fp32 logits and softmax (stable, max-
subtracted), bf16 probs into the context matmul.  Padding keys are masked
with -1e9 like the additive attention-bias path; padded query rows produce
garbage that downstream term-gathering never reads (same as XLA).

Inference-only by construction: the wrapper is wrapped in ``jax.custom_vjp``
whose backward recomputes attention with plain jnp ops, so training through
it works and costs what the XLA path always cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

interpret = False  # tests flip this to run on the CPU backend


def _attn_kernel(q_ref, k_ref, v_ref, seg_ref, segc_ref, o_ref, *, sm_scale, packed):
    # One grid program per batch element, all heads batched into one pair of
    # MXU matmuls — a (batch, head) grid (tiny [S, D] operands) measured no
    # faster than XLA: per-program overhead swamped the work.  Inputs arrive
    # pre-transposed to [B, H, S, D]: an in-kernel jnp.swapaxes on natural
    # [S, H, D] tiles measured ~11ms/layer of Mosaic relayout — far worse
    # than the XLA-side HBM transposes it replaced (401 vs 267 ms/step at
    # the bench geometry).
    q = q_ref[0].astype(jnp.bfloat16)  # [H, S, D]
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, S, S] fp32, on-chip
    logits = logits * sm_scale
    seg = seg_ref[0, :, :]  # [1, S]; 0 = padding key
    if packed:
        # sequence-packed rows: tokens attend only within their own segment
        # (block-diagonal).  exp(-1e9 - max) underflows to exactly 0, so
        # cross-document probabilities contribute exact zeros to the context
        # matmul — packed outputs match unpacked ones bit-for-bit up to
        # accumulation tiling.  The column orientation arrives as its own
        # input ([S, 1], transposed by XLA outside the kernel): deriving it
        # in-kernel from the [1, S] row would be a sublane<->lane relayout
        # that Mosaic lowers through an unsupported gather.
        allowed = segc_ref[0, :, :] == seg  # [S, 1] == [1, S] -> [S, S]
        logits = logits + jnp.where(allowed, 0.0, -1e9)[None, :, :]
    else:
        logits = logits + jnp.where(seg == 0, -1e9, 0.0)[None, :, :]
    m = jnp.max(logits, axis=2, keepdims=True)
    p = jnp.exp(logits - m)
    probs = (p / jnp.sum(p, axis=2, keepdims=True)).astype(jnp.bfloat16)
    ctx = jax.lax.dot_general(
        probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, S, D]
    o_ref[0] = ctx.astype(o_ref.dtype)


def _short_attention_fwd_impl(q, k, v, segment_mask, sm_scale, packed=False):
    b, h, s, d = q.shape
    kernel = functools.partial(_attn_kernel, sm_scale=sm_scale, packed=packed)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, s, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, s, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, k, v, segment_mask[:, None, :], segment_mask[:, :, None])


def _reference_attention(q, k, v, segment_mask, sm_scale, packed=False):
    """The XLA path's math, used for the custom-vjp backward."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
    ).astype(jnp.float32)
    logits = logits * sm_scale
    if packed:
        allowed = segment_mask[:, None, :, None] == segment_mask[:, None, None, :]
        bias = jnp.where(allowed, 0.0, -1e9)
    else:
        bias = jnp.where(segment_mask == 0, -1e9, 0.0)[:, None, None, :]
    probs = jax.nn.softmax(logits + bias, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.bfloat16)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def short_attention(q, k, v, segment_mask, sm_scale, packed=False):
    """Batched attention for S <= 512.

    q, k, v: [B, H, S, D]; segment_mask: [B, S] int.  With ``packed=False``
    the mask is a key-padding mask (0 = padding key).  With ``packed=True``
    it carries sequence-packing segment ids (0 = padding, 1..n per packed
    document); tokens attend only within their own segment.
    Returns [B, H, S, D] in q's dtype.
    """
    return _short_attention_fwd_impl(q, k, v, segment_mask, sm_scale, packed)


def _fwd(q, k, v, segment_mask, sm_scale, packed):
    return _short_attention_fwd_impl(q, k, v, segment_mask, sm_scale, packed), (
        q, k, v, segment_mask,
    )


def _bwd(sm_scale, packed, res, g):
    q, k, v, segment_mask = res
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_attention(q, k, v, segment_mask, sm_scale, packed),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


short_attention.defvjp(_fwd, _bwd)


def can_use_short_attention(seq_len: int, head_dim: int) -> bool:
    # S capped at 256: only S=256 is benchmarked, and an S=512/12-head
    # compile attempt on v5e did not finish within 20 minutes (the fp32
    # [H, S, S] logits/exp intermediates approach VMEM capacity) — at 512+
    # the stock flash-attention path is used instead.
    if seq_len > 256 or seq_len % 128 != 0:
        return False
    if head_dim % 8 != 0:
        return False
    if interpret:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
