"""Autoregressive sampling with a static-shape KV cache.

Replaces HF ``model.generate`` in the reference expansion path
(src/llama2/generate.py:53-62: do_sample with top_k=50, top_p=0.95,
num_return_sequences=80, max_new_tokens=50 — defaults in
src/utils/defaults.py:41-45).  TPU-first: one jitted prefill + one jitted
``lax.while_loop`` decode covering all steps, static shapes throughout,
per-call PRNG keys.  ``num_return_sequences`` is realized by tiling the
prompt batch — the decode batch feeds the MXU instead of looping.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GenerationConfig
from ..models.llama import LlamaConfig, LlamaModel, make_kv_caches
from ..models.quantization import dequantize_params


def top_k_top_p_filter(logits: jnp.ndarray, top_k: int, top_p: float) -> jnp.ndarray:
    """Standard nucleus + top-k filtering (HF semantics: top_k first, then
    top_p keeps the smallest prefix with cumulative prob > p, always
    keeping the best token)."""
    vocab = logits.shape[-1]
    if top_k > 0 and top_k < vocab:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while cumulative prob (excluding current) < top_p
        keep_sorted = (cum - probs) < top_p
        # threshold logit: smallest kept logit
        kept = jnp.where(keep_sorted, sorted_logits, jnp.inf)
        threshold = jnp.min(kept, axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return logits


class Sampler:
    """Jitted prefill + while-loop decode for a LlamaModel."""

    def __init__(self, config: LlamaConfig, gen: GenerationConfig, eos_token_id: int = 2):
        self.config = config
        self.gen = gen
        self.eos = eos_token_id
        self.module = LlamaModel(config)

        module, eos = self.module, self.eos
        max_new = gen.max_new_tokens
        top_k, top_p, temp = gen.top_k, gen.top_p, gen.temperature
        do_sample = gen.do_sample

        @jax.jit
        def run(params, input_ids, attention_mask, rng):
            # int8 weight-only support: {"q","s"} leaves dequantize AT EACH
            # USE, never as a whole tree.  The decode while_loop must capture
            # the int8 tree, not the dequantized one — a bf16 tree captured
            # by the loop stays live for the loop's entire duration (13.4GB
            # for 7B -> OOM on a 16GB chip).  Inside the body an
            # optimization_barrier pins the dequant to the loop iteration so
            # XLA's loop-invariant code motion can't hoist the full-precision
            # weights back out.  Full-precision trees pass through unchanged.
            def deq(p):
                return dequantize_params(p, dtype=jnp.dtype(config.dtype))

            bsz, prompt_len = input_ids.shape
            total = prompt_len + max_new
            caches = make_kv_caches(config, bsz, total)

            # positions: left-padded prompts count only real tokens
            positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
            prompt_lens = jnp.sum(attention_mask, axis=1)  # [B]

            slot_mask = jnp.concatenate(
                [attention_mask, jnp.zeros((bsz, max_new), dtype=attention_mask.dtype)],
                axis=1,
            )
            logits, caches = module.apply(
                {"params": deq(params)},
                input_ids,
                slot_mask,
                positions=positions,
                kv_caches=caches,
                cache_index=0,
            )
            last_logits = logits[:, -1, :]  # prompt is right-aligned (left pad)

            def sample_token(logits, rng):
                if do_sample:
                    logits = logits / jnp.maximum(temp, 1e-6)
                    logits = top_k_top_p_filter(logits, top_k, top_p)
                    return jax.random.categorical(rng, logits, axis=-1)
                return jnp.argmax(logits, axis=-1)

            rng, step_rng = jax.random.split(rng)
            next_tok = sample_token(last_logits, step_rng).astype(jnp.int32)

            out_tokens = jnp.zeros((bsz, max_new), dtype=jnp.int32)
            out_tokens = out_tokens.at[:, 0].set(next_tok)
            finished = next_tok == eos

            def cond(state):
                t, _, _, _, finished, _ = state
                return jnp.logical_and(t < max_new, ~jnp.all(finished))

            def body(state):
                t, caches, slot_mask, out_tokens, finished, rng = state
                cur = out_tokens[:, t - 1]
                cache_index = prompt_len + t - 1
                slot_mask = slot_mask.at[:, cache_index].set(1)
                pos = (prompt_lens + t - 1)[:, None].astype(jnp.int32)
                step_params = deq(jax.lax.optimization_barrier(params))
                logits, caches = module.apply(
                    {"params": step_params},
                    cur[:, None],
                    slot_mask,
                    positions=pos,
                    kv_caches=caches,
                    cache_index=cache_index,
                )
                rng, step_rng = jax.random.split(rng)
                nxt = sample_token(logits[:, 0, :], step_rng).astype(jnp.int32)
                nxt = jnp.where(finished, eos, nxt)
                out_tokens = out_tokens.at[:, t].set(nxt)
                finished = jnp.logical_or(finished, nxt == eos)
                return (t + 1, caches, slot_mask, out_tokens, finished, rng)

            state = (jnp.asarray(1), caches, slot_mask, out_tokens, finished, rng)
            _, _, _, out_tokens, _, _ = jax.lax.while_loop(cond, body, state)
            return out_tokens

        self._run = run

    def generate(
        self,
        params,
        input_ids: np.ndarray,  # [B, L] left-padded int32
        attention_mask: np.ndarray,
        num_return_sequences: int = 1,
        seed: int = 0,
    ) -> np.ndarray:
        """Returns [B * num_return_sequences, max_new_tokens] sampled ids
        (EOS-padded).  Sequence i*k..(i+1)*k are the k samples for prompt i."""
        if num_return_sequences > 1:
            input_ids = np.repeat(input_ids, num_return_sequences, axis=0)
            attention_mask = np.repeat(attention_mask, num_return_sequences, axis=0)
        out = self._run(
            params,
            jnp.asarray(input_ids, dtype=jnp.int32),
            jnp.asarray(attention_mask, dtype=jnp.int32),
            jax.random.PRNGKey(seed),
        )
        return np.asarray(out)
