"""T5/mT5 doc2query generation.

Capability parity with the reference T5QueryGenerator
(src/llama2/generate.py:82-101, generate_t5.py:22-77: documents in, N
sampled queries out, no prompt template — T5 consumes the document
directly).  Encoder runs once per prompt; decoder runs as a jitted
``lax.while_loop`` with self-attention KV caches and precomputed
cross-attention K/V.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GenerationConfig
from ..models.t5 import T5Config, T5Model, make_t5_kv_caches
from .sampling import top_k_top_p_filter


class T5Sampler:
    def __init__(
        self,
        config: T5Config,
        gen: GenerationConfig,
        decoder_start_token_id: int = 0,
        eos_token_id: int = 1,
    ):
        self.config = config
        self.gen = gen
        self.module = T5Model(config)
        module = self.module
        max_new = gen.max_new_tokens
        top_k, top_p, temp = gen.top_k, gen.top_p, gen.temperature
        do_sample = gen.do_sample
        start_id, eos = decoder_start_token_id, eos_token_id

        @jax.jit
        def run(params, enc_ids, enc_mask, rng):
            # int8 weight-only support (models.quantization): dequantize per
            # use; the while_loop captures the int8 tree and the body
            # dequantizes behind an optimization_barrier so the fp weights
            # never become a loop-lifetime capture (see expand.sampling).
            from ..models.quantization import dequantize_params

            def deq(pr):
                return dequantize_params(pr, dtype=jnp.float32)

            bsz = enc_ids.shape[0]
            enc_out = module.apply({"params": deq(params)}, enc_ids, enc_mask, method=T5Model.encode)
            cross_kvs = module.apply(
                {"params": deq(params)}, enc_out, method=T5Model.compute_cross_kvs
            )
            caches = make_t5_kv_caches(config, bsz, max_new + 1)

            def sample_token(logits, rng):
                if do_sample:
                    logits = logits / jnp.maximum(temp, 1e-6)
                    logits = top_k_top_p_filter(logits, top_k, top_p)
                    return jax.random.categorical(rng, logits, axis=-1)
                return jnp.argmax(logits, axis=-1)

            out_tokens = jnp.full((bsz, max_new), eos, dtype=jnp.int32)

            def cond(state):
                t, _, _, finished, _ = state
                return jnp.logical_and(t < max_new, ~jnp.all(finished))

            def body(state):
                t, caches, out_tokens, finished, rng = state
                cur = jnp.where(t == 0, jnp.full((bsz,), start_id, jnp.int32), out_tokens[:, jnp.maximum(t - 1, 0)])
                step_params = deq(jax.lax.optimization_barrier(params))
                logits, caches = module.apply(
                    {"params": step_params},
                    cur[:, None],
                    enc_out,
                    enc_mask,
                    kv_caches=caches,
                    cache_index=t,
                    cross_kvs=cross_kvs,
                    method=T5Model.decode,
                )
                rng, step_rng = jax.random.split(rng)
                nxt = sample_token(logits[:, 0, :], step_rng).astype(jnp.int32)
                nxt = jnp.where(finished, eos, nxt)
                out_tokens = out_tokens.at[:, t].set(nxt)
                finished = jnp.logical_or(finished, nxt == eos)
                return (t + 1, caches, out_tokens, finished, rng)

            state = (jnp.asarray(0), caches, out_tokens, jnp.zeros((bsz,), bool), rng)
            _, _, out_tokens, _, _ = jax.lax.while_loop(cond, body, state)
            return out_tokens

        self._run = run

    def generate(
        self,
        params,
        enc_ids: np.ndarray,
        enc_mask: np.ndarray,
        num_return_sequences: int = 1,
        seed: int = 0,
    ) -> np.ndarray:
        if num_return_sequences > 1:
            enc_ids = np.repeat(enc_ids, num_return_sequences, axis=0)
            enc_mask = np.repeat(enc_mask, num_return_sequences, axis=0)
        out = self._run(
            params,
            jnp.asarray(enc_ids, dtype=jnp.int32),
            jnp.asarray(enc_mask, dtype=jnp.int32),
            jax.random.PRNGKey(seed),
        )
        return np.asarray(out)


class T5QueryGenerator:
    """Documents -> N sampled queries each (reference T5 contract)."""

    def __init__(
        self,
        params,
        config: T5Config,
        tokenizer,  # encode(text)->ids (no specials needed beyond eos), decode(ids)->str
        gen: GenerationConfig = GenerationConfig(),
        pad_token_id: int = 0,
        eos_token_id: int = 1,
        decoder_start_token_id: int = 0,
    ):
        self.params = params
        self.tokenizer = tokenizer
        self.gen = gen
        self.pad_token_id = pad_token_id
        self.eos_token_id = eos_token_id
        self.sampler = T5Sampler(
            config, gen, decoder_start_token_id=decoder_start_token_id, eos_token_id=eos_token_id
        )

    def generate(self, documents: List[str], seed: int = 0) -> List[List[str]]:
        encoded = [
            self.tokenizer.encode(d)[: self.gen.max_tokens] for d in documents
        ]
        max_len = max(len(e) for e in encoded)
        ids = np.full((len(encoded), max_len), self.pad_token_id, dtype=np.int32)
        mask = np.zeros((len(encoded), max_len), dtype=np.int32)
        for i, e in enumerate(encoded):  # right padding (encoder side)
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        out = self.sampler.generate(
            self.params, ids, mask, num_return_sequences=self.gen.num_return_sequences, seed=seed
        )
        n = self.gen.num_return_sequences
        queries: List[List[str]] = []
        for i in range(len(documents)):
            decoded = []
            for j in range(n):
                toks = out[i * n + j]
                toks = toks[toks != self.eos_token_id]
                text = self.tokenizer.decode([int(t) for t in toks])
                decoded.append(re.sub(r"\s{2,}", " ", text).strip())
            queries.append(decoded)
        return queries
