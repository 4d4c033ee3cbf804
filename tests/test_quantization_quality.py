"""Weight-only quantization QUALITY on a non-toy, locally-TRAINED LM
(VERDICT round-2 ask #5): previous int8/int4 parity tests used random
LlamaConfig.tiny weights, which say nothing about whether quantization
preserves what a trained model generates.

Here a mid-size decoder (4 layers / 256 hidden / 512-token vocab) is trained
a few hundred steps on a deterministic synthetic grammar until it continues
sequences correctly, then greedy decoding (the quality-sensitive mode:
argmax flips on any logit perturbation near a tie) is compared between the
fp32 weights and their int8 / packed-int4 forms.

Reference workload being modeled: 4-bit NF4 Llama-2 doc2query decode
(src/llama2/generate.py:37-45)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from improving_learned_index_tpu.core.config import GenerationConfig
from improving_learned_index_tpu.expand.finetune import causal_lm_loss
from improving_learned_index_tpu.expand.sampling import Sampler
from improving_learned_index_tpu.models.llama import (
    LlamaConfig,
    LlamaModel,
    init_llama_params,
)
from improving_learned_index_tpu.models.quantization import (
    quantize_params_int4,
    quantize_params_int8,
)

VOCAB = 512
SEQ = 32


def _config() -> LlamaConfig:
    return LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=256,
        num_layers=4,
        num_heads=4,
        num_kv_heads=4,
        intermediate_size=512,
        max_position_embeddings=128,
        dtype="float32",  # fp32 baseline: quantization is the only delta
    )


def _grammar_batch(rng: np.random.Generator, batch: int) -> np.ndarray:
    """Deterministic next-token structure: arithmetic token walks
    t_{i+1} = (t_i + stride) % VOCAB with a per-sequence stride in [3, 11).
    A correct model must infer the stride from context."""
    starts = rng.integers(4, VOCAB, batch)
    strides = rng.integers(3, 11, batch)
    idx = np.arange(SEQ)
    return ((starts[:, None] + strides[:, None] * idx) % VOCAB).astype(np.int32)


@pytest.fixture(scope="module")
def trained_lm():
    cfg = _config()
    module = LlamaModel(cfg)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids):
        def loss_fn(p):
            mask = jnp.ones_like(ids)
            logits, _ = module.apply({"params": p}, ids, mask)
            # causal_lm_loss shifts internally (labels[:, 1:] vs logits[:, :-1])
            return causal_lm_loss(logits, ids)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    first = last = None
    for i in range(600):
        params, opt_state, loss = step(params, opt_state, _grammar_batch(rng, 32))
        if i == 0:
            first = float(loss)
        last = float(loss)
    assert last < first * 0.25, f"LM did not train: {first} -> {last}"
    return cfg, params


class _IdTok:
    def encode(self, text):
        return [int(t) for t in text.split()]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def _greedy_continuations(cfg, params, prompts: np.ndarray, max_new: int = 24):
    gen = GenerationConfig(
        num_return_sequences=1, max_new_tokens=max_new, do_sample=False,
        max_tokens=SEQ,
    )
    sampler = Sampler(cfg, gen, eos_token_id=1)  # eos never emitted by grammar
    mask = np.ones_like(prompts)
    return np.asarray(sampler.generate(params, prompts, mask, num_return_sequences=1))


@pytest.mark.slow
def test_trained_greedy_decode_and_quantized_agreement(trained_lm):
    cfg, params = trained_lm
    rng = np.random.default_rng(7)
    prompts = _grammar_batch(rng, 16)[:, :16]  # 16 seen tokens, continue 24

    fp = _greedy_continuations(cfg, params, prompts)

    # sanity: the TRAINED model actually learned the grammar (fp32 continues
    # the stride walk with high accuracy)
    strides = (prompts[:, 1] - prompts[:, 0]) % VOCAB
    idx = np.arange(1, fp.shape[1] + 1)
    expect = (prompts[:, -1][:, None] + strides[:, None] * idx) % VOCAB
    fp_acc = float((fp == expect).mean())
    assert fp_acc > 0.9, f"trained fp32 grammar accuracy {fp_acc}"

    q8 = _greedy_continuations(cfg, quantize_params_int8(params), prompts)
    q4 = _greedy_continuations(cfg, quantize_params_int4(params), prompts)

    agree8 = float((q8 == fp).mean())
    agree4 = float((q4 == fp).mean())
    # int8 weight-only: near-lossless greedy agreement; packed int4 loses
    # some tokens but must preserve the bulk of trained behavior
    assert agree8 >= 0.95, f"int8 greedy agreement {agree8}"
    assert agree4 >= 0.70, f"int4 greedy agreement {agree4}"

    # and the quantized models must still be RIGHT, not just self-consistent
    q8_acc = float((q8 == expect).mean())
    q4_acc = float((q4 == expect).mean())
    assert q8_acc > 0.9, f"int8 grammar accuracy {q8_acc}"
    assert q4_acc > 0.6, f"int4 grammar accuracy {q4_acc}"


@pytest.mark.slow
def test_trained_greedy_decode_int8_kv_cache_agreement(trained_lm):
    """int8 KV-cache quantization (models/llama._kv_quantize) must preserve
    the TRAINED model's greedy continuations — the serving mode where the
    cache is the decode-batch HBM ceiling at 7B."""
    import dataclasses

    cfg, params = trained_lm
    rng = np.random.default_rng(11)
    prompts = _grammar_batch(rng, 16)[:, :16]

    fp = _greedy_continuations(cfg, params, prompts)
    kv8 = _greedy_continuations(
        dataclasses.replace(cfg, kv_quant="int8"), params, prompts
    )

    agree = float((kv8 == fp).mean())
    assert agree >= 0.95, f"int8-KV greedy agreement {agree}"

    strides = (prompts[:, 1] - prompts[:, 0]) % VOCAB
    idx = np.arange(1, kv8.shape[1] + 1)
    expect = (prompts[:, -1][:, None] + strides[:, None] * idx) % VOCAB
    acc = float((kv8 == expect).mean())
    assert acc > 0.9, f"int8-KV grammar accuracy {acc}"
