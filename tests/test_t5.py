"""T5/mT5 tests: HF logits parity, cache decode consistency."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_learned_index_tpu.models.t5 import (
    T5Config,
    T5Model,
    hf_t5_to_flax,
    init_t5_params,
    make_t5_kv_caches,
)


def fp32(cfg: T5Config) -> T5Config:
    return dataclasses.replace(cfg, dtype="float32")


@pytest.fixture(scope="module")
def hf_t5():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFConfig, T5ForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=256,
        d_model=64,
        d_kv=16,
        num_heads=4,
        d_ff=128,
        num_layers=2,
        num_decoder_layers=2,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
        dropout_rate=0.0,
        decoder_start_token_id=0,
        eos_token_id=1,
        pad_token_id=0,
    )
    return T5ForConditionalGeneration(hf_cfg).eval()


def test_hf_t5_logits_parity(hf_t5):
    import torch

    cfg = fp32(T5Config.tiny())
    params = hf_t5_to_flax(hf_t5.state_dict(), cfg)
    rng = np.random.default_rng(0)
    enc_ids = rng.integers(2, 256, (2, 9)).astype(np.int32)
    enc_mask = np.ones((2, 9), dtype=np.int32)
    enc_mask[1, 7:] = 0
    dec_ids = rng.integers(2, 256, (2, 5)).astype(np.int32)
    dec_ids[:, 0] = 0  # decoder start

    with torch.no_grad():
        ref = hf_t5(
            input_ids=torch.tensor(enc_ids, dtype=torch.long),
            attention_mask=torch.tensor(enc_mask, dtype=torch.long),
            decoder_input_ids=torch.tensor(dec_ids, dtype=torch.long),
        ).logits.numpy()

    model = T5Model(cfg)
    got = model.apply(
        {"params": params},
        jnp.asarray(enc_ids),
        jnp.asarray(enc_mask),
        jnp.asarray(dec_ids),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=5e-4)


def test_t5_cache_decode_matches_teacher_forcing():
    cfg = fp32(T5Config.tiny())
    params = init_t5_params(cfg, jax.random.PRNGKey(0))
    model = T5Model(cfg)
    rng = np.random.default_rng(1)
    enc_ids = jnp.asarray(rng.integers(2, 256, (2, 7)), dtype=jnp.int32)
    enc_mask = jnp.ones((2, 7), dtype=jnp.int32)
    dec_ids = rng.integers(2, 256, (2, 4)).astype(np.int32)
    dec_ids[:, 0] = 0

    full = model.apply(
        {"params": params}, enc_ids, enc_mask, jnp.asarray(dec_ids)
    )

    enc_out = model.apply({"params": params}, enc_ids, enc_mask, method=T5Model.encode)
    cross_kvs = model.apply(
        {"params": params}, enc_out, method=T5Model.compute_cross_kvs
    )
    caches = make_t5_kv_caches(cfg, 2, 6, dtype=jnp.float32)
    for t in range(4):
        step_logits, caches = model.apply(
            {"params": params},
            jnp.asarray(dec_ids[:, t : t + 1]),
            enc_out,
            enc_mask,
            kv_caches=caches,
            cache_index=t,
            cross_kvs=cross_kvs,
            method=T5Model.decode,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full[:, t]),
            atol=1e-4,
            rtol=1e-4,
        )


def test_t5_greedy_matches_hf_generate(hf_t5):
    import torch

    from improving_learned_index_tpu.core.config import GenerationConfig
    from improving_learned_index_tpu.expand.t5_generate import T5Sampler

    cfg = fp32(T5Config.tiny())
    params = hf_t5_to_flax(hf_t5.state_dict(), cfg)
    rng = np.random.default_rng(2)
    enc_ids = rng.integers(2, 256, (2, 8)).astype(np.int32)
    enc_mask = np.ones((2, 8), dtype=np.int32)

    gen = GenerationConfig(num_return_sequences=1, max_new_tokens=5, do_sample=False)
    sampler = T5Sampler(cfg, gen, decoder_start_token_id=0, eos_token_id=1)
    got = sampler.generate(params, enc_ids, enc_mask, seed=0)

    with torch.no_grad():
        ref = hf_t5.generate(
            input_ids=torch.tensor(enc_ids, dtype=torch.long),
            attention_mask=torch.tensor(enc_mask, dtype=torch.long),
            max_new_tokens=5,
            do_sample=False,
        )[:, 1:].numpy()  # drop decoder_start
    # pad ref to 5 with eos
    padded = np.full((2, 5), 1, dtype=np.int64)
    padded[:, : ref.shape[1]] = ref
    np.testing.assert_array_equal(got[:, :1], padded[:, :1])  # first token exact
    # full agreement expected too on most seeds; tolerate near-ties like llama
    agree = (got == padded).mean()
    assert agree >= 0.6, (got, padded)


def test_t5_query_generator_end_to_end():
    from improving_learned_index_tpu.core.config import GenerationConfig
    from improving_learned_index_tpu.expand.t5_generate import T5QueryGenerator

    class ByteTok:
        def encode(self, t):
            return [b % 250 + 2 for b in t.encode()[:50]] + [1]

        def decode(self, ids):
            return bytes((i - 2) % 256 for i in ids if i >= 2).decode("utf-8", "ignore")

    cfg = fp32(T5Config.tiny())
    params = init_t5_params(cfg, jax.random.PRNGKey(3))
    gen = GenerationConfig(num_return_sequences=2, max_new_tokens=6, top_k=20, top_p=0.9)
    qg = T5QueryGenerator(params, cfg, ByteTok(), gen)
    out = qg.generate(["some document text", "another doc"], seed=1)
    assert len(out) == 2 and all(len(q) == 2 for q in out)
    assert all(isinstance(s, str) for q in out for s in q)


def test_t5_sampler_int8_params():
    """T5 decode with a weight-only int8 tree (models.quantization)."""
    import jax
    import numpy as np

    from improving_learned_index_tpu.core.config import GenerationConfig
    from improving_learned_index_tpu.expand.t5_generate import T5Sampler
    from improving_learned_index_tpu.models.quantization import quantize_params_int8
    from improving_learned_index_tpu.models.t5 import T5Config, T5Model, init_t5_params

    config = T5Config.tiny()
    params = init_t5_params(config, jax.random.PRNGKey(0))
    qparams = quantize_params_int8(jax.device_get(params))
    sampler = T5Sampler(
        config, GenerationConfig(max_new_tokens=5, num_return_sequences=2, top_k=8),
        eos_token_id=1, decoder_start_token_id=0,
    )
    ids = np.array([[3, 7, 9, 2]], dtype=np.int32)
    mask = np.ones_like(ids)
    out = sampler.generate(qparams, ids, mask, num_return_sequences=2, seed=0)
    assert out.shape == (2, 5)
    out2 = sampler.generate(qparams, ids, mask, num_return_sequences=2, seed=0)
    np.testing.assert_array_equal(out, out2)
