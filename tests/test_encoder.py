"""Encoder forward tests, including numerical parity against the torch
reference architecture (transformers BertModel/RobertaModel) after HF weight
import — the round-1 parity gate from SURVEY.md §7 build order step 1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_learned_index_tpu.core.config import EncoderConfig
from improving_learned_index_tpu.models.encoder import (
    DeepImpactModel,
    TransformerEncoder,
    init_params,
)
from improving_learned_index_tpu.models.hf_import import (
    hf_deep_impact_to_flax,
    hf_encoder_to_flax,
)


def fp32(cfg: EncoderConfig) -> EncoderConfig:
    import dataclasses

    return dataclasses.replace(cfg, dtype="float32")


def test_forward_shapes():
    cfg = EncoderConfig.tiny()
    model = DeepImpactModel(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    ids = jnp.ones((2, 16), dtype=jnp.int32)
    out = model.apply({"params": params}, ids, jnp.ones_like(ids), jnp.zeros_like(ids))
    assert out.shape == (2, 16, 1)
    assert bool(jnp.all(out >= 0))  # ReLU head


def test_softplus_head_positive():
    cfg = EncoderConfig.tiny(impact_activation="softplus")
    model = DeepImpactModel(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    ids = jnp.ones((1, 8), dtype=jnp.int32)
    out = model.apply({"params": params}, ids, jnp.ones_like(ids), jnp.zeros_like(ids))
    assert bool(jnp.all(out > 0))  # softplus strictly positive


def _torch_bert(cfg: EncoderConfig, seed: int = 0):
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    torch.manual_seed(seed)
    hf_cfg = BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=cfg.pad_token_id,
    )
    return BertModel(hf_cfg).eval()


def test_torch_parity_trunk():
    """Imported HF weights produce the same last_hidden_state as torch."""
    import torch

    cfg = fp32(EncoderConfig.tiny(vocab_size=128))
    hf = _torch_bert(cfg)
    params = hf_encoder_to_flax(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 12)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 9:] = 0
    ids[1, 9:] = cfg.pad_token_id

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.zeros_like(torch.tensor(ids, dtype=torch.long)),
        ).last_hidden_state.numpy()

    enc = TransformerEncoder(cfg)
    got = enc.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask), jnp.zeros_like(jnp.asarray(ids))
    )
    got = np.asarray(got)
    # compare only unmasked positions (pad positions are free)
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=2e-4, rtol=2e-4)


def test_torch_parity_impact_scores():
    """Full DeepImpact head parity: Linear + ReLU over the trunk output."""
    import torch

    cfg = fp32(EncoderConfig.tiny(vocab_size=128))
    hf = _torch_bert(cfg, seed=1)
    head = torch.nn.Linear(cfg.hidden_size, 1)
    torch.manual_seed(2)
    torch.nn.init.normal_(head.weight, std=0.1)
    torch.nn.init.zeros_(head.bias)

    sd = {f"bert.{k}": v for k, v in hf.state_dict().items()}
    sd["impact_score_encoder.0.weight"] = head.weight
    sd["impact_score_encoder.0.bias"] = head.bias
    params = hf_deep_impact_to_flax(sd, cfg)

    rng = np.random.default_rng(3)
    ids = rng.integers(1, 128, (2, 10)).astype(np.int32)
    mask = np.ones_like(ids)

    with torch.no_grad():
        hidden = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state
        ref = torch.relu(head(hidden)).numpy()

    model = DeepImpactModel(cfg)
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask), jnp.zeros_like(jnp.asarray(ids))
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_roberta_position_ids():
    """RoBERTa-family position ids skip pads and offset past pad_token_id."""
    from improving_learned_index_tpu.models.encoder import make_position_ids

    cfg = EncoderConfig.xlmr_base(vocab_size=100, hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64)
    ids = jnp.asarray([[5, 7, 9, 1, 1]], dtype=jnp.int32)  # pad_token_id = 1
    pos = make_position_ids(ids, cfg)
    np.testing.assert_array_equal(np.asarray(pos), [[2, 3, 4, 1, 1]])
