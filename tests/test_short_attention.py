"""Short-sequence Pallas attention vs the XLA attention path (interpreter
mode on CPU), including padding masks and gradients through the custom vjp."""

import numpy as np
import pytest

import improving_learned_index_tpu.ops.short_attention as sa


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(sa, "interpret", True)


def _setup(use_short):
    import dataclasses

    import jax

    from improving_learned_index_tpu.core.config import EncoderConfig
    from improving_learned_index_tpu.models.encoder import DeepImpactModel, init_params

    config = EncoderConfig(
        vocab_size=128,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        max_position_embeddings=256,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        use_short_attention=use_short,
    )
    module = DeepImpactModel(config)
    params = init_params(module, config, jax.random.PRNGKey(0), max_length=16)
    return module, params


def test_model_forward_matches_xla_path():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, s = 3, 128
    ids = rng.integers(1, 128, (b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[0, 90:] = 0  # padded tail
    mask[2, 50:] = 0
    type_ids = np.zeros((b, s), np.int32)

    module, params = _setup(True)
    module_ref, _ = _setup(False)
    out_kernel = np.asarray(
        module.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(type_ids))
    )
    out_ref = np.asarray(
        module_ref.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(type_ids))
    )
    # same math up to bf16 accumulation-order differences
    np.testing.assert_allclose(out_kernel, out_ref, rtol=0.05, atol=0.05)
    # padded positions must not contaminate valid ones: compare valid region only
    valid = mask.astype(bool)
    assert np.isfinite(out_kernel[valid]).all()


def test_gradients_flow_through_custom_vjp():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    b, h, s, d = 2, 2, 128, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    seg = jnp.ones((b, s), jnp.int32)

    def loss(q, k, v):
        return jnp.sum(sa.short_attention(q, k, v, seg, 0.25) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        arr = np.asarray(gi)
        assert np.isfinite(arr).all() and np.abs(arr).max() > 0

    # backward matches the reference implementation's gradient
    def loss_ref(q, k, v):
        return jnp.sum(sa._reference_attention(q, k, v, seg, 0.25) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gi, gr in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gr), rtol=0.1, atol=0.05)
