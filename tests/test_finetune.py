"""doc2query LoRA fine-tuning: prompt masking, adapter-only updates,
loss decrease, merge round trip."""

import jax
import numpy as np

from improving_learned_index_tpu.expand.finetune import (
    IGNORE_INDEX,
    Doc2QueryFineTuner,
    build_example,
    causal_lm_loss,
    collate_examples,
)
from improving_learned_index_tpu.models.llama import LlamaConfig, init_llama_params


class ByteTok:
    def encode(self, t):
        return [1] + [b % 250 + 4 for b in t.encode("utf-8")[:60]]

    def decode(self, ids):
        return bytes((i - 4) % 256 for i in ids if i >= 4).decode("utf-8", "ignore")


def test_build_example_prompt_masked():
    tok = ByteTok()
    ids, labels = build_example(tok, "doc text", "a query", max_length=128)
    prompt_len = len(tok.encode("Predict possible search queries for the following document:\ndoc text\n---\n"))
    assert labels[:prompt_len] == [IGNORE_INDEX] * prompt_len
    assert labels[-1] == 2  # eos supervised
    assert ids[-1] == 2
    assert len(ids) == len(labels)


def test_causal_lm_loss_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 6, 16)).astype(np.float32)
    labels = rng.integers(0, 16, (2, 6)).astype(np.int64)
    labels[0, :3] = IGNORE_INDEX
    ref = torch.nn.CrossEntropyLoss(ignore_index=IGNORE_INDEX)(
        torch.tensor(logits[:, :-1]).reshape(-1, 16), torch.tensor(labels[:, 1:]).reshape(-1)
    ).item()
    got = float(causal_lm_loss(logits, labels))
    assert abs(got - ref) < 1e-5


def test_finetune_loss_decreases_and_only_lora_updates():
    import dataclasses

    cfg = dataclasses.replace(LlamaConfig.tiny(vocab_size=260), dtype="float32")
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    base_snapshot = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params)
    ft = Doc2QueryFineTuner(params, cfg, ByteTok(), lr=5e-3, max_length=128, seed=1)

    pairs = [("dogs are loyal pets", "loyal dog"), ("foxes are quick", "quick fox")] * 8
    batch = ft.make_batch(pairs[:4])
    first = float(
        jax.jit(lambda l: causal_lm_loss(
            ft.module.apply({"params": __import__("improving_learned_index_tpu.expand.lora", fromlist=["lora_forward_params"]).lora_forward_params(ft.base_params, l, ft.lora_config)},
                            batch["input_ids"], batch["attention_mask"])[0], batch["labels"]))(ft.lora)
    )
    avg = ft.train(pairs, batch_size=4, total_steps=4)
    assert np.isfinite(avg)
    last = float(
        jax.jit(lambda l: causal_lm_loss(
            ft.module.apply({"params": __import__("improving_learned_index_tpu.expand.lora", fromlist=["lora_forward_params"]).lora_forward_params(ft.base_params, l, ft.lora_config)},
                            batch["input_ids"], batch["attention_mask"])[0], batch["labels"]))(ft.lora)
    )
    assert last < first
    # base params untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(base_snapshot), jax.tree_util.tree_leaves(ft.base_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # merged params differ from base (adapters trained away from zero)
    merged = ft.merged_params()
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(base_snapshot), jax.tree_util.tree_leaves(merged))
    ]
    assert max(diffs) > 0


def test_finetune_int8_base_qlora(tmp_path):
    """QLoRA mode: frozen int8 base + fp LoRA adapters — a step runs, loss is
    finite and decreases, and only adapters change."""
    import jax
    import numpy as np

    from improving_learned_index_tpu.expand.finetune import Doc2QueryFineTuner
    from improving_learned_index_tpu.expand.lora import LoraConfig
    from improving_learned_index_tpu.models.llama import LlamaConfig, init_llama_params

    class ByteTok:
        def encode(self, t):
            return [1] + [b % 250 + 3 for b in t.encode()[:40]]

    config = LlamaConfig.tiny()
    params = init_llama_params(config, jax.random.PRNGKey(0))
    ft = Doc2QueryFineTuner(
        params, config, ByteTok(), lora_config=LoraConfig(r=4, alpha=8),
        lr=1e-3, max_length=64, quantize_base_int8=True,
    )
    # base is quantized: 2-D kernels became {"q","s"} leaves
    qleaf = ft.base_params["layer_0"]["mlp"]["gate_proj"]["kernel"]
    assert set(qleaf.keys()) == {"q", "s"}

    pairs = [("a document about foxes", "what do foxes eat"),
             ("a document about indexes", "how are indexes built")] * 4
    lora_before = jax.tree_util.tree_map(np.asarray, ft.lora)
    avg1 = ft.train(iter(pairs[:4]), batch_size=2)
    avg2 = ft.train(iter(pairs), batch_size=2)
    assert np.isfinite(avg1) and np.isfinite(avg2)
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(lora_before), jax.tree_util.tree_leaves(ft.lora))
    )
    assert changed
    # merged params dequantize + fold adapters: usable by the model
    merged = ft.merged_params()
    assert merged["layer_0"]["mlp"]["gate_proj"]["kernel"].ndim == 2


def test_finetune_int4_base_trl_variant():
    """The reference finetune_4bit.py recipe (finetune_4bit.py:22-41): packed
    int4 frozen base + LoRA r=64 alpha=16 — a step runs, adapters train,
    merge round-trips through dequantization."""
    import dataclasses

    cfg = dataclasses.replace(LlamaConfig.tiny(), dtype="float32")
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ft = Doc2QueryFineTuner.trl_4bit(
        params, cfg, ByteTok(), max_length=64,
        lora_config=__import__(
            "improving_learned_index_tpu.expand.lora", fromlist=["LoraConfig"]
        ).LoraConfig(r=8, alpha=16),  # tiny geometry can't host r=64
    )
    assert ft.quantize_base == "int4"
    qleaf = ft.base_params["layer_0"]["mlp"]["gate_proj"]["kernel"]
    assert set(qleaf.keys()) == {"q4", "s"}
    # packed: half the rows of the fp kernel along the contracted axis
    fp = np.asarray(params["layer_0"]["mlp"]["gate_proj"]["kernel"])
    assert qleaf["q4"].shape == ((fp.shape[0] + 1) // 2, fp.shape[1])

    pairs = [("a document about foxes", "what do foxes eat"),
             ("docs about inverted indexes", "how are indexes built")] * 4
    lora_before = jax.tree_util.tree_map(np.asarray, ft.lora)
    avg = ft.train(iter(pairs), batch_size=2)
    assert np.isfinite(avg)
    assert any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(lora_before), jax.tree_util.tree_leaves(ft.lora))
    )
    merged = ft.merged_params()
    k = merged["layer_0"]["mlp"]["gate_proj"]["kernel"]
    assert k.ndim == 2 and np.isfinite(np.asarray(k)).all()


def test_build_example_bos_strip_uses_configured_id():
    """The continuation's auto-added BOS is stripped only when it matches
    the CONFIGURED bos id (the old check compared query_ids[0] to itself
    and hardcoded 1, so non-Llama-2 tokenizers kept a stray BOS in labels)."""

    class BosTok:
        def __init__(self, bos):
            self.bos = bos

        def encode(self, text):
            return [self.bos] + [b + 130 for b in text.encode("utf-8")[:50]]

        def decode(self, ids):
            return bytes((i - 130) % 256 for i in ids if i >= 130).decode(
                "utf-8", "ignore")

    # BOS id 7 (a Llama-3-style non-1 id): stripped when configured
    ids7, labels7 = build_example(
        BosTok(7), "d", "q", max_length=64, eos_token_id=2, bos_token_id=7
    )
    assert ids7.count(7) == 1  # only the prompt's BOS survives
    # mis-configured bos id: nothing stripped (no silent guess by value)
    ids_bad, _ = build_example(
        BosTok(7), "d", "q", max_length=64, eos_token_id=2, bos_token_id=1
    )
    assert ids_bad.count(7) == 2


def test_train_flushes_trailing_partial_batch():
    """Fewer pairs than batch_size must still train (the loop used to drop
    the trailing partial batch, making a small fine-tune a silent no-op)."""
    import dataclasses

    cfg = dataclasses.replace(LlamaConfig.tiny(vocab_size=260), dtype="float32")
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ft = Doc2QueryFineTuner(params, cfg, ByteTok(), lr=5e-3, max_length=64, seed=1)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), ft.lora)
    avg = ft.train([("tiny doc", "tiny query")] * 3, batch_size=4)
    assert avg > 0.0  # one step ran
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(ft.lora))
    )
    assert changed


def test_layerwise_loss_matches_merged_path():
    """The memory-bounded layerwise schedule (per-layer dequant+merge under
    jax.checkpoint — the 7B-on-16GB path) must be numerically identical to
    the merged-tree path: same loss, same adapter gradients."""
    import dataclasses

    import jax.numpy as jnp

    from improving_learned_index_tpu.models.llama import LlamaConfig

    cfg = dataclasses.replace(LlamaConfig.tiny(vocab_size=260), dtype="float32")
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    pairs = [("dogs are loyal pets", "loyal dog"), ("foxes are quick", "quick fox")]

    fts = [
        Doc2QueryFineTuner(
            params, cfg, ByteTok(), lr=1e-3, max_length=64, seed=1,
            quantize_base="int8", layerwise=lw,
        )
        for lw in (False, True)
    ]
    assert fts[0].layerwise is False and fts[1].layerwise is True
    batch = fts[0].make_batch(pairs)

    def loss_and_grads(ft):
        def f(lora):
            from improving_learned_index_tpu.expand.finetune import (
                causal_lm_loss,
                layerwise_lm_logits,
            )
            from improving_learned_index_tpu.expand.lora import (
                lora_forward_params,
            )
            from improving_learned_index_tpu.models.quantization import (
                dequantize_params,
            )

            if ft.layerwise:
                logits = layerwise_lm_logits(
                    cfg, ft.lora_config, lora, ft.base_params, batch
                )
                return causal_lm_loss(logits, batch["labels"])
            base = dequantize_params(ft.base_params, dtype=jnp.float32)
            merged = lora_forward_params(base, lora, ft.lora_config)
            logits, _ = ft.module.apply(
                {"params": merged}, batch["input_ids"], batch["attention_mask"]
            )
            return causal_lm_loss(logits, batch["labels"])

        return jax.value_and_grad(f)(ft.lora)

    (l0, g0), (l1, g1) = loss_and_grads(fts[0]), loss_and_grads(fts[1])
    assert abs(float(l0) - float(l1)) < 1e-5, (l0, l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    # and one real train step decreases loss on the layerwise path
    avg = fts[1].train(pairs * 4, batch_size=4, total_steps=2)
    assert np.isfinite(avg)


def test_prequantized_params_rejected():
    """Passing an already-quantized tree used to silently create ZERO LoRA
    adapters (the {"q","s"} leaves hide every kernel) — training became a
    no-op.  Now it raises."""
    import dataclasses

    from improving_learned_index_tpu.models.llama import LlamaConfig
    from improving_learned_index_tpu.models.quantization import (
        quantize_params_int8,
    )

    cfg = dataclasses.replace(LlamaConfig.tiny(vocab_size=260), dtype="float32")
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    import pytest

    with pytest.raises(ValueError, match="no LoRA targets"):
        Doc2QueryFineTuner(quantize_params_int8(params), cfg, ByteTok())


def test_chunked_loss_matches_full_logits_path():
    """``layerwise_lm_loss`` (sequence-chunked head+CE — the 7B memory
    path) must equal CE over the full logits tensor, loss AND adapter
    grads, including when the chunk size doesn't divide the sequence."""
    import dataclasses

    from improving_learned_index_tpu.expand.finetune import (
        layerwise_lm_logits,
        layerwise_lm_loss,
    )
    from improving_learned_index_tpu.models.llama import LlamaConfig

    cfg = dataclasses.replace(LlamaConfig.tiny(vocab_size=260), dtype="float32")
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ft = Doc2QueryFineTuner(
        params, cfg, ByteTok(), max_length=64, seed=3,
        quantize_base="int8", layerwise=True,
    )
    batch = ft.make_batch(
        [("dogs are loyal pets", "loyal dog"), ("foxes are quick", "quick fox")]
    )
    assert batch["input_ids"].shape[1] % 7 != 0  # chunk must not divide S

    def full(lora):
        logits = layerwise_lm_logits(cfg, ft.lora_config, lora, ft.base_params, batch)
        return causal_lm_loss(logits, batch["labels"])

    def chunked(lora):
        return layerwise_lm_loss(cfg, ft.lora_config, lora, ft.base_params,
                                 batch, chunk=7)

    (l0, g0) = jax.value_and_grad(full)(ft.lora)
    (l1, g1) = jax.value_and_grad(chunked)(ft.lora)
    assert abs(float(l0) - float(l1)) < 1e-5, (l0, l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
