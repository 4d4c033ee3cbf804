"""Llama decoder tests: HF logits parity, KV-cache decode consistency,
sampling filters, LoRA merge semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_learned_index_tpu.core.config import GenerationConfig
from improving_learned_index_tpu.expand.lora import (
    LoraConfig,
    init_lora_params,
    merge_lora,
)
from improving_learned_index_tpu.expand.sampling import Sampler, top_k_top_p_filter
from improving_learned_index_tpu.models.llama import (
    LlamaConfig,
    LlamaModel,
    hf_llama_to_flax,
    init_llama_params,
    llama_param_specs,
    make_kv_caches,
)


def fp32(cfg: LlamaConfig) -> LlamaConfig:
    return dataclasses.replace(cfg, dtype="float32")


@pytest.fixture(scope="module")
def hf_llama():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    return LlamaForCausalLM(hf_cfg).eval()


def test_hf_logits_parity(hf_llama):
    import torch

    cfg = fp32(LlamaConfig.tiny())
    params = hf_llama_to_flax(hf_llama.state_dict(), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, (2, 10)).astype(np.int32)

    with torch.no_grad():
        ref = hf_llama(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    model = LlamaModel(cfg)
    got, _ = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.ones((2, 10), dtype=jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=3e-4)


def test_kv_cache_decode_matches_full_forward():
    """Greedy decode with the cache must equal re-running the full prompt."""
    cfg = fp32(LlamaConfig.tiny())
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    model = LlamaModel(cfg)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 256, (2, 6)).astype(np.int32)
    mask = np.ones((2, 6), dtype=np.int32)

    # full forward on prompt + 2 extra tokens
    extra = rng.integers(0, 256, (2, 2)).astype(np.int32)
    full_ids = np.concatenate([prompt, extra], axis=1)
    full_logits, _ = model.apply(
        {"params": params}, jnp.asarray(full_ids), jnp.ones_like(jnp.asarray(full_ids))
    )

    # cached: prefill prompt, then decode the two extra tokens step by step
    caches = make_kv_caches(cfg, 2, 8, dtype=jnp.float32)
    slot_mask = np.zeros((2, 8), dtype=np.int32)
    slot_mask[:, :6] = 1
    logits, caches = model.apply(
        {"params": params},
        jnp.asarray(prompt),
        jnp.asarray(slot_mask),
        kv_caches=caches,
        cache_index=0,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :6]), atol=1e-4, rtol=1e-4
    )
    for t in range(2):
        slot_mask[:, 6 + t] = 1
        pos = np.full((2, 1), 6 + t, dtype=np.int32)
        step_logits, caches = model.apply(
            {"params": params},
            jnp.asarray(extra[:, t : t + 1]),
            jnp.asarray(slot_mask),
            positions=jnp.asarray(pos),
            kv_caches=caches,
            cache_index=6 + t,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, 6 + t]),
            atol=1e-4,
            rtol=1e-4,
        )


def test_int8_kv_cache_decode_close_to_fp_cache():
    """int8 KV cache: same decode protocol, logits within quantization
    tolerance of the full-precision cache at every step."""
    cfg = fp32(LlamaConfig.tiny())
    cfg8 = dataclasses.replace(cfg, kv_quant="int8")
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    model, model8 = LlamaModel(cfg), LlamaModel(cfg8)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 256, (2, 6)).astype(np.int32)
    extra = rng.integers(0, 256, (2, 3)).astype(np.int32)

    def run(model, caches):
        slot_mask = np.zeros((2, 9), dtype=np.int32)
        slot_mask[:, :6] = 1
        outs = []
        logits, caches = model.apply(
            {"params": params}, jnp.asarray(prompt), jnp.asarray(slot_mask),
            kv_caches=caches, cache_index=0,
        )
        outs.append(np.asarray(logits))
        for t in range(3):
            slot_mask[:, 6 + t] = 1
            pos = np.full((2, 1), 6 + t, dtype=np.int32)
            logits, caches = model.apply(
                {"params": params}, jnp.asarray(extra[:, t : t + 1]),
                jnp.asarray(slot_mask), positions=jnp.asarray(pos),
                kv_caches=caches, cache_index=6 + t,
            )
            outs.append(np.asarray(logits[:, 0]))
        return outs

    ref = run(model, make_kv_caches(cfg, 2, 9, dtype=jnp.float32))
    got = run(model8, make_kv_caches(cfg8, 2, 9))
    assert len(got[0].shape) == 3
    for a, b in zip(ref, got):
        # int8 K/V with per-(token, head) scales: sub-percent logit drift
        assert np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9) < 0.02


def test_int8_kv_cache_halves_bytes():
    cfg8 = dataclasses.replace(LlamaConfig.tiny(), kv_quant="int8")
    caches = make_kv_caches(cfg8, 4, 16)
    kq, ks, vq, vs = caches[0]
    assert kq.dtype == jnp.int8 and ks.dtype == jnp.float32
    assert kq.shape == (4, 16, cfg8.num_kv_heads, cfg8.head_dim)
    assert ks.shape == (4, 16, cfg8.num_kv_heads)
    bf16 = make_kv_caches(LlamaConfig.tiny(), 4, 16)
    bytes8 = sum(x.nbytes for x in caches[0])
    bytes16 = sum(x.nbytes for x in bf16[0])
    # tiny head_dim=16 makes the fp32 scale plane 25% overhead (0.625x);
    # at 7B geometry (head_dim 128) the ratio is ~0.52x
    assert bytes8 < bytes16 * 0.65


def test_top_k_top_p_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.generation.logits_process import (
        TopKLogitsWarper,
        TopPLogitsWarper,
    )

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(3, 50)).astype(np.float32)
    ref = TopKLogitsWarper(top_k=10)(None, torch.tensor(logits))
    ref = TopPLogitsWarper(top_p=0.9)(None, ref).numpy()
    got = np.asarray(top_k_top_p_filter(jnp.asarray(logits), 10, 0.9))
    # same support set (kept tokens) and same kept values
    np.testing.assert_array_equal(np.isinf(got), np.isinf(ref))
    keep = ~np.isinf(ref)
    np.testing.assert_allclose(got[keep], ref[keep], atol=1e-6)


def test_greedy_sampler_matches_hf_generate(hf_llama):
    import torch

    cfg = fp32(LlamaConfig.tiny())
    params = hf_llama_to_flax(hf_llama.state_dict(), cfg)
    rng = np.random.default_rng(3)
    # two prompts, one shorter (left-padded)
    p0 = rng.integers(3, 256, 5).tolist()
    p1 = rng.integers(3, 256, 7).tolist()
    max_len = 7
    ids = np.zeros((2, max_len), dtype=np.int32)
    mask = np.zeros((2, max_len), dtype=np.int32)
    ids[0, 2:] = p0
    mask[0, 2:] = 1
    ids[1, :] = p1
    mask[1, :] = 1

    gen = GenerationConfig(num_return_sequences=1, max_new_tokens=6, do_sample=False)
    sampler = Sampler(cfg, gen, eos_token_id=2)
    got = sampler.generate(params, ids, mask, num_return_sequences=1, seed=0)

    # Reference 1: greedy continuation via repeated *full* forwards on our
    # own model (no cache) — validates the Sampler's left-padding, position,
    # and cache plumbing end to end.
    model = LlamaModel(cfg)
    cur_ids, cur_mask = ids.copy(), mask.copy()
    ref_rows = [[] for _ in range(2)]
    for _ in range(6):
        logits, _ = model.apply(
            {"params": params}, jnp.asarray(cur_ids), jnp.asarray(cur_mask)
        )
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1)).astype(np.int32)
        for r in range(2):
            ref_rows[r].append(int(nxt[r]))
        cur_ids = np.concatenate([cur_ids, nxt[:, None]], axis=1)
        cur_mask = np.concatenate([cur_mask, np.ones((2, 1), np.int32)], axis=1)
    np.testing.assert_array_equal(got, np.asarray(ref_rows, dtype=np.int32))

    # Reference 2: the first greedy token agrees with HF generate (random
    # tiny weights produce near-tied logits after a few steps, so longer
    # exact agreement across frameworks is not numerically meaningful).
    with torch.no_grad():
        ref = hf_llama.generate(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            max_new_tokens=1,
            do_sample=False,
            eos_token_id=2,
            pad_token_id=2,
        )[:, max_len:].numpy()
    np.testing.assert_array_equal(got[:, :1], ref)


def test_lora_zero_init_is_identity_and_merge_changes():
    cfg = fp32(LlamaConfig.tiny())
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora_params(params, lcfg, jax.random.PRNGKey(1))

    merged = merge_lora(params, lora, lcfg)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))  # B=0 -> identity

    # set a nonzero B on one adapter and check exact delta
    node = lora["layer_0"]["attention"]["q_proj"]["kernel"]
    node["lora_b"] = jnp.ones_like(node["lora_b"])
    merged = merge_lora(params, lora, lcfg)
    base = np.asarray(params["layer_0"]["attention"]["q_proj"]["kernel"])
    got = np.asarray(merged["layer_0"]["attention"]["q_proj"]["kernel"])
    expected_delta = (
        np.asarray(node["lora_a"]) @ np.ones((4, base.shape[1] * base.shape[2]))
    ) * lcfg.scaling
    np.testing.assert_allclose(got - base, expected_delta.reshape(base.shape), atol=1e-5)


def test_lora_factors_on_matrix_view_not_leading_axis():
    """>2-D kernels must factor on the balanced [in_features, out_features]
    matrix view (peft semantics).  o_proj is [heads, head_dim, hidden]: a
    leading-axis split makes lora_b [r, head_dim*hidden] — rank-r across the
    tiny heads axis and 64x the adapter parameters at 7B geometry (1.1 GB at
    r=16, OOM with AdamW state at r=64)."""
    from improving_learned_index_tpu.expand.lora import _factor_dims

    assert _factor_dims((4096, 32, 128)) == (4096, 4096)   # q/k/v layout
    assert _factor_dims((32, 128, 4096)) == (4096, 4096)   # o_proj layout
    assert _factor_dims((4096, 11008)) == (4096, 11008)    # 2-D unchanged

    cfg = fp32(LlamaConfig.tiny())
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora_params(params, lcfg, jax.random.PRNGKey(1))
    o_kernel = params["layer_0"]["attention"]["o_proj"]["kernel"]
    node = lora["layer_0"]["attention"]["o_proj"]["kernel"]
    n_in = o_kernel.shape[0] * o_kernel.shape[1]
    assert node["lora_a"].shape == (n_in, lcfg.r)
    assert node["lora_b"].shape == (lcfg.r, o_kernel.shape[2])

    # merge applies the delta on the matrix view, reshaped back exactly
    node["lora_b"] = jnp.ones_like(node["lora_b"])
    merged = merge_lora(params, lora, lcfg)
    delta = (np.asarray(node["lora_a"]) @ np.asarray(node["lora_b"])) * lcfg.scaling
    np.testing.assert_allclose(
        np.asarray(merged["layer_0"]["attention"]["o_proj"]["kernel"])
        - np.asarray(o_kernel),
        delta.reshape(o_kernel.shape),
        atol=1e-5,
    )


def test_param_specs_cover_tree():
    from jax.sharding import PartitionSpec as P

    cfg = LlamaConfig.tiny()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    specs = llama_param_specs(params)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    names = ["/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat]
    sharded = [s for _, s in flat if s != P()]
    assert len(sharded) >= cfg.num_layers * 7  # all projections + embeddings
    assert any("embed_tokens" in n for n in names)


def test_tensor_parallel_forward_matches(cpu_devices):
    """Forward with TP-sharded params over a model=4 mesh axis equals the
    unsharded forward (XLA inserts the collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from improving_learned_index_tpu.core.config import MeshConfig
    from improving_learned_index_tpu.parallel import make_mesh

    cfg = fp32(LlamaConfig.tiny())
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    model = LlamaModel(cfg)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 256, (2, 8)), dtype=jnp.int32)
    mask = jnp.ones((2, 8), dtype=jnp.int32)

    ref, _ = model.apply({"params": params}, ids, mask)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    specs = llama_param_specs(params, model_parallel_size=4)
    sharded = jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(np.asarray(leaf), NamedSharding(mesh, s)),
        params,
        specs,
    )

    @jax.jit
    def forward(p, ids, mask):
        logits, _ = model.apply({"params": p}, ids, mask)
        return logits

    got = forward(
        sharded,
        jax.device_put(ids, NamedSharding(mesh, P("data", None))),
        jax.device_put(mask, NamedSharding(mesh, P("data", None))),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_tensor_parallel_sampling(cpu_devices):
    """Greedy decode with TP-sharded params matches unsharded decode."""
    from jax.sharding import NamedSharding

    from improving_learned_index_tpu.core.config import GenerationConfig, MeshConfig
    from improving_learned_index_tpu.parallel import make_mesh

    cfg = fp32(LlamaConfig.tiny())
    params = init_llama_params(cfg, jax.random.PRNGKey(7))
    gen = GenerationConfig(num_return_sequences=1, max_new_tokens=5, do_sample=False)
    sampler = Sampler(cfg, gen, eos_token_id=2)

    rng = np.random.default_rng(9)
    ids = rng.integers(3, 256, (2, 6)).astype(np.int32)
    mask = np.ones((2, 6), dtype=np.int32)
    ref = sampler.generate(params, ids, mask, seed=0)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    specs = llama_param_specs(params, model_parallel_size=2)
    sharded = jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(np.asarray(leaf), NamedSharding(mesh, s)),
        params,
        specs,
    )
    got = sampler.generate(sharded, ids, mask, seed=0)
    np.testing.assert_array_equal(got, ref)

    # int8 KV cache under TP: the quantized cache + scale arrays are created
    # inside the jit, so XLA must propagate the model-axis sharding through
    # the quantize/update/attend chain; greedy output must be unchanged.
    cfg8 = dataclasses.replace(cfg, kv_quant="int8")
    sampler8 = Sampler(cfg8, gen, eos_token_id=2)
    ref8 = sampler8.generate(params, ids, mask, seed=0)
    got8 = sampler8.generate(sharded, ids, mask, seed=0)
    np.testing.assert_array_equal(got8, ref8)


def test_flash_attention_prefill_matches_xla():
    """``use_flash_attention`` (Pallas online-softmax kernel — the
    7B-finetune memory path) must match the XLA additive-bias attention on
    logits at every non-padded position.  TPU-only: the stock kernel has no
    interpret mode."""
    import dataclasses

    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("pallas flash kernel is TPU-only")

    cfg = dataclasses.replace(
        LlamaConfig.tiny(vocab_size=260), num_heads=4, num_kv_heads=2,
        hidden_size=512, dtype="float32",  # head_dim 128: kernel min block
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, S = 2, 256
    ids = rng.integers(4, 250, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, 200:] = 0  # padded tail on row 0
    ids[0, 200:] = 0

    outs = {}
    for flash in (False, True):
        c = dataclasses.replace(cfg, use_flash_attention=flash)
        logits, _ = LlamaModel(c).apply({"params": params}, ids, mask)
        outs[flash] = np.asarray(logits)
    # padded rows differ by design (flash: pads attend pads); real rows must agree
    np.testing.assert_allclose(
        outs[True][0, :200], outs[False][0, :200], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        outs[True][1], outs[False][1], rtol=2e-3, atol=2e-3
    )
