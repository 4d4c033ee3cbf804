"""AOT peak-HBM probe for the 7B QLoRA train step.

Compiles the EXACT jitted train step ``Doc2QueryFineTuner`` builds — same
loss wiring, same optimizer chain — from ``jax.ShapeDtypeStruct``s alone,
then prints ``compiled.memory_analysis()``.  No 27 GB host init, no 6.7 GB
upload: shape-only lowering makes the OOM reproducible in ~a minute, which
is how the layerwise schedule's peak-HBM terms were found and fixed.

    python benchmarks/finetune_mem_probe.py --recipe int8 --batch 1
        [--layers 32] [--max_length 2048] [--no-flash] [--chunk 256]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--recipe", choices=["int8", "trl_4bit"], default="int8")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--max_length", type=int, default=2048)
    ap.add_argument("--flash", action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument("--chunk", type=int, default=None,
                    help="override layerwise CE chunk size")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )

    from improving_learned_index_tpu.expand import finetune as ft
    from improving_learned_index_tpu.expand.lora import (
        LoraConfig, init_lora_params,
    )
    from improving_learned_index_tpu.models import quantization as qz
    from improving_learned_index_tpu.models.llama import LlamaConfig

    config = LlamaConfig(
        vocab_size=32000, hidden_size=4096, num_layers=args.layers,
        num_heads=32, num_kv_heads=32, intermediate_size=11008,
        max_position_embeddings=args.max_length,
        use_flash_attention=args.flash,
    )
    if args.recipe == "trl_4bit":
        lora_config = LoraConfig(r=64, alpha=16)
        quantizer = qz.quantize_params_int4
        tx = optax.chain(optax.clip_by_global_norm(0.3),
                         optax.adamw(2e-4, weight_decay=0.001))
    else:
        lora_config = LoraConfig(r=16, alpha=32)
        quantizer = qz.quantize_params_int8
        tx = optax.chain(optax.adamw(2e-4, weight_decay=1e-4))

    # Tiny-but-real host tree ONLY to learn the quantized/LoRA tree
    # structure; jax.eval_shape turns it into abstract leaves, so nothing
    # big is ever materialized.
    hd = config.head_dim

    def mat(*shape):
        return np.zeros(shape, np.float32)

    params = {
        "embed_tokens": {"embedding": mat(config.vocab_size, config.hidden_size)},
        "norm": {"scale": mat(config.hidden_size)},
        "lm_head": {"kernel": mat(config.hidden_size, config.vocab_size)},
    }
    for i in range(config.num_layers):
        params[f"layer_{i}"] = {
            "attention": {
                "q_proj": {"kernel": mat(config.hidden_size, config.num_heads, hd)},
                "k_proj": {"kernel": mat(config.hidden_size, config.num_kv_heads, hd)},
                "v_proj": {"kernel": mat(config.hidden_size, config.num_kv_heads, hd)},
                "o_proj": {"kernel": mat(config.num_heads, hd, config.hidden_size)},
            },
            "mlp": {
                "gate_proj": {"kernel": mat(config.hidden_size, config.intermediate_size)},
                "up_proj": {"kernel": mat(config.hidden_size, config.intermediate_size)},
                "down_proj": {"kernel": mat(config.intermediate_size, config.hidden_size)},
            },
            "input_norm": {"scale": mat(config.hidden_size)},
            "post_attn_norm": {"scale": mat(config.hidden_size)},
        }

    lora = init_lora_params(params, lora_config, jax.random.PRNGKey(0))

    # abstract quantized tree by the quantizers' own shape rules (the
    # quantizers are host-side numpy, so jax.eval_shape cannot trace them)
    def q_abs(path, leaf):
        names = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                         for p in path)
        if leaf.ndim < 2 or "embed" in names.lower():
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype)
        s = jax.ShapeDtypeStruct(leaf.shape[1:], np.float32)
        if args.recipe == "trl_4bit" and leaf.shape[0] % 2 == 0:
            return {"q4": jax.ShapeDtypeStruct(
                (leaf.shape[0] // 2, *leaf.shape[1:]), np.uint8), "s": s}
        return {"q": jax.ShapeDtypeStruct(leaf.shape, np.int8), "s": s}

    del quantizer
    base_abs = jax.tree_util.tree_map_with_path(q_abs, params)
    lora_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), lora
    )
    opt_abs = jax.eval_shape(tx.init, lora_abs)
    batch_abs = {
        "input_ids": jax.ShapeDtypeStruct((args.batch, args.max_length), jnp.int32),
        "labels": jax.ShapeDtypeStruct((args.batch, args.max_length), jnp.int32),
        "attention_mask": jax.ShapeDtypeStruct((args.batch, args.max_length), jnp.int32),
    }

    loss_kwargs = {} if args.chunk is None else {"chunk": args.chunk}

    def loss_fn(lora, base_params, batch):
        return ft.layerwise_lm_loss(
            config, lora_config, lora, base_params, batch, **loss_kwargs
        )

    def train_step(lora, opt_state, base_params, batch):
        loss, grads = jax.value_and_grad(loss_fn)(lora, base_params, batch)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    print(f"lowering: {args.recipe} B={args.batch} L={args.layers} "
          f"S={args.max_length} flash={args.flash}", flush=True)
    lowered = jax.jit(train_step).lower(lora_abs, opt_abs, base_abs, batch_abs)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = lambda x: f"{x / 2**30:.2f} GB"
    print(f"backend: {jax.default_backend()}")
    print(f"argument size:  {gb(ma.argument_size_in_bytes)}")
    print(f"output size:    {gb(ma.output_size_in_bytes)}")
    print(f"temp size:      {gb(ma.temp_size_in_bytes)}")
    print(f"alias size:     {gb(ma.alias_size_in_bytes)}")
    print(f"peak (arg+out+temp-alias): "
          f"{gb(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
