"""CLI: doc2query expansion generation
(reference: python -m src.llama2.generate, generate.py:120-206)."""

from __future__ import annotations

import argparse
from pathlib import Path

from ..core.config import GenerationConfig
from ..expand.generate import PROMPT_EN, PROMPT_VI, QueryGenerator, generate_expansions
from ..models.llama import LlamaConfig, hf_llama_to_flax, init_llama_params


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--collection_path", type=Path, required=True)
    parser.add_argument("--collection_type", choices=["msmarco", "beir"], default="msmarco")
    parser.add_argument("--output_path", type=Path, required=True)
    parser.add_argument("--llama_path", type=str, default=None,
                        help="HF Llama checkpoint dir/id (weights + tokenizer)")
    parser.add_argument("--local_path", type=str, default=None,
                        help="local generator dir written by "
                        "expand.generate.save_local_generator (a model "
                        "fine-tuned here with no HF identity)")
    parser.add_argument("--peft_path", type=str, default=None,
                        help="LoRA adapter checkpoint (msgpack from expand.lora)")
    parser.add_argument("--prompt", choices=["en", "vi"], default="en")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--num_docs", type=int, default=None)
    parser.add_argument("--num_return_sequences", type=int, default=80)
    parser.add_argument("--max_new_tokens", type=int, default=50)
    parser.add_argument("--top_k", type=int, default=50)
    parser.add_argument("--top_p", type=float, default=0.95)
    parser.add_argument("--max_tokens", type=int, default=350)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--greedy", action="store_true",
                        help="deterministic argmax decode instead of "
                        "top-k/top-p sampling")
    parser.add_argument("--int8", action="store_true",
                        help="weight-only int8 quantized decode — halves HBM "
                        "residency/bandwidth so 7B fits a 16GB chip (the TPU "
                        "counterpart of the reference's NF4 4-bit load, "
                        "src/llama2/generate.py:37-45)")
    parser.add_argument("--int4", action="store_true",
                        help="packed 4-bit weight-only decode (the closest "
                        "analog of the reference's NF4; coarser than --int8)")
    parser.add_argument("--kv_quant", choices=["none", "int8"], default="none",
                        help="int8 KV cache (per-token/head scales): ~halves "
                        "cache HBM so larger decode batches fit; trained-LM "
                        "greedy agreement >= 0.95 (test_quantization_quality)")
    parser.add_argument("--tiny", action="store_true", help="tiny random model (smoke)")
    parser.add_argument("--t5", type=str, default=None, metavar="MODEL",
                        help="use a T5/mT5 checkpoint (e.g. an mT5 doc2query "
                        "model) instead of Llama")
    args = parser.parse_args(argv)

    if args.t5:
        return _t5_main(args)

    gen_cfg = GenerationConfig(
        num_return_sequences=args.num_return_sequences,
        max_new_tokens=args.max_new_tokens,
        top_k=args.top_k,
        top_p=args.top_p,
        max_tokens=args.max_tokens,
        do_sample=not args.greedy,
    )

    if args.local_path:
        import dataclasses

        from ..expand.generate import load_local_generator

        params, config, tokenizer = load_local_generator(args.local_path)
        config = dataclasses.replace(config, kv_quant=args.kv_quant)
        pad_id, eos_id = 0, 2
    elif args.tiny:
        import jax

        class ByteTokenizer:
            def encode(self, t):
                return [1] + [b + 3 for b in t.encode("utf-8")[:200]]

            def decode(self, ids):
                return bytes(i - 3 for i in ids if i >= 3).decode("utf-8", "ignore")

        import dataclasses

        config = dataclasses.replace(
            LlamaConfig.tiny(vocab_size=259), kv_quant=args.kv_quant
        )
        params = init_llama_params(config, jax.random.PRNGKey(args.seed))
        tokenizer = ByteTokenizer()
        pad_id, eos_id = 0, 2
    else:
        if not args.llama_path:
            raise SystemExit("--llama_path required (or --tiny for a smoke run)")
        import torch
        from transformers import AutoConfig, AutoTokenizer, LlamaForCausalLM

        hf_cfg = AutoConfig.from_pretrained(args.llama_path)
        config = LlamaConfig(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            num_kv_heads=getattr(hf_cfg, "num_key_value_heads", hf_cfg.num_attention_heads),
            intermediate_size=hf_cfg.intermediate_size,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            rms_norm_eps=hf_cfg.rms_norm_eps,
            rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
            kv_quant=args.kv_quant,
        )
        with torch.no_grad():
            hf_model = LlamaForCausalLM.from_pretrained(args.llama_path)
            params = hf_llama_to_flax(hf_model.state_dict(), config)
        del hf_model
        hf_tok = AutoTokenizer.from_pretrained(args.llama_path)
        pad_id, eos_id = 0, hf_tok.eos_token_id  # pad=0 != eos (reference generate.py:32)

        class HFTok:
            def encode(self, t):
                return hf_tok.encode(t)

            def decode(self, ids):
                return hf_tok.decode(ids, skip_special_tokens=True)

        tokenizer = HFTok()
        if args.peft_path:
            from ..core.checkpoint import load_params
            from ..expand.lora import LoraConfig, init_lora_params, merge_lora
            import jax

            lcfg = LoraConfig()
            lora = load_params(
                args.peft_path, like=init_lora_params(params, lcfg, jax.random.PRNGKey(0))
            )
            params = merge_lora(params, lora, lcfg)

    if args.int8 or args.int4:
        import jax as _jax

        from ..models.quantization import quantize_params_int4, quantize_params_int8

        quant = quantize_params_int4 if args.int4 else quantize_params_int8
        # quantize on host (fp32 tree never touches HBM), then upload ONCE:
        # numpy leaves fed to the jitted decode would re-transfer the whole
        # quantized model host->device every batch
        params = _jax.device_put(quant(_jax.device_get(params)))

    generator = QueryGenerator(
        params,
        config,
        tokenizer,
        gen_cfg,
        prompt_template=PROMPT_VI if args.prompt == "vi" else PROMPT_EN,
        pad_token_id=pad_id,
        eos_token_id=eos_id,
    )
    n = generate_expansions(
        generator,
        args.collection_path,
        args.output_path,
        args.collection_type,
        batch_size=args.batch_size,
        num_docs=args.num_docs,
        seed=args.seed,
    )
    print(f"expanded {n} documents -> {args.output_path}")
    return 0


def _t5_main(args) -> int:
    """T5/mT5 expansion path (reference: python -m src.llama2.generate_t5)."""
    import torch
    from transformers import AutoConfig, AutoTokenizer, T5ForConditionalGeneration

    from ..expand.t5_generate import T5QueryGenerator
    from ..models.t5 import T5Config, hf_t5_to_flax

    gen_cfg = GenerationConfig(
        num_return_sequences=args.num_return_sequences,
        max_new_tokens=args.max_new_tokens,
        top_k=args.top_k,
        top_p=args.top_p,
        max_tokens=args.max_tokens,
        do_sample=not args.greedy,
    )
    hc = AutoConfig.from_pretrained(args.t5)
    config = T5Config(
        vocab_size=hc.vocab_size,
        d_model=hc.d_model,
        d_kv=hc.d_kv,
        num_heads=hc.num_heads,
        d_ff=hc.d_ff,
        num_encoder_layers=hc.num_layers,
        num_decoder_layers=hc.num_decoder_layers,
        relative_attention_num_buckets=hc.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(hc, "relative_attention_max_distance", 128),
        gated_act="gated" in hc.feed_forward_proj,
        tie_word_embeddings=hc.tie_word_embeddings,
    )
    with torch.no_grad():
        params = hf_t5_to_flax(
            T5ForConditionalGeneration.from_pretrained(args.t5).state_dict(), config
        )
    if args.int8 or args.int4:
        import jax as _jax

        from ..models.quantization import quantize_params_int4, quantize_params_int8

        quant = quantize_params_int4 if args.int4 else quantize_params_int8
        params = _jax.device_put(quant(_jax.device_get(params)))  # upload once
    hf_tok = AutoTokenizer.from_pretrained(args.t5)

    class HFTok:
        def encode(self, t):
            return hf_tok.encode(t)

        def decode(self, ids):
            return hf_tok.decode(ids, skip_special_tokens=True)

    generator = T5QueryGenerator(
        params,
        config,
        HFTok(),
        gen_cfg,
        pad_token_id=hf_tok.pad_token_id or 0,
        eos_token_id=hf_tok.eos_token_id or 1,
        decoder_start_token_id=hc.decoder_start_token_id or 0,
    )
    n = generate_expansions(
        generator,
        args.collection_path,
        args.output_path,
        args.collection_type,
        batch_size=args.batch_size,
        num_docs=args.num_docs,
        seed=args.seed,
    )
    print(f"expanded {n} documents -> {args.output_path}")
    return 0

if __name__ == "__main__":
    raise SystemExit(main())
