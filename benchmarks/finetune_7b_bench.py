"""7B QLoRA fine-tuning on one 16 GB chip: step time, tokens/s, HBM.

The reference fine-tunes Llama-2-7B with a 4-bit NF4 frozen base + LoRA
adapters on a 48 GB RTX8000 (src/llama2/finetune/finetune.py:41-190,
finetune_4bit.py).  This bench runs the TPU counterpart — frozen int8 or
packed-int4 base dequantized inside the jitted step, fp32 adapters — at
full 7B geometry with prompt-masked 2048-token samples, through the REAL
``Doc2QueryFineTuner`` train step.

Memory design under test: the layerwise schedule (``layerwise_lm_logits``,
auto-on at 7B) dequantizes+merges each layer inside ``jax.checkpoint``, so
the full-precision weights are never live all at once — without it the
merged bf16 tree (13.4 GB) next to the quantized base OOMs a 16 GB chip.

    python benchmarks/finetune_7b_bench.py [--recipes int8 trl_4bit]
        [--batches 1 2 4] [--steps 6] [--out FINETUNE_7B.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class SyntheticTok:
    """Deterministic tokenizer emitting ids straight from word hashes —
    enough to build prompt-masked 2048-token examples without a real
    vocabulary (the bench measures step compute, not text quality)."""

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def encode(self, text):
        return [1] + [2 + (hash(w) % (self.vocab_size - 3)) for w in text.split()]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def hbm_stats(device, ft=None, batch=None):
    try:
        st = device.memory_stats()
        return {
            "bytes_in_use_gb": round(st.get("bytes_in_use", 0) / 2**30, 2),
            "peak_bytes_in_use_gb": round(
                st.get("peak_bytes_in_use", 0) / 2**30, 2
            ),
            "bytes_limit_gb": round(st.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        pass
    # remote backends (axon tunnel) expose no memory_stats; fall back to
    # the XLA AOT analysis of the exact compiled step (same numbers the
    # finetune_mem_probe reports, cached so this is cheap post-compile)
    if ft is not None:
        try:
            ma = (ft._train_step.lower(ft.lora, ft.opt_state,
                                       ft.base_params, batch)
                  .compile().memory_analysis())
            peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
            return {
                "aot_args_gb": round(ma.argument_size_in_bytes / 2**30, 2),
                "aot_temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                "aot_peak_gb": round(peak / 2**30, 2),
                "note": "AOT memory_analysis (memory_stats unavailable)",
            }
        except Exception:
            pass
    return {"note": "memory_stats unavailable on this backend"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--recipes", nargs="+", default=["int8", "trl_4bit"],
                    choices=["int8", "trl_4bit"])
    ap.add_argument("--batches", nargs="+", type=int, default=[1, 2, 4])
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--max_length", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--flash", action=argparse.BooleanOptionalAction, default=True,
                    help="Pallas flash attention for the full-sequence path "
                    "(the XLA path's fp32 [B,H,S,S] logits+probs are the "
                    "peak-HBM term of the backward at 7B/S=2048)")
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).parent / "FINETUNE_7B.json")
    args = ap.parse_args(argv)

    if len(args.recipes) > 1:
        # one subprocess per recipe: a recipe that OOMs must not poison the
        # next one's TPU context (leaked HBM buffers survive within a
        # process — observed: int8 OOM -> trl_4bit failing at PRNGKey)
        import subprocess

        results, meta = {}, {}
        for recipe in args.recipes:
            part = args.out.with_suffix(f".{recipe}.part.json")
            cmd = [sys.executable, __file__, "--recipes", recipe,
                   "--batches", *map(str, args.batches),
                   "--steps", str(args.steps),
                   "--max_length", str(args.max_length),
                   "--layers", str(args.layers),
                   "--flash" if args.flash else "--no-flash",
                   "--out", str(part)]
            rc = subprocess.call(cmd)
            if part.exists():
                rep = json.loads(part.read_text())
                results.update(rep.get("results", {}))
                meta = {k: rep[k] for k in
                        ("geometry", "schedule", "adapters", "reference")
                        if k in rep}
                part.unlink()
            else:
                results[recipe] = {"error": f"subprocess rc={rc}, no output"}
        report = {**meta, "results": results}
        args.out.write_text(json.dumps(report, indent=2) + "\n")
        print(json.dumps(report))
        return 0

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    from improving_learned_index_tpu.expand.finetune import Doc2QueryFineTuner
    from improving_learned_index_tpu.models.llama import LlamaConfig

    config = LlamaConfig(
        vocab_size=32000, hidden_size=4096, num_layers=args.layers,
        num_heads=32, num_kv_heads=32, intermediate_size=11008,
        max_position_embeddings=args.max_length,
        use_flash_attention=args.flash,
    )
    n_params = (
        config.vocab_size * config.hidden_size * 2
        + config.num_layers * (
            4 * config.hidden_size ** 2
            + 3 * config.hidden_size * config.intermediate_size
        )
    )
    print(f"geometry: {n_params/1e9:.2f}B params, {args.layers} layers",
          file=sys.stderr, flush=True)

    # Host tree in fp16 (27 GB in fp32; shapes + sane scale are all the
    # quantizer needs), quantized host-side and uploaded ONCE by the
    # fine-tuner — the real product path.  Values are a tiled random block:
    # per-value standard_normal over 6.7B elements costs minutes and the
    # bench measures step compute, not weight statistics.
    rng = np.random.default_rng(0)
    block = rng.standard_normal(1 << 20).astype(np.float32)

    def host_params():
        def mat(*shape):
            n = int(np.prod(shape))
            # fp32: numpy fp16 arithmetic is scalar-slow (the quantizer's
            # per-channel maxes took ~100s at 0.67B in fp16); 27 GB fp32
            # fits the 125 GB host
            return (np.resize(block, n).reshape(shape)
                    * np.float32(0.02 / np.sqrt(shape[0])))

        hd = config.head_dim
        p = {
            "embed_tokens": {"embedding": mat(config.vocab_size, config.hidden_size)},
            "norm": {"scale": np.ones(config.hidden_size, np.float32)},
            "lm_head": {"kernel": mat(config.hidden_size, config.vocab_size)},
        }
        for i in range(config.num_layers):
            p[f"layer_{i}"] = {
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
                "input_norm": {"scale": np.ones(config.hidden_size, np.float32)},
                "post_attn_norm": {"scale": np.ones(config.hidden_size, np.float32)},
            }
        return p

    # docs sized so prompt+query+eos lands just under max_length: the
    # query tokens must SURVIVE truncation or every label is masked and
    # the loss degenerates to 0
    tok = SyntheticTok(config.vocab_size)
    words = [f"w{i}" for i in range(5000)]
    doc_words = max(8, args.max_length - 60)
    docs = [
        " ".join(rng.choice(words, size=doc_words).tolist()) for _ in range(8)
    ]
    pairs = [(d, " ".join(rng.choice(words, size=24).tolist())) for d in docs]

    device = jax.devices()[0]
    results = {}
    for recipe in args.recipes:
        print(f"== recipe {recipe}: building host params", file=sys.stderr, flush=True)
        t0 = time.time()
        params = host_params()
        if recipe == "trl_4bit":
            ft = Doc2QueryFineTuner.trl_4bit(
                params, config, tok, max_length=args.max_length,
                layerwise=True,
            )
        else:
            ft = Doc2QueryFineTuner(
                params, config, tok, max_length=args.max_length,
                quantize_base="int8", layerwise=True,
            )
        del params
        setup_s = time.time() - t0
        assert ft.layerwise, "7B must take the layerwise schedule"
        print(f"setup (host init + quantize + upload): {setup_s:.1f}s",
              file=sys.stderr, flush=True)

        per_batch = {}
        for bsz in args.batches:
            batch = ft.make_batch(pairs[:bsz])
            # pad to the full max_length so every step is the worst case
            pad = args.max_length - batch["input_ids"].shape[1]
            if pad > 0:
                batch = {
                    k: np.pad(v, ((0, 0), (0, pad)),
                              constant_values=(0 if k != "labels" else -100))
                    for k, v in batch.items()
                }
            try:
                # the train step donates (lora, opt_state): every call's
                # inputs are consumed, so thread the outputs forward and
                # write them back to ft after each batch size
                t0 = time.time()
                lora, opt_state, loss = ft._train_step(
                    ft.lora, ft.opt_state, ft.base_params, batch
                )
                # device_get, not block_until_ready: the axon remote
                # backend returns from block_until_ready at dispatch time
                # (observed: 0.008 s/step for a 7B fwd+bwd, 50x under the
                # 197-TFLOP/s physics floor); a host transfer of the loss
                # cannot complete before the step that produced it
                first_loss = float(jax.device_get(loss))
                compile_s = time.time() - t0
                t0 = time.time()
                for _ in range(args.steps):
                    lora, opt_state, loss = ft._train_step(
                        lora, opt_state, ft.base_params, batch
                    )
                final_loss = float(jax.device_get(loss))
                step_s = (time.time() - t0) / args.steps
                ft.lora, ft.opt_state = lora, opt_state
                per_batch[str(bsz)] = {
                    "compile_s": round(compile_s, 1),
                    "step_s": round(step_s, 3),
                    "tokens_per_s": round(bsz * args.max_length / step_s, 1),
                    "loss": round(final_loss, 4),
                    "first_loss": round(first_loss, 4),
                    "hbm": hbm_stats(device, ft, batch),
                }
            except Exception as e:
                per_batch[str(bsz)] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"[{recipe} B={bsz}] {per_batch[str(bsz)]}",
                  file=sys.stderr, flush=True)
            if "error" in per_batch[str(bsz)]:
                break  # larger batches will only OOM harder
        results[recipe] = {
            "setup_s": round(setup_s, 1),
            "per_batch": per_batch,
        }
        del ft

    report = {
        "geometry": {"params_b": round(n_params / 1e9, 2),
                     "layers": args.layers, "seq": args.max_length},
        "schedule": "layerwise dequant+merge under jax.checkpoint "
                    "(expand/finetune.layerwise_lm_logits)",
        "adapters": {"int8": "LoRA r=16 a=32 on 7 projections",
                     "trl_4bit": "LoRA r=64 a=16, clip 0.3, wd 0.001 "
                                 "(reference finetune_4bit.py recipe)"},
        "results": results,
        "reference": "NF4 4-bit + LoRA on a 48GB RTX8000 "
                     "(src/llama2/finetune/finetune.py:41-190)",
    }
    args.out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
