"""7B-class doc2query decode on one 16GB v5e chip via weight-only int8.

The reference needs bitsandbytes NF4 4-bit to fit Llama-2-7B on its GPU
(src/llama2/generate.py:37-45); the TPU counterpart is
models.quantization's per-channel int8 (~6.7GB weights) + bf16 KV cache.
This benchmark builds random int8 weights ON DEVICE (values are meaningless;
bytes, shapes and speed are real — the relay uplink is too slow to ship 7GB
from host), then samples the reference's expansion workload: 80 sequences
per document, 50 new tokens, top-k 50 / top-p 0.95.

Prints one JSON line with seqs/s and tokens/s.

Usage: python benchmarks/llama_decode_bench.py [--layers N] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
import jax.numpy as jnp

from improving_learned_index_tpu.core.config import GenerationConfig
from improving_learned_index_tpu.expand.sampling import Sampler
from improving_learned_index_tpu.models.llama import LlamaConfig


def device_quantized_params(config: LlamaConfig, precision: str = "int8", seed: int = 0):
    """Random int8 / packed-int4 param tree created on device, one jit per
    layer.  int4 leaves use models.quantization's {"q4", "s"} packed layout
    (two nibbles per int8 along the contracted axis): the reference's
    NF4 density (src/llama2/generate.py:37-45), half int8's HBM residency."""
    c = config
    hd = c.head_dim

    def qmat(key, shape):
        if precision == "int4":
            packed = (shape[0] // 2,) + shape[1:]
            k_lo, k_hi = jax.random.split(key)
            lo = jax.random.randint(k_lo, packed, 0, 15, dtype=jnp.int32)
            hi = jax.random.randint(k_hi, packed, 0, 15, dtype=jnp.int32)
            q4 = (lo | (hi << 4)).astype(jnp.uint8)
            s = jnp.full(shape[1:], 0.02 / np.sqrt(shape[0]), dtype=jnp.float32)
            return {"q4": q4, "s": s}
        q = jax.random.randint(key, shape, -127, 128, dtype=jnp.int32).astype(jnp.int8)
        s = jnp.full(shape[1:], 0.02 / np.sqrt(shape[0]), dtype=jnp.float32)
        return {"q": q, "s": s}

    @jax.jit
    def make_layer(key):
        ks = jax.random.split(key, 7)
        return {
            "input_norm": {"scale": jnp.ones(c.hidden_size, jnp.float32)},
            "post_attn_norm": {"scale": jnp.ones(c.hidden_size, jnp.float32)},
            "attention": {
                "q_proj": {"kernel": qmat(ks[0], (c.hidden_size, c.num_heads, hd))},
                "k_proj": {"kernel": qmat(ks[1], (c.hidden_size, c.num_kv_heads, hd))},
                "v_proj": {"kernel": qmat(ks[2], (c.hidden_size, c.num_kv_heads, hd))},
                "o_proj": {"kernel": qmat(ks[3], (c.num_heads, hd, c.hidden_size))},
            },
            "mlp": {
                "gate_proj": {"kernel": qmat(ks[4], (c.hidden_size, c.intermediate_size))},
                "up_proj": {"kernel": qmat(ks[5], (c.hidden_size, c.intermediate_size))},
                "down_proj": {"kernel": qmat(ks[6], (c.intermediate_size, c.hidden_size))},
            },
        }

    @jax.jit
    def make_top(key):
        k1, k2 = jax.random.split(key)
        out = {
            "embed_tokens": {
                "embedding": jax.random.normal(k1, (c.vocab_size, c.hidden_size), jnp.float32)
                * 0.02
            },
            "norm": {"scale": jnp.ones(c.hidden_size, jnp.float32)},
        }
        if not c.tie_word_embeddings:
            out["lm_head"] = {"kernel": qmat(k2, (c.hidden_size, c.vocab_size))}
        return out

    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, c.num_layers + 1)
    params = make_top(keys[0])
    for i in range(c.num_layers):
        params[f"layer_{i}"] = make_layer(keys[i + 1])
    jax.block_until_ready(params)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=80, help="num_return_sequences")
    ap.add_argument("--prompt_len", type=int, default=64)
    ap.add_argument("--max_new", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--precision", choices=["int8", "int4"], default="int8")
    ap.add_argument("--kv_quant", choices=["none", "int8"], default="none",
                    help="int8 KV cache: ~halves cache HBM, raising max batch")
    args = ap.parse_args()

    base = LlamaConfig.llama2_7b()
    import dataclasses

    config = dataclasses.replace(base, num_layers=args.layers, kv_quant=args.kv_quant)
    n_params = (
        config.vocab_size * config.hidden_size * (1 if config.tie_word_embeddings else 2)
        + config.num_layers
        * (4 * config.hidden_size**2 + 3 * config.hidden_size * config.intermediate_size)
    )
    print(f"geometry: {n_params/1e9:.2f}B params, {args.layers} layers", file=sys.stderr)

    t0 = time.time()
    params = device_quantized_params(config, precision=args.precision)
    print(f"device {args.precision} init: {time.time()-t0:.1f}s", file=sys.stderr)

    gen = GenerationConfig(
        num_return_sequences=args.batch, max_new_tokens=args.max_new, top_k=50, top_p=0.95
    )
    sampler = Sampler(config, gen, eos_token_id=-1)  # no eos: fixed-length decode

    rng = np.random.default_rng(0)
    ids = rng.integers(3, config.vocab_size, (1, args.prompt_len)).astype(np.int32)
    mask = np.ones_like(ids)

    t0 = time.time()
    out = sampler.generate(params, ids, mask, num_return_sequences=args.batch, seed=0)
    print(f"compile+first generate: {time.time()-t0:.1f}s", file=sys.stderr)
    assert out.shape == (args.batch, args.max_new)

    times = []
    for i in range(args.iters):
        t0 = time.time()
        out = sampler.generate(params, ids, mask, num_return_sequences=args.batch, seed=i + 1)
        assert int(out[0, -1]) >= 0  # data-dependent fetch already done by np.asarray
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    seqs_per_s = args.batch / med
    toks_per_s = args.batch * args.max_new / med
    print(f"times: {[round(t,2) for t in times]}", file=sys.stderr)
    print(
        json.dumps(
            {
                "geometry_params_b": round(n_params / 1e9, 2),
                "precision": args.precision,
                "kv_quant": args.kv_quant,
                "batch": args.batch,
                "prompt_len": args.prompt_len,
                "max_new_tokens": args.max_new,
                "seqs_per_s": round(seqs_per_s, 2),
                "tokens_per_s": round(toks_per_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
