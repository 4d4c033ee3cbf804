"""Benchmark: documents-encoded/s on the flagship DeepImpact encoder.

Prints ONE JSON line:
    {"metric": "docs_encoded_per_s", "value": N, "unit": "docs/s", "vs_baseline": R}

``vs_baseline`` compares against the reference stack's encode path — a torch
(CPU) BERT-base forward with the same geometry/batch/sequence — measured once
on this machine and cached in ``.bench_baseline.json`` (the reference repo is
CUDA-only; CPU torch is its runnable equivalent here, and BASELINE.json's
north star is >10x docs/s vs the CPU reference).

Timing notes: the axon TPU relay executes asynchronously and
``block_until_ready`` alone has been observed to return early, so every timed
iteration fetches a data-dependent scalar (jnp.sum of the impact scores) to
the host — an un-fakeable round trip.  One shape only: remote compiles are
slow and erratic (40s-10min), so the benchmark compiles exactly one program.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

BATCH = 128  # measured sweet spot on v5e-1: 1388 docs/s (vs 720 at B=32)
SEQ = 256
ITERS = 8
CACHE = Path(__file__).parent / ".bench_baseline.json"

GEOM = dict(
    vocab_size=30522,
    hidden_size=768,
    num_layers=12,
    num_heads=12,
    intermediate_size=3072,
    max_position_embeddings=512,
)


def measure_torch_cpu() -> float:
    """Reference-equivalent encode throughput: torch BERT-base on CPU.
    Measured at a small batch (CPU docs/s is batch-insensitive; B=128 would
    take ~10 min on one core)."""
    import torch
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=GEOM["vocab_size"],
        hidden_size=GEOM["hidden_size"],
        num_hidden_layers=GEOM["num_layers"],
        num_attention_heads=GEOM["num_heads"],
        intermediate_size=GEOM["intermediate_size"],
        max_position_embeddings=GEOM["max_position_embeddings"],
    )
    model = BertModel(cfg).eval()
    head = torch.nn.Linear(GEOM["hidden_size"], 1)
    b = 8
    ids = torch.randint(1, GEOM["vocab_size"], (b, SEQ))
    mask = torch.ones_like(ids)
    with torch.no_grad():
        model(input_ids=ids, attention_mask=mask)  # warmup
        start = time.time()
        n = 2
        for _ in range(n):
            out = model(input_ids=ids, attention_mask=mask).last_hidden_state
            torch.relu(head(out))
        elapsed = time.time() - start
    return b * n / elapsed


def baseline_docs_per_s() -> float:
    if CACHE.exists():
        return json.loads(CACHE.read_text())["torch_cpu_docs_per_s"]
    val = measure_torch_cpu()
    CACHE.write_text(json.dumps({"torch_cpu_docs_per_s": val, "batch": BATCH, "seq": SEQ}))
    return val


def measure_jax() -> float:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
    except Exception:
        pass
    import jax.numpy as jnp

    from improving_learned_index_tpu.core.config import EncoderConfig
    from improving_learned_index_tpu.models.encoder import DeepImpactModel, init_params

    config = EncoderConfig(
        **GEOM, impact_activation="relu", hidden_dropout=0.0, attention_dropout=0.0
    )
    module = DeepImpactModel(config)
    params = init_params(module, config, jax.random.PRNGKey(0), max_length=16)

    @jax.jit
    def forward(p, ids, mask, type_ids):
        out = module.apply({"params": p}, ids, mask, type_ids)
        return jnp.sum(out)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, GEOM["vocab_size"], (BATCH, SEQ)), dtype=jnp.int32)
    mask = jnp.ones((BATCH, SEQ), dtype=jnp.int32)
    type_ids = jnp.zeros((BATCH, SEQ), dtype=jnp.int32)

    t0 = time.time()
    s = float(forward(params, ids, mask, type_ids))  # compile + execute + fetch
    print(f"compile+first: {time.time() - t0:.1f}s (sum={s:.2f})", file=sys.stderr)
    float(forward(params, ids, mask, type_ids))  # settle

    times = []
    for _ in range(ITERS):
        t0 = time.time()
        float(forward(params, ids, mask, type_ids))  # scalar fetch = real sync
        times.append(time.time() - t0)
    med = statistics.median(times)
    print(
        f"iters(ms): {[round(t * 1000, 1) for t in times]}", file=sys.stderr
    )
    return BATCH / med


def main():
    docs_per_s = measure_jax()
    try:
        base = baseline_docs_per_s()
        vs = docs_per_s / base
    except Exception as e:  # torch/transformers missing: report raw only
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        vs = None
    print(
        json.dumps(
            {
                "metric": "docs_encoded_per_s",
                "value": round(docs_per_s, 2),
                "unit": "docs/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
