"""Benchmark: documents-encoded/s + queries/s on the flagship stack.

Prints ONE JSON line:
    {"metric": "docs_encoded_per_s", "value": N, "unit": "docs/s",
     "vs_baseline": R, "extra": {"queries_per_s": Q, "queries_vs_baseline": RQ,
                                 "query_workload": "..."}}

``vs_baseline`` compares against the reference stack's encode path — a torch
(CPU) BERT-base forward with the same geometry/sequence — measured once on
this machine and cached in ``.bench_baseline.json`` (the reference repo is
CUDA-only; CPU torch at B=8 is its runnable equivalent here, and
BASELINE.json's north star is >10x docs/s AND queries/s vs the CPU
reference).  ``queries_vs_baseline`` compares the TPU query engine
(search.hybrid_engine, exact top-k, pipelined) against the reference's
actual Python postings loop (inverted_index.py:55-62) run from
/root/reference on the identical 1M-doc index.

Timing notes: the axon TPU relay executes asynchronously and adds ~30ms
dispatch latency per call; every timed iteration fetches data-dependent
results to the host — an un-fakeable round trip.  Compiles are slow and
erratic remotely, so both sections compile exactly one program each and use
the on-disk compilation cache.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

BATCH = 512  # measured on v5e-1: 1782 docs/s at B=512 vs 1388 at B=128
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


def _load_cache() -> dict:
    if CACHE.exists():
        return json.loads(CACHE.read_text())
    return {}


def _save_cache(d: dict) -> None:
    CACHE.write_text(json.dumps(d))


def measure_torch_cpu() -> float:
    """Reference-equivalent encode throughput: torch BERT-base on CPU.
    Measured at a small batch (CPU docs/s is batch-insensitive; B=512 would
    take ~30 min on one core)."""
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


def encode_baseline() -> float:
    cache = _load_cache()
    if "torch_cpu_docs_per_s" in cache:
        return cache["torch_cpu_docs_per_s"]
    val = measure_torch_cpu()
    cache["torch_cpu_docs_per_s"] = val
    _save_cache(cache)
    return val


def measure_encode() -> float:
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
    print(f"encode compile+first: {time.time() - t0:.1f}s (sum={s:.2f})", file=sys.stderr)
    float(forward(params, ids, mask, type_ids))  # settle

    times = []
    for _ in range(ITERS):
        t0 = time.time()
        float(forward(params, ids, mask, type_ids))  # scalar fetch = real sync
        times.append(time.time() - t0)
    med = statistics.median(times)
    print(f"encode iters(ms): {[round(t * 1000, 1) for t in times]}", file=sys.stderr)
    return BATCH / med


def measure_queries():
    """Queries/s on the 1M-doc / 5.7M-posting workload (benchmarks/
    query_bench.py geometry): hybrid exact engine, pipelined.  Baseline:
    the reference's Python postings loop on the same on-disk index,
    measured once and cached."""
    sys.path.insert(0, str(Path(__file__).parent / "benchmarks"))
    import query_bench as qb

    workdir = Path("/tmp/query_bench")
    index, queries = qb.build_index(workdir)

    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    eng = HybridSearchEngine(index, heavy_min=1024)
    eng.score_batch(queries, qb.TOPK)  # warmup/compile
    n_batches = 8
    # >= 3 repeats with recorded spread: single-shot numbers drifted -6.6%
    # between rounds 3 and 4 with no way to tell regression from noise
    reps = []
    for _ in range(3):
        t0 = time.time()
        total = 0
        for res in eng.score_stream([queries] * n_batches, qb.TOPK, depth=3):
            total += sum(len(r) for r in res)
        reps.append(qb.NQ * n_batches / (time.time() - t0))
    qps = statistics.median(reps)
    print(
        f"queries: {qps:.1f} q/s exact pipelined, reps "
        f"{[round(r, 1) for r in reps]} "
        f"(spread {min(reps):.1f}-{max(reps):.1f}, {total} results)",
        file=sys.stderr,
    )

    cache = _load_cache()
    # The baseline cache key carries the full workload fingerprint, so a
    # changed workload re-derives instead of reusing a stale anchor; the
    # measurement itself spans >= 20 queries (a 3-query sample drifted
    # 2.7-3.3 q/s across rounds).
    fingerprint = f"{qb.NUM_DOCS}-{qb.NUM_POSTINGS}-{index.num_postings}-dedup"
    base_key = f"refpy_q_per_s:{fingerprint}:n20"
    if base_key not in cache:
        disk = workdir / fingerprint
        if not (disk / "inverted_index.dat").exists():
            disk.mkdir(parents=True, exist_ok=True)
            index.save(disk)
        sys.path.insert(0, "/root/reference")
        import src.utils.defaults as ref_defaults

        ref_defaults.LOG_DIR = Path("/tmp/ref_logs")
        from src.deep_impact.inverted_index.inverted_index import InvertedIndex as RefII

        ref = RefII(disk)
        sub = (queries * 2)[:20]
        t0 = time.time()
        for q in sub:
            ref.score(q, top_k=qb.TOPK)
        cache[base_key] = len(sub) / (time.time() - t0)
        _save_cache(cache)
    base = cache[base_key]
    print(f"refpy baseline: {base:.2f} q/s", file=sys.stderr)
    return qps, qps / base, reps


def _relay_reachable(retry_s: float = 300.0) -> bool:
    """Fail fast-ish if the axon TPU relay daemon is down (nothing listening
    on its first port): jax.devices() would otherwise hang forever and the
    round's bench window would be spent blocked, not failing cleanly.  A
    flapping relay gets ``retry_s`` seconds to come back before we give up
    (probing a closed port is free; only jax clients must never be killed
    mid-RPC)."""
    import os
    import socket
    import time

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # not an axon environment; let jax pick its backend
    deadline = time.time() + retry_s
    while True:
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=5):
                return True
        except OSError:
            if time.time() >= deadline:
                return False
            print("TPU relay port closed; retrying for up to 5 min...", file=sys.stderr)
            time.sleep(15)


def main():
    if not _relay_reachable():
        print(
            json.dumps(
                {
                    "metric": "docs_encoded_per_s",
                    "value": None,
                    "unit": "docs/s",
                    "vs_baseline": None,
                    "error": "axon TPU relay daemon down (port 8082 unreachable); bench needs the TPU",
                }
            )
        )
        sys.exit(1)
    docs_per_s = measure_encode()
    try:
        base = encode_baseline()
        vs = docs_per_s / base
    except Exception as e:  # torch/transformers missing: report raw only
        print(f"encode baseline failed: {e}", file=sys.stderr)
        vs = None
    extra = None
    try:
        qps, q_vs, reps = measure_queries()
        extra = {
            "queries_per_s": round(qps, 2),
            "queries_vs_baseline": round(q_vs, 2),
            "queries_per_s_reps": [round(r, 2) for r in reps],
            "query_workload": "1M docs, 5.7M postings, 64-query batches, k=1000, exact top-k",
        }
    except Exception as e:
        print(f"query benchmark failed: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "docs_encoded_per_s",
                "value": round(docs_per_s, 2),
                "unit": "docs/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "baseline": "torch-CPU BERT-base fwd, B=8 S=256, 1 core (reference is CUDA-only)",
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
