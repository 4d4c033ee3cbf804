"""Host-side query-prep microbench (VERDICT round-2 ask #8).

Measures HybridSearchEngine._tables (vocab lookups + heavy one-hot + tail
chunk expansion) against the device batch latency so the host never becomes
the serving bottleneck.  Target: prep < 10% of batch latency at 64 queries x
32 terms.

Usage: python benchmarks/host_prep_bench.py  (host-only: runs on any backend)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    from improving_learned_index_tpu.index.inverted import InvertedIndexData
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    rng = np.random.default_rng(0)
    num_docs, vocab_size, postings = 1_000_000, 50_000, 6_000_000
    p = 1.0 / np.arange(1, vocab_size + 1)
    p /= p.sum()
    tids = rng.choice(vocab_size, size=postings, p=p)
    docs = rng.integers(0, num_docs, postings)
    vals = rng.integers(1, 256, postings)

    order = np.argsort(tids * 256 + (255 - vals), kind="stable")
    counts = np.bincount(tids, minlength=vocab_size)
    offsets = np.zeros(vocab_size + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    vocab = [f"t{i}" for i in range(vocab_size)]
    index = InvertedIndexData(
        vocab, offsets, docs[order].astype(np.uint32), vals[order].astype(np.uint8),
        num_docs=num_docs,
    )
    engine = HybridSearchEngine(index, dense_budget_bytes=1 << 30)

    def batch(n_q=64, n_terms=32):
        return [
            {vocab[i] for i in rng.choice(vocab_size, size=n_terms, p=p)}
            for _ in range(n_q)
        ]

    batches = [batch() for _ in range(20)]
    # warm + prep-only timing
    engine._tables(batches[0])
    t0 = time.time()
    for b in batches:
        engine._tables(b)
    prep_ms = (time.time() - t0) / len(batches) * 1000

    # full batch latency (includes prep, dispatch, device, fetch)
    fin = engine.score_batch_async(batches[0], 1000)
    fin()
    t0 = time.time()
    for b in batches:
        engine.score_batch_async(b, 1000)()
    total_ms = (time.time() - t0) / len(batches) * 1000

    report = {
        "workload": "64 queries x 32 terms, 1M docs / 6M postings",
        "host_prep_ms": round(prep_ms, 2),
        "batch_total_ms": round(total_ms, 2),
        "prep_fraction": round(prep_ms / total_ms, 4),
        "passes_10pct_target": prep_ms / total_ms < 0.10,
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
