"""Device-vs-hybrid engine crossover sweep (validates search.select's
HYBRID_MIN_DOCS boundary with measurements instead of interpolation).

Sweeps corpus size with postings scaled ~5.7/doc (the query_bench density),
measuring exact-top-k queries/s for both engines at 64-query batches.

Usage: python benchmarks/crossover_bench.py [--sizes 50000,100000,250000,1000000]
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

try:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
except Exception:
    pass

NQ = 64
TOPK = 1000
ITERS = 4


def build(num_docs: int, seed: int = 0):
    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    num_postings = int(num_docs * 5.7)
    vocab_size = max(1000, num_docs // 10)
    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, vocab_size + 1)
    p /= p.sum()
    tids = rng.choice(vocab_size, size=num_postings, p=p)
    docs = rng.integers(0, num_docs, num_postings)
    vals = rng.integers(1, 256, num_postings)
    order = np.argsort(tids * 256 + (255 - vals), kind="stable")
    counts = np.bincount(tids, minlength=vocab_size)
    offsets = np.zeros(vocab_size + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    vocab = [f"t{i}" for i in range(vocab_size)]
    index = InvertedIndexData(
        vocab, offsets, docs[order].astype(np.uint32), vals[order].astype(np.uint8),
        num_docs=num_docs,
    )
    queries = [
        {vocab[i] for i in rng.choice(vocab_size, size=8, p=p)} for _ in range(NQ)
    ]
    return index, queries


def time_engine(engine, queries) -> float:
    engine.score_batch(queries, TOPK)  # warm/compile
    t0 = time.time()
    n = 0
    if hasattr(engine, "score_stream"):
        for res in engine.score_stream([queries] * ITERS, TOPK, depth=2):
            n += len(res)
    else:
        for _ in range(ITERS):
            n += len(engine.score_batch(queries, TOPK))
    return n / (time.time() - t0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sizes", type=str, default="50000,100000,250000,1000000")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).parent / "CROSSOVER.json")
    args = parser.parse_args(argv)

    from improving_learned_index_tpu.core.config import SearchConfig
    from improving_learned_index_tpu.search.device_engine import DeviceSearchEngine
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    rows = []
    for size in [int(s) for s in args.sizes.split(",")]:
        index, queries = build(size)
        dev = DeviceSearchEngine(index, SearchConfig())
        dev_qps = time_engine(dev, queries)
        del dev
        hyb = HybridSearchEngine(index)
        hyb_qps = time_engine(hyb, queries)
        del hyb
        rows.append({
            "num_docs": size,
            "postings": index.num_postings,
            "device_qps": round(dev_qps, 1),
            "hybrid_qps": round(hyb_qps, 1),
            "winner": "hybrid" if hyb_qps > dev_qps else "device",
        })
        print(rows[-1], flush=True)

    report = {"workload": "64-query batches, 8 terms, k=1000, exact", "rows": rows}
    args.out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
