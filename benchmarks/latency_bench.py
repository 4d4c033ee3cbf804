"""Serving-latency benchmark: per-batch p50/p95/p99 at small batch sizes.

Throughput benches (query_bench.py) measure pipelined q/s with deep
batches; a serving deployment also cares about tail latency at batch
size 1-16.  This bench times individual `score_batch` calls (dispatch +
compute + the one packed result fetch) on the 1M-doc workload and
records percentiles per batch size.

Note the axon relay contributes ~30ms dispatch latency per call that a
directly-attached chip would not pay; the JSON records it as the
environment's floor (measured by timing a no-op device fetch).

Usage: python benchmarks/latency_bench.py --out benchmarks/LATENCY.json
"""

from __future__ import annotations

import argparse
import json
import statistics
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

from query_bench import build_index  # noqa: E402  (same 1M-doc workload)

TOPK = 1000
ROUNDS = 40


def percentiles(times):
    ts = sorted(times)

    def pct(p):
        return ts[min(len(ts) - 1, int(round(p / 100 * (len(ts) - 1))))]

    return {
        "p50_ms": round(statistics.median(ts) * 1000, 2),
        "p95_ms": round(pct(95) * 1000, 2),
        "p99_ms": round(pct(99) * 1000, 2),
        "max_ms": round(ts[-1] * 1000, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--batch_sizes", default="1,8,64")
    ap.add_argument("--rounds", type=int, default=ROUNDS)
    ap.add_argument("--dense_budget_gb", type=float, default=4.0)
    args = ap.parse_args()

    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    index, queries = build_index(Path("/tmp/latency_bench"))
    eng = HybridSearchEngine(
        index, heavy_min=1024,
        dense_budget_bytes=int(args.dense_budget_gb * (1 << 30)),
    )
    print(f"engine ready (pallas={eng._pallas})", file=sys.stderr)

    # Relay/dispatch floor: time a trivial device->host fetch.
    one = jax.device_put(np.zeros(8, np.float32))
    floor = []
    for _ in range(10):
        t0 = time.time()
        np.asarray(one + 1)
        floor.append(time.time() - t0)
    floor_ms = round(statistics.median(floor) * 1000, 2)
    print(f"device round-trip floor: {floor_ms} ms", file=sys.stderr)

    results = {"roundtrip_floor_ms": floor_ms, "top_k": TOPK, "by_batch": {}}
    rng = np.random.default_rng(7)
    for bs in (int(b) for b in args.batch_sizes.split(",")):
        # distinct query batches per round (realistic cache behavior), one
        # warmup per bucketed shape
        batches = [
            [queries[int(i)] for i in rng.integers(0, len(queries), bs)]
            for _ in range(args.rounds)
        ]
        eng.score_batch(batches[0], TOPK)  # warmup/compile
        times = []
        for b in batches:
            t0 = time.time()
            eng.score_batch(b, TOPK)
            times.append(time.time() - t0)
        stats = percentiles(times)
        stats["q_per_s_sync"] = round(bs / statistics.median(times), 1)
        results["by_batch"][bs] = stats
        print(f"batch {bs}: {stats}", file=sys.stderr)

    print(json.dumps(results))
    if args.out:
        args.out.write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
