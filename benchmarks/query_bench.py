"""Corpus-scale query benchmark: 1M docs / ~5.7M postings / 64-query batches,
k=1000 — the workload where round 1's XLA-scatter engine lost to the
single-core C++ engine (505 q/s).

Engines (pick with --engines, comma separated):
    hybrid         HybridSearchEngine, exact integer top-k   (TPU)
    hybrid_pallas  same engine, opt-in Pallas kernels        (TPU, A/B)
    hybrid_approx  HybridSearchEngine, approx_max_k          (TPU)
    device         round-1 DeviceSearchEngine scatter path   (TPU)
    native         C++ engine over the on-disk index         (host, 1 core)
    refpy          the reference's Python postings loop      (host, 1 core)

Timing: every iteration converts the full result to numpy (device->host
fetch), an un-fakeable sync under the axon async relay.  One compiled shape
per engine (same query batch re-scored), since remote compiles are slow.

Usage: python benchmarks/query_bench.py --engines hybrid,hybrid_approx
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

NUM_DOCS = 1_000_000
NUM_POSTINGS = 5_700_000
VOCAB = 100_000
NQ = 64
TOPK = 1000
QUERY_TERMS = 8
ITERS = 6


def configure(num_docs, num_postings, nq):
    """Override the workload (e.g. MSMARCO scale: 8.8M docs)."""
    global NUM_DOCS, NUM_POSTINGS, NQ
    NUM_DOCS, NUM_POSTINGS, NQ = num_docs, num_postings, nq


def build_index(tmp: Path):
    """Zipf postings over a 1M-doc corpus, direct CSR construction."""
    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    rng = np.random.default_rng(0)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    p = 1.0 / ranks
    p /= p.sum()
    # Oversample then dedupe (term, doc): a real index has exactly one
    # quantized impact per term per doc.
    n_draw = int(NUM_POSTINGS * 1.25)
    tids = rng.choice(VOCAB, size=n_draw, p=p).astype(np.int64)
    docs = rng.integers(0, NUM_DOCS, n_draw).astype(np.int64)
    _, uniq = np.unique(tids * NUM_DOCS + docs, return_index=True)
    uniq = uniq[:NUM_POSTINGS]
    assert len(uniq) == NUM_POSTINGS, f"only {len(uniq)} unique postings"
    tids, docs = tids[uniq], docs[uniq]
    vals = rng.integers(1, 256, NUM_POSTINGS).astype(np.int64)

    order = np.lexsort((-vals, tids))
    tids, docs, vals = tids[order], docs[order], vals[order]
    counts = np.bincount(tids, minlength=VOCAB)
    offsets = np.zeros(VOCAB + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    vocab = [f"t{i:06d}" for i in range(VOCAB)]
    index = InvertedIndexData(
        vocab, offsets, docs.astype(np.uint32), vals.astype(np.uint8), num_docs=NUM_DOCS
    )

    # Queries: Zipf-weighted term draws (frequent terms are frequent in
    # queries too), fixed seed.
    qrng = np.random.default_rng(1)
    queries = [
        {f"t{t:06d}" for t in qrng.choice(VOCAB, size=QUERY_TERMS, replace=False, p=p)}
        for _ in range(NQ)
    ]
    touched = sum(
        int(offsets[t + 1] - offsets[t])
        for q in queries
        for t in (int(s[1:]) for s in q)
    )
    print(f"postings touched per {NQ}-query batch: {touched/1e6:.2f}M", file=sys.stderr)
    return index, queries


def time_engine(fn, label: str, iters: int = ITERS):
    out = fn()  # warmup/compile
    check = sum(len(r) for r in out)
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn()
        assert sum(len(r) for r in out) == check
        times.append(time.time() - t0)
    med = statistics.median(times)
    qps = NQ / med
    print(
        f"{label}: {med*1000:.1f} ms/batch, {qps:.1f} q/s "
        f"(times ms: {[round(t*1000,1) for t in times]})",
        file=sys.stderr,
    )
    return {"label": label, "ms_per_batch": round(med * 1000, 2), "q_per_s": round(qps, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="hybrid,hybrid_approx,native")
    ap.add_argument("--workdir", type=Path, default=Path("/tmp/query_bench"))
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--num_docs", type=int, default=NUM_DOCS)
    ap.add_argument("--num_postings", type=int, default=NUM_POSTINGS)
    ap.add_argument("--nq", type=int, default=NQ)
    ap.add_argument("--dense_budget_gb", type=float, default=4.0)
    args = ap.parse_args()
    configure(args.num_docs, args.num_postings, args.nq)
    engines = args.engines.split(",")

    index, queries = build_index(args.workdir)
    results = []

    need_disk = {"native", "refpy"} & set(engines)
    if need_disk:
        # key the cached on-disk copy by the workload so edits to the
        # generator can't leave a stale index behind
        fingerprint = f"{NUM_DOCS}-{NUM_POSTINGS}-{index.num_postings}-dedup"
        args.workdir = args.workdir / fingerprint
        args.workdir.mkdir(parents=True, exist_ok=True)
        if not (args.workdir / "inverted_index.dat").exists():
            print("saving on-disk index...", file=sys.stderr)
            index.save(args.workdir)

    baseline_results = {}
    for name in engines:
        if name in (
            "hybrid", "hybrid_approx", "hybrid_pipelined",
            "hybrid_pallas", "hybrid_pallas_pipelined",  # opt-in Pallas kernels (A/B)
            "hybrid_part", "hybrid_part_pipelined",      # sort-free partitioned tail (A/B)
            "hybrid_nopart", "hybrid_nopart_pipelined",  # force sorted/flat tail (A/B)
        ):
            from improving_learned_index_tpu.core.config import SearchConfig
            from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

            cfg = SearchConfig(approx_top_k=(name == "hybrid_approx"))
            part = None
            if name.startswith("hybrid_part"):
                part = True
            elif name.startswith("hybrid_nopart"):
                part = False
            t0 = time.time()
            eng = HybridSearchEngine(
                index, config=cfg, heavy_min=1024,
                dense_budget_bytes=int(args.dense_budget_gb * (1 << 30)),
                use_pallas=name.startswith("hybrid_pallas"),
                tail_partitioned=part,
            )
            print(
                f"{name}: init {time.time()-t0:.1f}s, {eng.t_heavy} dense rows"
                f" (pallas={eng._pallas}, partitioned={eng._tail_partitioned})",
                file=sys.stderr,
            )
            if name.endswith("pipelined"):
                # Throughput mode: keep batches in flight so transfer
                # overlaps compute (exact top-k).
                eng.score_batch(queries, TOPK)  # warmup/compile
                n_batches = 8
                t0 = time.time()
                total = 0
                for res in eng.score_stream([queries] * n_batches, TOPK, depth=3):
                    total += sum(len(r) for r in res)
                el = time.time() - t0
                qps = NQ * n_batches / el
                print(
                    f"{name}: {el/n_batches*1000:.1f} ms/batch pipelined, "
                    f"{qps:.1f} q/s ({total} results)",
                    file=sys.stderr,
                )
                r = {"label": name, "ms_per_batch": round(el / n_batches * 1000, 2),
                     "q_per_s": round(qps, 2)}
            else:
                r = time_engine(lambda: eng.score_batch(queries, TOPK), name)
                if name == "hybrid":
                    baseline_results["hybrid"] = eng.score_batch(queries, TOPK)
                elif name == "hybrid_part":
                    baseline_results["hybrid_part"] = eng.score_batch(queries, TOPK)
            del eng
        elif name == "device":
            from improving_learned_index_tpu.search.device_engine import DeviceSearchEngine

            eng = DeviceSearchEngine(index)
            r = time_engine(lambda: eng.score_batch(queries, TOPK), name)
            del eng
        elif name == "native":
            from improving_learned_index_tpu.search.native import NativeSearchEngine

            eng = NativeSearchEngine(args.workdir)
            r = time_engine(lambda: eng.score_batch(queries, TOPK), name, iters=3)
            baseline_results["native"] = eng.score_batch(queries, TOPK)
        elif name == "refpy":
            sys.path.insert(0, "/root/reference")
            import src.utils.defaults as ref_defaults

            ref_defaults.LOG_DIR = args.workdir / "ref_logs"
            from src.deep_impact.inverted_index.inverted_index import InvertedIndex as RefII

            ref = RefII(args.workdir)
            sub = queries[:4]
            t0 = time.time()
            for q in sub:
                ref.score(q, top_k=TOPK)
            el = (time.time() - t0) / len(sub)
            r = {"label": "refpy", "ms_per_batch": round(el * NQ * 1000, 2),
                 "q_per_s": round(1.0 / el, 2)}
            print(f"refpy: {1.0/el:.2f} q/s ({el*1000:.0f} ms/query)", file=sys.stderr)
        else:
            raise SystemExit(f"unknown engine {name}")
        results.append(r)

    # Partitioned tail must match the default hybrid engine rank-by-rank.
    if "hybrid" in baseline_results and "hybrid_part" in baseline_results:
        for a, b in zip(baseline_results["hybrid"], baseline_results["hybrid_part"]):
            assert [s for _, s in a] == [s for _, s in b], "partitioned score mismatch"
        print("hybrid_part exact == hybrid scores at every rank", file=sys.stderr)

    # Cross-check exactness if both TPU-exact and native ran.
    if "hybrid" in baseline_results and "native" in baseline_results:
        for a, b in zip(baseline_results["hybrid"], baseline_results["native"]):
            sa = [s for _, s in a]
            sb = [s for _, s in b]
            assert sa == sb, "hybrid-exact vs native score mismatch"
        print("hybrid exact == native scores at every rank", file=sys.stderr)

    payload = {
        "workload": {
            "num_docs": NUM_DOCS, "num_postings": NUM_POSTINGS,
            "queries_per_batch": NQ, "top_k": TOPK, "query_terms": QUERY_TERMS,
        },
        "results": results,
    }
    print(json.dumps(payload))
    if args.out:
        args.out.write_text(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
