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
import os
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
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The axon sitecustomize registers/pins the TPU platform before the
        # env var is honored; mirror tests/conftest.py's explicit override
        # so a CPU-requested bench run never routes through the relay.
        jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

NUM_DOCS = 1_000_000
NUM_POSTINGS = 5_700_000
VOCAB = 100_000
NQ = 64
TOPK = 1000
QUERY_TERMS = 8
ITERS = 6


def configure(num_docs, num_postings, nq, vocab=VOCAB):
    """Override the workload (e.g. MSMARCO scale: 8.8M docs)."""
    global NUM_DOCS, NUM_POSTINGS, NQ, VOCAB
    NUM_DOCS, NUM_POSTINGS, NQ, VOCAB = num_docs, num_postings, nq, vocab


def build_index_dense_zipf():
    """MSMARCO-density variant of ``build_index``: exact posting-count
    construction at densities where rejection sampling saturates.

    At the INDEX_BUILD_8M8.json store shape (8.8M docs, 30k vocab, 388M
    postings) the head terms' lists approach the corpus size, so the default
    generator's single 1.25x oversample + dedupe cannot reach the target
    count (term 1 alone collides away ~80% of its draws).  Draw adaptively
    until the unique (term, doc) pool reaches the target, then subsample to
    it uniformly.  Postings come out doc-ascending within each term (the
    sorted unique keys) rather than the on-disk impact-descending order —
    irrelevant for the hybrid engines, which either device-sort the gathered
    updates per batch or doc-sort at load; the native/refpy on-disk engines
    are not supported by this generator."""
    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    rng = np.random.default_rng(0)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    p = 1.0 / ranks
    p /= p.sum()
    keys_u = np.empty(0, np.int64)
    n_draw = int(NUM_POSTINGS * 1.35)
    for attempt in range(8):
        tids = rng.choice(VOCAB, size=n_draw, p=p).astype(np.int64)
        docs = rng.integers(0, NUM_DOCS, n_draw).astype(np.int64)
        keys = tids * NUM_DOCS + docs
        del tids, docs
        keys_u = np.unique(np.concatenate([keys_u, keys]))
        del keys
        print(
            f"draw round {attempt}: {len(keys_u)/1e6:.1f}M unique "
            f"(target {NUM_POSTINGS/1e6:.1f}M)",
            file=sys.stderr,
        )
        if len(keys_u) >= NUM_POSTINGS:
            break
        n_draw = int((NUM_POSTINGS - len(keys_u)) * 2.5)
    assert len(keys_u) >= NUM_POSTINGS, "generator saturated below target"
    if len(keys_u) > NUM_POSTINGS:
        sel = np.sort(
            rng.choice(len(keys_u), NUM_POSTINGS, replace=False, shuffle=False)
        )
        keys_u = keys_u[sel]
        del sel
    tids = keys_u // NUM_DOCS
    docs = (keys_u % NUM_DOCS).astype(np.uint32)
    del keys_u
    vals = rng.integers(1, 256, NUM_POSTINGS).astype(np.uint8)
    counts = np.bincount(tids, minlength=VOCAB)
    del tids
    offsets = np.zeros(VOCAB + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    vocab = [f"t{i:06d}" for i in range(VOCAB)]
    index = InvertedIndexData(vocab, offsets, docs, vals, num_docs=NUM_DOCS)

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
    ap.add_argument("--vocab", type=int, default=VOCAB,
                    help="vocab size; a non-default value switches to the "
                    "adaptive MSMARCO-density generator (hybrid engines "
                    "only: no on-disk save)")
    ap.add_argument("--dense_budget_gb", type=float, default=4.0)
    ap.add_argument("--repeats", type=int, default=1,
                    help="repeat each engine's measurement N times to "
                    "record run-to-run spread")
    args = ap.parse_args()
    configure(args.num_docs, args.num_postings, args.nq, args.vocab)
    engines = args.engines.split(",")

    if args.vocab != 100_000:
        index, queries = build_index_dense_zipf()
    else:
        index, queries = build_index(args.workdir)
    results = []
    engine_cache = {}

    # Probe the density auto-gate on this store's statistics (host-only:
    # replicate the engine's heavy-term pick, no device work).
    from improving_learned_index_tpu.search import hybrid_engine as he

    lens = np.diff(np.asarray(index.offsets, dtype=np.int64))
    n_pad = (
        -(-index.num_docs // he._SCATTER_TILE) * he._SCATTER_TILE
        if index.num_docs >= he._PALLAS_MIN_DOCS
        else ((index.num_docs + 127) // 128) * 128
    )
    max_rows = max(1, int(args.dense_budget_gb * (1 << 30)) // (2 * n_pad))
    heavy = np.nonzero(lens >= 1024)[0]
    if len(heavy) > max_rows:
        heavy = np.sort(heavy[np.argsort(lens[heavy])[::-1][:max_rows]])
    is_heavy = np.zeros(len(lens), bool)
    is_heavy[heavy] = True
    gate, gate_stats = he.HybridSearchEngine.recommend_tail_partitioned(
        lens, is_heavy, n_pad, int(index.num_docs)
    )
    print(f"density auto-gate: partitioned={gate} {gate_stats}", file=sys.stderr)

    def get_hybrid(cfg_key, cfg, part, pallas):
        """One engine init per (partitioned, pallas, approx) config — at
        corpus scale init is minutes (dense build + doc-sort + uploads), so
        the sync and pipelined variants of one config share the engine."""
        if cfg_key not in engine_cache:
            from improving_learned_index_tpu.search.hybrid_engine import (
                HybridSearchEngine,
            )

            t0 = time.time()
            eng = HybridSearchEngine(
                index, config=cfg, heavy_min=1024,
                dense_budget_bytes=int(args.dense_budget_gb * (1 << 30)),
                use_pallas=pallas,
                tail_partitioned=part,
            )
            print(
                f"{cfg_key}: init {time.time()-t0:.1f}s, {eng.t_heavy} dense"
                f" rows (pallas={eng._pallas},"
                f" partitioned={eng._tail_partitioned})",
                file=sys.stderr,
            )
            engine_cache[cfg_key] = eng
        return engine_cache[cfg_key]

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
        if name.startswith("hybrid"):
            # hybrid          auto tail mode (the production default)
            # hybrid_approx   approx_max_k selection
            # hybrid_pallas*  opt-in Pallas kernels (A/B)
            # hybrid_part*    force sort-free partitioned tail (A/B)
            # hybrid_nopart*  force sorted/flat tail (A/B)
            # *_pipelined     throughput mode; *_pipelined32 at nq=32
            # Group same-config variants consecutively in --engines: one
            # init is shared, and requesting a NEW config frees the old
            # engine first (two corpus-scale engines do not co-fit in HBM).
            from improving_learned_index_tpu.core.config import SearchConfig

            base = name
            for suffix in ("_pipelined32", "_pipelined"):
                if base.endswith(suffix):
                    base = base[: -len(suffix)]
            cfg = SearchConfig(approx_top_k=(base == "hybrid_approx"))
            part = None
            if base.startswith("hybrid_part"):
                part = True
            elif base.startswith("hybrid_nopart"):
                part = False
            # pallas: force-on for hybrid_pallas*; force-off for the
            # explicit XLA-arm labels (nopart/part A/B controls must not
            # silently flip to the kernels, and partitioned never combines
            # with them); engine auto (production default) otherwise
            pallas = None
            if base.startswith("hybrid_pallas"):
                pallas = True
            elif base.startswith(("hybrid_xla", "hybrid_nopart", "hybrid_part")):
                pallas = False
            if base not in engine_cache:
                engine_cache.clear()
                eng = None  # free the previous config's HBM before this init
            eng = get_hybrid(base, cfg, part, pallas)
            if name.endswith("_pipelined") or name.endswith("_pipelined32"):
                # Throughput mode: keep batches in flight so transfer
                # overlaps compute (exact top-k).
                q = queries[:32] if name.endswith("32") else queries
                nq_eff = len(q)
                reps = []
                eng.score_batch(q, TOPK)  # warmup/compile
                for _ in range(max(args.repeats, 1)):
                    n_batches = 8
                    t0 = time.time()
                    total = 0
                    for res in eng.score_stream([q] * n_batches, TOPK, depth=3):
                        total += sum(len(r) for r in res)
                    el = time.time() - t0
                    reps.append(nq_eff * n_batches / el)
                qps = statistics.median(reps)
                el_ms = nq_eff * n_batches / qps / n_batches * 1000
                print(
                    f"{name}: {el_ms:.1f} ms/batch pipelined, "
                    f"{qps:.1f} q/s (reps: {[round(x,1) for x in reps]})",
                    file=sys.stderr,
                )
                r = {"label": name, "ms_per_batch": round(el_ms, 2),
                     "q_per_s": round(qps, 2)}
                if len(reps) > 1:
                    r["q_per_s_reps"] = [round(x, 2) for x in reps]
            else:
                r = time_engine(lambda: eng.score_batch(queries, TOPK), name)
                if base in ("hybrid", "hybrid_part", "hybrid_nopart",
                            "hybrid_pallas"):
                    baseline_results[base] = eng.score_batch(queries, TOPK)
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

    # Every tail mode must match every other rank-by-rank (exact contract).
    variants = ("hybrid", "hybrid_nopart", "hybrid_part", "hybrid_pallas")
    pairs = [
        (x, y)
        for i, x in enumerate(variants)
        for y in variants[i + 1:]
        if x in baseline_results and y in baseline_results
    ]
    for x, y in pairs:
        for a, b in zip(baseline_results[x], baseline_results[y]):
            assert [s for _, s in a] == [s for _, s in b], f"{x} vs {y} score mismatch"
        print(f"{y} exact == {x} scores at every rank", file=sys.stderr)

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
            "vocab": VOCAB,
            "queries_per_batch": NQ, "top_k": TOPK, "query_terms": QUERY_TERMS,
        },
        "auto_gate": {"partitioned": bool(gate), **{
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in gate_stats.items()
        }},
        "results": results,
    }
    print(json.dumps(payload))
    if args.out:
        args.out.write_text(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
