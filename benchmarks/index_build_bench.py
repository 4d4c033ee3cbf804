"""Corpus-scale index-build pipeline benchmark (VERDICT round-2 ask #2).

Runs the REAL pipeline — the same code paths as the CLIs — at 1M documents:

    synthetic collection.tsv
      -> cli.index      (TPU encode -> binary impact store, indexer.py;
                         --pipeline text writes the reference text format)
      -> cli.quantize   (global-max 8-bit quantize, byte-parity w/ reference)
      -> cli.invert     (radix build + slab-serialized binary index)
      -> InvertedIndexData.load + HybridSearchEngine init
      -> 64-query exact-top-k batches

The default ``store`` pipeline moves impacts between stages as flat arrays
(index/impact_store.py) — same final .dat/.idx/vocab bytes as the ``text``
pipeline (proven in tests/test_impact_store.py), without re-parsing ~9 bytes
of text per posting per stage on the single host core.

and records per-stage wall-clock and peak host RSS into
benchmarks/INDEX_BUILD.json.  Reference capability: MSMARCO-scale offline
builds via src/deep_impact/inverted_index/create.py:12-55 (single-threaded
Python dict loop; no published timing).

Usage:
    python benchmarks/index_build_bench.py [--n_docs 1000000] [--out FILE]
    python benchmarks/index_build_bench.py --n_docs 20000   # smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class RssSampler:
    """Samples /proc/self/status VmRSS on a thread; max per stage."""

    def __init__(self, period_s: float = 0.05):
        self.period = period_s
        self._max = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    @staticmethod
    def _rss_mb() -> float:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    def _run(self):
        while not self._stop.is_set():
            rss = self._rss_mb()
            with self._lock:
                self._max = max(self._max, rss)
            self._stop.wait(self.period)

    def take_max_mb(self) -> float:
        """Max since the last take (also folds in a fresh sample)."""
        with self._lock:
            out = max(self._max, self._rss_mb())
            self._max = 0
        return out


def gen_collection(path: Path, n_docs: int, vocab_size: int = 30_000,
                   words_per_doc: int = 48, seed: int = 0) -> None:
    """Zipf-distributed synthetic collection, written as MSMARCO TSV."""
    rng = np.random.default_rng(seed)
    words = np.array([f"w{i:05d}" for i in range(vocab_size)])
    p = 1.0 / np.arange(1, vocab_size + 1) ** 0.9
    p /= p.sum()
    chunk = 20_000
    with open(path, "w", encoding="utf-8") as f:
        for lo in range(0, n_docs, chunk):
            hi = min(lo + chunk, n_docs)
            ids = rng.choice(vocab_size, size=(hi - lo, words_per_doc), p=p)
            for d in range(hi - lo):
                f.write(f"{lo + d}\t{' '.join(words[ids[d]])}\n")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_docs", type=int, default=1_000_000)
    parser.add_argument("--workdir", type=Path, default=Path("/tmp/index_build_bench"))
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).parent / "INDEX_BUILD.json")
    parser.add_argument("--max_length", type=int, default=64)
    parser.add_argument("--model_batch_size", type=int, default=512)
    parser.add_argument("--query_batches", type=int, default=10)
    parser.add_argument("--pipeline", choices=["store", "text"], default="store",
                        help="inter-stage format: binary impact store (fast) "
                        "or reference text (parity path)")
    parser.add_argument("--pack", action="store_true",
                        help="sequence-packed encode (several docs per row; "
                        "pays off when max_length >> mean doc tokens)")
    parser.add_argument("--resume", action="store_true",
                        help="skip stages whose outputs already exist in "
                        "--workdir (for re-running a crashed tail; the "
                        "canonical artifact must come from a clean run)")
    args = parser.parse_args(argv)

    from improving_learned_index_tpu.cli import build_vocab, index as cli_index
    from improving_learned_index_tpu.cli import invert as cli_invert
    from improving_learned_index_tpu.cli import quantize as cli_quantize
    from improving_learned_index_tpu.index.inverted import InvertedIndexData
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    work = args.workdir
    work.mkdir(parents=True, exist_ok=True)
    sampler = RssSampler()
    stages = {}

    def stage(name, fn, done: Path | None = None):
        if args.resume and done is not None and done.exists():
            stages[name] = {"seconds": None, "peak_rss_mb": None,
                            "skipped": "resume: output exists"}
            print(f"[{name}] skipped (resume)", flush=True)
            return None
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        stages[name] = {"seconds": round(dt, 2), "peak_rss_mb": round(sampler.take_max_mb(), 1)}
        print(f"[{name}] {dt:.1f}s peak_rss={stages[name]['peak_rss_mb']:.0f}MB", flush=True)
        return out

    coll = work / "collection.tsv"
    stage("generate_collection", lambda: gen_collection(coll, args.n_docs), done=coll)

    vocab_path = work / "vocab.txt"
    stage("build_vocab", done=vocab_path, fn=lambda: build_vocab.main([
        "--collection_path", str(coll), "--output_path", str(vocab_path),
        "--max_size", "32000", "--min_freq", "1",
    ]))

    if args.pipeline == "store":
        fwd = work / "collection.store"
        out_flag = ["--store_path", str(fwd)]
        quant = work / "collection.qstore"
    else:
        fwd = work / "collection.index"
        out_flag = ["--output_file_path", str(fwd)]
        quant = work / "collection.quantized"
    stage("encode_tpu", lambda: cli_index.main([
        "--vocab_path", str(vocab_path),
        "--collection_path", str(coll),
        *out_flag,
        "--model_kind", "deepimpact",
        "--max_length", str(args.max_length),
        "--model_batch_size", str(args.model_batch_size),
        *(["--pack"] if args.pack else []),
    ]), done=fwd)

    stage("quantize", lambda: cli_quantize.main(["-i", str(fwd), "-o", str(quant)]),
          done=quant)

    inv_dir = work / "inverted"
    stage("invert", lambda: cli_invert.main(["-i", str(quant), "-o", str(inv_dir)]),
          done=inv_dir / "inverted_index.dat")

    index = stage("load_index", lambda: InvertedIndexData.load(inv_dir, num_docs=args.n_docs))
    engine = stage("engine_init", lambda: HybridSearchEngine(index))

    rng = np.random.default_rng(1)
    vocab_terms = index.vocab
    p = 1.0 / np.arange(1, len(vocab_terms) + 1) ** 0.5
    p /= p.sum()

    def batches():
        for _ in range(args.query_batches):
            yield [
                {vocab_terms[i] for i in rng.choice(len(vocab_terms), size=8, p=p)}
                for _ in range(64)
            ]

    def run_queries():
        n = 0
        for results in engine.score_stream(batches(), top_k=1000):
            n += len(results)
        return n

    t0 = time.time()
    n_q = run_queries()
    dt = time.time() - t0
    stages["queries"] = {
        "seconds": round(dt, 2),
        "peak_rss_mb": round(sampler.take_max_mb(), 1),
        "queries_per_s": round(n_q / dt, 1),
    }
    print(f"[queries] {n_q} queries in {dt:.1f}s = {n_q / dt:.1f} q/s", flush=True)

    report = {
        "pipeline": args.pipeline,
        "n_docs": args.n_docs,
        "n_terms": len(index.vocab),
        "n_postings": index.num_postings,
        "dat_bytes": (inv_dir / "inverted_index.dat").stat().st_size,
        "stages": stages,
        "total_build_seconds": round(
            sum(s["seconds"] for k, s in stages.items() if k != "queries"), 2
        ),
        "notes": (
            "real pipeline via the CLI mains on 1 TPU v5e through the axon "
            "relay; random bert-base weights (encode throughput is workload-"
            "representative, impact values are not); reference comparison: "
            "create.py's Python loop is single-threaded over a dict "
            "(no published number)"
        ),
    }
    args.out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
