"""NanoBEIR in-training-eval cost at realistic corpus scale (VERDICT
round-2 ask #4).

The reference runs NanoBEIREvaluator.evaluate_all every eval_every=500
training steps (src/deep_impact/training/trainer.py:133-141); if that is
slow, training stalls.  This bench generates ~10^4-doc BEIR-format fixtures
for 3 datasets, runs evaluate_all with a real (tiny, softplus) encoder, and
reports per-dataset wall-clock: encode+index build vs query+metric time.

Usage:
    python benchmarks/nano_beir_bench.py [--docs 10000] [--queries 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATASETS = ("scifact", "nfcorpus", "fiqa")


def write_beir_fixture(root: Path, name: str, n_docs: int, n_queries: int,
                       seed: int) -> None:
    """BEIR-format dir: Zipf docs over a 5k-word vocab; each query carries a
    rare signal term planted in its relevant docs."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"{name[:3]}w{i:04d}" for i in range(5000)])
    p = 1.0 / np.arange(1, len(vocab) + 1) ** 0.9
    p /= p.sum()
    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    doc_words = [vocab[rng.choice(len(vocab), size=20, p=p)] for _ in range(n_docs)]
    qrels_lines = ["query-id\tcorpus-id\tscore"]
    queries = []
    for q in range(n_queries):
        sig = f"{name[:3]}sig{q:03d}"
        rel = rng.choice(n_docs, size=3, replace=False)
        for did in rel:
            doc_words[did] = np.concatenate([doc_words[did], [sig]])
            qrels_lines.append(f"q{q}\td{did}\t1")
        queries.append((f"q{q}", f"{sig} {' '.join(vocab[rng.choice(len(vocab), size=3, p=p)])}"))
    with open(d / "corpus.jsonl", "w") as f:
        for i, words in enumerate(doc_words):
            f.write(json.dumps({"_id": f"d{i}", "title": "", "text": " ".join(words)}) + "\n")
    with open(d / "queries.jsonl", "w") as f:
        for qid, text in queries:
            f.write(json.dumps({"_id": qid, "text": text}) + "\n")
    (d / "qrels.tsv").write_text("\n".join(qrels_lines) + "\n")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--docs", type=int, default=10_000)
    parser.add_argument("--queries", type=int, default=50)
    parser.add_argument("--workdir", type=Path, default=Path("/tmp/nano_beir_bench"))
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).parent / "NANO_BEIR_10K.json")
    args = parser.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    from improving_learned_index_tpu.core.config import EncoderConfig
    from improving_learned_index_tpu.evaluation.nano_beir import NanoBEIREvaluator
    from improving_learned_index_tpu.models import DeepImpact
    from improving_learned_index_tpu.text import ImpactTokenizer, WordPieceVocab

    t0 = time.time()
    for i, name in enumerate(DATASETS):
        write_beir_fixture(args.workdir, name, args.docs, args.queries, seed=i)
    gen_s = time.time() - t0

    corpus_texts = []
    for name in DATASETS:
        with open(args.workdir / name / "corpus.jsonl") as f:
            corpus_texts += [json.loads(l)["text"] for l in f][:2000]
    vocab = WordPieceVocab.build(corpus_texts, max_size=20_000)
    tokenizer = ImpactTokenizer(vocab, max_length=64)
    model = DeepImpact(
        EncoderConfig.tiny(vocab_size=len(vocab), impact_activation="softplus"),
        tokenizer,
        seed=0,
    )

    evaluator = NanoBEIREvaluator(
        batch_size=64, local_data_dir=args.workdir, datasets=list(DATASETS)
    )
    per_dataset = {}
    for name in DATASETS:
        t0 = time.time()
        m = evaluator.evaluate_dataset(model, name)
        per_dataset[name] = {
            "seconds": round(time.time() - t0, 2),
            "NDCG@10": m[0]["NDCG@10"],
            "Recall@100": m[2]["Recall@100"],
        }
        print(f"[{name}] {per_dataset[name]}", flush=True)

    # a second pass re-encodes everything — the in-training steady-state cost
    t0 = time.time()
    evaluator.evaluate_all(model)
    second_pass_s = time.time() - t0

    report = {
        "backend": jax.default_backend(),
        "docs_per_dataset": args.docs,
        "queries_per_dataset": args.queries,
        "fixture_gen_seconds": round(gen_s, 2),
        "per_dataset_first_pass": per_dataset,
        "evaluate_all_steady_seconds": round(second_pass_s, 2),
        "notes": (
            "tiny softplus encoder; eval cost = encode+in-memory-index build "
            "+ device query batches; the reference runs this every 500 steps "
            "(trainer.py:133-141)"
        ),
    }
    args.out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
