"""NanoBEIR in-training-eval cost at realistic corpus scale (VERDICT
round-2 ask #4; round-3 missing #4 extends it to ALL 13 datasets and times
the eval from INSIDE a real cli.train run).

The reference runs NanoBEIREvaluator.evaluate_all every eval_every=500
training steps (src/deep_impact/training/trainer.py:133-141); if that is
slow, training stalls.  This bench generates ~10^4-doc BEIR-format fixtures
for the reference's 13 NanoBEIR datasets, runs evaluate_all with a real
(tiny, softplus) encoder, reports per-dataset wall-clock, and then runs one
actual ``cli.train --nano_beir_dir`` session past two eval_every boundaries
vs an identical ``--no_beir_eval`` run — the difference is the real
training-stall cost per eval.

Usage:
    python benchmarks/nano_beir_bench.py [--docs 10000] [--queries 50]
        [--skip_train_section]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the reference's full 13-dataset NanoBEIR list
# (nano_beir_evaluator.py:13-27)
DATASETS = (
    "climatefever", "dbpedia", "fever", "fiqa2018", "hotpotqa", "msmarco",
    "nfcorpus", "nq", "quoraretrieval", "scidocs", "arguana", "scifact",
    "touche2020",
)


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
    parser.add_argument("--skip_train_section", action="store_true")
    parser.add_argument("--eval_every", type=int, default=4)
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

    train_section = None
    if not args.skip_train_section:
        # the REAL cli.train loop, twice: with the 13-dataset eval firing
        # at two eval_every boundaries, and with --no_beir_eval.  The
        # difference is the genuine in-training stall.
        from improving_learned_index_tpu.cli import (
            build_vocab as cli_build_vocab,
            train as cli_train,
        )

        troot = args.workdir / "train"
        troot.mkdir(parents=True, exist_ok=True)
        docs = [" ".join(w) if not isinstance(w, str) else w
                for w in corpus_texts[:64]]
        (troot / "collection.tsv").write_text(
            "".join(f"{i}\t{d}\n" for i, d in enumerate(docs))
        )
        (troot / "queries.tsv").write_text(
            "".join(f"q{i}\t{docs[i][:40]}\n" for i in range(8))
        )
        rngt = np.random.default_rng(5)
        triples = [
            f"q{i % 8}\t{i % len(docs)}\t{(i * 7 + 3) % len(docs)}"
            for i in range(256)
        ]
        (troot / "triples.tsv").write_text("\n".join(triples) + "\n")
        assert cli_build_vocab.main([
            "--collection_path", str(troot / "collection.tsv"),
            "--output_path", str(troot / "vocab.txt"),
            "--max_size", "20000", "--min_freq", "1",
        ]) == 0
        total_steps = 2 * args.eval_every + 1  # crosses two eval boundaries

        def train_run(extra, ckpt):
            t0 = time.time()
            rc = cli_train.main([
                "--vocab_path", str(troot / "vocab.txt"), "--tiny",
                "--max_length", "64",
                "--dataset_path", str(troot / "triples.tsv"),
                "--queries_path", str(troot / "queries.tsv"),
                "--collection_path", str(troot / "collection.tsv"),
                "--checkpoint_dir", str(troot / ckpt),
                "--batch_size", "8", "--total_steps", str(total_steps),
                "--save_every", "1000000",
                "--eval_every", str(args.eval_every),
                "--seed", "0",
            ] + extra)
            assert rc == 0
            return time.time() - t0

        # i % eval_every == 0 fires at i=0 too (reference semantics,
        # trainer.py:133): 0, eval_every, 2*eval_every, ...
        evals = total_steps // args.eval_every + 1
        with_eval_s = train_run(["--nano_beir_dir", str(args.workdir)],
                                "ckpt_eval")
        # second identical run: the eval batch shapes are compiled now, so
        # this is the steady-state in-train cadence a long training run pays
        warm_with_eval_s = train_run(["--nano_beir_dir", str(args.workdir)],
                                     "ckpt_eval2")
        without_eval_s = train_run(["--no_beir_eval"], "ckpt_noeval")
        train_section = {
            "cli_train_total_steps": total_steps,
            "eval_every": args.eval_every,
            "evals_fired": evals,
            "with_eval_seconds": round(with_eval_s, 2),
            "warm_with_eval_seconds": round(warm_with_eval_s, 2),
            "without_eval_seconds": round(without_eval_s, 2),
            "stall_per_eval_cold_seconds": round(
                (with_eval_s - without_eval_s) / evals, 2
            ),
            "stall_per_eval_seconds": round(
                (warm_with_eval_s - without_eval_s) / evals, 2
            ),
            "note": "cold = first run in the process (in-train evals pay "
                    "jit compiles for the eval batch shapes); steady = "
                    "second identical run, shapes compiled",
        }
        print(f"[cli.train] with_eval={with_eval_s:.1f}s "
              f"warm={warm_with_eval_s:.1f}s "
              f"without={without_eval_s:.1f}s", flush=True)

    report = {
        "backend": jax.default_backend(),
        "datasets": len(DATASETS),
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
        **({"in_training": train_section} if train_section else {}),
    }
    args.out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
