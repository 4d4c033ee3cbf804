"""Full-fidelity NanoBEIR: all 13 datasets, offline BEIR-format fixtures, one
evaluate_all / CLI run (VERDICT round-1 item 5).

Metric pinning uses a deterministic unit-impact model (every term scores
1.0), so document scores are exact query-term overlap counts and every
metric is hand-computable."""

import json

import pytest

from improving_learned_index_tpu.evaluation.nano_beir import (
    DATASET_NAME_TO_ID,
    NanoBEIREvaluator,
)

ALL_13 = sorted(DATASET_NAME_TO_ID)


class UnitImpactModel:
    """Impact 1.0 for every whitespace term: scores = query-doc overlap."""

    def process_query(self, query):
        return set(query.lower().split())

    def get_impact_scores_batch(self, texts):
        return [[(t, 1.0) for t in dict.fromkeys(text.lower().split())] for text in texts]


def _write_beir_dir(root, name, perfect=True):
    """4 docs, 1 query 'alpha beta'.  doc0 has both terms, doc1 has one,
    doc2/doc3 neither.  perfect=True marks doc0 relevant (model ranks it
    first -> NDCG@10 = 1); perfect=False marks doc1 relevant (ranked second
    -> NDCG@10 = 1/log2(3))."""
    d = root / name
    d.mkdir(parents=True)
    docs = [
        ("d0", f"alpha beta {name} common text"),
        ("d1", f"alpha {name} unrelated filler words"),
        ("d2", f"{name} completely different content here"),
        ("d3", f"{name} nothing matching at all"),
    ]
    with open(d / "corpus.jsonl", "w") as f:
        for did, text in docs:
            f.write(json.dumps({"_id": did, "title": "", "text": text}) + "\n")
    with open(d / "queries.jsonl", "w") as f:
        f.write(json.dumps({"_id": "q0", "text": "alpha beta"}) + "\n")
    rel = "d0" if perfect else "d1"
    (d / "qrels.tsv").write_text(f"query-id\tcorpus-id\tscore\nq0\t{rel}\t1\n")


@pytest.fixture(scope="module")
def nano_13_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("nano13")
    for name in ALL_13:
        # one deliberately imperfect dataset to make the average non-trivial
        _write_beir_dir(root, name, perfect=(name != "scifact"))
    return root


def test_evaluate_all_13_datasets_hand_computed(nano_13_dir):
    import math

    evaluator = NanoBEIREvaluator(batch_size=8, local_data_dir=nano_13_dir)
    assert evaluator.datasets == ALL_13  # discovered all 13 local dirs
    metrics = evaluator.evaluate_all(UnitImpactModel())
    assert set(metrics) == set(ALL_13) | {"avg"}

    # Per-dataset NDCG@10: 12 perfect datasets = 1.0; scifact: the relevant
    # doc (1 matching term) ranks below the 2-term doc -> 1/log2(3).
    imperfect = round(1.0 / math.log2(3), 5)
    for name in ALL_13:
        ndcg = metrics[name][0]["NDCG@10"]
        assert ndcg == (imperfect if name == "scifact" else 1.0), name

    avg_ndcg, avg_map, avg_recall, avg_p = metrics["avg"]
    assert avg_ndcg["NDCG@10"] == round((12 * 1.0 + imperfect) / 13, 5)
    assert avg_map["MAP@10"] == round((12 * 1.0 + 0.5) / 13, 5)  # AP = 1/rank2
    assert avg_recall["Recall@10"] == 1.0
    assert avg_p["P@10"] == round(0.1, 5)
    # only 2 docs score > 0, so @100/@1000 equal @10 recall
    assert avg_recall["Recall@1000"] == 1.0


def test_nano_beir_cli_all_13(nano_13_dir, tmp_path):
    """One CLI invocation over all 13 datasets with a tiny real model."""
    from improving_learned_index_tpu.cli import build_vocab as cli_build_vocab
    from improving_learned_index_tpu.cli import nano_beir as cli_nano_beir

    # vocab over all corpora so the tiny model tokenizes everything
    corpus_tsv = tmp_path / "all.tsv"
    lines = []
    for name in ALL_13:
        with open(nano_13_dir / name / "corpus.jsonl") as f:
            for line in f:
                lines.append(json.loads(line)["text"])
    corpus_tsv.write_text("".join(f"{i}\t{t}\n" for i, t in enumerate(lines)))
    assert cli_build_vocab.main([
        "--collection_path", str(corpus_tsv),
        "--output_path", str(tmp_path / "vocab.txt"),
        "--max_size", "1024", "--min_freq", "1",
    ]) == 0

    out = tmp_path / "nano_beir.json"
    assert cli_nano_beir.main([
        "--vocab_path", str(tmp_path / "vocab.txt"), "--tiny", "--max_length", "32",
        "--local_data_dir", str(nano_13_dir),
        "--batch_size", "8",
        "--output", str(out),
    ]) == 0
    metrics = json.loads(out.read_text())
    assert set(metrics) == set(ALL_13) | {"avg"}
    avg = metrics["avg"]
    assert len(avg) == 4  # the reference's 4-tuple layout
    for d in avg:
        assert set(d) >= {f"{m}@10" for m in ("NDCG",)} or any("@10" in k for k in d)


def test_eval_datasets_subset(nano_13_dir):
    """The in-training cost dial: an explicit subset evaluates ONLY those
    datasets (--eval_datasets in cli.train), so the per-eval stall scales
    with the subset instead of all 13."""
    ev = NanoBEIREvaluator(
        batch_size=4, local_data_dir=nano_13_dir, datasets=["msmarco", "scifact"]
    )
    metrics = ev.evaluate_all(UnitImpactModel())
    assert sorted(metrics) == ["avg", "msmarco", "scifact"]
    assert metrics["msmarco"][0]["NDCG@10"] == 1.0
