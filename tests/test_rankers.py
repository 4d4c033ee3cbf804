"""Ranker / ReRanker end-to-end: index -> rank -> run file -> metrics,
and rerank a top-k file (reference rank.py / rerank.py flows)."""

import numpy as np
import pytest

from improving_learned_index_tpu.core.config import EncoderConfig, IndexConfig
from improving_learned_index_tpu.evaluation import Metrics, Ranker
from improving_learned_index_tpu.evaluation.reranker import (
    CrossEncoderReRanker,
    ReRanker,
)
from improving_learned_index_tpu.index import Indexer
from improving_learned_index_tpu.models import DeepImpact, DeepImpactCrossEncoder


@pytest.fixture(scope="module")
def setup(request, tmp_path_factory):
    tok = request.getfixturevalue("tiny_tokenizer")
    corpus = request.getfixturevalue("tiny_corpus")
    model = DeepImpact(EncoderConfig.tiny(vocab_size=len(tok.vocab)), tok, seed=0)
    root = tmp_path_factory.mktemp("rank")

    collection = root / "collection.tsv"
    collection.write_text("".join(f"{i}\t{t}\n" for i, t in enumerate(corpus)))
    queries = root / "queries.tsv"
    queries.write_text("q0\tquick brown fox\nq1\tinverted indexes postings\n")
    qrels = root / "qrels.tsv"
    qrels.write_text("q0\t0\t0\t1\nq1\t0\t3\t1\n")

    indexer = Indexer(model, IndexConfig(max_length=32, max_terms=32, model_batch_size=4))
    inv, _ = indexer.build_inverted(corpus)
    index_dir = root / "index"
    inv.save(index_dir)
    return model, root, collection, queries, qrels, index_dir


@pytest.mark.parametrize("engine", ["device", "hybrid", "host"])
def test_rank_to_run_file(setup, tmp_path, engine):
    model, root, collection, queries, qrels, index_dir = setup
    out = tmp_path / f"run_{engine}.tsv"
    ranker = Ranker(
        index_path=index_dir,
        queries_path=queries,
        output_path=out,
        tokenizer=model.tokenizer,
        qrels_path=qrels,
        engine=engine,
    )
    n = ranker.run()
    assert n == 2
    lines = out.read_text().splitlines()
    assert all(len(l.split("\t")) == 4 for l in lines)
    metrics = Metrics(out, qrels, mrr_depths=[10], recall_depths=[10]).evaluate()
    assert 0.0 <= metrics["MRR@10"] <= 1.0


def test_rank_engines_agree(setup, tmp_path):
    model, root, collection, queries, qrels, index_dir = setup
    outs = {}
    for engine in ("device", "hybrid", "host"):
        out = tmp_path / f"agree_{engine}.tsv"
        Ranker(
            index_path=index_dir,
            queries_path=queries,
            output_path=out,
            tokenizer=model.tokenizer,
            engine=engine,
        ).run()
        rows = {}
        for line in out.read_text().splitlines():
            qid, pid, rank, score = line.split("\t")
            rows.setdefault(qid, {})[pid] = float(score)
        outs[engine] = rows
    assert outs["device"] == outs["host"]


def test_reranker(setup, tmp_path):
    model, root, collection, queries, qrels, index_dir = setup
    # candidate run: all docs for each query in arbitrary order
    cand = tmp_path / "cand.tsv"
    with open(cand, "w") as f:
        for qid in ("q0", "q1"):
            for rank, pid in enumerate([3, 1, 0, 2], start=1):
                f.write(f"{qid}\t{pid}\t{rank}\t1.0\n")
    out = tmp_path / "reranked.tsv"
    rr = ReRanker(model, cand, queries, collection, out, batch_size=4)
    assert rr.run() == 2
    lines = out.read_text().splitlines()
    assert len(lines) == 8
    # scores descend per query
    by_q = {}
    for l in lines:
        qid, pid, rank, score = l.split("\t")
        by_q.setdefault(qid, []).append(float(score))
    for scores in by_q.values():
        assert scores == sorted(scores, reverse=True)


def test_cross_encoder_reranker(setup, tmp_path, request):
    model, root, collection, queries, qrels, index_dir = setup
    tok = request.getfixturevalue("tiny_tokenizer")
    corpus = request.getfixturevalue("tiny_corpus")
    ce = DeepImpactCrossEncoder(
        EncoderConfig.tiny(vocab_size=len(tok.vocab)), tok, seed=2
    )
    topk = tmp_path / "topk.tsv"
    with open(topk, "w") as f:
        for pid in (0, 1, 7):
            f.write(f"q0\t{pid}\tquick brown fox\t{corpus[pid]}\n")
    out = tmp_path / "ce_run.tsv"
    rr = CrossEncoderReRanker(ce, topk, collection, out, batch_size=2)
    assert rr.run() == 1
    lines = out.read_text().splitlines()
    assert len(lines) == 3
