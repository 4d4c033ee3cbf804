"""Evaluation harness tests: TREC metrics, run-file metrics, sparse search,
NanoBEIR local loading, BM25 baseline, MaxP aggregation."""

import json
import math

import numpy as np
import pytest

from improving_learned_index_tpu.evaluation import (
    BM25Index,
    Metrics,
    NanoBEIREvaluator,
    SparseSearch,
    trec_evaluate,
)
from improving_learned_index_tpu.search.maxp import (
    aggregate_run,
    make_passages,
    passage_collection,
)


def test_trec_metrics_hand_computed():
    qrels = {"q1": {"d1": 1, "d2": 1}, "q2": {"d3": 1}}
    results = {
        "q1": {"d1": 5.0, "dx": 4.0, "d2": 3.0},  # ranks 1 and 3
        "q2": {"dy": 2.0, "d3": 1.0},  # rank 2
    }
    ndcg, m, recall, prec = trec_evaluate(qrels, results, [3])
    # q1: DCG = 1/log2(2) + 1/log2(4) = 1.5; IDCG = 1/log2(2)+1/log2(3)
    q1 = 1.5 / (1 + 1 / math.log2(3))
    # q2: DCG = 1/log2(3); IDCG = 1
    q2 = 1 / math.log2(3)
    assert abs(ndcg["NDCG@3"] - (q1 + q2) / 2) < 1e-4
    # MAP: q1 = (1/1 + 2/3)/2 ; q2 = (1/2)/1
    assert abs(m["MAP@3"] - ((1 + 2 / 3) / 2 + 0.5) / 2) < 1e-4
    assert abs(recall["Recall@3"] - (1.0 + 1.0) / 2) < 1e-6
    assert abs(prec["P@3"] - (2 / 3 + 1 / 3) / 2) < 1e-4


def test_trec_metrics_vs_torch_free_reference():
    """Binary-relevance sanity: perfect ranking gives all 1.0 (except P@k)."""
    qrels = {"q": {"a": 1, "b": 1}}
    results = {"q": {"a": 2.0, "b": 1.0}}
    ndcg, m, recall, prec = trec_evaluate(qrels, results, [10])
    assert ndcg["NDCG@10"] == 1.0
    assert m["MAP@10"] == 1.0
    assert recall["Recall@10"] == 1.0


def test_run_file_metrics(tmp_path):
    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("q1\t0\td5\t1\nq2\t0\td9\t1\nq3\t0\td7\t1\n")
    run = tmp_path / "run.tsv"
    lines = []
    # q1: relevant at rank 2; q2: relevant at rank 1; q3: not retrieved
    lines.append("q1\td1\t1\t9.0")
    lines.append("q1\td5\t2\t8.0")
    lines.append("q2\td9\t1\t7.0")
    run.write_text("\n".join(lines) + "\n")
    metrics = Metrics(run, qrels, mrr_depths=[10], recall_depths=[10]).evaluate()
    assert metrics["MRR@10"] == round((0.5 + 1.0 + 0) / 3, 3)
    assert metrics["Recall@10"] == round((1 + 1 + 0) / 3, 3)


@pytest.fixture(scope="module")
def tiny_model(request):
    from improving_learned_index_tpu.core.config import EncoderConfig
    from improving_learned_index_tpu.models import DeepImpact

    tok = request.getfixturevalue("tiny_tokenizer")
    return DeepImpact(EncoderConfig.tiny(vocab_size=len(tok.vocab)), tok, seed=0)


def test_sparse_search_matches_bruteforce(tiny_model, tiny_corpus):
    corpus = {f"doc{i}": text for i, text in enumerate(tiny_corpus)}
    queries = {"q0": "quick brown fox", "q1": "inverted postings", "q2": "zzz unknown"}
    searcher = SparseSearch(tiny_model, batch_size=4)
    results = searcher.search(queries, corpus, k=10)

    # brute force: float impacts, sum over matching query terms, score > 0
    impacts = tiny_model.get_impact_scores_batch(list(corpus.values()))
    for qid, query in queries.items():
        terms = tiny_model.process_query(query)
        expected = {}
        for doc_id, term_impacts in zip(corpus.keys(), impacts):
            s = sum(v for t, v in term_impacts if t in terms and v > 0)
            if s > 0:
                expected[doc_id] = s
        got = results[qid]
        assert set(got) == set(expected)
        for d in expected:
            assert abs(got[d] - expected[d]) < 1e-3


def _write_beir_dir(root, corpus, queries, qrels):
    root.mkdir(parents=True, exist_ok=True)
    with open(root / "corpus.jsonl", "w") as f:
        for did, text in corpus.items():
            f.write(json.dumps({"_id": did, "title": "", "text": text}) + "\n")
    with open(root / "queries.jsonl", "w") as f:
        for qid, text in queries.items():
            f.write(json.dumps({"_id": qid, "text": text}) + "\n")
    with open(root / "qrels.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for qid, docs in qrels.items():
            for did in docs:
                f.write(f"{qid}\t{did}\t1\n")


def test_nano_beir_local_dir(tiny_model, tiny_corpus, tmp_path):
    corpus = {f"doc{i}": t for i, t in enumerate(tiny_corpus)}
    queries = {"q0": "quick brown fox jumps", "q1": "inverted indexes postings"}
    qrels = {"q0": ["doc0"], "q1": ["doc3"]}
    _write_beir_dir(tmp_path / "scifact", corpus, queries, qrels)

    ev = NanoBEIREvaluator(
        batch_size=4, local_data_dir=tmp_path, datasets=["scifact"], k_values=(10,)
    )
    metrics = ev.evaluate_all(tiny_model)
    assert "scifact" in metrics and "avg" in metrics
    ndcg, m, recall, prec = metrics["avg"]
    assert 0.0 <= ndcg["NDCG@10"] <= 1.0
    assert set(ndcg) == {"NDCG@10"}


def test_bm25_ranks_relevant_first(tiny_corpus, tiny_tokenizer):
    corpus = [(f"doc{i}", t) for i, t in enumerate(tiny_corpus)]
    bm25 = BM25Index().build(corpus, tiny_tokenizer)
    top = bm25.score(tiny_tokenizer.process_query("inverted indexes postings"))
    assert top[0][0] == "doc3"
    top = bm25.score(tiny_tokenizer.process_query("quick brown fox"))
    assert top[0][0] == "doc0"
    assert bm25.score(set()) == []


def test_make_passages_windows():
    words = " ".join(f"w{i}" for i in range(600))
    ps = make_passages(words, window=250, stride=100)
    assert len(ps) == 5  # starts at 0,100,200,300,400
    assert ps[0].split()[0] == "w0" and ps[0].split()[-1] == "w249"
    assert ps[-1].split()[-1] == "w599"
    assert make_passages("short doc", window=250, stride=100) == ["short doc"]


def test_maxp_aggregation(tmp_path):
    docs = [("docA", " ".join(f"a{i}" for i in range(400))), ("docB", "short")]
    pids = list(passage_collection(docs, window=250, stride=100))
    mapping = tmp_path / "pid_mapping.txt"
    mapping.write_text("\n".join(m for _, m, _ in pids) + "\n")
    assert [m for _, m, _ in pids] == ["docA#0", "docA#1", "docA#2", "docB#0"]
    # passage run: docA#0 scores 5, docA#1 scores 9, docB#0 scores 3
    run = tmp_path / "run.tsv"
    run.write_text("q1\t0\t1\t5.0\nq1\t1\t2\t9.0\nq1\t3\t3\t3.0\n")
    out = tmp_path / "agg.tsv"
    n = aggregate_run(run, mapping, out)
    lines = out.read_text().splitlines()
    assert n == 2
    assert lines[0].startswith("q1\tdocA\t1\t9.0")
    assert lines[1].startswith("q1\tdocB\t2\t3.0")


def test_anserini_export(tmp_path):
    from improving_learned_index_tpu.index.anserini import convert_to_anserini

    fwd = tmp_path / "fwd.txt"
    fwd.write_text("hello: 1.5, world: 2.0\nfoo: 0.5\n")
    out = tmp_path / "anserini.jsonl"
    assert convert_to_anserini(fwd, out) == 2
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert lines[0] == {"id": 0, "contents": "", "vector": {"hello": 1.5, "world": 2.0}}


def test_trec_metrics_tie_break_doc_id_descending():
    """pytrec_eval breaks score ties by doc id DESCENDING: with docs d1/d2/d9
    all scoring 1.0 and only d9 relevant, d9 must rank first -> NDCG@1 = 1."""
    from improving_learned_index_tpu.evaluation.trec_metrics import evaluate

    qrels = {"q": {"d9": 1}}
    results = {"q": {"d1": 1.0, "d2": 1.0, "d9": 1.0}}
    ndcg, _map, recall, precision = evaluate(qrels, results, k_values=[1, 3])
    assert ndcg["NDCG@1"] == 1.0
    assert precision["P@1"] == 1.0
    assert recall["Recall@1"] == 1.0

    # And ascending-relevant doc loses at the tie: only d1 relevant -> @1 = 0.
    ndcg2, _m2, recall2, _p2 = evaluate({"q": {"d1": 1}}, results, k_values=[1, 3])
    assert ndcg2["NDCG@1"] == 0.0
    assert recall2["Recall@3"] == 1.0


def test_trec_metrics_vectorized_matches_hand_computed_graded():
    """Graded relevance hand-check: ranks (by score desc, id desc) are
    dB(3), dA(0), dC(1); NDCG@3 = (3 + 1/2) / (3 + 2/log2(3)) for ideal
    gains [3,2]; MAP@3 = (1/1 + 2/3)/2."""
    import math

    from improving_learned_index_tpu.evaluation.trec_metrics import evaluate

    qrels = {"q": {"dB": 3, "dC": 1, "dZ": 2}}
    results = {"q": {"dB": 9.0, "dA": 5.0, "dC": 5.0}}
    # tie at 5.0 -> dC before dA (id desc)? 'dC' > 'dA' so dC ranks ahead.
    ndcg, _map, recall, precision = evaluate(qrels, results, k_values=[3])
    dcg = 3 / math.log2(2) + 1 / math.log2(3)  # dB at rank1, dC at rank2
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert abs(ndcg["NDCG@3"] - round(dcg / idcg, 5)) < 1e-9
    ap = (1 / 1 + 2 / 2) / 3  # hits at ranks 1,2; 3 relevant total
    assert abs(_map["MAP@3"] - round(ap, 5)) < 1e-9
    assert recall["Recall@3"] == round(2 / 3, 5)
