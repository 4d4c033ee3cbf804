"""Data-prep scripts + precomputed expansion + term-dependency analysis."""

import gzip
import json
import pickle

import numpy as np
import pytest

from improving_learned_index_tpu.expand.precomputed import (
    expand_with_precomputed,
    load_scored_queries_jsonl,
    tilde_expand,
)
from improving_learned_index_tpu.scripts.construct_distil_hard_neg_dataset import (
    construct as construct_distil,
)
from improving_learned_index_tpu.scripts.construct_hard_neg_dataset import (
    construct as construct_hard_neg,
)
from improving_learned_index_tpu.scripts.create_training_files import (
    expand_training_files,
)
from improving_learned_index_tpu.scripts.create_test_files import create_test_files
from improving_learned_index_tpu.scripts.create_unique_passage_mapping import dedup
from improving_learned_index_tpu.scripts.prepare_dataset import prepare
from improving_learned_index_tpu.scripts.preprocess_passages import (
    preprocess_collection,
)
from improving_learned_index_tpu.scripts.trim_scores import trim


def test_construct_hard_neg(tmp_path):
    src = tmp_path / "neg.jsonl.gz"
    with gzip.open(src, "wt") as f:
        f.write(json.dumps({"qid": "q1", "pos": ["p1"], "neg": {"bm25": ["n1", "n2"], "dense": ["n2", "n3"]}}) + "\n")
    out = tmp_path / "triples.tsv"
    n = construct_hard_neg(src, out, seed=0)
    assert n == 3  # p1 x {n1, n2, n3}
    rows = {tuple(l.split("\t")) for l in out.read_text().splitlines()}
    assert rows == {("q1", "p1", "n1"), ("q1", "p1", "n2"), ("q1", "p1", "n3")}


def test_construct_distil_and_trim(tmp_path):
    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("q1\t0\tp1\t1\n")
    scores = {"q1": {"p1": 9.0, "n1": 3.0, "n2": 1.0}}
    scores_path = tmp_path / "scores.pkl.gz"
    with gzip.open(scores_path, "wb") as f:
        pickle.dump(scores, f)
    out = tmp_path / "distil.tsv"
    n = construct_distil(qrels, scores_path, out, seed=0)
    assert n == 2
    rows = {tuple(l.split("\t")) for l in out.read_text().splitlines()}
    assert ("q1", "p1", "n1", "9.0", "3.0") in rows

    # trim: only p1 and n2 exist in the collection
    coll = tmp_path / "coll.tsv"
    coll.write_text("p1\ttext one\nn2\ttext two\n")
    with gzip.open(scores_path, "wb") as f:
        pickle.dump({"q1": {"p1": 9.0, "n1": 3.0, "n2": 1.0}}, f)
    trimmed_path = tmp_path / "trimmed.pkl.gz"
    kept = trim(scores_path, coll, trimmed_path)
    assert kept == 2
    with gzip.open(trimmed_path, "rb") as f:
        trimmed = pickle.load(f)
    assert trimmed == {"q1": {"p1": 9.0, "n2": 1.0}}


def test_prepare_dataset(tmp_path):
    (tmp_path / "qrels.tsv").write_text("q1\t0\td1\t1\n")
    (tmp_path / "queries.tsv").write_text("q1\twhat is a fox\n")
    (tmp_path / "coll.tsv").write_text("d1\tfoxes are canines\n")
    out = tmp_path / "pairs.tsv"
    n = prepare(tmp_path / "qrels.tsv", tmp_path / "queries.tsv", tmp_path / "coll.tsv", out)
    assert n == 1
    assert out.read_text() == "foxes are canines\twhat is a fox\n"


def test_expand_training_files(tmp_path):
    (tmp_path / "docs.tsv").write_text("d1\tthe quick fox\nd2\tlazy dog\n")
    exp = tmp_path / "exp.jsonl"
    exp.write_text(
        json.dumps({"doc_id": "d1", "queries": ["quick animal", "animal colour", "fox animal"]}) + "\n"
    )
    out_docs = tmp_path / "expanded.tsv"
    out_csv = tmp_path / "terms.csv"
    n = expand_training_files(
        tmp_path / "docs.tsv", exp, out_docs, out_csv, max_length=20, max_expansion_terms=2
    )
    assert n == 1
    doc_line = out_docs.read_text().strip()
    # 'animal' (freq 3) first, then 'colour'; 'quick'/'fox' deduped
    assert doc_line == "d1\tthe quick fox animal colour"
    assert "animal colour" in out_csv.read_text()


def test_token_budget_truncation(tmp_path):
    (tmp_path / "docs.tsv").write_text("d1\t" + " ".join(f"w{i}" for i in range(30)) + "\n")
    exp = tmp_path / "exp.jsonl"
    exp.write_text(json.dumps({"doc_id": "d1", "queries": ["novel1 novel2"]}) + "\n")
    out_docs = tmp_path / "expanded.tsv"
    n = expand_training_files(
        tmp_path / "docs.tsv", exp, out_docs, tmp_path / "t.csv", max_length=10
    )
    words = out_docs.read_text().strip().split("\t")[1].split()
    assert len(words) == 10  # 8 doc words + 2 expansion terms
    assert words[-2:] == ["novel1", "novel2"]


def test_dedup_passages(tmp_path):
    (tmp_path / "c.tsv").write_text("p1\ta\np2\tb\np1\tc\n")
    kept, dropped = dedup(tmp_path / "c.tsv", tmp_path / "out.tsv")
    assert (kept, dropped) == (2, 1)
    assert tmp_path.joinpath("out.tsv").read_text() == "p1\ta\np2\tb\n"


def test_preprocess_resume(tmp_path):
    (tmp_path / "c.tsv").write_text("p1\tThe Quick FOX\np2\tnot a lazy dog\n")
    stop = tmp_path / "stop.txt"
    stop.write_text("the\nnot\na\n")
    out = tmp_path / "pre.tsv"
    n = preprocess_collection(tmp_path / "c.tsv", out, stop)
    assert n == 2
    lines = out.read_text().splitlines()
    assert lines[0] == "p1\tquick fox"
    assert lines[1] == "p2\tnot lazy dog"  # 'not' kept (negation whitelist)
    # resume: nothing new
    assert preprocess_collection(tmp_path / "c.tsv", out, stop) == 0


def test_create_test_files(tmp_path):
    (tmp_path / "qmap.csv").write_text("query_id,query\nq1,claim one\n")
    (tmp_path / "pairs.csv").write_text("query,document\nclaim one,evidence text\n")
    (tmp_path / "dmap.csv").write_text("doc_id,document\nd7,evidence text\n")
    nq, nrel, missing = create_test_files(
        tmp_path / "qmap.csv", tmp_path / "pairs.csv", tmp_path / "dmap.csv",
        tmp_path / "queries.tsv", tmp_path / "qrels.tsv",
    )
    assert (nq, nrel, missing) == (1, 1, 0)
    assert (tmp_path / "qrels.tsv").read_text() == "q1\t0\td7\t1\n"


def test_precomputed_expansion(tmp_path, tiny_tokenizer):
    (tmp_path / "c.tsv").write_text("d1\tthe quick fox\nd2\tlazy dog\n")
    scored = {
        "d1": [("quick beast", 0.9), ("irrelevant junk", 0.1)],
        "d2": [("sleepy canine", 0.8)],
    }
    out = tmp_path / "expanded.tsv"
    n = expand_with_precomputed(
        tmp_path / "c.tsv", scored, out, tiny_tokenizer, percentile=50, append="terms"
    )
    assert n == 2
    lines = dict(l.split("\t", 1) for l in out.read_text().splitlines())
    assert " [SEP] " in lines["d1"]
    assert "beast" in lines["d1"] and "junk" not in lines["d1"]
    assert "quick" not in lines["d1"].split(" [SEP] ")[1]  # already in doc

    # full-queries mode keeps whole queries
    out2 = tmp_path / "expanded_q.tsv"
    expand_with_precomputed(
        tmp_path / "c.tsv", scored, out2, tiny_tokenizer, percentile=50, append="queries"
    )
    assert "quick beast" in out2.read_text()


def test_tilde_expand(tmp_path, tiny_tokenizer):
    (tmp_path / "c.tsv").write_text("d1\tthe quick fox\n")
    out = tmp_path / "tilde.tsv"
    n = tilde_expand(
        tmp_path / "c.tsv", {"d1": ["fox", "vulpine", "animal"]}, out, tiny_tokenizer
    )
    assert n == 1
    text = out.read_text()
    assert "vulpine" in text and "animal" in text
    assert text.count("fox") == 1  # duplicate dropped


def test_term_pair_attention(tiny_tokenizer):
    from improving_learned_index_tpu.analysis import extract_term_pair_attention
    from improving_learned_index_tpu.core.config import EncoderConfig
    from improving_learned_index_tpu.models import DeepImpact

    model = DeepImpact(EncoderConfig.tiny(vocab_size=len(tiny_tokenizer.vocab)), tiny_tokenizer, seed=0)
    results = extract_term_pair_attention(model, ["the quick fox", "lazy dog sleeps"])
    assert len(results) == 2
    pairs = results[0]
    assert ("the", "quick") in pairs
    series = pairs[("the", "quick")]
    assert series.shape == (2,)  # tiny model: 2 layers
    assert np.all(series >= 0) and np.all(series <= 1)


def test_visualize_plots(tiny_tokenizer, tmp_path):
    pytest.importorskip("matplotlib")
    from improving_learned_index_tpu.analysis import extract_term_pair_attention
    from improving_learned_index_tpu.analysis.visualize import (
        plot_attention_histogram,
        plot_layer_series,
    )
    from improving_learned_index_tpu.core.config import EncoderConfig
    from improving_learned_index_tpu.models import DeepImpact

    model = DeepImpact(EncoderConfig.tiny(vocab_size=len(tiny_tokenizer.vocab)), tiny_tokenizer, seed=0)
    results = extract_term_pair_attention(model, ["the quick brown fox"])
    plot_attention_histogram(results, layer=0, output_path=tmp_path / "hist.png")
    plot_layer_series(results, output_path=tmp_path / "series.png")
    assert (tmp_path / "hist.png").stat().st_size > 0
    assert (tmp_path / "series.png").stat().st_size > 0
