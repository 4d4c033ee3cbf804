"""CLI surface: the full pipeline via the argparse entry points
(build_vocab -> index -> quantize -> invert -> rank -> evaluate), plus
aggregation, anserini export, bm25, merge, expand --tiny."""

import json
import subprocess
import sys

import pytest

from improving_learned_index_tpu.cli import (
    aggregate_run as cli_aggregate,
    bm25 as cli_bm25,
    build_vocab as cli_build_vocab,
    convert_to_anserini as cli_anserini,
    evaluate as cli_evaluate,
    expand as cli_expand,
    index as cli_index,
    invert as cli_invert,
    merge as cli_merge,
    quantize as cli_quantize,
    rank as cli_rank,
)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory, request):
    corpus = request.getfixturevalue("tiny_corpus")
    root = tmp_path_factory.mktemp("cli")
    (root / "collection.tsv").write_text(
        "".join(f"{i}\t{t}\n" for i, t in enumerate(corpus))
    )
    (root / "queries.tsv").write_text(
        "q0\tquick brown fox\nq1\tinverted indexes postings\n"
    )
    (root / "qrels.tsv").write_text("q0\t0\t0\t1\nq1\t0\t3\t1\n")
    return root


def test_full_cli_pipeline(workspace):
    root = workspace
    # 1. vocab
    assert cli_build_vocab.main([
        "--collection_path", str(root / "collection.tsv"),
        "--output_path", str(root / "vocab.txt"),
        "--max_size", "512", "--min_freq", "1",
    ]) == 0
    model_args = [
        "--vocab_path", str(root / "vocab.txt"),
        "--tiny", "--max_length", "32",
    ]
    # 2. forward index
    assert cli_index.main(model_args + [
        "--collection_path", str(root / "collection.tsv"),
        "--output_file_path", str(root / "collection.index"),
        "--model_batch_size", "4",
    ]) == 0
    assert (root / "collection.index").read_text().count("\n") == 8
    # 3. quantize
    assert cli_quantize.main([
        "-i", str(root / "collection.index"),
        "-o", str(root / "collection.index.quantized"),
    ]) == 0
    # 4. invert
    assert cli_invert.main([
        "-i", str(root / "collection.index.quantized"),
        "-o", str(root / "inverted"),
    ]) == 0
    assert (root / "inverted" / "vocab.txt").exists()
    assert (root / "inverted" / "inverted_index.dat").exists()
    # 5. rank
    assert cli_rank.main(model_args + [
        "--index_path", str(root / "inverted"),
        "--queries_path", str(root / "queries.tsv"),
        "--output_path", str(root / "run.tsv"),
    ]) == 0
    # 6. evaluate
    assert cli_evaluate.main([
        "--run_file_path", str(root / "run.tsv"),
        "--qrels_path", str(root / "qrels.tsv"),
    ]) == 0
    # 7. anserini export
    assert cli_anserini.main([
        "-i", str(root / "collection.index.quantized"),
        "-o", str(root / "anserini.jsonl"),
    ]) == 0
    # 8. bm25 baseline
    assert cli_bm25.main(model_args + [
        "--collection_path", str(root / "collection.tsv"),
        "--queries_path", str(root / "queries.tsv"),
        "--output_path", str(root / "bm25_run.tsv"),
    ]) == 0
    assert (root / "bm25_run.tsv").read_text().strip()


def test_cli_expand_and_merge(workspace):
    root = workspace
    assert cli_expand.main([
        "--collection_path", str(root / "collection.tsv"),
        "--output_path", str(root / "expansions.jsonl"),
        "--tiny", "--batch_size", "2", "--num_docs", "2",
        "--num_return_sequences", "2", "--max_new_tokens", "4",
    ]) == 0
    lines = (root / "expansions.jsonl").read_text().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["doc_id"] == "0"
    # merge only covers the expanded prefix (zip-stops at the shorter file)
    assert cli_merge.main([
        "--vocab_path", str(root / "vocab.txt"),
        "--collection_path", str(root / "collection.tsv"),
        "--queries_path", str(root / "expansions.jsonl"),
        "--output_path", str(root / "merged.tsv"),
    ]) == 0
    assert len((root / "merged.tsv").read_text().splitlines()) == 2


def test_cli_aggregate(workspace, tmp_path):
    mapping = tmp_path / "pid_mapping.txt"
    mapping.write_text("docA#0\ndocA#1\ndocB#0\n")
    run = tmp_path / "run.tsv"
    run.write_text("q1\t0\t1\t5.0\nq1\t1\t2\t9.0\nq1\t2\t3\t3.0\n")
    assert cli_aggregate.main([
        "--run_file", str(run),
        "--mapping", str(mapping),
        "--output", str(tmp_path / "agg.tsv"),
    ]) == 0
    assert (tmp_path / "agg.tsv").read_text().splitlines()[0].startswith("q1\tdocA\t1")


def test_module_invocation_smoke(workspace):
    """`python -m improving_learned_index_tpu.cli.evaluate` works as a module."""
    result = subprocess.run(
        [
            sys.executable, "-m", "improving_learned_index_tpu.cli.evaluate",
            "--run_file_path", str(workspace / "run.tsv"),
            "--qrels_path", str(workspace / "qrels.tsv"),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert result.returncode == 0, result.stderr
    assert "MRR@10" in result.stdout


def test_cli_pairwise_index(workspace):
    """--model_kind pairwise emits term1|term2 composite postings
    (reference index.py --pairwise)."""
    root = workspace
    out = root / "pairwise.index"
    assert cli_index.main([
        "--vocab_path", str(root / "vocab.txt"),
        "--tiny", "--max_length", "32",
        "--model_kind", "pairwise",
        "--collection_path", str(root / "collection.tsv"),
        "--output_file_path", str(out),
        "--model_batch_size", "4",
    ]) == 0
    text = out.read_text()
    assert text.count("\n") == 8
    assert "|" in text  # composite pair postings present


def test_cli_pairwise_full_loop(workspace):
    """Pairwise model end to end: index -> quantize -> invert -> rank
    --pairwise.  The composite term1|term2 postings must actually
    contribute: ranking the same queries WITHOUT --pairwise yields
    strictly lower-or-equal scores, with at least one strictly lower
    (reference rank.py:53-57 adds pair products to the accumulation)."""
    root = workspace
    assert cli_build_vocab.main([
        "--collection_path", str(root / "collection.tsv"),
        "--output_path", str(root / "vocab.txt"),
        "--max_size", "512", "--min_freq", "1",
    ]) == 0
    fwd = root / "pairwise.index"
    assert cli_index.main([
        "--vocab_path", str(root / "vocab.txt"),
        "--tiny", "--max_length", "32",
        "--model_kind", "pairwise",
        "--collection_path", str(root / "collection.tsv"),
        "--output_file_path", str(fwd),
        "--model_batch_size", "4",
    ]) == 0
    q = root / "pairwise.index.q"
    assert cli_quantize.main(["-i", str(fwd), "-o", str(q)]) == 0
    inv = root / "pairwise_inverted"
    assert cli_invert.main(["-i", str(q), "-o", str(inv)]) == 0

    # query the two sides of a composite posting with a NONZERO quantized
    # impact (zero-quantized postings stay in vocab for byte parity but are
    # never scored), so the pair term MUST contribute under --pairwise
    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    loaded = InvertedIndexData.load(inv)
    pair_terms = [
        t
        for tid, t in enumerate(loaded.vocab)
        if "|" in t and loaded.offsets[tid + 1] > loaded.offsets[tid]
    ]
    assert pair_terms, "no scored composite postings survived quantization"
    t1, t2 = pair_terms[0].split("|")
    (root / "pair_queries.tsv").write_text(f"qp\t{t1} {t2}\n")

    def rank(flag, out_name):
        args = [
            "--vocab_path", str(root / "vocab.txt"),
            "--tiny", "--max_length", "32",
            "--index_path", str(inv),
            "--queries_path", str(root / "pair_queries.tsv"),
            "--output_path", str(root / out_name),
            "--engine", "host",
        ] + flag
        assert cli_rank.main(args) == 0
        scores = {}
        for line in (root / out_name).read_text().splitlines():
            qid, pid, _rank, score = line.split("\t")[:4]
            scores[(qid, pid)] = float(score)
        return scores

    pair_scores = rank(["--pairwise"], "run_pairwise.tsv")
    flat_scores = rank([], "run_flat.tsv")
    assert pair_scores, "pairwise ranking produced no results"
    common = set(pair_scores) & set(flat_scores)
    assert common
    assert all(pair_scores[k] >= flat_scores[k] for k in common)
    assert any(pair_scores[k] > flat_scores[k] for k in common)


def test_cli_finetune_tiny(tmp_path):
    from improving_learned_index_tpu.cli import finetune as cli_finetune

    pairs = tmp_path / "pairs.tsv"
    pairs.write_text("a doc about foxes\tquick fox\nanother doc\tlazy dog\n" * 2)
    adapter = tmp_path / "adapter.msgpack"
    assert cli_finetune.main([
        "--dataset_path", str(pairs),
        "--output_adapter", str(adapter),
        "--tiny", "--batch_size", "2", "--total_steps", "2", "--max_length", "64",
    ]) == 0
    assert adapter.stat().st_size > 0


def test_cli_nano_beir_local(workspace, tmp_path):
    import json

    from improving_learned_index_tpu.cli import nano_beir as cli_nano

    corpus = (workspace / "collection.tsv").read_text().splitlines()
    d = tmp_path / "nb" / "scifact"
    d.mkdir(parents=True)
    with open(d / "corpus.jsonl", "w") as f:
        for line in corpus:
            pid, text = line.split("\t", 1)
            f.write(json.dumps({"_id": f"d{pid}", "title": "", "text": text}) + "\n")
    (d / "queries.jsonl").write_text(json.dumps({"_id": "q0", "text": "quick brown fox"}) + "\n")
    (d / "qrels.tsv").write_text("query-id\tcorpus-id\tscore\nq0\td0\t1\n")
    out = tmp_path / "metrics.json"
    assert cli_nano.main([
        "--vocab_path", str(workspace / "vocab.txt"),
        "--tiny", "--max_length", "32",
        "--local_data_dir", str(tmp_path / "nb"),
        "--batch_size", "4",
        "--output", str(out),
    ]) == 0
    assert "scifact" in out.read_text()


def test_cli_train_to_index_checkpoint_handoff(workspace, tmp_path):
    """The train CLI's latest checkpoint (wrapped params+opt_state payload)
    must be consumable by the index CLI via --checkpoint (reference
    index.py defaults to the trainer's DeepImpact_latest.pt)."""
    from improving_learned_index_tpu.cli import train as cli_train

    root = workspace
    if not (root / "vocab.txt").exists():
        assert cli_build_vocab.main([
            "--collection_path", str(root / "collection.tsv"),
            "--output_path", str(root / "vocab.txt"),
            "--max_size", "512", "--min_freq", "1",
        ]) == 0
    (tmp_path / "triples.tsv").write_text("q0\t0\t7\nq1\t3\t1\nq0\t0\t5\nq1\t3\t2\n")
    ckpt_dir = tmp_path / "ckpt"
    model_args = [
        "--vocab_path", str(root / "vocab.txt"),
        "--tiny", "--max_length", "32",
    ]
    assert cli_train.main(model_args + [
        "--dataset_path", str(tmp_path / "triples.tsv"),
        "--queries_path", str(root / "queries.tsv"),
        "--collection_path", str(root / "collection.tsv"),
        "--checkpoint_dir", str(ckpt_dir),
        "--batch_size", "2", "--total_steps", "2", "--save_every", "1",
        "--no_beir_eval", "--seed", "0",
    ]) == 0
    latest = ckpt_dir / "DeepImpact_latest.msgpack"
    assert latest.exists()
    assert cli_index.main(model_args + [
        "--checkpoint", str(latest),
        "--collection_path", str(root / "collection.tsv"),
        "--output_file_path", str(tmp_path / "handoff.index"),
        "--model_batch_size", "4",
    ]) == 0
    assert (tmp_path / "handoff.index").read_text().count("\n") == 8


def test_cli_expand_int8(workspace, tmp_path):
    """--int8 quantized decode through the expand CLI (tiny model)."""
    out = tmp_path / "expansions_int8.jsonl"
    assert cli_expand.main([
        "--collection_path", str(workspace / "collection.tsv"),
        "--output_path", str(out),
        "--tiny", "--int8", "--batch_size", "2", "--num_docs", "2",
        "--num_return_sequences", "2", "--max_new_tokens", "4",
    ]) == 0
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["doc_id"] == "0" and len(rec["queries"]) == 2


def test_cli_expand_precomputed(workspace, tmp_path):
    """doc2query-- / TILDE precomputed-expansion CLI (reference
    src/doc2query--/__main__.py and tilde_expansions CLI surface)."""
    from improving_learned_index_tpu.cli import expand_precomputed as cli_pre

    store = tmp_path / "store.jsonl"
    store.write_text(
        json.dumps({"doc_id": "0", "queries": [
            {"query": "quick vulpine beast", "score": 0.9},
            {"query": "irrelevant junk", "score": 0.1},
        ]}) + "\n"
    )
    out = tmp_path / "expanded.tsv"
    assert cli_pre.main([
        "--vocab_path", str(workspace / "vocab.txt"),
        "--collection_path", str(workspace / "collection.tsv"),
        "--queries_path", str(store),
        "--output_path", str(out),
        "--threshold", "0.5",  # fraction form -> p50, like the reference
    ]) == 0
    lines = dict(l.split("\t", 1) for l in out.read_text().splitlines())
    assert "vulpine" in lines["0"] and "junk" not in lines["0"]

    out2 = tmp_path / "tilde.tsv"
    assert cli_pre.main([
        "--vocab_path", str(workspace / "vocab.txt"),
        "--collection_path", str(workspace / "collection.tsv"),
        "--queries_path", str(store),
        "--output_path", str(out2),
        "--style", "tilde",
    ]) == 0
    assert "junk" in out2.read_text()  # tilde appends terms, no score filter


def test_cli_expand_module_entry_reaches_t5_path(tmp_path):
    """`python -m ...cli.expand --t5 ...` must reach _t5_main: the module's
    __main__ guard used to sit ABOVE the _t5_main definition, so script
    execution raised NameError before any T5 work started."""
    import subprocess
    import sys
    from pathlib import Path

    coll = tmp_path / "c.tsv"
    coll.write_text("d0\tdoc\n")
    proc = subprocess.run(
        [sys.executable, "-m", "improving_learned_index_tpu.cli.expand",
         "--collection_path", str(coll),
         "--output_path", str(tmp_path / "o.jsonl"),
         "--t5", str(tmp_path / "no_such_model")],
        capture_output=True, text=True, timeout=300,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    # it must fail on the nonexistent model, not on module layout
    assert proc.returncode != 0
    assert "NameError" not in proc.stderr
