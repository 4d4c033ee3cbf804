"""End-to-end quality loop: doc2query expansion IMPROVES retrieval — the
reference's entire thesis (/root/reference/README.md:14-18, BASELINE
config 4: generate queries with a fine-tuned LM, merge novel terms into the
collection, re-index, retrieval quality goes up).

The synthetic world makes the unexpanded index provably unable to answer:
query vocabulary ("ask*" terms) is DISJOINT from document vocabulary, so
before expansion every query scores zero documents (Recall@10 = MRR@10 = 0).
A tiny Llama decoder is LoRA-fine-tuned via expand.finetune on
(document -> query) pairs — the reference's finetune.py:41-190 workload —
until it maps each document's body term to its query's ask term.  Then the
REAL CLI chain runs: expand --local_path (greedy decode) -> merge -> index
-> quantize -> invert -> rank -> Metrics, for both the raw and the expanded
collection, and the lift must be total: Recall@10 goes 0 -> ~1.
"""

import dataclasses
from pathlib import Path

import jax
import numpy as np
import pytest

from improving_learned_index_tpu.cli import (
    build_vocab as cli_build_vocab,
    evaluate as cli_evaluate,
    expand as cli_expand,
    index as cli_index,
    invert as cli_invert,
    merge as cli_merge,
    rank as cli_rank,
)
from improving_learned_index_tpu.evaluation.run_metrics import Metrics
from improving_learned_index_tpu.expand.finetune import Doc2QueryFineTuner
from improving_learned_index_tpu.expand.generate import (
    PROMPT_EN,
    WordTokenizer,
    load_local_generator,
    save_local_generator,
)
from improving_learned_index_tpu.models.llama import LlamaConfig, init_llama_params

N_TOPICS = 10


def _world():
    """Documents use body*/fill*/shared vocabulary; queries use ask* terms
    that appear in NO document — an index over the raw collection cannot
    match them (the doc2query failure mode expansion exists to fix)."""
    docs, queries, qrels, pairs = [], {}, {}, []
    for t in range(N_TOPICS):
        doc = f"body{t:02d} fill{(t * 3) % 7} fill{(t * 5) % 7} shared"
        docs.append(doc)
        qid = f"q{t}"
        queries[qid] = f"ask{t:02d}"
        qrels[qid] = t
        pairs.append((doc, queries[qid]))
    return docs, queries, qrels, pairs


def _rank_and_score(root: Path, collection: Path, tag: str, queries, qrels):
    """index -> quantize -> invert -> rank -> Metrics via the real CLIs."""
    # xlmr kind = Softplus impact head: a random tiny ReLU head zeroes ~half
    # the vocabulary, which would erase some ask terms from the expanded
    # index for reasons unrelated to expansion (cf. test_train_lift.py)
    model_args = ["--vocab_path", str(root / "vocab.txt"), "--tiny",
                  "--model_kind", "xlmr", "--max_length", "32"]
    fwd = root / f"{tag}.index"
    assert cli_index.main(model_args + [
        "--collection_path", str(collection),
        "--output_file_path", str(fwd),
        "--model_batch_size", "4",
    ]) == 0
    q = root / f"{tag}.index.q"
    assert cli_quantize_main(["-i", str(fwd), "-o", str(q)]) == 0
    inv = root / f"{tag}_inverted"
    assert cli_invert.main(["-i", str(q), "-o", str(inv)]) == 0
    run = root / f"{tag}_run.tsv"
    assert cli_rank.main(model_args + [
        "--index_path", str(inv),
        "--queries_path", str(root / "queries.tsv"),
        "--output_path", str(run),
        "--qrels_path", str(root / "qrels.tsv"),
        "--top_k", "10",
    ]) == 0
    # the evaluate CLI must accept the run (prints the table) ...
    assert cli_evaluate.main([
        "--run_file_path", str(run),
        "--qrels_path", str(root / "qrels.tsv"),
        "--mrr_depths", "10", "--recall_depths", "10",
    ]) == 0
    # ... and Metrics gives us the numbers to assert on
    return Metrics(run, root / "qrels.tsv", mrr_depths=[10],
                   recall_depths=[10]).evaluate()


def cli_quantize_main(argv):
    from improving_learned_index_tpu.cli import quantize as cli_quantize

    return cli_quantize.main(argv)


@pytest.fixture(scope="module")
def trained_generator_dir(tmp_path_factory):
    """LoRA-fine-tune the tiny decoder on (doc, query) pairs until greedy
    decode emits each topic's ask term, then save it in the local-generator
    layout the expand CLI loads."""
    docs, queries, qrels, pairs = _world()
    tok = WordTokenizer.build(
        [PROMPT_EN.format(doc=d) for d in docs] + list(queries.values())
    )
    cfg = dataclasses.replace(
        LlamaConfig.tiny(vocab_size=tok.vocab_size), dtype="float32"
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ft = Doc2QueryFineTuner(params, cfg, tok, lr=5e-3, max_length=64, seed=1)
    rng = np.random.default_rng(0)
    for _ in range(60):
        order = rng.permutation(len(pairs))
        ft.train([pairs[i] for i in order], batch_size=5)
    out = tmp_path_factory.mktemp("generator")
    save_local_generator(out, ft.merged_params(), cfg, tok)
    return out


def test_local_generator_roundtrip(trained_generator_dir):
    params, cfg, tok = load_local_generator(trained_generator_dir)
    assert cfg.dtype == "float32" and tok.vocab_size == cfg.vocab_size
    ids = tok.encode("shared body00")
    assert ids[0] == WordTokenizer.BOS and WordTokenizer.UNK not in ids
    assert tok.decode(ids) == "shared body00"
    assert tok.encode("zzz-not-in-vocab")[1] == WordTokenizer.UNK


def test_expansion_improves_retrieval(trained_generator_dir, tmp_path):
    docs, queries, qrels, _ = _world()
    root = tmp_path
    collection = root / "collection.tsv"
    collection.write_text("".join(f"{i}\t{d}\n" for i, d in enumerate(docs)))
    (root / "queries.tsv").write_text(
        "".join(f"{qid}\t{q}\n" for qid, q in queries.items())
    )
    (root / "qrels.tsv").write_text(
        "".join(f"{qid}\t0\t{did}\t1\n" for qid, did in qrels.items())
    )
    # encoder-side vocab covers docs AND query terms (the ask terms must be
    # indexable once expansion writes them into documents)
    corpus_plus = root / "vocab_source.tsv"
    corpus_plus.write_text(
        collection.read_text()
        + "".join(f"q{i}\t{q}\n" for i, q in enumerate(queries.values()))
    )
    assert cli_build_vocab.main([
        "--collection_path", str(corpus_plus),
        "--output_path", str(root / "vocab.txt"),
        "--max_size", "512", "--min_freq", "1",
    ]) == 0

    before = _rank_and_score(root, collection, "before", queries, qrels)
    # the world guarantees total failure without expansion
    assert before["MRR@10"] == 0.0 and before["Recall@10"] == 0.0

    # expand (real CLI, greedy decode on the fine-tuned local generator)
    expansions = root / "expansions.jsonl"
    assert cli_expand.main([
        "--collection_path", str(collection),
        "--output_path", str(expansions),
        "--local_path", str(trained_generator_dir),
        "--greedy", "--batch_size", "5",
        "--num_return_sequences", "1", "--max_new_tokens", "4",
        "--max_tokens", "64",
    ]) == 0
    assert len(expansions.read_text().splitlines()) == len(docs)

    # merge novel terms into the collection (real CLI)
    merged = root / "merged.tsv"
    assert cli_merge.main([
        "--vocab_path", str(root / "vocab.txt"),
        "--collection_path", str(collection),
        "--queries_path", str(expansions),
        "--output_path", str(merged),
    ]) == 0
    # every ask term must now live in its document
    merged_rows = dict(
        line.split("\t", 1) for line in merged.read_text().splitlines()
    )
    hit = sum(
        1 for t in range(N_TOPICS) if f"ask{t:02d}" in merged_rows[str(t)]
    )
    assert hit == N_TOPICS, f"generator expanded only {hit}/{N_TOPICS} docs"

    after = _rank_and_score(root, merged, "after", queries, qrels)
    assert after["Recall@10"] == 1.0, after
    assert after["MRR@10"] >= 0.99, after
