"""End-to-end quality loop: training IMPROVES retrieval (VERDICT round-2
ask #1b).  Train the tiny encoder on synthetic relevance triples, then push
BOTH the untrained and the trained model through the full pipeline —
encode -> global-max quantize -> inverted index -> save/load -> rank ->
MRR/Recall (evaluation.run_metrics) — and assert a large MRR@10 lift.

The synthetic world is adversarial for an untrained model: every query
carries one discriminative signal term plus four ubiquitous "common" terms;
distractor documents contain ALL four commons while each relevant document
has the signal term and only one common.  Random nonnegative impacts
therefore rank distractors (4 matched terms) above the relevant doc
(2 matched terms) most of the time; a trained model must learn to suppress
common-term impacts and amplify signal terms — the DeepImpact training
objective's whole point (reference trainer.py:158-167).
"""

from pathlib import Path

import numpy as np
import pytest

from improving_learned_index_tpu.core.config import (
    EncoderConfig,
    IndexConfig,
    TrainConfig,
)
from improving_learned_index_tpu.evaluation.ranker import Ranker
from improving_learned_index_tpu.evaluation.run_metrics import Metrics
from improving_learned_index_tpu.index.indexer import Indexer
from improving_learned_index_tpu.models import DeepImpact
from improving_learned_index_tpu.parallel.dataloader import BatchLoader
from improving_learned_index_tpu.text import ImpactTokenizer, WordPieceVocab
from improving_learned_index_tpu.train import COLLATES, Trainer

N_TOPICS = 12
COMMONS = ["commona", "commonb", "commonc", "commond"]


def _world():
    """(corpus docs, queries, qrels, triples): one relevant doc + three
    common-term distractors per topic."""
    docs, queries, qrels, triples = [], {}, {}, []
    for t in range(N_TOPICS):
        sig = f"signal{t:02d}"
        rel = f"{sig} {COMMONS[t % 4]} filler{t:02d} extra{(t * 7) % 5}"
        rel_id = len(docs)
        docs.append(rel)
        distractor_ids = []
        for j in range(3):
            d = f"{' '.join(COMMONS)} filler{(t + j + 1) % N_TOPICS:02d} junk{j}"
            distractor_ids.append(len(docs))
            docs.append(d)
        qid = f"q{t}"
        queries[qid] = f"{sig} {' '.join(COMMONS)}"
        qrels[qid] = rel_id
        for j in distractor_ids:
            triples.append((queries[qid], rel, docs[j]))
    return docs, queries, qrels, triples


def _pipeline_mrr(model, docs, queries, qrels, workdir: Path) -> float:
    """encode -> quantize -> invert -> save -> load -> rank -> MRR@10."""
    workdir.mkdir(parents=True, exist_ok=True)
    inv, _ = Indexer(
        model, IndexConfig(max_length=32, max_terms=32, model_batch_size=8)
    ).build_inverted(docs)
    inv.save(workdir / "index")

    (workdir / "queries.tsv").write_text(
        "".join(f"{qid}\t{q}\n" for qid, q in queries.items())
    )
    (workdir / "qrels.tsv").write_text(
        "".join(f"{qid}\t0\t{did}\t1\n" for qid, did in qrels.items())
    )
    ranker = Ranker(
        index_path=workdir / "index",
        queries_path=workdir / "queries.tsv",
        output_path=workdir / "run.tsv",
        tokenizer=model,
        qrels_path=workdir / "qrels.tsv",
        engine="auto",
        top_k=10,
    )
    assert ranker.run() == len(queries)
    metrics = Metrics(
        workdir / "run.tsv",
        workdir / "qrels.tsv",
        mrr_depths=[10],
        recall_depths=[10],
    ).evaluate()
    return metrics["MRR@10"]


@pytest.mark.slow
def test_training_improves_retrieval(tmp_path):
    docs, queries, qrels, triples = _world()
    vocab = WordPieceVocab.build(docs + list(queries.values()), max_size=512)
    tokenizer = ImpactTokenizer(vocab, max_length=32)
    # Softplus head (the DeepImpactXLMR configuration, reference
    # xlmr_original.py:34-38): a randomly-initialized ReLU head can be fully
    # dead (every impact 0 -> zero gradients), and its strictly positive
    # impacts make the untrained baseline rank by raw term-match count —
    # exactly what the adversarial world punishes.
    cfg = EncoderConfig.tiny(vocab_size=len(vocab), impact_activation="softplus")

    untrained = DeepImpact(cfg, tokenizer, seed=3)
    mrr_before = _pipeline_mrr(untrained, docs, queries, qrels, tmp_path / "before")

    model = DeepImpact(cfg, tokenizer, seed=3)
    tc = TrainConfig(
        batch_size=4, lr=3e-3, save_every=10**6, eval_every=10**9,
        loss="pairwise_ce",
    )
    trainer = Trainer(model, tc, tmp_path / "ckpt")
    collate = COLLATES["pairwise_ce"]
    rng = np.random.default_rng(0)
    for epoch in range(6):
        order = rng.permutation(len(triples))
        loader = BatchLoader(
            [triples[i] for i in order],
            4,
            lambda b: collate(b, tokenizer, 32),
            shuffle=False,
        )
        trainer.train(loader, skip=0)

    mrr_after = _pipeline_mrr(model, docs, queries, qrels, tmp_path / "after")

    # the untrained model must rank distractors high (the world is built for
    # it to fail) and the trained model must solve it
    assert mrr_after >= 0.8, f"trained MRR@10 {mrr_after}"
    assert mrr_after >= mrr_before + 0.25, (
        f"no training lift: before={mrr_before} after={mrr_after}"
    )


def test_distillation_improves_retrieval(tmp_path):
    """Same adversarial world, trained with DistilKL from a synthetic
    perfect teacher (pos score 10, distractor 0 — the reference's
    distillation path, distil_trainer.py:34-75) instead of pairwise CE."""
    docs, queries, qrels, triples = _world()
    vocab = WordPieceVocab.build(docs + list(queries.values()), max_size=512)
    tokenizer = ImpactTokenizer(vocab, max_length=32)
    cfg = EncoderConfig.tiny(vocab_size=len(vocab), impact_activation="softplus")

    untrained = DeepImpact(cfg, tokenizer, seed=3)
    mrr_before = _pipeline_mrr(untrained, docs, queries, qrels, tmp_path / "before")

    # distillation groups: (query, [(pos, 10.0), (neg, 0.0)])
    groups = [(q, [(pos, 10.0), (neg, 0.0)]) for q, pos, neg in triples]

    model = DeepImpact(cfg, tokenizer, seed=3)
    tc = TrainConfig(
        batch_size=4, lr=3e-3, save_every=10**6, eval_every=10**9,
        loss="distil_kl",
    )
    trainer = Trainer(model, tc, tmp_path / "ckpt")
    collate = COLLATES["distil_kl"]
    rng = np.random.default_rng(0)
    for epoch in range(6):
        order = rng.permutation(len(groups))
        loader = BatchLoader(
            [groups[i] for i in order],
            4,
            lambda b: collate(b, tokenizer, 32),
            shuffle=False,
        )
        trainer.train(loader, skip=0)

    mrr_after = _pipeline_mrr(model, docs, queries, qrels, tmp_path / "after")
    assert mrr_after >= 0.8, f"distil-trained MRR@10 {mrr_after}"
    assert mrr_after >= mrr_before + 0.25, (
        f"no distillation lift: before={mrr_before} after={mrr_after}"
    )


def test_in_batch_negatives_improves_retrieval(tmp_path):
    """Same world, trained with the in-batch-negatives objective (every
    query scored against all B negatives, reference in_batch_negatives.py)."""
    docs, queries, qrels, triples = _world()
    vocab = WordPieceVocab.build(docs + list(queries.values()), max_size=512)
    tokenizer = ImpactTokenizer(vocab, max_length=32)
    cfg = EncoderConfig.tiny(vocab_size=len(vocab), impact_activation="softplus")

    untrained = DeepImpact(cfg, tokenizer, seed=3)
    mrr_before = _pipeline_mrr(untrained, docs, queries, qrels, tmp_path / "before")

    model = DeepImpact(cfg, tokenizer, seed=3)
    tc = TrainConfig(
        batch_size=4, lr=3e-3, save_every=10**6, eval_every=10**9,
        loss="in_batch_negatives",
    )
    trainer = Trainer(model, tc, tmp_path / "ckpt")
    collate = COLLATES["in_batch_negatives"]
    rng = np.random.default_rng(0)
    for epoch in range(6):
        order = rng.permutation(len(triples))
        loader = BatchLoader(
            [triples[i] for i in order],
            4,
            lambda b: collate(b, tokenizer, 32),
            shuffle=False,
        )
        trainer.train(loader, skip=0)

    mrr_after = _pipeline_mrr(model, docs, queries, qrels, tmp_path / "after")
    assert mrr_after >= 0.8, f"in-batch-neg MRR@10 {mrr_after}"
    assert mrr_after >= mrr_before + 0.25, (
        f"no in-batch-negatives lift: before={mrr_before} after={mrr_after}"
    )
