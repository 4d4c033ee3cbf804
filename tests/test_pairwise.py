"""DeepPairwiseImpact: pair slots, composite postings, training step."""

import numpy as np
import pytest

from improving_learned_index_tpu.core.config import EncoderConfig, TrainConfig
from improving_learned_index_tpu.models.pairwise import (
    DeepPairwiseImpact,
    build_pair_slots,
)
from improving_learned_index_tpu.train import COLLATES, Trainer


def test_build_pair_slots():
    pairs, mask = build_pair_slots([[3, 1, 5], [2]], max_pairs=8)
    # sorted indices -> combinations (1,3), (1,5), (3,5)
    assert mask[0].sum() == 3 and mask[1].sum() == 0
    np.testing.assert_array_equal(pairs[0, :3], [[1, 3], [1, 5], [3, 5]])
    # directed doubles them
    pairs, mask = build_pair_slots([[1, 3]], max_pairs=8, directed=True)
    np.testing.assert_array_equal(pairs[0, :2], [[1, 3], [3, 1]])
    assert mask[0].sum() == 2


@pytest.fixture(scope="module")
def pw_model(request):
    tok = request.getfixturevalue("tiny_tokenizer")
    cfg = EncoderConfig.tiny(vocab_size=len(tok.vocab))
    return DeepPairwiseImpact(cfg, tok, seed=0, max_pairs=32)


def test_pairwise_impacts(pw_model):
    impacts = pw_model.get_impact_scores_batch(["the quick fox", "lazy dog"])
    terms0 = [t for t, _ in impacts[0]]
    assert {"the", "quick", "fox"}.issubset(set(terms0))
    composite = [t for t in terms0 if "|" in t]
    # composite pairs are in token order, no self-pairs
    for c in composite:
        t1, t2 = c.split("|")
        assert t1 != t2
    scores = [s for _, s in impacts[0]]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_pairwise_training_step(pw_model, tmp_path, request):
    tok = request.getfixturevalue("tiny_tokenizer")
    triples = [
        ("quick fox", "the quick brown fox jumps", "sleepy dog naps"),
        ("lazy dog", "the lazy dog sleeps here", "fast fox runs"),
    ] * 2
    collate = COLLATES["pairwise_impact"]
    batches = [collate(triples[i : i + 2], tok, 32, max_pairs=16) for i in (0, 2)]
    cfg = TrainConfig(batch_size=2, lr=1e-3, save_every=10**6, eval_every=10**9, loss="pairwise_impact")
    trainer = Trainer(pw_model, cfg, tmp_path)
    first = float(trainer._grad_step(trainer.params, trainer._put_batch(batches[0]))[0][0])
    trainer.train(batches * 3, total_steps=6)
    last = float(trainer._grad_step(trainer.params, trainer._put_batch(batches[0]))[0][0])
    assert np.isfinite(first) and last < first
