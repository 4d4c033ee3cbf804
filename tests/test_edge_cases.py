"""Edge-case robustness: empty/punctuation-only/unicode inputs through the
tokenizer, encoder, index, and search layers."""

import numpy as np
import pytest

from improving_learned_index_tpu.core.config import EncoderConfig, IndexConfig
from improving_learned_index_tpu.index import Indexer, InvertedIndexData
from improving_learned_index_tpu.models import DeepImpact
from improving_learned_index_tpu.search import DeviceSearchEngine, InvertedIndex
from improving_learned_index_tpu.text import ImpactTokenizer, WordPieceVocab


@pytest.fixture(scope="module")
def model(request):
    tok = request.getfixturevalue("tiny_tokenizer")
    return DeepImpact(EncoderConfig.tiny(vocab_size=len(tok.vocab)), tok, seed=0)


def test_empty_document(model):
    enc = model.process_document("")
    assert enc.term_to_token_index == {}
    assert sum(enc.attention_mask) == 2  # [CLS] [SEP]
    impacts = model.get_impact_scores("")
    assert impacts == []


def test_punctuation_only_document(model):
    enc = model.process_document("!!! ... ,,, ???")
    assert enc.term_to_token_index == {}  # punctuation filtered
    assert model.get_impact_scores("?!") == []


def test_punctuation_only_query(model):
    assert model.process_query("?!,.") == set()


def test_unicode_document(model):
    # accents strip in normalization; unknown scripts fall to [UNK] pieces
    enc = model.process_document("café naïve résumé 日本語")
    assert "cafe" in enc.term_to_token_index
    assert "naive" in enc.term_to_token_index
    impacts = model.get_impact_scores("café résumé")
    assert {t for t, _ in impacts} == {"cafe", "resume"}


def test_whitespace_variants(model):
    a = model.process_document("the\tquick\nbrown\r\nfox")
    b = model.process_document("the quick brown fox")
    assert a.term_to_token_index == b.term_to_token_index


def test_index_with_empty_and_weird_docs(model):
    docs = ["", "the quick fox", "!!!", "   ", "fox fox fox"]
    indexer = Indexer(model, IndexConfig(max_length=32, max_terms=32, model_batch_size=2))
    inv, _ = indexer.build_inverted(docs)
    assert inv.num_docs == 5
    host = InvertedIndex(inv)
    dev = DeviceSearchEngine(inv)
    q = [model.process_query("quick fox"), set()]
    for h, d in zip(host.score_batch(q, 5), dev.score_batch(q, 5)):
        assert dict(h) == dict(d)
    # empty/punct docs never appear in results
    for doc_id, _ in host.score_batch(q, 5)[0]:
        assert doc_id in (1, 4)


def test_single_doc_corpus(model):
    inv, _ = Indexer(
        model, IndexConfig(max_length=32, max_terms=32, model_batch_size=2)
    ).build_inverted(["the quick brown fox"])
    assert inv.num_docs == 1
    res = DeviceSearchEngine(inv).score_batch([model.process_query("fox")], 10)
    assert all(d == 0 for d, _ in res[0])


def test_very_long_word(model):
    word = "x" * 500  # beyond max_chars_per_word -> [UNK], still indexable
    enc = model.process_document(f"the {word} fox")
    assert "the" in enc.term_to_token_index and "fox" in enc.term_to_token_index
    assert word in enc.term_to_token_index


def test_duplicate_query_terms_score_once(model):
    inv, _ = Indexer(
        model, IndexConfig(max_length=32, max_terms=32, model_batch_size=2)
    ).build_inverted(["the quick fox", "lazy dog"])
    host = InvertedIndex(inv)
    # process_query returns a SET: duplicates collapse (reference semantics)
    q1 = model.process_query("fox fox fox")
    q2 = model.process_query("fox")
    assert host.score_batch([q1], 5) == host.score_batch([q2], 5)
