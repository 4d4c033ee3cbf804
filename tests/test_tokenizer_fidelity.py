"""Tokenizer-fidelity golden test (SURVEY.md §7 hard part: the term->token
mapping decides which token's score represents a term; a silent mismatch
corrupts the index).

The self-contained WordPiece stack and the HF fast-tokenizer adapter are run
over the SAME vocab file (BertTokenizerFast built offline from our
vocab.txt): ids, masks, and the term->first-token map must agree exactly."""

import numpy as np
import pytest

from improving_learned_index_tpu.text import ImpactTokenizer, WordPieceVocab

transformers = pytest.importorskip("transformers")

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "unbelievable running dogs, and foxes!",
    "sub-word pieces: tokenization fidelity matters",
    "repeated repeated terms terms stay unique",
]

DOCS = [
    "The quick brown fox! The fox.",
    "unbelievable running, dogs and foxes",
    "tokenization fidelity matters matters",
    "punctuation, everywhere! (really)",
]


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    from improving_learned_index_tpu.text.hf_adapter import HFImpactTokenizer

    vocab = WordPieceVocab.build(CORPUS, max_size=512)
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    vocab.save(path)
    ours = ImpactTokenizer(vocab, max_length=32)
    hf = HFImpactTokenizer(
        transformers.BertTokenizerFast(vocab_file=str(path), do_lower_case=True),
        max_length=32,
    )
    return ours, hf


def test_document_encoding_identical(stacks):
    ours, hf = stacks
    for doc in DOCS:
        a = ours.process_document(doc)
        b = hf.process_document(doc)
        assert a.ids == b.ids, doc
        assert a.attention_mask == b.attention_mask, doc
        assert a.term_to_token_index == b.term_to_token_index, doc


def test_query_terms_identical(stacks):
    ours, hf = stacks
    for q in ["The Quick fox?", "unbelievable DOGS", "fidelity, matters!"]:
        assert ours.process_query(q) == hf.process_query(q), q


def test_training_mask_identical(stacks):
    ours, hf = stacks
    for q, d in [("quick fox", DOCS[0]), ("running dogs", DOCS[1])]:
        _, ma = ours.process_query_and_document(q, d)
        _, mb = hf.process_query_and_document(q, d)
        np.testing.assert_array_equal(ma, mb)


def test_truncation_behavior_identical(stacks):
    ours, hf = stacks
    long_doc = " ".join(DOCS) + " " + " ".join(CORPUS)
    a = ours.process_document(long_doc, max_length=16)
    b = hf.process_document(long_doc, max_length=16)
    assert a.ids == b.ids
    assert a.term_to_token_index == b.term_to_token_index
