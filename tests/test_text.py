"""Tokenization / term-mapping unit tests.

The term->first-token contract decides which token's score represents a term
in the index (SURVEY.md §7 "tokenizer fidelity"); these tests pin it down.
"""

import numpy as np

from improving_learned_index_tpu.text import (
    ImpactTokenizer,
    WordPieceTokenizer,
    WordPieceVocab,
    batch_arrays,
    batch_term_slots,
    normalize,
    pretokenize,
)


def test_normalize_lowercase_accents():
    assert normalize("Héllo  WORLD") == "hello  world"
    assert normalize("a\tb\nc") == "a b c"


def test_pretokenize_splits_punctuation():
    assert pretokenize("hello, world!") == ["hello", ",", "world", "!"]
    assert pretokenize("it's a-b") == ["it", "'", "s", "a", "-", "b"]


def test_wordpiece_roundtrip():
    vocab = WordPieceVocab.build(["hello world", "held hand"], max_size=256)
    wp = WordPieceTokenizer(vocab)
    ids = wp.tokenize_word("hello")
    assert all(i != vocab.unk_id for i in ids)
    # unseen word decomposes into seen chars, not UNK
    ids2 = wp.tokenize_word("hold")
    assert all(i != vocab.unk_id for i in ids2)
    # word with unseen char becomes UNK
    assert wp.tokenize_word("zzz") == [vocab.unk_id]


def test_process_document_term_map(tiny_tokenizer):
    doc = "The quick brown fox! The fox."
    enc = tiny_tokenizer.process_document(doc)
    assert len(enc.ids) == 32
    assert len(enc.attention_mask) == 32
    # punctuation filtered, duplicates keep first occurrence
    assert "!" not in enc.term_to_token_index
    assert "." not in enc.term_to_token_index
    assert set(enc.term_to_token_index) == {"the", "quick", "brown", "fox"}
    # first token of doc is CLS at 0, so first term maps to index 1
    assert enc.term_to_token_index["the"] == 1
    # indices strictly increasing in document order for unique terms
    idxs = [enc.term_to_token_index[t] for t in ["the", "quick", "brown", "fox"]]
    assert idxs == sorted(idxs)


def test_process_document_truncation(tiny_tokenizer):
    doc = " ".join(["term%d" % i for i in range(100)])
    enc = tiny_tokenizer.process_document(doc, max_length=16)
    assert len(enc.ids) == 16
    assert sum(enc.attention_mask) == 16
    # overflowed terms dropped from the map
    assert all(v < 15 for v in enc.term_to_token_index.values())


def test_process_query_set(tiny_tokenizer):
    q = tiny_tokenizer.process_query("The quick, quick fox?")
    assert q == {"the", "quick", "fox"}


def test_query_document_token_mask(tiny_tokenizer):
    enc, mask = tiny_tokenizer.process_query_and_document(
        "brown dog", "the quick brown fox"
    )
    assert mask.dtype == bool and mask.shape == (32,)
    assert mask[enc.term_to_token_index["brown"]]
    assert mask.sum() == 1  # 'dog' not in doc


def test_batching_fixed_shapes(tiny_tokenizer):
    docs = ["the quick brown fox", "a lazy dog sleeps"]
    encs = [tiny_tokenizer.process_document(d) for d in docs]
    arrays = batch_arrays(encs)
    assert arrays["input_ids"].shape == (2, 32)
    slots, valid, terms = batch_term_slots(encs, max_terms=8)
    assert slots.shape == (2, 8)
    assert valid[0].sum() == len(encs[0].term_to_token_index)
    assert terms[0] == list(encs[0].term_to_token_index.keys())
    # slot j of doc i points at the first token of terms[i][j]
    for i in range(2):
        for j, t in enumerate(terms[i]):
            assert encs[i].term_to_token_index[t] == slots[i, j]


def test_normalize_pretokenize_ascii_fast_path_equivalence():
    """The ASCII fast paths (translate/regex) must match the general
    per-character path exactly."""
    import random
    import string as _string

    from improving_learned_index_tpu.text.normalize import (
        _is_control,
        _is_punct_char,
        normalize,
        pretokenize,
    )

    def slow_normalize(text, lowercase=True):
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if ch.isspace() else ch)
        text = "".join(out)
        return text.lower() if lowercase else text

    def slow_pretokenize(text):
        terms, buf = [], []
        for ch in text:
            if ch.isspace():
                if buf:
                    terms.append("".join(buf)); buf = []
            elif _is_punct_char(ch):
                if buf:
                    terms.append("".join(buf)); buf = []
                terms.append(ch)
            else:
                buf.append(ch)
        if buf:
            terms.append("".join(buf))
        return terms

    rng = random.Random(0)
    pool = _string.printable + "\x00\x01\x0b\x0c\x7f"
    for _ in range(200):
        s = "".join(rng.choice(pool) for _ in range(rng.randrange(0, 80)))
        assert s.isascii()
        n_fast = normalize(s)
        n_slow = slow_normalize(s)
        assert n_fast == n_slow, (s.encode(), n_fast, n_slow)
        assert pretokenize(n_fast) == slow_pretokenize(n_slow)
    # non-ASCII takes the general path (accent stripping intact)
    assert pretokenize(normalize("Café—überall!")) == ["cafe", "—", "uberall", "!"]


def test_expand_pairwise_terms_exact_ordered_pairs():
    """Regression (advisor r3): the composite loop must snapshot the input
    once — re-reading the mutating set compounded composites into
    composite-of-composite terms (c|b|a|b) with exponential blowup, matching
    neither the reference's itertools.product semantics (ranker.py:53-57)
    nor the index's posting vocabulary."""
    from improving_learned_index_tpu.utils.text_utils import expand_pairwise_terms

    for n in (0, 1, 2, 3, 10):
        base = {f"t{i}" for i in range(n)}
        out = expand_pairwise_terms(set(base))
        assert len(out) == n * (n - 1) + n
        assert out == base | {f"{a}|{b}" for a in base for b in base if a != b}
