"""Incremental indexing: shard indexes merged with doc-id offsets are
byte-identical to a one-shot build over the concatenated corpus."""

import random

from improving_learned_index_tpu.index.inverted import InvertedIndexData

TERMS = ["apple", "banana", "cherry", "date", "elder", "fig"]


def _docs(n, seed, zero_in=()):
    rng = random.Random(seed)
    out = []
    for d in range(n):
        terms = rng.sample(TERMS, rng.randint(0, 4))
        doc = {t: rng.randint(1, 255) for t in terms}
        if d in zero_in:
            doc["zeroterm"] = 0  # exercises the zero-CSR byte-parity quirk
        out.append(doc)
    return out


def _build(docs):
    return InvertedIndexData.build(enumerate(docs), num_docs=len(docs))


def test_merge_equals_oneshot(tmp_path):
    shards = [_docs(7, 0, zero_in={2}), _docs(5, 1), _docs(9, 2, zero_in={0, 8})]
    full = _build([d for s in shards for d in s])
    merged = InvertedIndexData.merge([_build(s) for s in shards])
    assert merged.num_docs == full.num_docs
    full.save(tmp_path / "full")
    merged.save(tmp_path / "merged")
    for f in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (tmp_path / "merged" / f).read_bytes() == (tmp_path / "full" / f).read_bytes(), f


def test_merge_disjoint_vocabs():
    a = _build([{"only_a": 3}, {"only_a": 9}])
    b = _build([{"only_b": 5}])
    m = InvertedIndexData.merge([a, b])
    assert m.vocab == ["only_a", "only_b"]
    docs, vals = m.term_postings("only_a")
    assert docs.tolist() == [1, 0] and vals.tolist() == [9, 3]
    docs, vals = m.term_postings("only_b")
    assert docs.tolist() == [2] and vals.tolist() == [5]


def test_merge_explicit_offsets():
    a = _build([{"x": 1}])
    b = _build([{"x": 2}])
    m = InvertedIndexData.merge([a, b], doc_offsets=[0, 10])
    docs, vals = m.term_postings("x")
    assert docs.tolist() == [10, 0] and vals.tolist() == [2, 1]
    assert m.num_docs == 11


def test_hybrid_engine_over_merged_index():
    """Query-level equivalence, not just byte-level: the hybrid engine over
    a merged index scores like the engine over the one-shot build."""
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    shards = [_docs(20, 7), _docs(15, 8)]
    merged = InvertedIndexData.merge([_build(s) for s in shards])
    oneshot = _build([d for s in shards for d in s])
    ea, eb = HybridSearchEngine(merged), HybridSearchEngine(oneshot)
    qs = [{"apple", "fig"}, {"banana"}, {"cherry", "date", "elder"}]
    ra, rb = ea.score_batch(qs, 10), eb.score_batch(qs, 10)
    for a, b in zip(ra, rb):
        assert [(int(d), float(s)) for d, s in a] == [(int(d), float(s)) for d, s in b]


def test_merge_cli(tmp_path):
    from improving_learned_index_tpu.cli import merge_indexes

    shards = [_docs(6, 3), _docs(4, 4)]
    full = _build([d for s in shards for d in s])
    full.save(tmp_path / "full")
    for i, s in enumerate(shards):
        _build(s).save(tmp_path / f"shard{i}")
    rc = merge_indexes.main([
        "-i", str(tmp_path / "shard0"), str(tmp_path / "shard1"),
        "-o", str(tmp_path / "merged"),
        "--num_docs", str(len(shards[0])), str(len(shards[1])),
    ])
    assert rc == 0
    for f in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (tmp_path / "merged" / f).read_bytes() == (tmp_path / "full" / f).read_bytes(), f
