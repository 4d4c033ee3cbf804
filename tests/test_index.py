"""Index pipeline tests: quantization parity, forward-index format,
binary inverted-index layout (validated with raw struct against the
reference's on-disk format), and search-engine agreement."""

import struct

import numpy as np
import pytest

from improving_learned_index_tpu.index import (
    ForwardIndex,
    InvertedIndexData,
    format_line,
    parse_line,
    quantize_file,
)
from improving_learned_index_tpu.ops.quantize import (
    quantize_scale,
    quantize_value,
)
from improving_learned_index_tpu.search import DeviceSearchEngine, InvertedIndex


def test_quantize_exact_parity():
    # Reference formula: scale = 255 / max; q = int(score * scale)
    max_val = 3.7
    scale = quantize_scale(max_val)
    assert scale == 255 / 3.7
    for score in [0.0, 0.001, 1.234, 3.7, 2.49999, 0.0145]:
        assert quantize_value(score, scale) == int(score * scale)
    assert quantize_value(max_val, scale) == 255


def test_forward_index_format_roundtrip(tmp_path):
    line = format_line([("hello", 1.23456), ("world", 0.5)])
    assert line == "hello: 1.235, world: 0.5"
    parsed = parse_line(line)
    assert parsed == {"hello": 1.235, "world": 0.5}


def test_quantize_file_drops_zeros(tmp_path):
    inp = tmp_path / "fwd.txt"
    out = tmp_path / "fwd.q.txt"
    inp.write_text("a: 2.0, b: 0.001\nc: 1.0\n")
    max_val = quantize_file(inp, out)
    assert max_val == 2.0
    lines = out.read_text().splitlines()
    # b quantizes to int(0.001 * 127.5) = 0 -> dropped
    assert lines[0] == "a: 255"
    assert lines[1] == f"c: {int(1.0 * 255 / 2.0)}"


DOCS = [
    {"apple": 200, "banana": 100},
    {"apple": 150, "cherry": 50},
    {"banana": 250, "cherry": 10, "apple": 5},
]


def _build():
    return InvertedIndexData.build(enumerate(DOCS), num_docs=3)


def test_inverted_build_sorted_vocab_and_impact_order():
    idx = _build()
    assert idx.vocab == ["apple", "banana", "cherry"]
    docs, imps = idx.term_postings("apple")
    # impact-descending: doc0 (200), doc1 (150), doc2 (5)
    np.testing.assert_array_equal(docs, [0, 1, 2])
    np.testing.assert_array_equal(imps, [200, 150, 5])
    docs, imps = idx.term_postings("banana")
    np.testing.assert_array_equal(docs, [2, 0])
    np.testing.assert_array_equal(imps, [250, 100])


def test_binary_layout_matches_reference_struct(tmp_path):
    """Validate serialized bytes with the exact struct formats the reference
    reads: '<I'+'B' postings records, '<QQ' offsets
    (reference utils/defaults.py:26-37, inverted_index/inverted_index.py:31-53)."""
    idx = _build()
    idx.save(tmp_path)

    vocab = (tmp_path / "vocab.txt").read_text().splitlines()
    assert vocab == ["apple", "banana", "cherry"]

    dat = (tmp_path / "inverted_index.dat").read_bytes()
    idx_bytes = (tmp_path / "inverted_index.idx").read_bytes()
    assert len(dat) == 7 * 5  # 7 postings, 5 bytes each
    assert len(idx_bytes) == 3 * 16  # 3 terms, 16 bytes each

    # Read term 'banana' (id 1) exactly the way the reference engine does.
    start, end = struct.unpack("<QQ", idx_bytes[1 * 16 : 2 * 16])
    records = []
    pos = start
    while pos < end:
        doc_id, impact = struct.unpack("<IB", dat[pos : pos + 5])
        records.append((doc_id, impact))
        pos += 5
    assert records == [(2, 250), (0, 100)]


def test_inverted_save_load_roundtrip(tmp_path):
    idx = _build()
    idx.save(tmp_path)
    loaded = InvertedIndexData.load(tmp_path, num_docs=3)
    assert loaded.vocab == idx.vocab
    np.testing.assert_array_equal(loaded.doc_ids, idx.doc_ids)
    np.testing.assert_array_equal(loaded.impacts, idx.impacts)
    np.testing.assert_array_equal(loaded.offsets, idx.offsets)


def test_host_engine_scoring():
    engine = InvertedIndex(_build())
    top = engine.score({"apple", "banana"}, top_k=10)
    scores = dict(top)
    assert scores == {0: 300, 1: 150, 2: 255}
    assert top[0][0] == 0  # highest first
    # batch path agrees
    batch = engine.score_batch([{"apple", "banana"}], top_k=10)[0]
    assert dict(batch) == scores


def test_device_engine_matches_host():
    idx = _build()
    host = InvertedIndex(idx)
    device = DeviceSearchEngine(idx)
    queries = [
        {"apple", "banana"},
        {"cherry"},
        {"missing"},
        {"apple", "banana", "cherry", "missing"},
    ]
    host_res = host.score_batch(queries, top_k=3)
    dev_res = device.score_batch(queries, top_k=3)
    for h, d in zip(host_res, dev_res):
        assert dict(h) == dict(d)


def test_device_engine_large_random():
    rng = np.random.default_rng(0)
    num_docs, vocab_size = 500, 50
    docs = []
    for _ in range(num_docs):
        terms = rng.choice(vocab_size, size=rng.integers(1, 20), replace=False)
        docs.append({f"t{t}": int(rng.integers(1, 255)) for t in terms})
    idx = InvertedIndexData.build(enumerate(docs), num_docs=num_docs)
    host = InvertedIndex(idx)
    device = DeviceSearchEngine(idx)
    queries = [
        {f"t{t}" for t in rng.choice(vocab_size, size=rng.integers(1, 8), replace=False)}
        for _ in range(7)
    ]
    for h, d in zip(host.score_batch(queries, 1000), device.score_batch(queries, 1000)):
        assert dict(h) == dict(d)


def test_dense_engine_matches_host():
    from improving_learned_index_tpu.search.dense_engine import DenseSearchEngine

    idx = _build()
    host = InvertedIndex(idx)
    dense = DenseSearchEngine(idx)
    queries = [
        {"apple", "banana"},
        {"cherry"},
        {"missing"},
        set(),
        {"apple", "banana", "cherry", "missing"},
    ]
    for h, d in zip(host.score_batch(queries, 3), dense.score_batch(queries, 3)):
        assert dict(h) == dict(d)


def test_dense_engine_large_random_exact():
    from improving_learned_index_tpu.search.dense_engine import DenseSearchEngine

    rng = np.random.default_rng(3)
    num_docs, vocab_size = 700, 80
    docs = []
    for _ in range(num_docs):
        terms = rng.choice(vocab_size, size=rng.integers(1, 25), replace=False)
        docs.append({f"t{t}": int(rng.integers(1, 255)) for t in terms})
    idx = InvertedIndexData.build(enumerate(docs), num_docs=num_docs)
    host = InvertedIndex(idx)
    dense = DenseSearchEngine(idx)
    queries = [
        {f"t{t}" for t in rng.choice(vocab_size, size=rng.integers(1, 9), replace=False)}
        for _ in range(23)
    ]
    for h, d in zip(host.score_batch(queries, 1000), dense.score_batch(queries, 1000)):
        assert dict(h) == dict(d)  # exact: bf16 int impacts, fp32 accumulation


def test_dense_engine_float_impacts_exact():
    """Float (unquantized) impacts keep an fp32 matrix -> exact sums."""
    from improving_learned_index_tpu.search.dense_engine import DenseSearchEngine

    rng = np.random.default_rng(4)
    per_doc = []
    for _ in range(50):
        terms = rng.choice(30, size=10, replace=False)
        per_doc.append([(f"t{t}", float(rng.random()) * 3) for t in terms])
    dense = DenseSearchEngine.from_term_impacts(iter(per_doc))
    queries = [{f"t{t}" for t in rng.choice(30, size=4, replace=False)} for _ in range(5)]
    got = dense.score_batch(queries, 50)
    for q, res in zip(queries, got):
        expected = {}
        for doc_id, impacts in enumerate(per_doc):
            s = np.float32(0)
            for t, v in impacts:
                if t in q:
                    s += np.float32(v)
            if s > 0:
                expected[doc_id] = float(s)
        assert set(dict(res)) == set(expected)
        for d_, s_ in res:
            assert abs(s_ - expected[d_]) < 1e-5


def test_device_engine_approx_topk():
    from improving_learned_index_tpu.core.config import SearchConfig

    rng = np.random.default_rng(5)
    num_docs = 2000
    docs = []
    for _ in range(num_docs):
        terms = rng.choice(60, size=10, replace=False)
        docs.append({f"t{t}": int(rng.integers(1, 255)) for t in terms})
    idx = InvertedIndexData.build(enumerate(docs), num_docs=num_docs)
    exact = DeviceSearchEngine(idx)
    approx = DeviceSearchEngine(idx, SearchConfig(approx_top_k=True))
    queries = [{f"t{t}" for t in rng.choice(60, size=5, replace=False)} for _ in range(6)]
    ex = exact.score_batch(queries, 100)
    ap = approx.score_batch(queries, 100)
    for e, a in zip(ex, ap):
        de, da = dict(e), dict(a)
        overlap = len(set(de) & set(da)) / max(len(de), 1)
        assert overlap >= 0.9  # high recall even approximate
        for doc in set(de) & set(da):
            assert de[doc] == da[doc]  # scores themselves exact


def test_inverted_zero_impact_byte_parity(tmp_path):
    """The reference creator writes int(val)==0 records to .dat (create.py:
    44-46); its reader stops at the first zero (inverted_index.py:49-51).
    Our save() must emit the zero records for byte parity, and scoring must
    ignore them."""
    import struct

    from improving_learned_index_tpu.index.inverted import InvertedIndexData
    from improving_learned_index_tpu.search.engine import InvertedIndex

    docs = [
        (0, {"apple": 7, "pear": 0}),
        (1, {"apple": 0, "pear": 3}),
        (2, {"apple": 2}),
    ]
    idx = InvertedIndexData.build(docs, num_docs=3)
    out = tmp_path / "zidx"
    idx.save(out)

    # Reference-written bytes for the same collection: vocab sorted
    # [apple, pear]; postings per term sorted impact desc -> apple:
    # (0,7),(2,2),(1,0); pear: (1,3),(0,0).
    expected = b"".join(
        struct.pack("<I", d) + struct.pack("B", v)
        for d, v in [(0, 7), (2, 2), (1, 0), (1, 3), (0, 0)]
    )
    assert (out / "inverted_index.dat").read_bytes() == expected
    locs = (out / "inverted_index.idx").read_bytes()
    assert struct.unpack("<4Q", locs) == (0, 15, 15, 25)

    # Zero records must not score: doc1 gets nothing from 'apple'.
    engine = InvertedIndex(idx)
    res = dict(engine.score_batch([{"apple"}], top_k=10)[0])
    assert res == {0: 7, 2: 2}

    # Round-trip: load() re-splits and save() reproduces identical bytes.
    idx2 = InvertedIndexData.load(out, num_docs=3)
    assert idx2.num_postings == 3  # scored postings only
    out2 = tmp_path / "zidx2"
    idx2.save(out2)
    assert (out2 / "inverted_index.dat").read_bytes() == expected
    assert (out2 / "inverted_index.idx").read_bytes() == locs
    res2 = dict(InvertedIndex(idx2).score_batch([{"apple", "pear"}], top_k=10)[0])
    assert res2 == {0: 7, 2: 2, 1: 3}


def test_quantize_file_empty_and_all_zero_inputs(tmp_path):
    """quantize_file must not divide by a 0.0 global max (empty forward
    index, or one whose scores are all zero) — quantize_store guards the
    identical edge with `or 1.0`."""
    empty = tmp_path / "empty.index"
    empty.write_text("")
    out = tmp_path / "empty_q.index"
    quantize_file(empty, out)
    assert out.read_text() == ""

    zeros = tmp_path / "zeros.index"
    zeros.write_text("apple: 0.0, banana: 0.0\n")
    out2 = tmp_path / "zeros_q.index"
    quantize_file(zeros, out2)
    # every impact quantizes to 0 and drops, like the reference
    assert out2.read_text().strip() == ""
