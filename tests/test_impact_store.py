"""Binary impact-store fast path: byte-parity with the reference text
pipeline at every stage (store <-> text forward index, array quantize vs
quantize_file, final .dat/.idx/vocab from either path)."""

import random

import numpy as np
import pytest

from improving_learned_index_tpu.index import InvertedIndexData, format_line, quantize_file
from improving_learned_index_tpu.index.impact_store import (
    ImpactStore,
    ImpactStoreWriter,
    is_impact_store,
    quantize_store,
    store_from_forward_text,
    store_to_forward_text,
)

TERMS = ["apple", "banana", "cherry", "négociation", "x|y", "##ing", ":", "zz"]


def _rand_docs(n_docs=40, seed=0):
    """Per-doc unique (term, float impact) lists, incl. an empty doc and a
    term whose every impact quantizes to zero (vocab-compaction case)."""
    rng = random.Random(seed)
    docs = []
    for d in range(n_docs):
        if d == 7:
            docs.append([])  # empty document line
            continue
        terms = rng.sample(TERMS, rng.randint(1, len(TERMS) - 1))
        doc = [(t, rng.uniform(0.001, 4.0)) for t in terms if t != "zz"]
        if "zz" in terms:
            doc.append(("zz", rng.uniform(1e-5, 1e-4)))  # always -> q == 0
        docs.append(doc)
    return docs


def _write_both(tmp_path, docs):
    """Write the same docs the way Indexer.index_to_file does: text via
    format_line, binary via ImpactStoreWriter."""
    text = tmp_path / "fwd.txt"
    with open(text, "w", encoding="utf-8") as f, ImpactStoreWriter(
        tmp_path / "fwd.store"
    ) as w:
        for doc in docs:
            f.write(format_line(doc) + "\n")
            w.add_doc(doc)
    return text, tmp_path / "fwd.store"


def test_exact_round3_matches_python_round():
    from improving_learned_index_tpu.index.impact_store import _exact_round3

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.gamma(2.0, 0.35, size=200_000),
        rng.uniform(0, 100, size=200_000),
        # adversarial: exact and near half-boundaries at 3 decimals
        np.array([0.0005, 0.0015, 0.0025, 1.0005, 2.6755, 0.57350001,
                  0.5734999999, 12.3455, 0.1235, 0.0, 255.0004999]),
        np.float64(np.random.default_rng(1).gamma(2, 0.35, 50_000).astype(np.float32)),
    ])
    got = _exact_round3(vals)
    for v, g in zip(vals.tolist(), got.tolist()):
        assert g == round(v, 3), (v, g, round(v, 3))


def test_add_doc_row_equals_add_doc(tmp_path):
    rng = np.random.default_rng(2)
    terms = [f"t{i}" for i in range(40)]
    rows = [rng.gamma(2.0, 0.35, size=40).astype(np.float32) for _ in range(50)]
    a = ImpactStoreWriter(tmp_path / "a")
    b = ImpactStoreWriter(tmp_path / "b")
    for row in rows:
        a.add_doc([(t, float(v)) for t, v in zip(terms, row)])
        b.add_doc_row(terms, row)
    a.close(); b.close()
    for f in ("counts.bin", "term_ids.bin", "values.bin", "vocab.txt"):
        assert (tmp_path / "a" / f).read_bytes() == (tmp_path / "b" / f).read_bytes(), f


def test_store_roundtrip_reader(tmp_path):
    docs = _rand_docs()
    _, store_path = _write_both(tmp_path, docs)
    assert is_impact_store(store_path)
    store = ImpactStore(store_path)
    assert store.num_docs == len(docs)
    got = dict(store.iter_docs())
    for d, doc in enumerate(docs):
        assert got[d] == {t: round(float(v), 3) for t, v in doc}


def test_store_to_text_matches_format_line(tmp_path):
    docs = _rand_docs(seed=1)
    text, store_path = _write_both(tmp_path, docs)
    out = tmp_path / "from_store.txt"
    store_to_forward_text(store_path, out)
    assert out.read_bytes() == text.read_bytes()


def test_quantize_store_byte_parity_with_quantize_file(tmp_path):
    docs = _rand_docs(seed=2)
    text, store_path = _write_both(tmp_path, docs)
    qtext = tmp_path / "fwd.q.txt"
    max_text = quantize_file(text, qtext)
    qstore = tmp_path / "fwd.q.store"
    max_store = quantize_store(store_path, qstore)
    assert max_store == max_text
    out = tmp_path / "q_from_store.txt"
    store_to_forward_text(qstore, out)
    assert out.read_bytes() == qtext.read_bytes()


def test_quantize_store_chunked_matches_monolithic(tmp_path):
    docs = _rand_docs(seed=7)
    _, store_path = _write_both(tmp_path, docs)
    quantize_store(store_path, tmp_path / "q_big")
    quantize_store(store_path, tmp_path / "q_small", doc_block=3)
    for f in ("counts.bin", "term_ids.bin", "values.bin", "meta.json", "vocab.txt"):
        assert (tmp_path / "q_small" / f).read_bytes() == (tmp_path / "q_big" / f).read_bytes(), f


def test_legacy_f64_store_reads_and_quantizes_identically(tmp_path):
    """v1 (float64 values) stores remain readable; the whole downstream
    pipeline produces the same bytes as from the current milli_i32 format."""
    import json

    docs = _rand_docs(seed=11)
    _, store_path = _write_both(tmp_path, docs)
    v2 = ImpactStore(store_path)
    assert v2.values_format == "milli_i32"
    leg = tmp_path / "legacy.store"
    leg.mkdir()
    np.asarray(v2.counts).tofile(leg / "counts.bin")
    np.asarray(v2.term_ids).tofile(leg / "term_ids.bin")
    v2.value_block(0, v2.num_postings).tofile(leg / "values.bin")
    (leg / "vocab.txt").write_bytes((store_path / "vocab.txt").read_bytes())
    json.dump(
        {"version": 1, "num_docs": v2.num_docs, "num_postings": v2.num_postings,
         "quantized": False, "bits": 8, "max_val": None},
        open(leg / "meta.json", "w"),
    )
    lst = ImpactStore(leg)
    assert lst.values_format == "f64"
    assert dict(lst.iter_docs()) == dict(v2.iter_docs())
    quantize_store(store_path, tmp_path / "q_v2")
    quantize_store(leg, tmp_path / "q_leg")
    for f in ("counts.bin", "term_ids.bin", "values.bin"):
        assert (tmp_path / "q_leg" / f).read_bytes() == (tmp_path / "q_v2" / f).read_bytes(), f


def test_final_index_byte_parity(tmp_path):
    docs = _rand_docs(seed=3)
    text, store_path = _write_both(tmp_path, docs)
    qtext = tmp_path / "fwd.q.txt"
    quantize_file(text, qtext)
    qstore = tmp_path / "fwd.q.store"
    quantize_store(store_path, qstore)

    idx_text = InvertedIndexData.from_forward_index(qtext)
    idx_store = InvertedIndexData.from_impact_store(qstore)
    # "zz" only ever quantizes to 0 -> absent from both vocabs
    assert "zz" not in idx_text.term_to_id
    assert idx_text.vocab == idx_store.vocab

    out_text, out_store = tmp_path / "inv_text", tmp_path / "inv_store"
    idx_text.save(out_text)
    idx_store.save(out_store)
    for name in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (out_store / name).read_bytes() == (out_text / name).read_bytes(), name


def test_invert_requires_quantized_store(tmp_path):
    _, store_path = _write_both(tmp_path, _rand_docs(seed=4))
    with pytest.raises(ValueError, match="quantized"):
        InvertedIndexData.from_impact_store(store_path)


def test_store_from_forward_text_converter(tmp_path):
    docs = _rand_docs(seed=5)
    text, _ = _write_both(tmp_path, docs)
    store = store_from_forward_text(text, tmp_path / "conv.store")
    out = tmp_path / "conv_back.txt"
    store_to_forward_text(store, out)
    assert out.read_bytes() == text.read_bytes()


def test_anserini_export_from_store_matches_text(tmp_path):
    from improving_learned_index_tpu.index.anserini import convert_to_anserini

    docs = _rand_docs(seed=9)
    text, store_path = _write_both(tmp_path, docs)
    n1 = convert_to_anserini(text, tmp_path / "a.jsonl")
    n2 = convert_to_anserini(store_path, tmp_path / "b.jsonl")
    assert n1 == n2 == len(docs)
    assert (tmp_path / "b.jsonl").read_bytes() == (tmp_path / "a.jsonl").read_bytes()


def test_cli_pipeline_with_store(tmp_path):
    """quantize + invert CLIs accept store directories and produce the same
    final index as the text CLIs."""
    from improving_learned_index_tpu.cli import invert as invert_cli
    from improving_learned_index_tpu.cli import quantize as quantize_cli

    docs = _rand_docs(seed=6)
    text, store_path = _write_both(tmp_path, docs)

    qtext = tmp_path / "q.txt"
    qstore = tmp_path / "q.store"
    parity_text = tmp_path / "q_parity.txt"
    assert quantize_cli.main(["-i", str(text), "-o", str(qtext)]) == 0
    assert (
        quantize_cli.main(
            ["-i", str(store_path), "-o", str(qstore), "--text_out", str(parity_text)]
        )
        == 0
    )
    assert parity_text.read_bytes() == qtext.read_bytes()

    inv_text, inv_store = tmp_path / "inv_t", tmp_path / "inv_s"
    assert invert_cli.main(["-i", str(qtext), "-o", str(inv_text)]) == 0
    assert invert_cli.main(["-i", str(qstore), "-o", str(inv_store)]) == 0
    for name in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (inv_store / name).read_bytes() == (inv_text / name).read_bytes(), name


class TestRobustness:
    def test_empty_store_roundtrip(self, tmp_path):
        """A zero-posting store (empty collection, or all impacts zeroed)
        must open, quantize, and export — np.memmap refuses empty files,
        so the loader substitutes empty arrays."""
        with ImpactStoreWriter(tmp_path / "empty"):
            pass
        store = ImpactStore(tmp_path / "empty")
        assert store.num_docs == 0 and store.num_postings == 0
        quantize_store(tmp_path / "empty", tmp_path / "empty_q")
        q = ImpactStore(tmp_path / "empty_q")
        assert q.quantized and q.num_postings == 0
        store_to_forward_text(q, tmp_path / "empty.txt")
        assert (tmp_path / "empty.txt").read_text() == ""

    def test_empty_docs_only_store_opens(self, tmp_path):
        with ImpactStoreWriter(tmp_path / "zdocs") as w:
            w.add_doc([])
            w.add_doc([])
        store = ImpactStore(tmp_path / "zdocs")
        assert store.num_docs == 2 and store.num_postings == 0

    def test_quantize_store_clamps_instead_of_wrapping(self, tmp_path):
        """max_val below the true max (stale/per-shard) must clamp to 255:
        a float->uint8 cast would wrap 300 -> 44, inverting the ranking of
        the LARGEST impacts."""
        with ImpactStoreWriter(tmp_path / "s") as w:
            w.add_doc([("a", 3.0), ("b", 1.0)])
        quantize_store(tmp_path / "s", tmp_path / "sq", max_val=1.0)
        q = ImpactStore(tmp_path / "sq")
        vals = np.asarray(q.values)
        assert vals.max() == 255  # clamped, not wrapped
        assert vals.min() > 0

    def test_add_doc_row_rejects_nan_inf(self, tmp_path):
        with ImpactStoreWriter(tmp_path / "nan") as w:
            with pytest.raises(ValueError, match="int32-milli"):
                w.add_doc_row(["a", "b"], np.array([1.0, float("nan")]))
            with pytest.raises(ValueError, match="int32-milli"):
                w.add_doc_row(["a"], np.array([float("inf")]))
            with pytest.raises(ValueError, match="int32-milli"):
                w.add_doc_row(["a"], np.array([3.0e9]))


def test_wide_vocab_streaming_invert_matches_build(tmp_path):
    """from_impact_store's streaming two-pass branch (vocab > 131072, the
    combined-key bucket table too big) must equal InvertedIndexData.build
    over the same postings, posting for posting."""
    import numpy as np

    rng = np.random.default_rng(7)
    nvocab, per_doc = 140_000, 100
    vocab = [f"t{i:06d}" for i in range(nvocab)]
    docs = []
    with ImpactStoreWriter(tmp_path / "wide", quantized=True) as w:
        # first sweep covers EVERY term once (the store vocab only holds
        # seen terms, and the wide branch needs > 131072 of them), then
        # random docs add duplicate (term, impact) pairs for tie coverage
        for d in range(nvocab // per_doc):
            tids = np.arange(d * per_doc, (d + 1) * per_doc)
            vals = rng.integers(1, 256, per_doc)
            w.add_doc([(vocab[t], int(v)) for t, v in zip(tids, vals)])
            docs.append((d, {vocab[t]: int(v) for t, v in zip(tids, vals)}))
        for d in range(nvocab // per_doc, nvocab // per_doc + 200):
            tids = rng.choice(nvocab, size=per_doc, replace=False)
            vals = rng.integers(1, 4, per_doc)  # heavy impact ties
            w.add_doc([(vocab[t], int(v)) for t, v in zip(tids, vals)])
            docs.append((d, {vocab[t]: int(v) for t, v in zip(tids, vals)}))
    n_docs = len(docs)
    got = InvertedIndexData.from_impact_store(tmp_path / "wide")
    want = InvertedIndexData.build(iter(docs), num_docs=n_docs)
    assert got.vocab == want.vocab
    np.testing.assert_array_equal(got.offsets, want.offsets)
    np.testing.assert_array_equal(got.doc_ids, want.doc_ids)
    np.testing.assert_array_equal(got.impacts, want.impacts)
