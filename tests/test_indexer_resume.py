"""Crash-resume for the corpus encode stage: torn outputs repaired to the
last consistent document, encoding restarts there, final outputs identical
to an uninterrupted run (the reference indexer restarts from scratch)."""

import os

import numpy as np
import pytest

from improving_learned_index_tpu.core.config import EncoderConfig, IndexConfig
from improving_learned_index_tpu.index.impact_store import (
    ImpactStore,
    ImpactStoreWriter,
)
from improving_learned_index_tpu.index.indexer import (
    Indexer,
    _repair_text_forward,
    _truncate_text_forward,
)
from improving_learned_index_tpu.models import DeepImpact
from improving_learned_index_tpu.text import ImpactTokenizer, WordPieceVocab

DOCS = [
    [("alpha", 1.25), ("beta", 0.5)],
    [("beta", 2.0), ("gamma", 0.75), ("delta", 0.3)],
    [],
    [("epsilon", 3.125)],
    [("alpha", 0.9), ("zeta", 1.1)],
    [("eta", 0.2), ("theta", 0.4), ("gamma", 2.5)],
]


def _write_store(path, docs, flush_every=None):
    w = ImpactStoreWriter(path)
    for i, d in enumerate(docs):
        w.add_doc(d)
        if flush_every and (i + 1) % flush_every == 0:
            w._flush()
    return w


def test_writer_crash_repair_and_continue(tmp_path):
    crash = tmp_path / "crash.store"
    # flush after 4 docs, buffer 2 more, then "crash" (no close): the
    # buffered docs are lost, the flushed 4 survive
    w = _write_store(crash, DOCS, flush_every=4)
    del w  # abandoned without close -> no meta.json, buffered tail lost
    # torn final flush: garbage tail bytes on the values file
    with open(crash / "values.bin", "ab") as f:
        f.write(b"\x01\x02\x03")
    w2 = ImpactStoreWriter(crash, resume=True)
    assert w2.resume_docs == 4
    for d in DOCS[4:]:
        w2.add_doc(d)
    w2.close()

    clean = tmp_path / "clean.store"
    _write_store(clean, DOCS).close()
    a, b = ImpactStore(crash), ImpactStore(clean)
    assert a.num_docs == b.num_docs == len(DOCS)
    assert dict(a.iter_docs()) == dict(b.iter_docs())


def test_writer_repair_torn_vocab_line(tmp_path):
    crash = tmp_path / "v.store"
    w = _write_store(crash, DOCS[:4], flush_every=4)
    del w
    with open(crash / "vocab.txt", "a", encoding="utf-8") as f:
        f.write("tornter")  # no newline: torn mid-write
    w2 = ImpactStoreWriter(crash, resume=True)
    assert w2.resume_docs == 4
    assert "tornter" not in w2._tid
    w2.close()
    assert "tornter" not in ImpactStore(crash).vocab


def test_repair_text_forward(tmp_path):
    p = tmp_path / "fwd.txt"
    p.write_text("a: 1\nb: 2\nc: 3\nto")  # torn 4th line
    assert _repair_text_forward(p) == 3
    assert p.read_text() == "a: 1\nb: 2\nc: 3\n"
    _truncate_text_forward(p, 1)
    assert p.read_text() == "a: 1\n"
    assert _repair_text_forward(tmp_path / "missing.txt") == 0


def _tiny_indexer():
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "a fast auburn fox leaped across a sleepy canine",
        "neural networks learn sparse representations of text",
        "inverted indexes map terms to document postings",
        "impact scores quantize term importance into bytes",
        "tpu systolic arrays multiply matrices in bfloat16",
        "retrieval systems rank documents for user queries",
        "the dog sleeps while the fox runs through fields",
    ]
    vocab = WordPieceVocab.build(corpus, max_size=512)
    tok = ImpactTokenizer(vocab, max_length=32)
    model = DeepImpact(EncoderConfig.tiny(vocab_size=len(vocab)), tok, seed=0)
    return corpus, Indexer(model, IndexConfig(max_length=32, max_terms=32, model_batch_size=4))


def test_index_to_file_resume_end_to_end(tmp_path):
    corpus, indexer = _tiny_indexer()
    coll = tmp_path / "collection.tsv"
    coll.write_text("".join(f"{i}\t{t}\n" for i, t in enumerate(corpus)))

    # uninterrupted run = ground truth
    ref_text, ref_store = tmp_path / "ref.txt", tmp_path / "ref.store"
    n = indexer.index_to_file(coll, ref_text, store_path=ref_store)
    assert n == len(corpus)

    # simulate a crash: text got 5 complete lines + a torn 6th; the store
    # flushed only 3 docs and its values file has a torn tail
    crash_text, crash_store = tmp_path / "c.txt", tmp_path / "c.store"
    ref_lines = ref_text.read_text().splitlines(keepends=True)
    crash_text.write_text("".join(ref_lines[:5]) + ref_lines[5][:7])
    w = ImpactStoreWriter(crash_store)
    ref = ImpactStore(ref_store)
    for d in range(3):
        ids, vals = ref.doc(d)
        w.add_doc([(ref.vocab[t], v) for t, v in zip(ids.tolist(), vals.tolist())])
    w._flush()
    del w
    with open(crash_store / "values.bin", "ab") as f:
        f.write(b"\xff" * 5)

    # resume: syncs both outputs to doc 3, re-encodes 3..8 only
    n = indexer.index_to_file(coll, crash_text, store_path=crash_store, resume=True)
    assert n == len(corpus)
    assert crash_text.read_bytes() == ref_text.read_bytes()
    a, b = ImpactStore(crash_store), ImpactStore(ref_store)
    assert dict(a.iter_docs()) == dict(b.iter_docs())


def test_resume_on_complete_output_is_noop(tmp_path):
    corpus, indexer = _tiny_indexer()
    coll = tmp_path / "collection.tsv"
    coll.write_text("".join(f"{i}\t{t}\n" for i, t in enumerate(corpus)))
    text, store = tmp_path / "f.txt", tmp_path / "f.store"
    indexer.index_to_file(coll, text, store_path=store)
    before = text.read_bytes()
    n = indexer.index_to_file(coll, text, store_path=store, resume=True)
    assert n == len(corpus)
    assert text.read_bytes() == before
    assert ImpactStore(store).num_docs == len(corpus)


def test_producer_error_surfaces_instead_of_hanging():
    """An exception while streaming/tokenizing documents must reach the
    consumer: the producer thread used to die without enqueueing its
    sentinel, deadlocking a multi-hour encode on queue.get() forever."""
    corpus, indexer = _tiny_indexer()

    def poisoned():
        yield corpus[0]
        yield corpus[1]
        raise RuntimeError("stream broke mid-collection")

    with pytest.raises(RuntimeError, match="stream broke"):
        list(indexer.encode_documents(poisoned()))

    # packed pipeline has its own producer: same contract
    import dataclasses

    packed = Indexer(
        indexer.model,
        dataclasses.replace(indexer.config, pack_sequences=True),
    )
    with pytest.raises(RuntimeError, match="stream broke"):
        list(packed.encode_documents(poisoned()))


def test_store_path_requires_round3(tmp_path):
    import dataclasses

    corpus, indexer = _tiny_indexer()
    coll = tmp_path / "c.tsv"
    coll.write_text("".join(f"{i}\t{d}\n" for i, d in enumerate(corpus)))
    bad = Indexer(indexer.model, dataclasses.replace(indexer.config, round_decimals=2))
    with pytest.raises(ValueError, match="round_decimals=3"):
        bad.index_to_file(coll, store_path=tmp_path / "s")
