"""Hot-swap memory safety: build-time (term, doc) dedupe + staged engine swap.

Two corpus-scale device engines cannot co-reside in a 16GB HBM budget when
an index forces the fp32 dense path; round-4 verdict asked for (a) built
indexes that never carry duplicate (term, doc) postings (reference
create.py:41-45 semantics: one posting per pair) and (b) a swap that
releases the old engine before constructing the new one.
"""

import threading
import time

import numpy as np
import pytest

from improving_learned_index_tpu.index.inverted import InvertedIndexData
from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine
from improving_learned_index_tpu.serve.server import RetrievalServer, _PendingSwapEngine


# -- (a) build-time dedupe -------------------------------------------------

def test_build_dedupes_repeated_doc_id():
    # doc 0 fed twice with an overlapping term: impacts sum
    idx = InvertedIndexData.build(
        [(0, {"a": 3, "b": 1}), (1, {"a": 7}), (0, {"a": 4})]
    )
    docs, vals = idx.term_postings("a")
    assert docs.tolist() == [0, 1] and vals.tolist() == [7, 7]
    docs, vals = idx.term_postings("b")
    assert docs.tolist() == [0] and vals.tolist() == [1]


def test_build_dedupe_saturates_at_255():
    idx = InvertedIndexData.build([(0, {"a": 200}), (0, {"a": 200})])
    docs, vals = idx.term_postings("a")
    assert docs.tolist() == [0] and vals.tolist() == [255]


def test_build_without_duplicates_unchanged(tmp_path):
    stream = [(i, {"a": i + 1, "b": 255 - i}) for i in range(50)]
    idx = InvertedIndexData.build(stream)
    # same bytes as before the dedupe pass existed: well-formed input must
    # not pay (or be perturbed by) the pass
    idx.save(tmp_path / "x")
    idx2 = InvertedIndexData.build(stream)
    idx2._dedupe_sum_duplicates()  # idempotent on a clean index
    idx2.save(tmp_path / "y")
    assert (tmp_path / "x" / "inverted_index.dat").read_bytes() == (
        tmp_path / "y" / "inverted_index.dat"
    ).read_bytes()


def test_merge_overlapping_ranges_dedupe_sum():
    a = InvertedIndexData.build([(0, {"x": 10, "y": 5}), (1, {"x": 20})])
    b = InvertedIndexData.build([(0, {"x": 7})])  # same doc 0 as `a`
    m = InvertedIndexData.merge([a, b], doc_offsets=[0, 0])
    docs, vals = m.term_postings("x")
    assert sorted(zip(docs.tolist(), vals.tolist())) == [(0, 17), (1, 20)]
    docs, vals = m.term_postings("y")
    assert docs.tolist() == [0] and vals.tolist() == [5]
    # impact-descending order within the term is preserved after merge
    assert vals.tolist() == sorted(vals.tolist(), reverse=True)


def test_merge_disjoint_ranges_skip_dedupe():
    a = InvertedIndexData.build([(0, {"x": 10})])
    b = InvertedIndexData.build([(0, {"x": 7})])
    m = InvertedIndexData.merge([a, b])  # consecutive slices: disjoint
    docs, vals = m.term_postings("x")
    assert docs.tolist() == [0, 1] and vals.tolist() == [10, 7]


def test_dedupe_keeps_impact_desc_doc_asc_order():
    rng = np.random.default_rng(0)
    stream = []
    for d in range(40):
        stream.append((d, {f"t{i}": int(v) for i, v in
                           enumerate(rng.integers(1, 100, 8))}))
    # duplicate a third of the docs with fresh impacts
    for d in range(0, 40, 3):
        stream.append((d, {f"t{i}": int(v) for i, v in
                           enumerate(rng.integers(1, 100, 8))}))
    idx = InvertedIndexData.build(stream)
    for t in idx.vocab:
        docs, vals = idx.term_postings(t)
        assert len(set(docs.tolist())) == len(docs), "duplicate pair survived"
        order = np.lexsort((docs, vals.astype(np.int16) * -1))
        assert docs.tolist() == docs[order].tolist()
        assert vals.tolist() == vals[order].tolist()


def test_deduped_index_keeps_bf16_dense():
    """A built index (duplicates merged, lattice <= 255) must never trigger
    the engine's fp32 dense rebuild — the 2x-HBM hot-swap OOM class."""
    stream = [(d, {"hot": 100}) for d in range(64)]
    idx = InvertedIndexData.build(stream + stream)  # every doc duplicated
    eng = HybridSearchEngine(idx, heavy_min=2)
    assert eng.t_heavy == 1
    assert eng.dense.dtype == np.dtype("bfloat16")
    assert eng.score_batch([{"hot"}], 3)[0][0][1] == 200.0  # 100 + 100 summed


def test_raw_duplicate_index_still_exact_fp32():
    """Hand-built CSR with duplicates (bypassing build) keeps the fp32
    backstop: sums above 256 stay exact."""
    offsets = np.array([0, 4], np.int64)
    doc_ids = np.array([0, 0, 1, 1], np.uint32)
    impacts = np.array([200, 200, 9, 9], np.uint8)
    idx = InvertedIndexData(["w"], offsets, doc_ids, impacts, num_docs=2)
    eng = HybridSearchEngine(idx, heavy_min=2)
    assert eng.dense.dtype == np.dtype("float32")
    res = eng.score_batch([{"w"}], 2)[0]
    assert dict(res) == {0: 400.0, 1: 18.0}


# -- (b) staged swap -------------------------------------------------------

class _FakeEngine:
    def __init__(self, name, log=None):
        self.name = name
        self.log = log if log is not None else []
        self.released = False

    def release(self):
        self.log.append(f"release:{self.name}")
        self.released = True

    def score_batch(self, term_sets, top_k=None):
        if self.released:
            raise RuntimeError("released")
        return [[(0, float(len(self.name)))] for _ in term_sets]


def _server(engine):
    return RetrievalServer(engine, top_k=10, max_batch=4, max_wait_ms=1.0)


def test_staged_swap_releases_before_build():
    log = []
    old = _FakeEngine("old", log)
    srv = _server(old)

    def build_new():
        log.append("build")
        return _FakeEngine("fresh", log)

    out = srv.swap_engine_staged(build_new)
    assert log == ["release:old", "build"], log
    assert srv.engine is out and out.name == "fresh"


def test_staged_swap_fallback_serves_during_build():
    old = _FakeEngine("old")
    fallback = _FakeEngine("fb")
    srv = _server(old)
    gate = threading.Event()
    answered = []

    def build_new():
        # during the build window the fallback must answer
        answered.append(srv.engine.score_batch([{"q"}])[0][0][1])
        gate.wait(5)
        return _FakeEngine("fresh")

    srv.swap_engine_staged(build_new, fallback_engine=fallback)
    gate.set()
    assert answered == [2.0]  # len("fb")
    assert srv.engine.name == "fresh"
    assert old.released


def test_staged_swap_pending_blocks_then_delegates():
    srv = _server(_FakeEngine("old"))
    gate = threading.Event()
    results = []

    def build_new():
        gate.wait(5)
        return _FakeEngine("fresh")

    t = threading.Thread(
        target=lambda: srv.swap_engine_staged(build_new), daemon=True
    )
    t.start()
    # wait until the pending placeholder is installed
    for _ in range(100):
        if isinstance(srv.engine, _PendingSwapEngine):
            break
        time.sleep(0.01)
    pend = srv.engine
    q = threading.Thread(
        target=lambda: results.append(pend.score_batch([{"q"}])[0][0][1]),
        daemon=True,
    )
    q.start()
    time.sleep(0.05)
    assert results == []  # blocked: swap in progress
    gate.set()
    t.join(5)
    q.join(5)
    assert results == [5.0]  # len("fresh"): delegated to the new engine


def test_staged_swap_build_failure_keeps_fallback():
    old = _FakeEngine("old")
    fallback = _FakeEngine("fb")
    srv = _server(old)

    def build_new():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        srv.swap_engine_staged(build_new, fallback_engine=fallback)
    assert srv.engine is fallback  # never flipped to a broken engine
    assert old.released


def test_hybrid_release_frees_and_guards():
    idx = InvertedIndexData.build([(0, {"a": 5}), (1, {"a": 3, "b": 1})])
    eng = HybridSearchEngine(idx, heavy_min=2)
    assert eng.score_batch([{"a"}], 2)[0]
    eng.release()
    assert eng.dense is None and eng.doc_ids is None and eng.impacts is None
    with pytest.raises(RuntimeError, match="released"):
        eng.score_batch([{"a"}], 2)
    eng.release()  # idempotent
