"""Pallas blocked-TAAT scoring kernel: interpret-mode correctness on CPU
(the TPU path is exercised and measured on hardware; see module docstring)."""

import numpy as np
import pytest

from improving_learned_index_tpu.index import InvertedIndexData
from improving_learned_index_tpu.ops.pallas_scoring import (
    HEAVY_MIN,
    PallasBlockedEngine,
)
from improving_learned_index_tpu.search import InvertedIndex


def _mixed_index(rng, num_docs=9000, heavy_terms=3, tail_terms=27):
    tids, docs, vals = [], [], []
    for t in range(heavy_terms + tail_terms):
        n = HEAVY_MIN + 2000 if t < heavy_terms else 300
        d = rng.choice(num_docs, size=n, replace=False)
        tids.append(np.full(len(d), t))
        docs.append(d)
        vals.append(rng.integers(1, 255, len(d)))
    tid = np.concatenate(tids)
    doc = np.concatenate(docs)
    val = np.concatenate(vals)
    order = np.lexsort((-val, tid))
    nterms = heavy_terms + tail_terms
    counts = np.bincount(tid, minlength=nterms)
    offsets = np.zeros(nterms + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return InvertedIndexData(
        [f"t{t}" for t in range(nterms)], offsets, doc[order], val[order], num_docs=num_docs
    )


def test_hybrid_kernel_matches_host_interpret():
    rng = np.random.default_rng(0)
    idx = _mixed_index(rng)
    host = InvertedIndex(idx)
    eng = PallasBlockedEngine(idx, approx_top_k=False, interpret=True)
    queries = [
        {"t0", "t5"},  # heavy + tail
        {"t1", "t2", "t20"},  # two heavy + tail
        {"t7"},  # tail only
        {"t0"},  # heavy only
        {"unknown"},
        set(),
        {"t0", "t1", "t2"},  # all heavy
    ]
    h = host.score_batch(queries, idx.num_docs)
    p = eng.score_batch(queries, idx.num_docs)
    for a, b in zip(h, p):
        assert dict(a) == dict(b)


def test_kernel_block_boundaries_interpret():
    """Docs placed exactly at block edges score correctly."""
    from improving_learned_index_tpu.ops.pallas_scoring import BLK

    num_docs = 2 * BLK + 5
    edge_docs = [0, BLK - 1, BLK, 2 * BLK - 1, 2 * BLK, num_docs - 1]
    postings = {f"d{i}": {} for i in range(1)}
    rng = np.random.default_rng(1)
    # one heavy term covering the edges plus filler
    filler = rng.choice(num_docs, size=HEAVY_MIN, replace=False)
    all_docs = np.unique(np.concatenate([filler, np.asarray(edge_docs)]))
    doc_impacts = [{"heavy": 7} for _ in all_docs]
    idx = InvertedIndexData.build(
        ((int(d), {"heavy": 7}) for d in all_docs), num_docs=num_docs
    )
    host = InvertedIndex(idx)
    eng = PallasBlockedEngine(idx, approx_top_k=False, interpret=True)
    h = host.score_batch([{"heavy"}], num_docs)[0]
    p = eng.score_batch([{"heavy"}], num_docs)[0]
    assert dict(h) == dict(p)
    for d in edge_docs:
        assert dict(p).get(d) == 7.0
