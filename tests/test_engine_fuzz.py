"""Cross-engine property fuzz: host / device / hybrid engines must agree
exactly on randomized quantized indexes across corpus shapes — single-doc,
all-heavy, all-tail, k larger than the positives, duplicate query terms,
and skewed posting-length distributions.

Complements the targeted tests in test_hybrid_engine.py / test_edge_cases.py
with breadth: each seed draws a different world shape.  Agreement is on the
exact (doc, score) map of the top-k plus the reference boundary-tie
semantics (same k-th-score census)."""

import numpy as np
import pytest

from improving_learned_index_tpu.search.device_engine import DeviceSearchEngine
from improving_learned_index_tpu.search.engine import InvertedIndex
from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine


class _CSR:
    pass


def _random_world(rng):
    num_docs = int(rng.choice([1, 3, 50, 700, 4096, 20000]))
    n_terms = int(rng.integers(2, 40))
    offsets = [0]
    doc_ids, impacts = [], []
    for _ in range(n_terms):
        style = rng.random()
        if style < 0.3:  # heavy-ish list
            n_post = int(rng.integers(1, max(2, num_docs)))
        elif style < 0.6:  # short tail
            n_post = int(rng.integers(1, 8))
        else:
            n_post = int(rng.integers(1, min(200, max(2, num_docs))))
        docs = np.unique(rng.integers(0, num_docs, n_post))
        order = np.argsort(-rng.integers(1, 256, len(docs)), kind="stable")
        vals = rng.integers(1, 256, len(docs)).astype(np.uint8)
        # impact-descending within the term, like the on-disk format
        srt = np.argsort(-vals.astype(np.int64), kind="stable")
        doc_ids.append(docs[srt].astype(np.uint32))
        impacts.append(vals[srt])
        offsets.append(offsets[-1] + len(docs))
        del order
    idx = _CSR()
    idx.term_to_id = {f"t{i}": i for i in range(n_terms)}
    idx.vocab = list(idx.term_to_id)
    idx.offsets = np.asarray(offsets, np.int64)
    idx.doc_ids = np.concatenate(doc_ids)
    idx.impacts = np.concatenate(impacts)
    idx.num_docs = num_docs
    return idx


@pytest.mark.parametrize("seed", range(6))
def test_engines_agree_on_random_worlds(seed):
    rng = np.random.default_rng(100 + seed)
    idx = _random_world(rng)
    host = InvertedIndex(idx)
    dev = DeviceSearchEngine(idx)
    heavy_min = int(rng.choice([1, 4, 64, 1024]))
    hyb = HybridSearchEngine(idx, heavy_min=heavy_min)

    terms = idx.vocab
    queries = []
    for _ in range(7):
        qn = int(rng.integers(1, 6))
        q = {terms[i] for i in rng.integers(0, len(terms), qn)}
        if rng.random() < 0.3:
            q.add("unknown_term")
        queries.append(q)
    queries.append(set())
    k = int(rng.choice([1, 3, 10, 1000]))

    h = host.score_batch(queries, k)
    d = dev.score_batch(queries, k)
    y = hyb.score_batch(queries, k)
    for qi, (a, b, c) in enumerate(zip(h, d, y)):
        da, db, dc = dict(a), dict(b), dict(c)
        # scores of every returned doc must match the host engine exactly
        for dd in db:
            assert db[dd] == da.get(dd, None), (seed, qi, dd)
        for dd in dc:
            assert dc[dd] == da.get(dd, None), (seed, qi, dd)
        # same result-set size and same k-th-score census (ties may pick
        # different doc ids only AT the boundary value, like the reference)
        assert len(db) == len(da) and len(dc) == len(da), (seed, qi)
        if da:
            kth = min(da.values())
            assert sum(v > kth for v in db.values()) == sum(
                v > kth for v in da.values()
            )
            assert sum(v > kth for v in dc.values()) == sum(
                v > kth for v in da.values()
            )
