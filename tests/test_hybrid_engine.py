"""HybridSearchEngine (dense heavy rows + tail scatter + exact integer
top-k): exact agreement with the host engine, including ties, heavy/tail
splits, unknown terms, and approx mode sanity."""

import numpy as np
import pytest

from improving_learned_index_tpu.core.config import SearchConfig
from improving_learned_index_tpu.index.inverted import InvertedIndexData
from improving_learned_index_tpu.ops.exact_topk import exact_topk_integer
from improving_learned_index_tpu.search.engine import InvertedIndex
from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine


def _random_index(rng, num_docs=500, vocab_size=60, postings=6000, zipf=True):
    """Zipf-ish synthetic quantized index."""
    if zipf:
        p = 1.0 / np.arange(1, vocab_size + 1)
        p /= p.sum()
        tids = rng.choice(vocab_size, size=postings, p=p)
    else:
        tids = rng.integers(0, vocab_size, postings)
    docs = rng.integers(0, num_docs, postings)
    vals = rng.integers(1, 256, postings)
    per_doc = {}
    for t, d, v in zip(tids, docs, vals):
        per_doc.setdefault(int(d), {})[f"t{t}"] = int(v)
    return InvertedIndexData.build(sorted(per_doc.items()), num_docs=num_docs)


def _assert_topk_equivalent(ours, theirs, k):
    """Same scores at every rank; same doc set above the k-th score (the
    boundary-tie doc choice is implementation-defined, as in the reference
    heapq)."""
    assert len(ours) <= k and len(theirs) <= k
    assert [s for _, s in ours] == [s for _, s in theirs]
    if not ours:
        return
    boundary = ours[-1][1]
    assert {d for d, s in ours if s > boundary} == {d for d, s in theirs if s > boundary}
    assert dict(theirs) .keys() >= {d for d, s in ours if s > boundary}


@pytest.mark.parametrize("heavy_min", [1, 64, 10**9])
def test_hybrid_matches_host(heavy_min):
    """heavy_min=1: everything dense; 10**9: everything tail; 64: mixed."""
    rng = np.random.default_rng(7)
    index = _random_index(rng)
    host = InvertedIndex(index)
    hybrid = HybridSearchEngine(index, heavy_min=heavy_min)
    queries = [
        {"t0", "t1", "t5"},
        {"t2", "t40", "unknown-term"},
        {f"t{i}" for i in range(20)},
        set(),
        {"unknown-only"},
    ]
    k = 50
    h = host.score_batch(queries, k)
    y = hybrid.score_batch(queries, k)
    for ours, theirs in zip(y, h):
        _assert_topk_equivalent(ours, theirs, k)


def test_hybrid_full_depth_exact():
    """k >= num_docs: the full score vectors must match exactly."""
    rng = np.random.default_rng(3)
    index = _random_index(rng, num_docs=150, vocab_size=30, postings=2500)
    host = InvertedIndex(index)
    hybrid = HybridSearchEngine(index, heavy_min=32)
    queries = [{"t0", "t1", "t2", "t3"}, {"t4", "t9"}]
    h = host.score_batch(queries, 150)
    y = hybrid.score_batch(queries, 150)
    for ours, theirs in zip(y, h):
        assert dict(ours) == dict(theirs)


def test_hybrid_dense_budget_caps_rows():
    rng = np.random.default_rng(1)
    index = _random_index(rng, num_docs=300, vocab_size=40, postings=4000)
    # Budget for only 2 dense rows: the 2 longest lists go dense, rest tail.
    eng = HybridSearchEngine(index, heavy_min=1, dense_budget_bytes=2 * 2 * 384)
    assert eng.t_heavy == 2
    host = InvertedIndex(index)
    queries = [{f"t{i}" for i in range(10)}]
    _assert_topk_equivalent(
        eng.score_batch(queries, 20)[0], host.score_batch(queries, 20)[0], 20
    )


def test_hybrid_approx_mode_runs():
    rng = np.random.default_rng(5)
    index = _random_index(rng)
    eng = HybridSearchEngine(index, config=SearchConfig(approx_top_k=True))
    out = eng.score_batch([{"t0", "t1"}], 10)[0]
    assert all(s > 0 for _, s in out)


def test_exact_topk_integer_vs_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for _ in range(4):
        scores = rng.integers(0, 31, (6, 3000)).astype(np.float32)  # heavy ties
        scores[2, :] = 0.0
        v, i = exact_topk_integer(jnp.asarray(scores), 100)
        v, i = np.asarray(v), np.asarray(i)
        ref = -np.sort(-scores, axis=1)[:, :100]
        np.testing.assert_array_equal(v, np.where(ref > 0, ref, 0))
        for q in range(6):
            sel = v[q] > 0
            np.testing.assert_array_equal(scores[q, i[q][sel]], v[q][sel])
            assert len(set(i[q][sel].tolist())) == sel.sum()


def test_exact_topk_integer_shape_sweep():
    """Randomized sweep over awkward shapes: n below/at/above one rank
    block, k >= n, heavy ties, all-zero rows, single row."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    cases = [
        (1, 50, 10), (3, 255, 300), (2, 256, 256), (5, 257, 100),
        (4, 1000, 1000), (8, 5000, 17), (2, 513, 512),
    ]
    for q, n, k in cases:
        scores = np.where(
            rng.random((q, n)) < 0.5, rng.integers(0, 9, (q, n)), 0
        ).astype(np.float32)  # few distinct values -> massive ties
        if q > 1:
            scores[1, :] = 0.0
        v, i = exact_topk_integer(jnp.asarray(scores), k)
        v, i = np.asarray(v), np.asarray(i)
        kk = min(k, n)
        ref = -np.sort(-scores, axis=1)[:, :kk]
        np.testing.assert_array_equal(v, np.where(ref > 0, ref, 0), err_msg=str((q, n, k)))
        for row in range(q):
            sel = v[row] > 0
            np.testing.assert_array_equal(scores[row, i[row][sel]], v[row][sel])
            assert len(set(i[row][sel].tolist())) == sel.sum()


def test_hybrid_duplicate_postings_accumulate():
    """Duplicate (term, doc) postings must sum in the dense rows exactly like
    the host/scatter paths (regression: dense build once used assignment)."""
    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    vocab = ["a", "b"]
    offsets = np.array([0, 3, 4], dtype=np.int64)
    doc_ids = np.array([0, 0, 1, 0], dtype=np.uint32)  # term 'a' lists doc0 twice
    impacts = np.array([5, 4, 3, 2], dtype=np.uint8)
    index = InvertedIndexData(vocab, offsets, doc_ids, impacts, num_docs=2)
    host = InvertedIndex(index)
    hybrid = HybridSearchEngine(index, heavy_min=1)  # all dense
    q = [{"a", "b"}]
    assert dict(hybrid.score_batch(q, 2)[0]) == dict(host.score_batch(q, 2)[0]) == {0: 11.0, 1: 3.0}


def test_hybrid_tiled_tail_scatter_large_corpus(monkeypatch):
    """Corpora past the tiled-scatter threshold take the doc-sorted tiled
    tail path (_apply_tail_tiled); results must match the host engine
    exactly, including docs on both sides of tile boundaries.  The 4M-doc
    production threshold is lowered so the CPU test stays small."""
    from improving_learned_index_tpu.index.inverted import InvertedIndexData
    from improving_learned_index_tpu.search import hybrid_engine
    from improving_learned_index_tpu.search.hybrid_engine import _SCATTER_TILE

    monkeypatch.setattr(hybrid_engine, "_TILED_MIN_DOCS", _SCATTER_TILE + 1)
    monkeypatch.setattr(hybrid_engine, "_PALLAS_MIN_DOCS", _SCATTER_TILE + 1)
    num_docs = _SCATTER_TILE + 5000  # 2 tiles
    rng = np.random.default_rng(11)
    per_doc = {}
    docs = np.concatenate([
        rng.integers(0, num_docs, 4000),
        # force hits at the tile boundary and the last doc
        np.array([_SCATTER_TILE - 1, _SCATTER_TILE, num_docs - 1]),
    ])
    for t, dcc, v in zip(rng.integers(0, 40, len(docs)), docs, rng.integers(1, 256, len(docs))):
        per_doc.setdefault(int(dcc), {})[f"t{t}"] = int(v)
    index = InvertedIndexData.build(sorted(per_doc.items()), num_docs=num_docs)
    host = InvertedIndex(index)
    # heavy_min large => everything goes through the tail scatter
    eng = HybridSearchEngine(index, heavy_min=10_000)
    assert eng.n_pad % _SCATTER_TILE == 0 and eng.n_pad > _SCATTER_TILE
    queries = [{f"t{i}" for i in range(8)}, {f"t{i}" for i in range(20, 25)}]
    for a, b in zip(host.score_batch(queries, 50), eng.score_batch(queries, 50)):
        assert dict(a) == dict(b)


def test_hybrid_duplicate_postings_past_bf16_range():
    """If accumulated impacts exceed 256 (not exact in bf16), the on-device
    dense build must fall back to fp32 rows and stay exact."""
    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    vocab = ["a"]
    offsets = np.array([0, 3], dtype=np.int64)
    doc_ids = np.array([0, 0, 1], dtype=np.uint32)  # doc0 twice: 200+200=400
    impacts = np.array([200, 200, 3], dtype=np.uint8)
    index = InvertedIndexData(vocab, offsets, doc_ids, impacts, num_docs=2)
    hybrid = HybridSearchEngine(index, heavy_min=1)
    import jax.numpy as jnp

    assert hybrid.dense.dtype == jnp.float32
    assert dict(hybrid.score_batch([{"a"}], 2)[0]) == {0: 400.0, 1: 3.0}


def test_scoring_matmuls_pin_highest_precision():
    """The fp32 dense path is only exact on TPU with precision=HIGHEST: the
    default matmul precision truncates fp32 operands to bf16 on the MXU
    (measured on v5e: a 257.0 dense cell scores as 256.0, an off-by-one the
    CPU test backend cannot reproduce).  Pin the precision in the lowered
    jaxprs of every scoring matmul so a regression is caught on CPU."""
    import improving_learned_index_tpu.search.dense_engine as de
    import improving_learned_index_tpu.search.hybrid_engine as he

    rng = np.random.default_rng(1)
    index = _random_index(rng, num_docs=300, vocab_size=30, postings=3000)
    eng = HybridSearchEngine(index, heavy_min=48)
    w, starts, lengths, rows, _, _, _ = eng._tables([{"t1", "t2"}])
    import jax
    import jax.numpy as jnp

    jaxpr = jax.make_jaxpr(
        lambda *a: he._score_and_topk(*a, 300, 10, True, True, False, True, False)
    )(
        eng.dense, jnp.asarray(w.astype(jnp.bfloat16)), eng.doc_ids, eng.impacts,
        jnp.asarray(starts), jnp.asarray(lengths), jnp.asarray(rows),
        jnp.zeros(1, jnp.int32),
    )
    assert "HIGHEST" in str(jaxpr)

    mat = jnp.zeros((5, 8), jnp.float32)
    jaxpr2 = jax.make_jaxpr(lambda m, t, v: de._dense_scores(m, t, v, 8))(
        mat, jnp.zeros((2, 3), jnp.int32), jnp.ones((2, 3), bool)
    )
    assert "HIGHEST" in str(jaxpr2)


def test_hybrid_stream_pipelined():
    rng = np.random.default_rng(9)
    index = _random_index(rng, num_docs=300, vocab_size=30, postings=3000)
    eng = HybridSearchEngine(index, heavy_min=48)
    batch = [{"t0", "t1"}, {"t2", "t3", "t4"}]
    sync = eng.score_batch(batch, 15)
    outs = list(eng.score_stream([batch] * 4, top_k=15, depth=2))
    assert len(outs) == 4
    for out in outs:
        for a, b in zip(out, sync):
            assert a == b


def test_hybrid_float_exact_matches_device():
    """Float-impact mode (integer_scores=False): HybridSearchEngine built
    via from_term_impacts agrees with DeviceSearchEngine.from_term_impacts
    on the same float impacts (the SparseSearch in-memory semantics)."""
    from improving_learned_index_tpu.search.device_engine import DeviceSearchEngine

    rng = np.random.default_rng(11)
    docs = []
    for _ in range(300):
        n_terms = rng.integers(1, 12)
        docs.append(
            [(f"t{rng.integers(0, 50)}", float(rng.uniform(-0.5, 4.0)))
             for _ in range(n_terms)]
        )
    dev = DeviceSearchEngine.from_term_impacts(iter(docs))
    hyb = HybridSearchEngine.from_term_impacts(iter(docs), heavy_min=8)
    assert hyb.integer_scores is False
    queries = [{f"t{i}", f"t{i+1}", "unknown"} for i in range(0, 40, 3)]
    ours = hyb.score_batch(queries, 25)
    theirs = dev.score_batch(queries, 25)
    for o, t in zip(ours, theirs):
        o_scores = [round(s, 4) for _, s in o]
        t_scores = [round(float(s), 4) for _, s in t]
        assert o_scores == t_scores
        assert dict(o).keys() == {int(d) for d, _ in t} or o_scores[-1:] == t_scores[-1:]


def test_choose_engine_thresholds():
    from improving_learned_index_tpu.search.select import (
        HYBRID_MIN_DOCS,
        HYBRID_MIN_DOCS_QUANTIZED,
        choose_engine,
    )

    # quantized (integer-score) indexes: hybrid from the smallest measured
    # sweep point (CROSSOVER.json: hybrid wins 772 vs 561 q/s at 4k docs)
    assert choose_engine(100) == "device"
    assert choose_engine(HYBRID_MIN_DOCS_QUANTIZED - 1) == "device"
    assert choose_engine(HYBRID_MIN_DOCS_QUANTIZED) == "hybrid"
    assert choose_engine(10**7) == "hybrid"
    # float-impact corpora (SparseSearch) keep the eval-scale device default
    assert choose_engine(10_000, integer_scores=False) == "device"
    assert choose_engine(HYBRID_MIN_DOCS - 1, integer_scores=False) == "device"
    assert choose_engine(HYBRID_MIN_DOCS, integer_scores=False) == "hybrid"


def test_sparse_search_picks_hybrid_at_scale(monkeypatch):
    """SparseSearch switches to the float-exact hybrid engine above the
    corpus-size threshold, and the two engines rank identically."""
    from improving_learned_index_tpu.evaluation import sparse_search as ss

    class ToyModel:
        def get_impact_scores_batch(self, texts):
            return [
                [(w, float(len(w)) / 2) for w in set(t.split())] for t in texts
            ]

        def process_query(self, q):
            return set(q.split())

    corpus = {
        f"d{i}": f"w{i % 17} w{(i * 3) % 11} common"
        for i in range(200)
    }
    queries = {"q0": "w3 common", "q1": "w10 w5"}
    small = ss.SparseSearch(ToyModel())
    res_small = small.search(queries, corpus, k=10)
    from improving_learned_index_tpu.search.device_engine import DeviceSearchEngine

    assert isinstance(small.engine, DeviceSearchEngine)

    monkeypatch.setattr(ss, "HYBRID_MIN_DOCS", 100)
    big = ss.SparseSearch(ToyModel())
    res_big = big.search(queries, corpus, k=10)
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    assert isinstance(big.engine, HybridSearchEngine)
    for qid in queries:
        assert {k: round(v, 4) for k, v in res_small[qid].items()} == {
            k: round(v, 4) for k, v in res_big[qid].items()
        }


def test_expand_tail_chunks_matches_loop():
    """Vectorized chunk expansion == the straightforward per-term loop."""
    from improving_learned_index_tpu.search.hybrid_engine import expand_tail_chunks

    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(0, 30))
        starts = rng.integers(0, 10_000, n).astype(np.int64)
        lens = rng.integers(0, 2000, n).astype(np.int64)
        rows = rng.integers(0, 8, n).astype(np.int64)
        chunk = int(rng.choice([64, 512, 777]))
        cs, cl, cr = expand_tail_chunks(starts, starts + lens, rows, chunk)
        exp = []
        for s, ln, q in zip(starts, lens, rows):
            a, e = int(s), int(s + ln)
            while a < e:
                exp.append((a, min(chunk, e - a), int(q)))
                a += chunk
        got = list(zip(cs.tolist(), cl.tolist(), cr.tolist()))
        assert got == exp, f"trial {trial}"


def test_warmup_covers_live_traffic_shapes():
    """After warmup(max_batch, top_k), live batches of ANY size <= max_batch
    and any mixed heavy/tail term draw must not trigger a new jit compile
    of the XLA scoring fn (new bucket combos mid-request were the p99
    compile stalls in the round-3 TPU serve bench)."""
    from improving_learned_index_tpu.search import hybrid_engine as he

    rng = np.random.default_rng(11)
    index = _random_index(rng, num_docs=400, vocab_size=50, postings=5000)
    engine = HybridSearchEngine(index, heavy_min=64)
    assert engine.t_heavy > 0, "fixture must have both heavy and tail terms"
    # small lattice: CPU compiles are ~10s per combo, so the test caps the
    # chunk buckets at what its own live batches below can produce
    # (16 queries x 6 tail terms x 1 chunk each -> <= 96 -> bucket 128)
    n = engine.warmup(max_batch=16, top_k=10, max_chunks=128)
    assert n > 0
    size_after_warmup = he._score_and_topk._cache_size()

    host = InvertedIndex(index)
    vocab = list(engine.vocab)
    for nq in (1, 3, 8, 9, 16):
        batch = [
            {vocab[i] for i in rng.choice(len(vocab), size=6, replace=False)}
            for _ in range(nq)
        ]
        got = engine.score_batch(batch, 10)
        want = host.score_batch(batch, 10)
        for g, w in zip(got, want):
            _assert_topk_equivalent(g, w, 10)
    assert he._score_and_topk._cache_size() == size_after_warmup

    # an engine with NO heavy terms takes the tail-only shape on every
    # query — warmup must cover that variant instead (found live: a small
    # index's daemon warmed the dense shapes, then every real query
    # compiled mid-request)
    engine2 = HybridSearchEngine(index, heavy_min=10**9)
    assert engine2.t_heavy == 0
    engine2.warmup(max_batch=16, top_k=10, max_chunks=128)
    size_after_warmup = he._score_and_topk._cache_size()
    for nq in (1, 16):
        batch = [
            {vocab[i] for i in rng.choice(len(vocab), size=6, replace=False)}
            for _ in range(nq)
        ]
        got = engine2.score_batch(batch, 10)
        want = host.score_batch(batch, 10)
        for g, w in zip(got, want):
            _assert_topk_equivalent(g, w, 10)
    assert he._score_and_topk._cache_size() == size_after_warmup


def test_hybrid_partitioned_tail_matches_host(monkeypatch):
    """The sort-free partitioned tail (_apply_tail_partitioned: load-time
    doc-sort per term + host tile bounds) must match the host engine
    exactly — tile-boundary docs, heavy/tail mixes, duplicate (term, doc)
    postings, and ties included.  Thresholds lowered so the CPU test stays
    at 2-tile scale."""
    from improving_learned_index_tpu.search import hybrid_engine
    from improving_learned_index_tpu.search.hybrid_engine import _SCATTER_TILE

    monkeypatch.setattr(hybrid_engine, "_TILED_MIN_DOCS", _SCATTER_TILE + 1)
    monkeypatch.setattr(hybrid_engine, "_PALLAS_MIN_DOCS", _SCATTER_TILE + 1)
    num_docs = _SCATTER_TILE + 4321  # 2 tiles
    rng = np.random.default_rng(17)
    per_doc = {}
    docs = np.concatenate([
        rng.integers(0, num_docs, 5000),
        np.array([0, _SCATTER_TILE - 1, _SCATTER_TILE, num_docs - 1]),
    ])
    for t, dcc, v in zip(
        rng.integers(0, 40, len(docs)), docs, rng.integers(1, 256, len(docs))
    ):
        per_doc.setdefault(int(dcc), {})[f"t{t}"] = int(v)
    index = InvertedIndexData.build(sorted(per_doc.items()), num_docs=num_docs)
    host = InvertedIndex(index)
    # heavy_min=600: both heavy rows and tail terms exercise the split
    eng = HybridSearchEngine(index, heavy_min=600, tail_partitioned=True)
    assert eng._tail_partitioned
    # load-time reorder keeps each term's postings doc-sorted, and the
    # boundary table brackets every tile
    b = eng._tail_bounds_rel
    for tid in range(len(eng.term_len)):
        if eng.is_heavy[tid] or eng.term_len[tid] == 0:
            continue
        s, ln = int(eng.term_start[tid]), int(eng.term_len[tid])
        seg = np.asarray(eng.doc_ids)[s : s + ln]
        assert (np.diff(seg) >= 0).all()
        assert b[tid, 0] == 0 and b[tid, -1] == ln
        for k in range(eng.n_pad // _SCATTER_TILE):
            lo, hi = int(b[tid, k]), int(b[tid, k + 1])
            tile_docs = seg[lo:hi]
            assert (tile_docs // _SCATTER_TILE == k).all()
    queries = [
        {f"t{i}" for i in range(10)},
        {f"t{i}" for i in range(20, 30)},
        set(),
        {"zzz-not-in-vocab"},
        {f"t{i}" for i in range(40)},
    ]
    for a, b2 in zip(host.score_batch(queries, 100), eng.score_batch(queries, 100)):
        assert dict(a) == dict(b2)
    # warmup covers the partitioned shapes: live batches compile nothing new
    n = eng.warmup(max_batch=8, top_k=10, max_chunks=64)
    assert n > 0
    size = hybrid_engine._score_and_topk._cache_size()
    eng.score_batch(queries[:3], 10)
    assert hybrid_engine._score_and_topk._cache_size() == size
