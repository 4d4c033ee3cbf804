"""Interpret-mode correctness for the hybrid engine's Pallas kernels.

The engine only takes the Pallas path on a real TPU backend
(``HybridSearchEngine._pallas``); these tests run the kernels through the
Pallas interpreter on CPU so the lattice/update semantics are pinned in
the suite.  TPU timing lives in benchmarks/BENCHMARKS.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from improving_learned_index_tpu.ops.gather_rows import (
    accumulate_rows,
    can_use_pallas_gather,
)
from improving_learned_index_tpu.ops.scatter_scores import (
    PAGE,
    TILE,
    apply_tail_updates,
    can_use_pallas_tail,
)


def test_apply_tail_updates_matches_np_add_at():
    rng = np.random.default_rng(0)
    nq, n_pad = 16, 2 * TILE
    e = 3000
    e_pad = 4 * PAGE
    d = rng.integers(0, n_pad, e).astype(np.int32)
    v = rng.integers(1, 256, e).astype(np.float32)
    r = rng.integers(0, nq, e).astype(np.int32)
    scores0 = rng.integers(0, 300, (nq, n_pad)).astype(np.float32)

    pad = e_pad - e
    d_p = np.concatenate([d, np.zeros(pad, np.int32)])
    v_p = np.concatenate([v, np.zeros(pad, np.float32)])  # v==0 => padding
    r_p = np.concatenate([r, np.zeros(pad, np.int32)])

    out = apply_tail_updates(
        jnp.asarray(scores0),
        jnp.asarray(d_p),
        jnp.asarray(v_p),
        jnp.asarray(r_p),
        interpret=True,
    )
    ref = scores0.copy()
    np.add.at(ref, (r, d), v)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_apply_tail_updates_duplicates_accumulate():
    nq, n_pad = 8, TILE
    # many duplicate (row, doc) updates including a tile-boundary doc
    d = np.array([0, 0, 0, TILE - 1, TILE - 1] + [5] * (PAGE - 5), np.int32)
    v = np.full(PAGE, 3.0, np.float32)
    r = np.zeros(PAGE, np.int32)
    out = apply_tail_updates(
        jnp.zeros((nq, n_pad), jnp.float32),
        jnp.asarray(d),
        jnp.asarray(v),
        jnp.asarray(r),
        interpret=True,
    )
    host = np.asarray(out)
    assert host[0, 0] == 9.0
    assert host[0, TILE - 1] == 6.0
    assert host[0, 5] == 3.0 * (PAGE - 5)


def test_accumulate_rows_matches_onehot_matmul():
    rng = np.random.default_rng(1)
    nq, t_heavy, n_pad = 8, 37, TILE
    dense = rng.integers(0, 256, (t_heavy, n_pad)).astype(np.float32)
    hit = np.sort(rng.choice(t_heavy, 9, replace=False)).astype(np.int32)
    # each query subscribes to 0-3 hit slots; one slot shared by two queries
    pairs_list = [(0, 0), (0, 1), (1, 1), (2, 5), (3, 8), (5, 2), (5, 3), (5, 4)]
    h_b, p_b = 64, 64
    ids = np.zeros(h_b, np.int32)
    ids[: len(hit)] = hit
    pairs = np.zeros((p_b, 2), np.int32)
    for i, (q, s) in enumerate(pairs_list):
        pairs[i] = (q, s)
    counts = np.array([len(hit), len(pairs_list)], np.int32)

    out = accumulate_rows(
        jnp.asarray(dense.astype(jnp.bfloat16)),
        jnp.asarray(ids),
        jnp.asarray(pairs),
        jnp.asarray(counts),
        nq,
        interpret=True,
    )
    ref = np.zeros((nq, n_pad), np.float32)
    for q, s in pairs_list:
        ref[q] += dense[hit[s]]
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_apply_tail_updates_all_padding_is_noop():
    nq, n_pad = 8, TILE
    scores0 = np.arange(nq * n_pad, dtype=np.float32).reshape(nq, n_pad) % 7
    out = apply_tail_updates(
        jnp.asarray(scores0),
        jnp.zeros(PAGE, jnp.int32),
        jnp.zeros(PAGE, jnp.float32),  # v == 0 everywhere -> pure padding
        jnp.zeros(PAGE, jnp.int32),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), scores0)


def test_apply_tail_updates_last_tile_and_straddle():
    """Updates concentrated in the final tile, with one page straddling the
    tile boundary, must land exactly once."""
    nq, n_pad = 4, 3 * TILE
    e = 2 * PAGE
    rng = np.random.default_rng(4)
    # half the updates just below the 2nd/3rd tile edge, half just above
    d = np.concatenate(
        [
            rng.integers(2 * TILE - 64, 2 * TILE, e // 2),
            rng.integers(2 * TILE, 2 * TILE + 64, e // 2),
        ]
    ).astype(np.int32)
    v = rng.integers(1, 256, e).astype(np.float32)
    r = rng.integers(0, nq, e).astype(np.int32)
    out = apply_tail_updates(
        jnp.zeros((nq, n_pad), jnp.float32),
        jnp.asarray(d),
        jnp.asarray(v),
        jnp.asarray(r),
        interpret=True,
    )
    ref = np.zeros((nq, n_pad), np.float32)
    np.add.at(ref, (r, d), v)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_accumulate_rows_zero_counts():
    dense = jnp.ones((4, TILE), jnp.bfloat16)
    out = accumulate_rows(
        dense,
        jnp.zeros(64, jnp.int32),
        jnp.zeros((64, 2), jnp.int32),
        jnp.zeros(2, jnp.int32),  # no hit rows, no pairs
        8,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.zeros((8, TILE), np.float32))


def test_count_ge_matches_numpy():
    from improving_learned_index_tpu.ops.count_ge import _TILE, count_ge

    rng = np.random.default_rng(2)
    q, n = 8, 2 * _TILE
    scores = rng.integers(0, 2000, (q, n)).astype(np.float32)
    t = rng.integers(1, 2000, (q, 7)).astype(np.float32)
    got = count_ge(jnp.asarray(scores), jnp.asarray(t), interpret=True)
    ref = (scores[:, :, None] >= t[:, None, :]).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_exact_topk_padded_width_matches_sliced():
    """Zero-padded columns must never change exact top-k results (the
    engine now keeps the tile-padded width through the integer path)."""
    from improving_learned_index_tpu.ops.exact_topk import exact_topk_integer

    rng = np.random.default_rng(6)
    q, n, pad = 4, 3000, 1096
    scores = np.zeros((q, n + pad), np.float32)
    scores[:, :n] = rng.integers(0, 50, (q, n))
    v_pad, i_pad = exact_topk_integer(jnp.asarray(scores), 100)
    v_ref, i_ref = exact_topk_integer(jnp.asarray(scores[:, :n]), 100)
    np.testing.assert_array_equal(np.asarray(v_pad), np.asarray(v_ref))
    # indices agree wherever the value is positive (zeros pad arbitrarily)
    live = np.asarray(v_ref) > 0
    np.testing.assert_array_equal(np.asarray(i_pad)[live], np.asarray(i_ref)[live])


def test_vmem_gates():
    assert can_use_pallas_tail(TILE, 64)
    assert not can_use_pallas_tail(TILE + 128, 64)
    assert not can_use_pallas_tail(TILE, 128)
    assert can_use_pallas_gather(TILE, 64, 256)
    assert not can_use_pallas_gather(TILE, 64, 257)
    assert not can_use_pallas_gather(TILE - 128, 64, 8)


def _toy_corpus_index(num_docs=70_000, n_terms=40, seed=3):
    rng = np.random.default_rng(seed)

    class CSR:
        pass

    offsets = [0]
    doc_ids = []
    impacts = []
    for t in range(n_terms):
        # terms 0-4 heavy (>=1024 postings), rest tail
        n_post = int(rng.integers(1500, 2500)) if t < 5 else int(rng.integers(3, 200))
        docs = np.unique(rng.integers(0, num_docs, n_post))
        offsets.append(offsets[-1] + len(docs))
        doc_ids.append(docs)
        impacts.append(rng.integers(1, 256, len(docs)))
    idx = CSR()
    idx.term_to_id = {f"t{t}": t for t in range(n_terms)}
    idx.offsets = np.asarray(offsets, np.int64)
    idx.doc_ids = np.concatenate(doc_ids).astype(np.uint32)
    idx.impacts = np.concatenate(impacts).astype(np.uint8)
    idx.num_docs = num_docs
    return idx, rng


@pytest.mark.parametrize("force_matmul", [False, True])
def test_engine_pallas_dispatch_matches_xla_path(monkeypatch, force_matmul):
    """Run the engine's full Pallas dispatch path (tables, bucketing,
    gather-vs-matmul selection, tail padding) through the Pallas
    interpreter on CPU and pin it against the XLA path."""
    from improving_learned_index_tpu.search import hybrid_engine
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    monkeypatch.setattr(hybrid_engine, "_PALLAS_MIN_DOCS", TILE)
    idx, rng = _toy_corpus_index()
    eng = HybridSearchEngine(idx, heavy_min=1024)
    assert eng.n_pad % TILE == 0 and eng.t_heavy == 5

    terms = list(idx.term_to_id)
    batch = [
        {terms[i] for i in rng.choice(len(terms), size=4, replace=False)}
        for _ in range(6)
    ]
    batch.append(set())  # empty query
    batch.append({"t0"})  # heavy-only query
    batch.append({"t30", "zz"})  # tail-only + unknown term

    ref = eng.score_batch(batch, 50)
    assert not eng._pallas
    eng._pallas = True
    eng._pallas_interpret = True
    if force_matmul:
        # push the hit-row count over the gather gate so the matmul
        # fallback branch runs instead
        monkeypatch.setattr(
            "improving_learned_index_tpu.ops.gather_rows.can_use_pallas_gather",
            lambda *a: False,
        )
    got = eng.score_batch(batch, 50)
    for a, b in zip(ref, got):
        assert dict(a) == dict(b)


def test_engine_pallas_subbatches_large_batch(monkeypatch):
    """>64-query batches must split into 64-query Pallas sub-dispatches."""
    from improving_learned_index_tpu.search import hybrid_engine
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    monkeypatch.setattr(hybrid_engine, "_PALLAS_MIN_DOCS", TILE)
    idx, rng = _toy_corpus_index()
    eng = HybridSearchEngine(idx, heavy_min=1024)
    terms = list(idx.term_to_id)
    batch = [
        {terms[i] for i in rng.choice(len(terms), size=3, replace=False)}
        for _ in range(67)
    ]
    ref = eng.score_batch(batch, 20)
    eng._pallas = True
    eng._pallas_interpret = True
    got = eng.score_batch(batch, 20)
    assert len(got) == 67
    for a, b in zip(ref, got):
        assert dict(a) == dict(b)


def test_engine_pallas_runtime_fallback(monkeypatch):
    """A failing Pallas dispatch must degrade the engine to the XLA path
    (permanently) and still return exact results for the batch."""
    from improving_learned_index_tpu.search import hybrid_engine
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    monkeypatch.setattr(hybrid_engine, "_PALLAS_MIN_DOCS", TILE)
    idx, rng = _toy_corpus_index()
    eng = HybridSearchEngine(idx, heavy_min=1024)
    terms = list(idx.term_to_id)
    batch = [{terms[i] for i in rng.choice(len(terms), size=3)} for _ in range(4)]
    ref = eng.score_batch(batch, 20)

    def boom(*a, **k):
        raise RuntimeError("INVALID_ARGUMENT: injected")

    monkeypatch.setattr(hybrid_engine, "_score_and_topk_pallas", boom)
    eng._pallas = True
    got = eng.score_batch(batch, 20)  # dispatch-time failure -> XLA fallback
    assert not eng._pallas
    for a, b in zip(ref, got):
        assert dict(a) == dict(b)


def test_engine_pallas_fetch_fallback(monkeypatch):
    """A failure surfacing at result-fetch time (async dispatch) must also
    fall back and recompute exactly."""
    from improving_learned_index_tpu.search import hybrid_engine
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    monkeypatch.setattr(hybrid_engine, "_PALLAS_MIN_DOCS", TILE)
    idx, rng = _toy_corpus_index()
    eng = HybridSearchEngine(idx, heavy_min=1024)
    terms = list(idx.term_to_id)
    batch = [{terms[i] for i in rng.choice(len(terms), size=3)} for _ in range(4)]
    ref = eng.score_batch(batch, 20)

    class _Poisoned:
        def __array__(self, *a, **k):
            raise RuntimeError("DATA_LOSS: injected at fetch")

    monkeypatch.setattr(
        hybrid_engine, "_score_and_topk_pallas", lambda *a, **k: _Poisoned()
    )
    eng._pallas = True
    got = eng.score_batch(batch, 20)
    assert not eng._pallas
    for a, b in zip(ref, got):
        assert dict(a) == dict(b)


def test_engine_pallas_gate_off_on_cpu():
    """On the CPU test backend the engine must keep the XLA paths."""
    from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine

    class CSR:
        pass

    idx = CSR()
    idx.term_to_id = {"a": 0}
    idx.offsets = np.array([0, 1], np.int64)
    idx.doc_ids = np.array([0], np.uint32)
    idx.impacts = np.array([3], np.uint8)
    idx.num_docs = 2
    eng = HybridSearchEngine(idx, heavy_min=1)
    assert jax.default_backend() != "tpu"
    assert not eng._pallas
    assert dict(eng.score_batch([{"a"}], 2)[0]) == {0: 3.0}
