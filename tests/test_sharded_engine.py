"""Doc-sharded multi-chip query engine on the 8-device CPU mesh: exact
agreement with the host engine; the per-shard top-k + all_gather merge is
lossless."""

import numpy as np
import pytest

from improving_learned_index_tpu.core.config import MeshConfig
from improving_learned_index_tpu.index.inverted import InvertedIndexData
from improving_learned_index_tpu.parallel.mesh import make_mesh
from improving_learned_index_tpu.search.engine import InvertedIndex
from improving_learned_index_tpu.search.sharded_engine import ShardedSearchEngine


def _random_index(rng, num_docs=700, vocab_size=50, postings=7000):
    p = 1.0 / np.arange(1, vocab_size + 1)
    p /= p.sum()
    tids = rng.choice(vocab_size, size=postings, p=p)
    docs = rng.integers(0, num_docs, postings)
    vals = rng.integers(1, 256, postings)
    per_doc = {}
    for t, d, v in zip(tids, docs, vals):
        per_doc.setdefault(int(d), {})[f"t{t}"] = int(v)
    return InvertedIndexData.build(sorted(per_doc.items()), num_docs=num_docs)


@pytest.fixture(scope="module")
def mesh(request):
    request.getfixturevalue("cpu_devices")
    import numpy as _np
    import jax
    from jax.sharding import Mesh

    return Mesh(_np.asarray(jax.devices()[:8]), axis_names=("data",))


def test_sharded_pallas_tail_matches_host(mesh, monkeypatch):
    """Opt-in per-shard Pallas tail scatter (interpret mode on the virtual
    mesh) must agree exactly with the host engine."""
    from improving_learned_index_tpu.search import sharded_engine

    monkeypatch.setattr(sharded_engine, "_PALLAS_MIN", 1)  # force tile pad
    rng = np.random.default_rng(13)
    index = _random_index(rng, num_docs=900, vocab_size=40, postings=6000)
    host = InvertedIndex(index)
    sharded = ShardedSearchEngine(index, mesh, heavy_min=48)
    assert sharded.shard_docs % (1 << 16) == 0
    sharded._pallas = True
    sharded._pallas_interpret = True
    queries = [{"t0", "t1", "t7"}, {f"t{i}" for i in range(20)}, set()]
    h = host.score_batch(queries, 30)
    y = sharded.score_batch(queries, 30)
    for ours, theirs in zip(y, h):
        assert [s for _, s in ours] == [s for _, s in theirs]
        if ours:
            boundary = ours[-1][1]
            assert {d for d, s in ours if s > boundary} == {
                d for d, s in theirs if s > boundary
            }


@pytest.mark.parametrize("heavy_min", [1, 48, 10**9])
def test_sharded_matches_host(mesh, heavy_min):
    rng = np.random.default_rng(11)
    index = _random_index(rng)
    host = InvertedIndex(index)
    sharded = ShardedSearchEngine(index, mesh, heavy_min=heavy_min)
    queries = [
        {"t0", "t1", "t7"},
        {f"t{i}" for i in range(25)},
        {"t3", "missing-term"},
        set(),
    ]
    k = 40
    h = host.score_batch(queries, k)
    y = sharded.score_batch(queries, k)
    for ours, theirs in zip(y, h):
        assert [s for _, s in ours] == [s for _, s in theirs]
        if ours:
            boundary = ours[-1][1]
            assert {d for d, s in ours if s > boundary} == {
                d for d, s in theirs if s > boundary
            }


def test_sharded_full_depth(mesh):
    """k >= num_docs: full score vectors identical (merge is lossless)."""
    rng = np.random.default_rng(2)
    index = _random_index(rng, num_docs=200, vocab_size=20, postings=2000)
    host = InvertedIndex(index)
    sharded = ShardedSearchEngine(index, mesh, heavy_min=64)
    queries = [{"t0", "t1", "t2"}, {"t5"}]
    h = host.score_batch(queries, 200)
    y = sharded.score_batch(queries, 200)
    for ours, theirs in zip(y, h):
        assert dict(ours) == dict(theirs)


def test_sharded_stream_pipelined(mesh):
    rng = np.random.default_rng(4)
    index = _random_index(rng, num_docs=300, vocab_size=25, postings=3000)
    eng = ShardedSearchEngine(index, mesh, heavy_min=48)
    batch = [{"t0", "t1"}, {"t2", "t3"}]
    sync = eng.score_batch(batch, 15)
    outs = list(eng.score_stream([batch, batch, batch], top_k=15, depth=2))
    assert len(outs) == 3
    for out in outs:
        for a, b in zip(out, sync):
            assert [s for _, s in a] == [s for _, s in b]


def test_sharded_tiled_tail_large_shards(mesh, monkeypatch):
    """Shards past the tiled-scatter threshold take the VMEM-tiled tail
    path; per-shard results must still merge to exact host agreement.  The
    4M-doc production threshold is lowered so the CPU test stays small."""
    from improving_learned_index_tpu.search import hybrid_engine, sharded_engine
    from improving_learned_index_tpu.search.hybrid_engine import _SCATTER_TILE

    monkeypatch.setattr(hybrid_engine, "_TILED_MIN_DOCS", _SCATTER_TILE + 1)
    monkeypatch.setattr(sharded_engine, "_TILED_MIN", _SCATTER_TILE + 1)
    monkeypatch.setattr(sharded_engine, "_PALLAS_MIN", _SCATTER_TILE + 1)
    num_docs = 2 * _SCATTER_TILE * 8 + 777  # >1 tile per shard on 8 devices
    rng = np.random.default_rng(7)
    per_doc = {}
    docs = np.concatenate([
        rng.integers(0, num_docs, 3000),
        np.array([0, _SCATTER_TILE, num_docs - 1]),  # boundary docs
    ])
    for t, d, v in zip(rng.integers(0, 30, len(docs)), docs, rng.integers(1, 256, len(docs))):
        per_doc.setdefault(int(d), {})[f"t{t}"] = int(v)
    index = InvertedIndexData.build(sorted(per_doc.items()), num_docs=num_docs)
    host = InvertedIndex(index)
    eng = ShardedSearchEngine(index, mesh, heavy_min=10**9)  # all tail
    assert eng.shard_docs > _SCATTER_TILE and eng.shard_docs % _SCATTER_TILE == 0
    queries = [{f"t{i}" for i in range(8)}, {f"t{i}" for i in range(10, 14)}]
    for ours, theirs in zip(eng.score_batch(queries, 60), host.score_batch(queries, 60)):
        assert dict(ours) == dict(theirs)


def test_sharded_partitioned_tail_matches_host(mesh, monkeypatch):
    """Per-shard sort-free partitioned tail (round-5): doc-sorted shard
    blocks + host tile bounds must merge to exact host agreement, including
    tile-boundary docs and heavy/tail mixes."""
    from improving_learned_index_tpu.search import hybrid_engine, sharded_engine
    from improving_learned_index_tpu.search.hybrid_engine import _SCATTER_TILE

    monkeypatch.setattr(hybrid_engine, "_TILED_MIN_DOCS", _SCATTER_TILE + 1)
    monkeypatch.setattr(sharded_engine, "_TILED_MIN", _SCATTER_TILE + 1)
    monkeypatch.setattr(sharded_engine, "_PALLAS_MIN", _SCATTER_TILE + 1)
    num_docs = 2 * _SCATTER_TILE * 8 + 777  # >1 tile per shard on 8 devices
    rng = np.random.default_rng(23)
    per_doc = {}
    docs = np.concatenate([
        rng.integers(0, num_docs, 4000),
        np.array([0, _SCATTER_TILE - 1, _SCATTER_TILE, num_docs - 1]),
    ])
    for t, d, v in zip(rng.integers(0, 30, len(docs)), docs,
                       rng.integers(1, 256, len(docs))):
        per_doc.setdefault(int(d), {})[f"t{t}"] = int(v)
    index = InvertedIndexData.build(sorted(per_doc.items()), num_docs=num_docs)
    host = InvertedIndex(index)
    # heavy_min=300: heavy rows AND partitioned tail both engage
    eng = ShardedSearchEngine(index, mesh, heavy_min=300, tail_partitioned=True)
    assert eng._tail_partitioned
    # per-shard doc-sort invariant: every term segment is doc-ascending and
    # the bounds bracket each local tile
    for s in range(eng.n_shards):
        offs, b = eng.tail_offsets[s], eng._tail_bounds_rel[s]
        t_docs = np.asarray(eng.tail_docs)[s]
        for tid in range(len(offs) - 1):
            lo, ln = int(offs[tid]), int(offs[tid + 1] - offs[tid])
            if ln == 0:
                continue
            seg = t_docs[lo : lo + ln]
            assert (np.diff(seg) >= 0).all()
            assert b[tid, 0] == 0 and b[tid, -1] == ln
    queries = [
        {f"t{i}" for i in range(8)},
        {f"t{i}" for i in range(10, 14)},
        {"t0"},
        {"nosuch"},
    ]
    got = eng.score_batch(queries, 60)
    want = host.score_batch(queries, 60)
    for ours, theirs in zip(got, want):
        assert [s for _, s in ours] == [s for _, s in theirs]
        assert dict(ours) == dict(theirs)
    # default (auto) mode on this geometry stays un-partitioned and agrees
    eng2 = ShardedSearchEngine(index, mesh, heavy_min=300)
    assert not eng2._tail_partitioned
    for ours, theirs in zip(eng2.score_batch(queries, 60), want):
        assert [s for _, s in ours] == [s for _, s in theirs]
