"""Property fuzz over index algebra: arbitrary compositions of shard
builds, merges, deletions, and save/load round-trips must stay
byte-identical to a one-shot build over the equivalent corpus."""

import random

import numpy as np
import pytest

from improving_learned_index_tpu.index.inverted import InvertedIndexData

TERMS = [f"t{i:03d}" for i in range(40)] + ["x|y", "##sub", ":"]


def _docs(rng, n):
    out = []
    for _ in range(n):
        k = rng.randint(0, 6)
        doc = {t: rng.randint(0, 255) for t in rng.sample(TERMS, k)}
        out.append(doc)
    return out


def _build(docs):
    return InvertedIndexData.build(enumerate(docs), num_docs=len(docs))


def test_wide_vocab_takes_combined_key_path(tmp_path):
    """Vocabs > 65536 leave the 16-bit radix fast path; the combined-key
    fallback must produce the same bytes as a direct small build would —
    compare against a seeded shuffle-invariant ordering check + round-trip."""
    import numpy as np

    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    V, D = 70_000, 2000

    def gen(order):
        for d in order:
            yield d, {f"t{(d * 37 + i) % V:05d}": (d + i) % 255 + 1 for i in range(40)}

    a = InvertedIndexData.build(gen(range(D)), num_docs=D)
    assert len(a.vocab) > (1 << 16)
    # within-term invariants: impact desc, doc asc per impact
    for tid in (0, 1, len(a.vocab) // 2, len(a.vocab) - 1):
        s, e = a.offsets[tid], a.offsets[tid + 1]
        v = a.impacts[s:e].astype(int)
        d_ = a.doc_ids[s:e].astype(int)
        assert (np.diff(v) <= 0).all()
        for imp in np.unique(v):
            grp = np.asarray(d_)[v == imp]
            assert (np.diff(grp) > 0).all()
    a.save(tmp_path / "wide")
    b = InvertedIndexData.load(tmp_path / "wide", num_docs=D)
    b.save(tmp_path / "wide2")
    for f in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (tmp_path / "wide2" / f).read_bytes() == (tmp_path / "wide" / f).read_bytes(), f


@pytest.mark.parametrize("seed", range(8))
def test_algebra_composition(tmp_path, seed):
    rng = random.Random(seed)
    # corpus = several shards, some empty
    shards = [_docs(rng, rng.randint(0, 12)) for _ in range(rng.randint(1, 4))]
    corpus = [d for s in shards for d in s]

    # path A: shard builds -> merge
    idx = InvertedIndexData.merge([_build(s) for s in shards]) if corpus else _build([])

    # random delete round(s)
    kept = list(range(len(corpus)))
    for _ in range(rng.randint(0, 2)):
        if not kept:
            break
        drop = rng.sample(range(len(kept)), rng.randint(0, min(3, len(kept))))
        mask = np.ones(len(kept), bool)
        mask[drop] = False
        idx = idx.filter_docs(mask)
        kept = [d for i, d in enumerate(kept) if mask[i]]

    # random save/load round-trip in the middle
    if rng.random() < 0.5:
        p = tmp_path / f"rt{seed}"
        idx.save(p)
        idx = InvertedIndexData.load(p, num_docs=len(kept))

    oracle = _build([corpus[d] for d in kept])
    a, b = tmp_path / "a", tmp_path / "b"
    idx.save(a)
    oracle.save(b)
    for f in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (a / f).read_bytes() == (b / f).read_bytes(), (seed, f)
