"""Crash-point fuzz: truncate a store at arbitrary byte offsets (simulating
a crash mid-flush), resume, finish the corpus — the result must equal an
uninterrupted run at every crash point."""

import random

import numpy as np
import pytest

from improving_learned_index_tpu.index.impact_store import ImpactStore, ImpactStoreWriter

TERMS = [f"t{i}" for i in range(25)]


def _docs(n=30, seed=0):
    rng = random.Random(seed)
    return [
        [(t, rng.uniform(0.001, 5.0)) for t in rng.sample(TERMS, rng.randint(0, 6))]
        for _ in range(n)
    ]


def _write(path, docs, flush_every=5):
    w = ImpactStoreWriter(path)
    for i, d in enumerate(docs):
        w.add_doc(d)
        if (i + 1) % flush_every == 0:
            w._flush()
    return w


@pytest.mark.parametrize("seed", range(10))
def test_arbitrary_truncation_recovers(tmp_path, seed):
    rng = random.Random(seed)
    docs = _docs(seed=seed)
    clean = tmp_path / "clean"
    _write(clean, docs).close()

    crash = tmp_path / "crash"
    w = _write(crash, docs)
    del w  # crash before close: buffered tail lost, files possibly torn
    # Crash model: appends land sequentially, so each file holds a PREFIX of
    # its true byte stream — truncate at arbitrary offsets (possibly
    # mid-element: a partial final element is unaligned and must be
    # dropped).  Byte *corruption* (garbage overwriting real data at an
    # aligned size) is not the resume threat model.
    import os

    for name in rng.sample(["counts.bin", "term_ids.bin", "values.bin"], rng.randint(1, 2)):
        p = crash / name
        size = p.stat().st_size
        if size:
            os.truncate(p, rng.randrange(0, size))
    if rng.random() < 0.3:
        # partial write of the NEXT element: unaligned garbage tail on an
        # otherwise-consistent file (floor division must drop it)
        item = 8
        p = crash / "values.bin"
        os.truncate(p, (p.stat().st_size // item) * item)
        with open(p, "ab") as f:
            f.write(bytes(rng.randrange(1, item)))

    w2 = ImpactStoreWriter(crash, resume=True)
    n = w2.resume_docs
    assert 0 <= n <= len(docs)
    # the recovered prefix must MATCH the clean run exactly
    for d in docs[n:]:
        w2.add_doc(d)
    w2.close()
    a, b = ImpactStore(crash), ImpactStore(clean)
    assert a.num_docs == b.num_docs
    assert dict(a.iter_docs()) == dict(b.iter_docs()), f"seed={seed} n={n}"
