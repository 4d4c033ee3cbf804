"""radix_argsort: equivalence with numpy's stable argsort across key widths."""

import numpy as np
import pytest

from improving_learned_index_tpu.utils.sorting import radix_argsort


@pytest.mark.parametrize("hi", [1, 200, 60_000, 100_000, 1 << 22, 1 << 40])
def test_matches_numpy_stable(hi):
    rng = np.random.default_rng(hi)
    key = rng.integers(0, hi, size=100_000, dtype=np.int64)
    got = radix_argsort(key)
    ref = np.argsort(key, kind="stable")
    assert np.array_equal(got, ref)


def test_empty_and_constant():
    assert radix_argsort(np.empty(0, np.int64)).size == 0
    key = np.full(1000, 7, np.int64)
    assert np.array_equal(radix_argsort(key), np.arange(1000))


def test_speed_sanity():
    import time

    rng = np.random.default_rng(0)
    key = rng.integers(0, 30_000 * 256, size=4_000_000, dtype=np.int64)
    # warm both paths (first-touch page faults dominate a cold run), then
    # compare best-of-3 — single-shot wall clock is flaky under CI load
    radix_argsort(key)
    np.argsort(key, kind="stable")

    def best(fn, n=3):
        times = []
        for _ in range(n):
            t = time.time()
            fn()
            times.append(time.time() - t)
        return min(times)

    fast = best(lambda: radix_argsort(key))
    slow = best(lambda: np.argsort(key, kind="stable"))
    assert fast < slow, (fast, slow)


class TestStableScatterPass:
    """The chunked counting-scatter that replaced whole-index argsorts in
    InvertedIndexData._finalize (the 16 GB RSS spike at 385M postings) must
    be order-identical to a stable argsort, across chunk boundaries."""

    def _check(self, keys, nbuckets, chunk):
        from improving_learned_index_tpu.index.inverted import (
            _stable_scatter_pass,
        )

        n = len(keys)
        payload = np.arange(n, dtype=np.int64)  # position tags expose order
        out = np.empty(n, dtype=np.int64)
        counts = np.bincount(keys, minlength=nbuckets).astype(np.int64)
        pairs = (
            (keys[s:e], (payload[s:e],))
            for s, e in (
                (s, min(s + chunk, n)) for s in range(0, max(n, 1), chunk)
            )
        )
        _stable_scatter_pass(nbuckets, counts, pairs, (out,))
        np.testing.assert_array_equal(out, np.argsort(keys, kind="stable"))

    def test_matches_stable_argsort_narrow_and_wide(self):
        rng = np.random.default_rng(0)
        for nbuckets, dtype in ((7, np.uint8), (256, np.uint8),
                                (1000, np.uint16), (70000, np.int32)):
            keys = rng.integers(0, nbuckets, 5000).astype(dtype)
            for chunk in (1, 13, 999, 5000, 10 ** 9):
                self._check(keys, nbuckets, chunk)

    def test_empty(self):
        self._check(np.empty(0, np.uint8), 256, 64)


def test_build_order_matches_lexsort_with_zero_impacts():
    """End-to-end: InvertedIndexData.build's (term asc, impact desc,
    doc asc) order — including a vocab wide enough for the int32 key path
    and zero-impact postings kept in the side CSR — equals a lexsort ground
    truth."""
    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    rng = np.random.default_rng(1)
    for nvocab in (50, 66000):
        n_docs, per_doc = 400, 12
        tids = rng.integers(0, nvocab, (n_docs, per_doc))
        vals = rng.integers(0, 8, (n_docs, per_doc))  # many dups + zeros

        def gen():
            for d in range(n_docs):
                yield d, {f"t{t:06d}": int(v)
                          for t, v in zip(tids[d], vals[d])}

        idx = InvertedIndexData.build(gen(), num_docs=n_docs)
        # ground truth over the same (deduped per doc) postings
        rows = []
        for d in range(n_docs):
            seen = {}
            for t, v in zip(tids[d], vals[d]):
                seen[f"t{t:06d}"] = int(v)  # dict semantics: last wins
            rows += [(term, v, d) for term, v in seen.items()]
        vocab = sorted({r[0] for r in rows})
        t2i = {t: i for i, t in enumerate(vocab)}
        order = sorted(rows, key=lambda r: (t2i[r[0]], -r[1], r[2]))
        nz = [(t2i[t], v, d) for t, v, d in order if v > 0]
        assert idx.vocab == vocab
        np.testing.assert_array_equal(idx.doc_ids, [d for _, _, d in nz])
        np.testing.assert_array_equal(idx.impacts, [v for _, v, _ in nz])
        zs = [(t2i[t], d) for t, v, d in order if v == 0]
        np.testing.assert_array_equal(idx.zero_doc_ids, [d for _, d in zs])
        counts = np.bincount([t for t, _, _ in nz], minlength=len(vocab))
        np.testing.assert_array_equal(np.diff(idx.offsets), counts)
