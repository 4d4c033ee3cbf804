"""C++ native engine: build, binary-format read, agreement with the host
engine on random indexes, Ranker integration."""

import shutil

import numpy as np
import pytest

from improving_learned_index_tpu.index import InvertedIndexData
from improving_learned_index_tpu.search import InvertedIndex

native = pytest.importorskip(
    "improving_learned_index_tpu.search.native", reason="native module"
)
if shutil.which("g++") is None and not native._LIB_PATH.exists():
    pytest.skip("no C++ toolchain", allow_module_level=True)


@pytest.fixture(scope="module")
def random_index(tmp_path_factory):
    rng = np.random.default_rng(7)
    num_docs, vocab_size = 300, 40
    docs = []
    for _ in range(num_docs):
        terms = rng.choice(vocab_size, size=rng.integers(1, 15), replace=False)
        docs.append({f"t{t}": int(rng.integers(1, 255)) for t in terms})
    idx = InvertedIndexData.build(enumerate(docs), num_docs=num_docs)
    path = tmp_path_factory.mktemp("native_idx")
    idx.save(path)
    return idx, path


def test_native_engine_agrees_with_host(random_index):
    idx, path = random_index
    eng = native.NativeSearchEngine(path)
    assert eng.num_terms == len(idx)
    assert eng.num_docs == idx.num_docs
    host = InvertedIndex(idx)
    rng = np.random.default_rng(8)
    queries = [
        {f"t{t}" for t in rng.choice(40, size=rng.integers(1, 6), replace=False)}
        for _ in range(20)
    ] + [set(), {"unknown_term"}]
    for h, n in zip(host.score_batch(queries, 50), eng.score_batch(queries, 50)):
        assert dict(h) == dict(n)
        # identical score ordering (ties broken deterministically by doc id)
        assert [s for _, s in n] == sorted((s for _, s in n), reverse=True)
    eng.close()


def test_native_zero_impact_terminates(tmp_path):
    """A zero-impact posting ends the list, like the reference read loop."""
    idx = InvertedIndexData.build(enumerate([{"a": 5}, {"a": 3}]), num_docs=2)
    # manually append a zero-impact record to term 'a' on disk
    idx.save(tmp_path)
    with open(tmp_path / "inverted_index.dat", "ab") as f:
        f.write(np.uint32(1).tobytes() + np.uint8(0).tobytes())
    with open(tmp_path / "inverted_index.idx", "wb") as f:
        f.write(np.uint64(0).tobytes() + np.uint64(15).tobytes())
    eng = native.NativeSearchEngine(tmp_path)
    res = eng.score_batch([{"a"}], 10)[0]
    assert dict(res) == {0: 5.0, 1: 3.0}  # third (zero) record ignored
    eng.close()


def test_ranker_native_engine(random_index, tmp_path, tiny_tokenizer):
    from improving_learned_index_tpu.evaluation import Ranker

    _, path = random_index
    queries = tmp_path / "queries.tsv"
    queries.write_text("q0\tt0 t1 t2\nq1\tt5\n")
    out = tmp_path / "run_native.tsv"
    n = Ranker(
        index_path=path,
        queries_path=queries,
        output_path=out,
        tokenizer=tiny_tokenizer,
        engine="native",
    ).run()
    assert n == 2
    assert out.read_text().strip()
