"""Document deletion without rebuild: filtered index is byte-identical to a
one-shot build over the kept corpus (compact renumbering)."""

import random

import numpy as np

from improving_learned_index_tpu.index.inverted import InvertedIndexData

TERMS = ["apple", "banana", "cherry", "date", "elder", "fig", "grape"]


def _docs(n, seed):
    rng = random.Random(seed)
    out = []
    for d in range(n):
        doc = {t: rng.randint(1, 255) for t in rng.sample(TERMS, rng.randint(0, 4))}
        if d % 5 == 1:
            doc["rareterm" if d < 10 else "zed"] = rng.randint(0, 3)  # incl. zeros
        out.append(doc)
    return out


def _build(docs):
    return InvertedIndexData.build(enumerate(docs), num_docs=len(docs))


def test_filter_equals_oneshot(tmp_path):
    docs = _docs(30, 0)
    rng = random.Random(1)
    keep = np.array([rng.random() > 0.3 for _ in docs])
    full = _build(docs)
    filtered = full.filter_docs(keep)
    oneshot = _build([d for d, k in zip(docs, keep) if k])
    assert filtered.num_docs == oneshot.num_docs == int(keep.sum())
    filtered.save(tmp_path / "f")
    oneshot.save(tmp_path / "o")
    for f in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (tmp_path / "f" / f).read_bytes() == (tmp_path / "o" / f).read_bytes(), f


def test_filter_drops_emptied_terms():
    full = _build([{"solo": 7}, {"both": 1}, {"both": 2}])
    out = full.delete_docs([0])
    assert "solo" not in out.term_to_id
    docs, vals = out.term_postings("both")
    assert docs.tolist() == [1, 0] and vals.tolist() == [2, 1]


def test_filter_keep_all_and_none():
    docs = _docs(8, 2)
    full = _build(docs)
    same = full.filter_docs(np.ones(len(docs), bool))
    assert same.vocab == full.vocab and same.num_postings == full.num_postings
    empty = full.filter_docs(np.zeros(len(docs), bool))
    assert empty.num_docs == 0 and empty.num_postings == 0 and empty.vocab == []


def test_split_merge_roundtrip(tmp_path):
    docs = _docs(23, 5)
    full = _build(docs)
    shards = full.split_docs(4)
    assert sum(s.num_docs for s in shards) == full.num_docs
    merged = InvertedIndexData.merge(shards)
    full.save(tmp_path / "full")
    merged.save(tmp_path / "merged")
    for f in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (tmp_path / "merged" / f).read_bytes() == (tmp_path / "full" / f).read_bytes(), f


def test_split_cli_manifest(tmp_path):
    import json

    from improving_learned_index_tpu.cli import split_index

    docs = _docs(10, 6)
    _build(docs).save(tmp_path / "inv")
    rc = split_index.main([
        "-i", str(tmp_path / "inv"), "-o", str(tmp_path / "shards"),
        "--n_shards", "3", "--num_docs", str(len(docs)),
    ])
    assert rc == 0
    manifest = json.load(open(tmp_path / "shards" / "shards.json"))
    assert sum(m["num_docs"] for m in manifest) == len(docs)
    assert manifest[0]["doc_offset"] == 0
    assert manifest[2]["doc_offset"] == manifest[0]["num_docs"] + manifest[1]["num_docs"]
    loaded = [
        InvertedIndexData.load(tmp_path / "shards" / m["path"], num_docs=m["num_docs"])
        for m in manifest
    ]
    merged = InvertedIndexData.merge(loaded)
    _build(docs).save(tmp_path / "ref")
    merged.save(tmp_path / "rt")
    for f in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (tmp_path / "rt" / f).read_bytes() == (tmp_path / "ref" / f).read_bytes(), f


def test_filter_cli(tmp_path):
    from improving_learned_index_tpu.cli import filter_index

    docs = _docs(12, 3)
    _build(docs).save(tmp_path / "inv")
    (tmp_path / "rm.txt").write_text("1\n4\n9\n")
    rc = filter_index.main([
        "-i", str(tmp_path / "inv"), "-o", str(tmp_path / "out"),
        "--delete_ids_path", str(tmp_path / "rm.txt"),
        "--num_docs", str(len(docs)),
    ])
    assert rc == 0
    kept = [d for i, d in enumerate(docs) if i not in (1, 4, 9)]
    _build(kept).save(tmp_path / "ref")
    for f in ("inverted_index.dat", "inverted_index.idx", "vocab.txt"):
        assert (tmp_path / "out" / f).read_bytes() == (tmp_path / "ref" / f).read_bytes(), f
