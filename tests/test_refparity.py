"""Cross-implementation golden parity: run the ACTUAL reference modules
(/root/reference, pure-Python parts that import offline) against ours on the
same synthetic corpus and assert identical outputs.

Covered reference modules (VERDICT round-1 item 2):
  - src/deep_impact/indexing/quantize.py      (quantize_file)
  - src/deep_impact/inverted_index/create.py  (InvertedIndexCreator)
  - src/deep_impact/inverted_index/inverted_index.py (InvertedIndex.score)
  - src/deep_impact/evaluation/metrics.py     (Metrics MRR/Recall)

The shared pipeline input is the *forward index* our encoder writes ("term:
score, ..." text lines, reference indexer.py:62-68): the reference model
stack itself cannot import offline (models/original.py downloads the PhoBERT
tokenizer at class-definition time); encoder-level torch parity is covered
separately in tests/test_encoder.py with locally constructed weights.

Run with ``pytest -m refparity`` (also part of the default suite).
"""

import shutil
import sys
import types
from pathlib import Path

import pytest

pytestmark = pytest.mark.refparity

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """Import the reference's offline-importable modules, with its Logger
    redirected away from the read-only reference checkout."""
    if not REFERENCE.exists():
        pytest.skip("reference checkout not mounted")
    sys.path.insert(0, str(REFERENCE))
    try:
        import src.utils.defaults as ref_defaults

        # Redirect LOG_DIR before src.utils.logger binds it as a default arg.
        ref_defaults.LOG_DIR = tmp_path_factory.mktemp("ref_logs")

        from src.deep_impact.indexing.quantize import quantize_file
        from src.deep_impact.inverted_index.create import InvertedIndexCreator
        from src.deep_impact.inverted_index.inverted_index import InvertedIndex

        # src.deep_impact.evaluation.__init__ imports the torch model stack
        # (needs network); load metrics.py directly under a stub package.
        import importlib.util

        pkg_name = "src.deep_impact.evaluation"
        if pkg_name not in sys.modules:
            stub = types.ModuleType(pkg_name)
            stub.__path__ = [str(REFERENCE / "src/deep_impact/evaluation")]
            sys.modules[pkg_name] = stub
        spec = importlib.util.spec_from_file_location(
            pkg_name + ".metrics", REFERENCE / "src/deep_impact/evaluation/metrics.py"
        )
        metrics_mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = metrics_mod
        spec.loader.exec_module(metrics_mod)

        yield types.SimpleNamespace(
            quantize_file=quantize_file,
            InvertedIndexCreator=InvertedIndexCreator,
            InvertedIndex=InvertedIndex,
            Metrics=metrics_mod.Metrics,
        )
    finally:
        sys.path.remove(str(REFERENCE))


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory, request):
    """Our encode -> forward index, then BOTH implementations take it through
    quantize -> invert."""
    corpus = request.getfixturevalue("tiny_corpus")
    root = tmp_path_factory.mktemp("refparity")
    (root / "collection.tsv").write_text(
        "".join(f"{i}\t{t}\n" for i, t in enumerate(corpus))
    )
    from improving_learned_index_tpu.cli import build_vocab, index as cli_index

    assert build_vocab.main([
        "--collection_path", str(root / "collection.tsv"),
        "--output_path", str(root / "vocab.txt"),
        "--max_size", "512", "--min_freq", "1",
    ]) == 0
    assert cli_index.main([
        "--vocab_path", str(root / "vocab.txt"), "--tiny", "--max_length", "32",
        "--collection_path", str(root / "collection.tsv"),
        "--output_file_path", str(root / "collection.index"),
        "--model_batch_size", "4",
    ]) == 0
    return root


def test_quantize_parity(ref, pipeline):
    """Reference quantize_file and our quantize CLI produce identical text."""
    from improving_learned_index_tpu.cli import quantize as cli_quantize

    root = pipeline
    ref.quantize_file(root / "collection.index", root / "ref.quantized")
    assert cli_quantize.main([
        "-i", str(root / "collection.index"), "-o", str(root / "ours.quantized"),
    ]) == 0
    ref_text = (root / "ref.quantized").read_text()
    ours_text = (root / "ours.quantized").read_text()
    assert ours_text == ref_text
    assert ref_text.strip(), "quantized forward index is empty"


def test_inverted_index_byte_parity(ref, pipeline):
    """Reference InvertedIndexCreator and our invert CLI write byte-identical
    vocab.txt / inverted_index.dat / inverted_index.idx."""
    from improving_learned_index_tpu.cli import invert as cli_invert

    root = pipeline
    if not (root / "ref.quantized").exists():
        ref.quantize_file(root / "collection.index", root / "ref.quantized")
    ref.InvertedIndexCreator(root / "ref.quantized", root / "ref_inverted").run()
    assert cli_invert.main([
        "-i", str(root / "ref.quantized"), "-o", str(root / "our_inverted"),
    ]) == 0
    for name in ("vocab.txt", "inverted_index.dat", "inverted_index.idx"):
        ours = (root / "our_inverted" / name).read_bytes()
        theirs = (root / "ref_inverted" / name).read_bytes()
        assert ours == theirs, f"{name} differs ({len(ours)} vs {len(theirs)} bytes)"
    assert (root / "ref_inverted" / "inverted_index.dat").stat().st_size > 0


def test_query_scoring_parity(ref, pipeline):
    """Reference InvertedIndex.score == our host engine on the same index."""
    from improving_learned_index_tpu.index.inverted import InvertedIndexData
    from improving_learned_index_tpu.search.engine import InvertedIndex as OurIndex

    root = pipeline
    if not (root / "ref_inverted" / "vocab.txt").exists():
        if not (root / "ref.quantized").exists():
            ref.quantize_file(root / "collection.index", root / "ref.quantized")
        ref.InvertedIndexCreator(root / "ref.quantized", root / "ref_inverted").run()

    ref_index = ref.InvertedIndex(root / "ref_inverted")
    our_index = OurIndex(InvertedIndexData.load(root / "ref_inverted"))

    vocab = (root / "ref_inverted" / "vocab.txt").read_text().split()
    queries = [
        set(vocab[:3]),
        set(vocab[-2:]),
        {vocab[0], "zz-unknown-term"},
        {"zz-unknown-term"},
        set(),
    ]
    for q in queries:
        theirs = dict(ref_index.score(q, top_k=1000))
        ours = dict(our_index.score_batch([q], top_k=1000)[0])
        assert ours == theirs, f"query {q}: {ours} != {theirs}"


def test_metrics_parity(ref, tmp_path):
    """Reference Metrics and our run_metrics agree on MRR/Recall, including
    fractional-recall and missing-query cases."""
    run = tmp_path / "run.tsv"
    qrels = tmp_path / "qrels.tsv"
    # q1: relevant at ranks 2 and 5 (2 of 3 relevant found);
    # q2: relevant at rank 1 (1 of 1); q3: never retrieved.
    run.write_text(
        "q1\td9\t1\t9.0\nq1\td2\t2\t8.0\nq1\td8\t3\t7.0\nq1\td7\t4\t6.0\nq1\td3\t5\t5.0\n"
        "q2\td1\t1\t4.0\nq2\td6\t2\t3.0\n"
    )
    qrels.write_text(
        "q1\t0\td2\t1\nq1\t0\td3\t1\nq1\t0\td4\t1\n"
        "q2\t0\td1\t1\n"
        "q3\t0\td5\t1\n"
    )
    depths_mrr = [1, 3, 10]
    depths_recall = [1, 3, 10]

    theirs = ref.Metrics(run, qrels, depths_mrr, depths_recall)
    theirs.evaluate()
    n = len(theirs.qrels)
    ref_vals = {f"MRR@{d}": round(theirs.mrr_sums[d] / n, 3) for d in depths_mrr}
    ref_vals.update(
        {f"Recall@{d}": round(theirs.recall_sums[d] / n, 3) for d in depths_recall}
    )

    from improving_learned_index_tpu.evaluation.run_metrics import Metrics as OurMetrics

    ours = OurMetrics(run, qrels, mrr_depths=depths_mrr, recall_depths=depths_recall)
    assert ours.evaluate() == ref_vals
    # sanity: hand-computed MRR@3 = (1/2 + 1/1 + 0) / 3
    assert ref_vals["MRR@3"] == round((0.5 + 1.0) / 3, 3)
