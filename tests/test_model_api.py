"""DeepImpact wrapper API + end-to-end encode->index->search slice."""

import numpy as np
import pytest

from improving_learned_index_tpu.core.config import EncoderConfig, IndexConfig
from improving_learned_index_tpu.index import Indexer
from improving_learned_index_tpu.models import DeepImpact, DeepImpactCrossEncoder
from improving_learned_index_tpu.search import DeviceSearchEngine, InvertedIndex


@pytest.fixture(scope="module")
def model(request):
    tiny_tokenizer = request.getfixturevalue("tiny_tokenizer")
    cfg = EncoderConfig.tiny(vocab_size=len(tiny_tokenizer.vocab))
    return DeepImpact(cfg, tiny_tokenizer, seed=0)


def test_get_impact_scores(model):
    impacts = model.get_impact_scores("the quick brown fox")
    terms = [t for t, _ in impacts]
    assert terms == ["the", "quick", "brown", "fox"]
    assert all(s >= 0 for _, s in impacts)


def test_get_impact_scores_batch_consistent(model):
    docs = ["the quick brown fox", "a lazy dog sleeps", "fox fox fox"]
    batch = model.get_impact_scores_batch(docs)
    assert len(batch) == 3
    single = model.get_impact_scores(docs[0])
    assert [t for t, _ in batch[0]] == [t for t, _ in single]
    np.testing.assert_allclose(
        [s for _, s in batch[0]], [s for _, s in single], rtol=1e-5, atol=1e-5
    )
    # dedup: 'fox' appears once
    assert [t for t, _ in batch[2]] == ["fox"]


def test_compute_term_impacts_from_raw_outputs(model):
    enc = model.process_document("the quick fox")
    import jax.numpy as jnp

    ids = jnp.asarray([enc.ids], dtype=jnp.int32)
    out = model(ids, jnp.asarray([enc.attention_mask], dtype=jnp.int32))
    impacts = model.compute_term_impacts([enc.term_to_token_index], out)[0]
    direct = model.get_impact_scores("the quick fox")
    assert dict(impacts).keys() == dict(direct).keys()
    for (t1, s1), (t2, s2) in zip(sorted(impacts), sorted(direct)):
        assert t1 == t2
        assert abs(s1 - s2) < 1e-5


def test_end_to_end_slice(model, tiny_corpus):
    """Encode corpus -> quantize -> invert -> device search -> relevant doc
    ranks first (the config-1 slice of BASELINE.json, on a tiny model)."""
    indexer = Indexer(model, IndexConfig(max_length=32, max_terms=32, model_batch_size=4))
    inv, max_val = indexer.build_inverted(tiny_corpus)
    assert max_val > 0
    assert inv.num_docs == len(tiny_corpus)
    assert inv.num_postings > 0
    assert np.all(inv.impacts <= 255)

    host = InvertedIndex(inv)
    device = DeviceSearchEngine(inv)
    queries = [model.process_query("quick brown fox"), model.process_query("inverted indexes")]
    h = host.score_batch(queries, top_k=8)
    d = device.score_batch(queries, top_k=8)
    for hr, dr in zip(h, d):
        assert dict(hr) == dict(dr)
    # scoring is the sum of quantized impacts of matching terms: check vs
    # forward computation for query 0.
    scale = 255 / max_val
    impacts = model.get_impact_scores_batch(tiny_corpus)
    expected = {}
    for doc_id, term_impacts in enumerate(impacts):
        s = sum(int(v * scale) for t, v in term_impacts if t in queries[0] and int(v * scale) > 0)
        if s > 0:
            expected[doc_id] = s
    assert dict(h[0]) == expected


def test_cross_encoder_scores(request):
    tok = request.getfixturevalue("tiny_tokenizer")
    cfg = EncoderConfig.tiny(vocab_size=len(tok.vocab))
    ce = DeepImpactCrossEncoder(cfg, tok, seed=1)
    encs = ce.process_cross_encoder_documents_and_query(
        ["the quick brown fox", "sleepy dog"], "brown fox"
    )
    scores = ce.score_batch(encs)
    assert scores.shape == (2,)
    assert np.all(scores >= 0)


def test_checkpoint_save_load(model, tmp_path):
    from improving_learned_index_tpu.core.checkpoint import load_params, save_params

    p = tmp_path / "model.msgpack"
    model.save(p)
    restored = load_params(p, like=model.params)
    import jax

    leaves1 = jax.tree_util.tree_leaves(model.params)
    leaves2 = jax.tree_util.tree_leaves(restored)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mesh_data_parallel_encode_matches_single(tiny_tokenizer, tiny_corpus, cpu_devices):
    """encode_term_scores with a mesh shards the batch over the data axis
    (torch DataParallel replacement) and matches single-device output."""
    import numpy as np

    from improving_learned_index_tpu.core.config import EncoderConfig, MeshConfig
    from improving_learned_index_tpu.models import DeepImpact
    from improving_learned_index_tpu.parallel.mesh import make_mesh

    cfg = EncoderConfig.tiny(vocab_size=len(tiny_tokenizer.vocab))
    single = DeepImpact(cfg, tiny_tokenizer, seed=0)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    sharded = DeepImpact(cfg, tiny_tokenizer, seed=0, mesh=mesh)

    encs = [tiny_tokenizer.process_document(d) for d in tiny_corpus[:5]]
    s1, t1 = single.encode_term_scores(encs, max_terms=16)
    s2, t2 = sharded.encode_term_scores(encs, max_terms=16)
    assert t1 == t2
    np.testing.assert_allclose(s1, s2, rtol=2e-5, atol=2e-5)
    # inputs actually landed sharded: batch padded to >= 8
    assert s2.shape == s1.shape
