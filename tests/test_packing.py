"""Sequence packing: packer invariants + packed-vs-unpacked score parity.

The packed encode path must be a pure speed optimization: per-document term
impacts computed from a packed batch (segment-masked attention, per-segment
position ids) must match the unpacked path to fp tolerance, for both BERT
(arange positions) and RoBERTa (pad-offset positions) conventions, through
both the XLA additive-bias path and the short-attention kernel (interpret
mode).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from improving_learned_index_tpu.core.config import EncoderConfig, IndexConfig
from improving_learned_index_tpu.index.indexer import Indexer
from improving_learned_index_tpu.models import DeepImpact
from improving_learned_index_tpu.models.encoder import (
    make_packed_position_ids,
    make_position_ids,
)
from improving_learned_index_tpu.text import ImpactTokenizer, WordPieceVocab
from improving_learned_index_tpu.text.packing import SequencePacker, pack_documents


def _tiny_corpus(n=37, seed=0, min_words=3, max_words=14):
    rng = np.random.default_rng(seed)
    words = [f"tok{i:02d}" for i in range(40)]
    return [
        " ".join(rng.choice(words, size=rng.integers(min_words, max_words)))
        for _ in range(n)
    ]


def _model(activation="softplus", position_offset=0, seed=0, corpus=None):
    corpus = corpus or _tiny_corpus()
    vocab = WordPieceVocab.build(corpus, max_size=128)
    tokenizer = ImpactTokenizer(vocab, max_length=24)
    config = EncoderConfig(
        vocab_size=len(vocab),
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        impact_activation=activation,
        position_offset=position_offset,
        pad_token_id=0 if position_offset == 0 else 1,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    return DeepImpact(config, tokenizer, seed=seed), corpus


class TestPacker:
    def test_all_docs_placed_in_order(self):
        model, corpus = _model()
        encs = [model.process_document(d) for d in corpus]
        batches = list(pack_documents(encs, seq_len=24, rows=4))
        terms = [t for b in batches for t in b.terms]
        assert len(terms) == len(encs)
        for got, enc in zip(terms, encs):
            assert got == list(enc.term_to_token_index.keys())

    def test_segments_contiguous_and_ids_roundtrip(self):
        model, corpus = _model()
        encs = [model.process_document(d) for d in corpus]
        batches = list(pack_documents(encs, seq_len=24, rows=4))
        it = iter(encs)
        for b in batches:
            for r in range(b.segment_ids.shape[0]):
                seg = b.segment_ids[r]
                n_seg = seg.max()
                for s in range(1, n_seg + 1):
                    where = np.nonzero(seg == s)[0]
                    assert where.size > 0
                    assert np.array_equal(where, np.arange(where[0], where[-1] + 1))
                    enc = next(it)
                    n = int(sum(enc.attention_mask))
                    assert np.array_equal(
                        b.input_ids[r, where], np.asarray(enc.ids[:n])
                    )
        # slots point at each term's first token
        flat_ids = batches[0].input_ids.reshape(-1)
        b0 = batches[0]
        for i, enc in enumerate(encs[: b0.n_docs]):
            lo, hi = b0.term_offsets[i], b0.term_offsets[i + 1]
            doc_slots = b0.flat_slots[lo:hi]
            expected = [enc.ids[tok] for tok in enc.term_to_token_index.values()]
            assert list(flat_ids[doc_slots]) == expected

    def test_packing_density_beats_padding(self):
        model, corpus = _model(corpus=_tiny_corpus(200))
        encs = [model.process_document(d) for d in corpus]
        batches = list(pack_documents(encs, seq_len=24, rows=8))
        rows_used = sum(
            int((b.segment_ids.max(axis=1) > 0).sum()) for b in batches
        )
        assert rows_used < len(encs) / 1.7  # ~2 docs per row on this corpus

    def test_doc_longer_than_row_rejected(self):
        model, _ = _model()
        enc = model.process_document(" ".join(["tok00"] * 30))
        packer = SequencePacker(seq_len=8, rows=2)
        with pytest.raises(ValueError):
            list(packer.add(enc))


class TestPackedPositions:
    @pytest.mark.parametrize("position_offset,pad_id", [(0, 0), (2, 1)])
    def test_matches_unpacked_convention(self, position_offset, pad_id):
        config = EncoderConfig(
            vocab_size=32,
            hidden_size=8,
            num_layers=1,
            num_heads=2,
            intermediate_size=16,
            max_position_embeddings=32,
            position_offset=position_offset,
            pad_token_id=pad_id,
        )
        # a packed row: doc A of 3 tokens, doc B of 4, 1 pad
        seg = jnp.asarray([[1, 1, 1, 2, 2, 2, 2, 0]], dtype=jnp.int32)
        got = make_packed_position_ids(seg, config)
        # unpacked rows for the same docs (ids: anything non-pad)
        ids_a = jnp.asarray([[pad_id + 1] * 3 + [pad_id] * 5], dtype=jnp.int32)
        ids_b = jnp.asarray([[pad_id + 1] * 4 + [pad_id] * 4], dtype=jnp.int32)
        pos_a = make_position_ids(ids_a, config)[0, :3]
        pos_b = make_position_ids(ids_b, config)[0, :4]
        assert np.array_equal(np.asarray(got)[0, :3], np.asarray(pos_a))
        assert np.array_equal(np.asarray(got)[0, 3:7], np.asarray(pos_b))


class TestPackedParity:
    @pytest.mark.parametrize("position_offset", [0, 2])
    def test_packed_scores_match_unpacked(self, position_offset):
        model, corpus = _model(position_offset=position_offset)
        expected = model.get_impact_scores_batch(corpus)
        got = model.get_impact_scores_batch_packed(corpus, rows=4)
        assert len(got) == len(expected)
        for e, g in zip(expected, got):
            assert [t for t, _ in e] == [t for t, _ in g]
            np.testing.assert_allclose(
                [v for _, v in e], [v for _, v in g], rtol=2e-4, atol=2e-5
            )

    def test_packed_scores_match_through_short_attention_kernel(self):
        from improving_learned_index_tpu.ops import short_attention as sa

        model, corpus = _model()
        model.config = model.config  # geometry gate: S=24 not %128 -> kernel off
        # exercise the kernel directly in interpret mode at a compliant shape
        old = sa.interpret
        sa.interpret = True
        try:
            rng = np.random.default_rng(0)
            b, h, s, d = 2, 2, 128, 8
            q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
            k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
            seg = np.zeros((b, s), np.int32)
            seg[0, :50] = 1
            seg[0, 50:120] = 2
            seg[1, :128] = 1
            seg = jnp.asarray(seg)
            out = sa.short_attention(q, k, v, seg, 0.125, True)
            ref = sa._reference_attention(q, k, v, seg, 0.125, True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-3
            )
            # block-diagonality leak detector: v carries its segment id, so
            # a convex combination within one segment returns that id exactly
            # (to bf16 prob rounding) while ANY cross-segment attention pulls
            # the value toward the other id
            v_seg = jnp.broadcast_to(
                jnp.asarray(seg, jnp.float32)[:, None, :, None], v.shape
            )
            out1 = np.asarray(sa.short_attention(q, k, v_seg, seg, 0.125, True))
            np.testing.assert_allclose(out1[0, :, :50], 1.0, atol=5e-3)
            np.testing.assert_allclose(out1[0, :, 50:120], 2.0, atol=1e-2)
            np.testing.assert_allclose(out1[1], 1.0, atol=5e-3)
        finally:
            sa.interpret = old

    def test_indexer_packed_output_identical(self, tmp_path):
        model, corpus = _model()
        base = Indexer(model, IndexConfig(max_length=24, max_terms=24, model_batch_size=8))
        packed = Indexer(
            model,
            IndexConfig(
                max_length=24, max_terms=24, model_batch_size=8, pack_sequences=True
            ),
        )
        a = tmp_path / "fwd_base.txt"
        b = tmp_path / "fwd_packed.txt"
        coll = tmp_path / "coll.tsv"
        coll.write_text(
            "".join(f"{i}\t{doc}\n" for i, doc in enumerate(corpus)), encoding="utf-8"
        )
        base.index_to_file(coll, a)
        packed.index_to_file(coll, b)
        la = a.read_text(encoding="utf-8").splitlines()
        lb = b.read_text(encoding="utf-8").splitlines()
        assert len(la) == len(lb) == len(corpus)
        # round-to-3-decimals output: bit-level agreement can differ in the
        # last digit only on fp ties; require full equality on >99% of lines
        # and per-term closeness everywhere
        diff = 0
        for x, y in zip(la, lb):
            if x != y:
                diff += 1
                tx = dict(
                    (p.rsplit(": ", 1)[0], float(p.rsplit(": ", 1)[1]))
                    for p in x.split(", ")
                    if p
                )
                ty = dict(
                    (p.rsplit(": ", 1)[0], float(p.rsplit(": ", 1)[1]))
                    for p in y.split(", ")
                    if p
                )
                assert tx.keys() == ty.keys()
                for t in tx:
                    assert abs(tx[t] - ty[t]) <= 2e-3, (t, tx[t], ty[t])
        assert diff <= max(1, len(la) // 50)

    def test_packed_resume_consistent(self, tmp_path):
        """Packed encode + crash-resume: restart mid-stream re-encodes only
        the missing tail and the result matches an uninterrupted run."""
        model, corpus = _model()
        cfg = IndexConfig(
            max_length=24, max_terms=24, model_batch_size=8, pack_sequences=True
        )
        coll = tmp_path / "coll.tsv"
        coll.write_text(
            "".join(f"{i}\t{doc}\n" for i, doc in enumerate(corpus)), encoding="utf-8"
        )
        full = tmp_path / "full.txt"
        Indexer(model, cfg).index_to_file(coll, full)
        partial = tmp_path / "partial.txt"
        lines = full.read_text(encoding="utf-8").splitlines(keepends=True)
        partial.write_text("".join(lines[:11]) + "torn: 0.1", encoding="utf-8")
        n = Indexer(model, cfg).index_to_file(coll, partial, resume=True)
        assert n == len(corpus)
        assert partial.read_text(encoding="utf-8") == full.read_text(encoding="utf-8")
