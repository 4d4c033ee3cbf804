"""Sequence-packed TRAINING: pack_collated invariants, packed-vs-unpacked
loss/gradient parity per objective, and a Trainer step on the 8-device mesh.

The packed loss must be the same objective as the reference's
(trainer.py:158-167, distil_trainer.py:81-94) — only the batch layout
changes — so loss and gradients must agree with the unpacked path to fp
tolerance on the fp32 CPU backend."""

import dataclasses

import jax
import numpy as np
import pytest

from improving_learned_index_tpu.core.config import EncoderConfig, TrainConfig
from improving_learned_index_tpu.models import DeepImpact
from improving_learned_index_tpu.parallel.dataloader import BatchLoader
from improving_learned_index_tpu.train import COLLATES, Trainer
from improving_learned_index_tpu.train.packed import (
    PACKABLE_LOSSES,
    pack_collated,
    packing_collate,
    row_buckets,
)
from improving_learned_index_tpu.train.trainer import make_loss_fn

TRIPLES = [
    ("quick fox", "the quick brown fox jumps", "sleepy dog naps inside"),
    ("lazy dog", "the lazy dog sleeps here", "fast fox runs far away"),
    ("sparse index", "inverted indexes map terms postings", "the fox is quick"),
    ("neural text", "neural networks learn text", "dogs and foxes play"),
]


def _model(tiny_tokenizer, act="relu"):
    cfg = EncoderConfig.tiny(vocab_size=len(tiny_tokenizer.vocab), impact_activation=act)
    cfg = dataclasses.replace(cfg, dtype="float32")
    return DeepImpact(cfg, tiny_tokenizer, seed=0)


def _collated(tokenizer, loss, max_length=32):
    if loss in ("distil_kl", "distil_mse"):
        items = [(q, [(pos, 9.0), (neg, 1.0)]) for q, pos, neg in TRIPLES]
    else:
        items = TRIPLES
    return COLLATES[loss](items, tokenizer, max_length)


class TestPackCollated:
    def test_row_buckets_cover_and_align(self):
        assert row_buckets(16, 1) == list(range(1, 17))  # ceil(N/16)=1 steps
        assert row_buckets(16, 8) == [8, 16]
        assert row_buckets(3, 2) == [2, 4]  # every bucket data-axis aligned
        assert row_buckets(64, 1) == [4 * k for k in range(1, 17)]
        # final bucket always covers n_docs
        for n in (1, 5, 17, 33, 100):
            for d in (1, 2, 8):
                bs = row_buckets(n, d)
                assert bs[-1] >= n and all(b % d == 0 for b in bs)
                assert bs == sorted(set(bs))

    def test_layout_roundtrip(self, tiny_tokenizer):
        arrays = _collated(tiny_tokenizer, "pairwise_ce")
        packed = pack_collated(arrays)
        n, seq = arrays["input_ids"].shape
        assert packed["input_ids"].shape == packed["segment_ids"].shape
        assert packed["doc_base"].shape == (n + 1,)
        # every document's tokens appear once, in order, with its mask
        for i in range(n):
            where = packed["doc_index"] == i
            ln = int(arrays["attention_mask"][i].sum())
            assert where.sum() == ln
            np.testing.assert_array_equal(
                packed["input_ids"][where], arrays["input_ids"][i, :ln]
            )
            np.testing.assert_array_equal(
                packed["masks"][where], arrays["masks"][i, :ln]
            )
        # padding slots: dummy doc, segment 0, id 0
        pad = packed["doc_index"] == n
        assert (packed["segment_ids"][pad] == 0).all()
        assert (packed["input_ids"][pad] == 0).all()
        # segments are block-contiguous per row and denser than one doc/row
        assert packed["input_ids"].shape[0] < n


    def test_rejects_left_or_mid_padded_rows(self, tiny_tokenizer):
        """Regression (advisor r3): a left-padded row like [0,1,1,0] has the
        right popcount and a 1 at lengths-1, so the old check passed and
        ids[:2] silently packed the pad token and dropped the last real
        token.  The mask must be contiguous from column 0."""
        arrays = _collated(tiny_tokenizer, "pairwise_ce")
        for bad in ("left", "hole"):
            a = {k: np.array(v, copy=True) for k, v in arrays.items()}
            att = a["attention_mask"]
            ln = int(att[0].sum())
            assert ln >= 3
            if bad == "left":
                att[0, :] = 0
                att[0, 1:ln] = 1  # shifted right by one: att[0,0]==0
            else:
                att[0, 1] = 0
                att[0, ln] = 1  # hole at 1, stray 1 past the end
            with pytest.raises(ValueError, match="right-padded"):
                pack_collated(a)

    def test_rejects_pair_mask_shapes(self, tiny_tokenizer):
        arrays = _collated(tiny_tokenizer, "in_batch_negatives")
        with pytest.raises(ValueError, match="per \\(query, document\\)"):
            pack_collated(arrays)


@pytest.mark.parametrize("loss", list(PACKABLE_LOSSES))
def test_packed_loss_and_grads_match_unpacked(tiny_tokenizer, loss):
    model = _model(tiny_tokenizer, act="softplus")  # no dead-ReLU grad zeros
    loss_fn = make_loss_fn(model.module, loss)
    arrays = _collated(tiny_tokenizer, loss)
    packed = pack_collated(arrays)

    def run(batch):
        b = {k: v for k, v in batch.items() if k != "group_size"}
        return jax.value_and_grad(loss_fn)(model.params, b)

    lu, gu = run(arrays)
    lp, gp = run(packed)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-5)
    flat_u = jax.tree_util.tree_leaves(gu)
    flat_p = jax.tree_util.tree_leaves(gp)
    for a, b in zip(flat_u, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6)


def test_trainer_step_packed_on_mesh(tiny_tokenizer, tmp_path):
    from improving_learned_index_tpu.parallel import make_mesh

    mesh = make_mesh()
    n_data = int(mesh.shape["data"])
    model = _model(tiny_tokenizer)
    cfg = TrainConfig(batch_size=4, lr=1e-3, save_every=10**9, eval_every=10**9,
                      loss="pairwise_ce")
    trainer = Trainer(model, cfg, tmp_path / "packed", mesh=mesh)
    collate = packing_collate(
        lambda b: COLLATES["pairwise_ce"](b, tiny_tokenizer, 32), n_data=n_data
    )
    loader = BatchLoader(TRIPLES * 2, 4, collate, shuffle=False)
    batches = list(loader)
    assert batches[0]["input_ids"].shape[0] % n_data == 0
    first = float(
        trainer._grad_step(trainer.params, trainer._put_batch(batches[0]))[0][0]
    )
    trainer.train(batches * 4, total_steps=8)
    last = float(
        trainer._grad_step(trainer.params, trainer._put_batch(batches[0]))[0][0]
    )
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first


def test_cli_rejects_unpackable_loss(tiny_tokenizer, tmp_path):
    from improving_learned_index_tpu.cli import train as train_cli

    triples = tmp_path / "triples.tsv"
    queries = tmp_path / "queries.tsv"
    collection = tmp_path / "collection.tsv"
    queries.write_text("0\tquick fox\n")
    collection.write_text("0\tthe quick brown fox\n1\tsleepy dog naps\n")
    triples.write_text("0\t0\t1\n")
    vocab_path = tmp_path / "vocab.txt"
    tiny_tokenizer.vocab.save(vocab_path)
    with pytest.raises(SystemExit):  # parser.error: survives python -O
        train_cli.main([
            "--dataset_path", str(triples),
            "--queries_path", str(queries),
            "--collection_path", str(collection),
            "--checkpoint_dir", str(tmp_path / "ckpt"),
            "--vocab_path", str(vocab_path),
            "--in_batch_negatives", "--pack", "--no_beir_eval",
            "--max_length", "32",
        ])


def test_cli_packs_by_default_and_no_pack_opts_out(tiny_tokenizer, tmp_path, monkeypatch):
    """Packing is the measured winner (benchmarks/PACKED_TRAIN.json) so the
    train CLI applies it by default for packable losses; --no_pack restores
    the reference's row-per-document layout; unpackable losses silently
    train unpacked (no flag needed)."""
    from improving_learned_index_tpu.cli import train as train_cli
    from improving_learned_index_tpu.train import packed as packed_mod

    triples = tmp_path / "triples.tsv"
    queries = tmp_path / "queries.tsv"
    collection = tmp_path / "collection.tsv"
    queries.write_text("0\tquick fox\n")
    collection.write_text("0\tthe quick brown fox\n1\tsleepy dog naps\n")
    triples.write_text("0\t0\t1\n0\t0\t1\n")
    vocab_path = tmp_path / "vocab.txt"
    tiny_tokenizer.vocab.save(vocab_path)

    calls = []
    real = packed_mod.packing_collate
    monkeypatch.setattr(
        packed_mod, "packing_collate",
        lambda *a, **k: calls.append(1) or real(*a, **k),
    )
    common = [
        "--dataset_path", str(triples),
        "--queries_path", str(queries),
        "--collection_path", str(collection),
        "--vocab_path", str(vocab_path),
        "--tiny", "--max_length", "32", "--batch_size", "2",
        "--total_steps", "1", "--no_beir_eval", "--save_every", "1000000",
    ]
    assert train_cli.main(common + ["--checkpoint_dir", str(tmp_path / "c1")]) == 0
    assert calls, "pairwise_ce (packable) must pack by default"

    calls.clear()
    assert train_cli.main(
        common + ["--no_pack", "--checkpoint_dir", str(tmp_path / "c2")]
    ) == 0
    assert not calls, "--no_pack must disable packing"

    calls.clear()
    assert train_cli.main(
        common + ["--in_batch_negatives", "--checkpoint_dir", str(tmp_path / "c3")]
    ) == 0
    assert not calls, "unpackable loss must train unpacked without a flag"
