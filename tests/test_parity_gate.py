"""Mechanism validation for the real-weights parity gate (VERDICT r3
missing #2): scripts/parity_gate.py --selftest builds a tiny random
HF-format checkpoint + local BEIR-format datasets, runs the reference's
actual SparseSearch (torch side) and our NanoBEIREvaluator (JAX side) on
identical weights, and the nDCG@10 delta must be zero.  This proves the
gate's plumbing end-to-end so it can be trusted the moment real weights
(e.g. soyuj/deeper-impact) and NanoBEIR data reach the machine."""

import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


@pytest.fixture()
def parity_gate():
    sys.path.insert(0, str(SCRIPTS))
    try:
        import parity_gate as pg

        yield pg
    finally:
        sys.path.remove(str(SCRIPTS))


def test_parity_gate_selftest_zero_delta(parity_gate, tmp_path):
    ckpt, data = parity_gate.build_selftest_fixture(tmp_path)
    worst, deltas, rows = parity_gate.run_gate(
        ckpt, data, tol=1e-6, max_length=64
    )
    assert worst <= 1e-6, deltas
    assert set(deltas) == {"alpha", "beta"}
    # scores are real retrieval numbers, not degenerate constants
    assert all(0.0 < ref < 1.0 for _, ref, _, _ in rows)


def test_parity_gate_is_weight_sensitive(parity_gate, tmp_path):
    """Different weights must move the measured nDCG: guards against a
    gate whose two sides trivially agree because neither depends on the
    checkpoint."""
    _, data = parity_gate.build_selftest_fixture(tmp_path / "a", seed=0)
    ckpt_b, _ = parity_gate.build_selftest_fixture(tmp_path / "b", seed=123)
    worst_a, _, rows_a = parity_gate.run_gate(
        tmp_path / "a" / "checkpoint", data, tol=1e-6, max_length=64
    )
    worst_b, _, rows_b = parity_gate.run_gate(
        ckpt_b, data, tol=1e-6, max_length=64
    )
    # both self-consistent, but with DIFFERENT retrieval quality
    assert worst_a <= 1e-6 and worst_b <= 1e-6
    assert [r[1] for r in rows_a] != [r[1] for r in rows_b]


def test_parity_gate_trained_selftest(parity_gate, tmp_path):
    """Round-5: trained weights through both stacks.  The fixture checkpoint
    is trained with THIS repo's loop to a measurably lower loss, exported
    back to HF format (flax_deep_impact_to_hf), and the gate must still be
    zero-delta — trained impact distributions (ReLU knees, learned score>0
    filtering) exercised, not just random init."""
    ckpt, data = parity_gate.build_selftest_fixture(tmp_path)
    before = parity_gate.load_state_dict(ckpt)
    parity_gate.train_selftest_checkpoint(ckpt, data, steps=8)
    after = parity_gate.load_state_dict(ckpt)
    # training moved the weights that were exported
    import numpy as np

    k = "impact_score_encoder.0.weight"
    assert float(np.abs(before[k].numpy() - after[k].numpy()).max()) > 1e-5
    worst, deltas, rows = parity_gate.run_gate(ckpt, data, tol=1e-6, max_length=64)
    assert worst <= 1e-6, deltas
    assert all(0.0 < ref < 1.0 for _, ref, _, _ in rows)


def test_hf_export_import_roundtrip(parity_gate, tmp_path):
    """flax_deep_impact_to_hf is the exact inverse of hf_deep_impact_to_flax:
    export-then-import reproduces the tree bit-exactly."""
    import jax
    import numpy as np

    from improving_learned_index_tpu.models.hf_import import (
        flax_deep_impact_to_hf,
        hf_deep_impact_to_flax,
    )

    ckpt, _ = parity_gate.build_selftest_fixture(tmp_path)
    config = parity_gate.encoder_config_from_hf(ckpt)
    tree = hf_deep_impact_to_flax(parity_gate.load_state_dict(ckpt), config)
    sd = flax_deep_impact_to_hf(tree, config)
    tree2 = hf_deep_impact_to_flax(sd, config)
    flat1 = jax.tree_util.tree_leaves_with_path(tree)
    flat2 = jax.tree_util.tree_leaves_with_path(tree2)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p1))
