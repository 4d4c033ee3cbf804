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
