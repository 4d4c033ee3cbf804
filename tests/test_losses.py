"""Loss parity against the reference's torch implementations."""

import numpy as np
import pytest

from improving_learned_index_tpu.train.losses import (
    distil_kl,
    distil_margin_mse,
    pairwise_ce,
)

torch = pytest.importorskip("torch")


def test_pairwise_ce_matches_torch():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(4, 3)).astype(np.float32)
    # reference: CrossEntropyLoss(outputs, zeros) (trainer.py:163-167)
    ref = torch.nn.CrossEntropyLoss()(
        torch.tensor(scores), torch.zeros(4, dtype=torch.long)
    ).item()
    got = float(pairwise_ce(scores))
    assert abs(got - ref) < 1e-6


def test_margin_mse_matches_torch():
    rng = np.random.default_rng(1)
    out = rng.normal(size=(4, 6)).astype(np.float32)
    tgt = rng.normal(size=(4, 6)).astype(np.float32)

    # reference DistilMarginMSE (distil_trainer.py:6-31)
    o, t = torch.tensor(out), torch.tensor(tgt)
    student_margin = o[:, 0].unsqueeze(1) - o[:, 1:]
    teacher_margin = t[:, 0].unsqueeze(1) - t[:, 1:]
    ref = torch.nn.MSELoss()(student_margin, teacher_margin).item()

    got = float(distil_margin_mse(out, tgt))
    assert abs(got - ref) < 1e-6


def _torch_kl(out, tgt, dim):
    o, t = torch.tensor(out), torch.tensor(tgt)
    student = torch.log_softmax(o, dim=dim)
    teacher = torch.softmax(t, dim=dim)
    loss = torch.nn.KLDivLoss(reduction="none")(student, teacher)
    if dim == 0:
        return loss.sum().item()
    return loss.sum(dim=1).mean(dim=0).item()


def test_distil_kl_matches_torch_2d():
    rng = np.random.default_rng(2)
    out = rng.normal(size=(3, 5)).astype(np.float32)
    tgt = rng.normal(size=(3, 5)).astype(np.float32)
    ref = _torch_kl(out, tgt, dim=1)
    got = float(distil_kl(out, tgt))
    assert abs(got - ref) < 1e-6


def test_distil_kl_matches_torch_1d():
    # reference's 1-D path (distil_trainer.py:48-53): softmax over dim 0, sum
    rng = np.random.default_rng(3)
    out = rng.normal(size=(5,)).astype(np.float32)
    tgt = rng.normal(size=(5,)).astype(np.float32)
    ref = _torch_kl(out, tgt, dim=0)
    got = float(distil_kl(out, tgt))
    assert abs(got - ref) < 1e-6
