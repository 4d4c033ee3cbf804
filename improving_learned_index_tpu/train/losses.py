"""Training objectives — numerical parity with the reference's torch losses.

- ``pairwise_ce``    : cross-entropy over (positive, negatives) score rows
  with the positive at column 0 (reference training/trainer.py:163-167:
  ``CrossEntropyLoss`` with all-zero labels).
- ``distil_margin_mse``: MSE between student and teacher (pos - neg) margins
  (reference training/distil_trainer.py:6-31, arXiv:2010.02666).
- ``distil_kl``      : KL(softmax(teacher) || log_softmax(student)), summed
  over the score dim, averaged over batch; 1-D and 2-D aware
  (reference distil_trainer.py:34-75, arXiv:2010.11386).

All are pure jnp functions of (student_scores, targets) so they jit into the
training step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_ce(scores: jnp.ndarray) -> jnp.ndarray:
    """scores: [B, n] with the positive document's score in column 0.
    Cross-entropy with label 0 == -log_softmax(scores)[:, 0], averaged."""
    log_probs = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(log_probs[:, 0])


def distil_margin_mse(scores: jnp.ndarray, teacher_scores: jnp.ndarray) -> jnp.ndarray:
    """scores/teacher_scores: [B, n], column 0 positive, rest negatives.
    MSE over per-negative margins."""
    student_margin = scores[:, :1] - scores[:, 1:]
    teacher_margin = teacher_scores[:, :1] - teacher_scores[:, 1:]
    return jnp.mean((student_margin - teacher_margin) ** 2)


def distil_kl(scores: jnp.ndarray, teacher_scores: jnp.ndarray) -> jnp.ndarray:
    """KL divergence distillation.

    2-D [B, n]: sum KL over n, mean over B.  1-D [n]: sum (a single group —
    the reference's flattened path, distil_trainer.py:48-53)."""
    if scores.ndim == 1:
        scores = scores[None, :]
        teacher_scores = teacher_scores[None, :]
    student_log = jax.nn.log_softmax(scores, axis=-1)
    teacher = jax.nn.softmax(teacher_scores, axis=-1)
    # torch KLDivLoss: target * (log(target) - input); 0 * log(0) := 0.
    teacher_log = jnp.where(teacher > 0, jnp.log(jnp.where(teacher > 0, teacher, 1.0)), 0.0)
    kl = teacher * (teacher_log - student_log)
    return jnp.mean(jnp.sum(kl, axis=-1))


LOSSES = {
    "pairwise_ce": pairwise_ce,
    "distil_kl": distil_kl,
    "distil_mse": distil_margin_mse,
}
