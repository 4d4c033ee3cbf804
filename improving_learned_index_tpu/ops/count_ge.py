"""Pallas multi-threshold count: ``counts[q, a] = |{scores[q, :] >= t[q, a]}|``.

The n-ary threshold search in ``ops.exact_topk`` runs one of these counts
per pass (_ARITY - 1 thresholds per row, ~4 passes at serving shapes).
The XLA form — ``sum((scores[:, :, None] >= t[:, None, :]), axis=1)`` —
reduces over the *middle* axis with a tiny [Q, T] output, a shape XLA
handles far from HBM bandwidth.  The arithmetic floor is one read of the
score matrix plus T compares/element: ~2ms at [32, 8.8M] on v5e, while
the engine's measured search step implies much more per pass.

This kernel streams [Q, TILE] score tiles through VMEM and accumulates the
[Q, 128] count block in place across grid steps (output revisiting keeps
it VMEM-resident; only the final block is written back).  Counts
accumulate in fp32 — exact below 2^24, far above any [Q, N] row length we
serve.

Opt-in (exact_topk reads ILI_TOPK_PALLAS=1).  Measured on v5e-1
(benchmarks/topk_profile.py, tpu_validation.log 2026-08-18): exact match
with the XLA form, but no speed win — one count pass times at 24-25ms for
BOTH paths at [32, 8.8M] and [64, 1M], which is the ~22ms axon relay
dispatch floor, not compute (the bandwidth floor is ~1.4ms).  A sync-
timed single op cannot resolve below the dispatch floor here, and in the
pipelined engine the pass overlaps adjacent stages anyway, so the default
stays XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1 << 14  # docs per grid step: [64, 16384] fp32 = 4MB VMEM
_TPAD = 128      # thresholds padded to one lane tile


def _make_kernel(n_thresh: int):
    def _count_kernel(scores_ref, t_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        tile = scores_ref[...]  # [Q, TILE]
        # One compare+reduce per threshold lane: [Q, TILE] >= [Q, 1] -> sum
        # over lanes -> [Q].  Unrolled over the static threshold count.
        for a in range(n_thresh):
            cnt = jnp.sum((tile >= t_ref[:, a][:, None]).astype(jnp.float32), axis=1)
            out_ref[:, a] += cnt

    return _count_kernel


def count_ge(scores: jnp.ndarray, thresholds: jnp.ndarray, *, interpret: bool = False):
    """Return [Q, T] int32 counts of scores >= threshold, per row.

    ``scores``: [Q, N] fp32 with N % 16384 == 0 (the engine pads corpus
    scores to 65536-doc tiles, a multiple).  ``thresholds``: [Q, T] fp32
    with T <= 128 (static).
    """
    q, n = scores.shape
    n_thresh = thresholds.shape[1]
    assert n % _TILE == 0, n
    assert n_thresh <= _TPAD
    t_pad = jnp.zeros((q, _TPAD), thresholds.dtype)
    t_pad = jax.lax.dynamic_update_slice(t_pad, thresholds, (0, 0))

    out = pl.pallas_call(
        _make_kernel(n_thresh),
        grid=(n // _TILE,),
        in_specs=[
            pl.BlockSpec((q, _TILE), lambda s: (0, s)),
            pl.BlockSpec((q, _TPAD), lambda s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((q, _TPAD), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, _TPAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scores, t_pad)
    return out[:, :n_thresh].astype(jnp.int32)
