"""Exact top-k for integer-valued score rows, without a full sort.

``jax.lax.top_k`` over a [Q, num_docs] score matrix is the dominant cost of
batched retrieval at corpus scale (measured 943ms for [64, 1M] k=1000 on
v5e-1, vs 128ms for ``approx_max_k`` at recall 0.99).  Impact scores are sums
of 8-bit quantized impacts, i.e. exact small integers — which admits an
exact selection in a handful of bandwidth passes:

1. per row, binary-search the k-th score value ``s_k`` (the largest s with
   |{score >= s}| >= k) over the integer range [1, row_max] — ~18 masked
   count-reductions over the row (pure HBM bandwidth, ~6ms);
2. the selected set is: every doc with score > s_k (provably fewer than k),
   plus the first (k - m) docs with score == s_k in doc-id order (the
   reference heapq.nlargest also picks an arbitrary subset of boundary ties,
   inverted_index.py:62).  Both groups collapse into ONE non-decreasing
   selection-rank array:  ``sel = cumsum(score > s_k) + min(cumsum(score ==
   s_k), k - m)`` — the j-th selected doc is the first position where sel
   >= j;
3. positions are recovered WITHOUT sort or scatter by a two-level
   vectorized binary search: a [Q, N/512] block-end table narrows each
   target to a 512-wide block (log-steps over a small, cache-resident
   table), then 9 branchless halving steps probe the big array — ~9 HBM
   gather rounds of [Q, k] elements instead of a 943ms sorting network;
4. a final ``lax.top_k`` over the tiny [Q, k] candidate set orders by score.

Measured end to end on v5e-1: [64, 1M] k=1000 in ~45ms — ~20x faster than
exact ``lax.top_k`` and ~3x faster than ``approx_max_k`` while staying exact.

Zero scores are never selected (s_k >= 1); rows with fewer than k positive
docs pad with (score 0, doc 0) entries, which callers filter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Scores are sums of <= max_length uint8 impacts: 255 * 512 < 2^17.  18
# iterations cover any realistic impact sum; fp32 arithmetic is exact here.
_MAX_SCORE_BITS = 18

_BLOCK = 512  # two-level search block width (power of 2)


def _blocked_searchsorted(table: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-row first index where ``table[row, i] >= target`` for
    non-decreasing int32 rows.  [Q, N] table, [Q, K] targets -> [Q, K].

    Level 1 scans a [Q, ceil(N/512)] block-end summary; level 2 does 9
    branchless halving probes inside the 512-wide block.  Targets larger
    than the row total return clamped garbage — callers mask them.
    """
    q, n = table.shape
    nb = -(-n // _BLOCK)
    n_pad = nb * _BLOCK
    if n_pad != n:
        table = jnp.concatenate(
            [table, jnp.broadcast_to(table[:, -1:], (q, n_pad - n))], axis=1
        )
    block_ends = table[:, _BLOCK - 1 :: _BLOCK]  # [Q, nb]

    vs = jax.vmap(partial(jnp.searchsorted, side="left"))
    blk = jnp.minimum(vs(block_ends, targets), nb - 1).astype(jnp.int32)

    pos = blk * _BLOCK
    half = _BLOCK // 2
    while half >= 1:
        probe = jnp.take_along_axis(table, pos + half - 1, axis=1)
        pos = jnp.where(probe < targets, pos + half, pos)
        half //= 2
    return jnp.minimum(pos, n - 1)


@partial(jax.jit, static_argnums=(1,))
def exact_topk_integer(scores: jnp.ndarray, k: int):
    """Exact top-k over integer-valued non-negative fp32 scores.

    Args:
        scores: [Q, N] float32, integer-valued, >= 0.
        k: number of results per row (static).
    Returns:
        (values [Q, k] float32 desc-sorted, indices [Q, k] int32).  Rows with
        fewer than k positive scores pad with value 0.
    """
    q, n = scores.shape
    k = min(k, n)

    # -- 1. binary search s_k per row over [1, row_max] ------------------------
    lo = jnp.ones((q, 1), jnp.float32)
    hi = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), 1.0)

    def bs_step(_, lh):
        lo, hi = lh
        mid = jnp.floor((lo + hi + 1.0) * 0.5)
        count = jnp.sum((scores >= mid).astype(jnp.int32), axis=1, keepdims=True)
        ok = count >= k
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1.0)

    lo, hi = jax.lax.fori_loop(0, _MAX_SCORE_BITS, bs_step, (lo, hi))
    s_k = lo  # [Q, 1]; if the row has < k positives, s_k == 1

    # -- 2. one combined selection-rank array ----------------------------------
    pos_hi = jnp.cumsum((scores > s_k).astype(jnp.int32), axis=1)
    pos_eq = jnp.cumsum((scores == s_k).astype(jnp.int32), axis=1)
    m = pos_hi[:, -1:]  # sure-selections per row (< k by construction)
    sel = pos_hi + jnp.minimum(pos_eq, jnp.maximum(k - m, 0))
    total = sel[:, -1:]  # min(k, positives at or above s_k)

    # -- 3. recover the j-th selected position ----------------------------------
    j = jnp.arange(k, dtype=jnp.int32)[None, :]
    idx = _blocked_searchsorted(sel, jnp.broadcast_to(j + 1, (q, k))).astype(jnp.int32)
    valid = j < total
    vals = jnp.take_along_axis(scores, idx, axis=1)
    vals = jnp.where(valid, vals, 0.0)

    # -- 4. order the k candidates by score ------------------------------------
    vals_sorted, order = jax.lax.top_k(vals, k)
    idx_sorted = jnp.take_along_axis(idx, order, axis=1)
    return vals_sorted, jnp.where(vals_sorted > 0, idx_sorted, 0)
