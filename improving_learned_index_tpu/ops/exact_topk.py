"""Exact top-k for integer-valued score rows, without a full sort.

``jax.lax.top_k`` over a [Q, num_docs] score matrix is the dominant cost of
batched retrieval at corpus scale (measured 890ms for [32, 8.8M] k=1000 on
v5e-1, vs 62ms for ``approx_max_k`` at recall 0.99).  Impact scores are sums
of 8-bit quantized impacts, i.e. exact small integers — which admits an
exact selection in a few bandwidth passes:

1. per row, find the k-th score value ``s_k`` (the largest s with
   |{score >= s}| >= k) by **n-ary search** (``_ARITY`` thresholds counted
   per pass; XLA fuses the broadcast-compare into the reduction, so one
   pass still reads the row once) under a ``while_loop`` that stops when
   every row has converged — for realistic impact sums (row max ~2k) that
   is ~4 passes at arity 8, where a fixed bit-by-bit binary search burned
   18;
2. the selected set is: every doc with score > s_k (provably fewer than k),
   plus the first (k - m) docs with score == s_k in doc-id order (the
   reference heapq.nlargest also picks an arbitrary subset of boundary ties,
   inverted_index.py:62).  Both groups collapse into ONE non-decreasing
   selection-rank function ``sel(i) = |{score > s_k}|_{<=i} +
   min(|{score == s_k}|_{<=i}, k - m)`` — the j-th selected doc is the first
   position where sel >= j;
3. ``sel`` is NEVER materialized at full width (a [Q, N] cumsum lowers to a
   log-pass scan — measured ~100ms at [32, 8.8M]).  Instead: per-block
   counts (one fused pass) -> tiny [Q, N/256] exclusive scan -> per target
   rank j, a vectorized searchsorted over block ends finds the owning block,
   a [Q, k, 256] gather pulls just those blocks, and a short local cumsum
   pins the exact position;
4. a final ``lax.top_k`` over the tiny [Q, k] candidate set orders by score
   (stable, so boundary ties stay in doc-id order).

Measured end to end on v5e-1 ([32, 8.8M] k=1000, ~30ms of relay dispatch
included in every number): 177ms as a fixed binary search + full-width
cumsums, ~125ms in this form, vs 890ms exact ``lax.top_k`` and ~65ms
``approx_max_k`` at recall 0.99 — ~7x faster than the exact sort, within 2x
of the approximate kernel while staying exact.

Zero scores are never selected (s_k >= 1); rows with fewer than k positive
docs pad with (score 0, doc 0) entries, which callers filter.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Opt-in Pallas threshold-count kernel for the search passes (ops/count_ge.py)
# — unmeasured on hardware; see its docstring.
_PALLAS_COUNT = os.environ.get("ILI_TOPK_PALLAS") == "1"

_ARITY = 8  # thresholds probed per search pass.  Swept on v5e-1 at
# [32, 8.8M] k=1000: arity 16 = 110.7ms, 8 = 96.0ms, 4 = 96.7ms, 2 =
# 107.5ms end to end — 7 compares/element balances VPU work per pass
# against pass count (log_8 of the score range ~= 4 passes).

_BLOCK = 256  # selection block width: granularity of the rank-j gather


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

    # -- 1. n-ary search for s_k per row over [1, row_max] ---------------------
    lo = jnp.ones((q, 1), jnp.float32)
    hi = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), 1.0)
    frac = jnp.arange(1, _ARITY, dtype=jnp.float32) / _ARITY  # [_ARITY - 1]

    def search_cond(lh):
        lo, hi = lh
        return jnp.any(lo < hi)

    use_pallas_count = (
        _PALLAS_COUNT and jax.default_backend() == "tpu" and n % (1 << 14) == 0
    )

    def search_body(lh):
        lo, hi = lh
        width = hi - lo + 1.0
        t = jnp.minimum(lo + jnp.ceil(frac[None, :] * width), hi)  # [Q, A-1]
        if use_pallas_count:
            from .count_ge import count_ge

            counts = count_ge(scores, t)
        else:
            counts = jnp.sum(
                (scores[:, :, None] >= t[:, None, :]).astype(jnp.int32), axis=1
            )  # [Q, A-1]; XLA fuses the broadcast-compare into the reduce
        ok = counts >= k  # monotone non-increasing along the threshold axis
        new_lo = jnp.max(jnp.where(ok, t, lo), axis=1, keepdims=True)
        new_hi = jnp.minimum(
            jnp.min(jnp.where(ok, jnp.inf, t), axis=1, keepdims=True) - 1.0, hi
        )
        return new_lo, new_hi

    lo, hi = jax.lax.while_loop(search_cond, search_body, (lo, hi))
    s_k = lo  # [Q, 1]; if the row has < k positives, s_k == 1

    # -- 2. block-level selection-rank table (one fused pass + tiny scans) -----
    nb = -(-n // _BLOCK)
    n_pad = nb * _BLOCK
    if n_pad != n:
        scores_pad = jnp.concatenate(
            [scores, jnp.zeros((q, n_pad - n), scores.dtype)], axis=1
        )
    else:
        scores_pad = scores
    blocks = scores_pad.reshape(q, nb, _BLOCK)
    s_k3 = s_k[:, :, None]
    # Pack both counts into one reduction: hi-count in the high 16 bits,
    # eq-count in the low (block counts <= _BLOCK < 2^16) — one pass, not
    # two.  fp32 accumulation is exact (max packed sum 256*65537 < 2^24) and
    # measured ~7ms faster than int32 at [32, 8.8M]; a hand-written Pallas
    # kernel for this pass measured no better than the fused XLA reduction.
    packed = jnp.sum(
        (blocks > s_k3).astype(jnp.float32) * 65536.0
        + (blocks == s_k3).astype(jnp.float32),
        axis=2,
    ).astype(jnp.int32)  # [Q, nb]
    blk_hi = packed >> 16
    blk_eq = packed & 0xFFFF
    scan = partial(jax.lax.associative_scan, jnp.add, axis=1)
    cum_hi = scan(blk_hi)  # [Q, nb]: tiny
    cum_eq = scan(blk_eq)
    m = cum_hi[:, -1:]  # sure-selections per row (< k by construction)
    cap = jnp.maximum(k - m, 0)  # boundary-tie quota
    sel_end = cum_hi + jnp.minimum(cum_eq, cap)  # sel at each block's last doc
    total = sel_end[:, -1:]  # min(k, positives at or above s_k)

    # -- 3. rank j -> owning block -> exact position ---------------------------
    j = jnp.arange(1, k + 1, dtype=jnp.int32)[None, :]  # [1, k]
    targets = jnp.broadcast_to(j, (q, k))
    vs = jax.vmap(partial(jnp.searchsorted, side="left"))
    blk = jnp.minimum(vs(sel_end, targets), nb - 1).astype(jnp.int32)  # [Q, k]
    # Exclusive hi/eq prefixes of each owning block, fetched as ONE
    # slice-gather of a [Q, nb, 2] pack instead of four element gathers.
    pre_pack = jnp.stack([cum_hi - blk_hi, cum_eq - blk_eq], axis=-1)
    pre = jax.vmap(lambda row, b: jnp.take(row, b, axis=0))(pre_pack, blk)  # [Q, k, 2]
    pre_hi = pre[..., 0]
    pre_eq = pre[..., 1]

    # Gather each target's owning block as a contiguous 256-wide slice
    # (jnp.take along the block axis lowers to a slice-gather; flattened
    # element indices lower to an element-wise gather measured ~100x slower).
    seg = jax.vmap(lambda row, b: jnp.take(row, b, axis=0))(blocks, blk)  # [Q, k, B]
    offs3 = jnp.arange(_BLOCK, dtype=jnp.int32)[None, None, :]
    scan2 = partial(jax.lax.associative_scan, jnp.add, axis=2)
    local_hi = scan2((seg > s_k3).astype(jnp.int32))
    local_eq = scan2((seg == s_k3).astype(jnp.int32))
    sel_local = (
        pre_hi[:, :, None]
        + local_hi
        + jnp.minimum(pre_eq[:, :, None] + local_eq, cap[:, :, None])
    )  # [Q, k, BLOCK]: sel at every doc of the owning block
    pos = jnp.minimum(
        jnp.sum((sel_local < targets[:, :, None]).astype(jnp.int32), axis=2), _BLOCK - 1
    )
    idx = blk * _BLOCK + pos  # [Q, k]

    valid = targets <= total
    # Selected values come out of the already-gathered segments as a one-hot
    # multiply-reduce (VPU, bandwidth over [Q, k, BLOCK]); an element gather
    # back into the [Q, N] scores measured +27ms at [32, 8.8M] (~1M elem/s).
    onehot = (offs3 == pos[:, :, None]).astype(seg.dtype)
    vals = jnp.sum(seg * onehot, axis=2)
    vals = jnp.where(valid, vals, 0.0)

    # -- 4. order the k candidates by score ------------------------------------
    vals_sorted, order = jax.lax.top_k(vals, k)
    idx_sorted = jnp.take_along_axis(idx, order, axis=1)
    return vals_sorted, jnp.where(vals_sorted > 0, idx_sorted, 0)
