"""Corpus-scale TPU query engine: dense heavy-term matmul + tail scatter
+ exact integer top-k.

This is the doc-block redesign the round-1 device engine docstring promised:
the replacement for the reference's per-query Python postings loop
(src/deep_impact/inverted_index/inverted_index.py:55-62) that stays ahead of
a native CPU engine at 1M+ docs.

Why the old path lost: XLA lowers the [Q, num_docs] scatter-add of posting
impacts to a *serialized* scatter (~232ms for 64 queries x 5.7M postings on
v5e-1) and exact ``lax.top_k`` over [64, 1M] costs another ~386ms.  Both are
latency, not bandwidth, limits — the wrong regime for a TPU.

Redesign, in MXU/bandwidth terms:

- **Heavy terms become dense rows.**  Posting lists with >= ``heavy_min``
  entries are materialized once, at index load, as dense bf16 rows of a
  [T_heavy, num_docs] matrix in HBM (quantized impacts <= 255 are exact in
  bf16).  Scoring a query batch is then ONE matmul: a tiny one-hot query-term
  matrix [Q, T_heavy] against the dense matrix — MXU work at hundreds of
  TFLOP/s instead of serialized scatter.  Zipf makes this cheap: few terms
  are heavy, but they own most postings.
- **Tail terms keep the gather + scatter-add path.**  The scatter only sees
  the short lists, so its serialized cost drops by the heavy coverage ratio.
- **Exact top-k without sorting** via ops.exact_topk (16-ary threshold
  search + block-level rank tables): integer impact sums make the k-th
  score findable in a few bandwidth passes; boundary ties resolve in
  doc-id order like the reference's heapq over insertion-ordered dicts.

The public contract matches the other engines: ``score_batch(term_sets, k)``
-> per query, a list of (doc_id, score) with score > 0, exact scores, exact
top-k set (modulo arbitrary choice among k-th-score ties).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SearchConfig
from ..index.inverted import InvertedIndexData
from ..ops.exact_topk import exact_topk_integer

TAIL_CHUNK = 512


def _bucket(n: int, base: int = 16) -> int:
    b = base
    while b < n:
        b *= 2
    return b


def expand_tail_chunks(starts, ends, rows, chunk):
    """Vectorized per-term -> per-chunk table expansion.

    ``starts``/``ends``: int64 posting ranges per tail term; ``rows``: the
    query row each term belongs to.  Splits every range into windows of
    ``chunk`` postings and returns (chunk_starts, chunk_lengths, chunk_rows)
    as int32 arrays — the layout the tail-scatter kernels consume.  Replaces
    a per-term/per-chunk Python loop (numpy repeat/arange arithmetic: ~50x
    at 64 queries x 32 terms, benchmarks/host_prep_bench.py)."""
    n_chunks = -(-(ends - starts) // chunk)
    total = int(n_chunks.sum())
    if total == 0:
        e = np.empty(0, np.int32)
        return e, e.copy(), e.copy()
    firsts = np.zeros(len(starts) + 1, np.int64)
    np.cumsum(n_chunks, out=firsts[1:])
    term_of = np.repeat(np.arange(len(starts)), n_chunks)
    within = np.arange(total, dtype=np.int64) - firsts[term_of]
    cs = starts[term_of] + within * chunk
    cl = np.minimum(chunk, ends[term_of] - cs)
    return (
        cs.astype(np.int32),
        cl.astype(np.int32),
        rows[term_of].astype(np.int32),
    )


_SCATTER_TILE = 1 << 16  # docs per tile: a [Q, TILE] fp32 window is VMEM-resident
_SCATTER_WIN = 4096      # updates applied per on-tile pass
# Flat-scatter cost grows with operand size (HBM RMW locality); the tiled
# path pays a fixed sort + tile-loop overhead.  Measured crossover on v5e-1:
# 1M docs flat wins (797 vs 607 q/s pipelined), 8.8M docs tiled wins
# (312 vs 203 q/s).  With use_pallas=True (opt-in) the Pallas kernels
# below replace both on TPU for integer-score indexes.
_TILED_MIN_DOCS = 4 << 20
# From this corpus size n_pad is tile-aligned (<= 12.5% pad) so the Pallas
# gather/scatter kernels can apply; measured 2.3x on the tail scatter and
# ~4x on the heavy stage at 1M docs / 44M postings (ops/scatter_scores.py,
# ops/gather_rows.py docstrings).
_PALLAS_MIN_DOCS = 1 << 19


def _apply_tail_tiled(scores, d, v, r, valid):
    """Scatter-add tail updates via doc-sorted, VMEM-tile-resident passes.

    XLA lowers a scatter-add into a [Q, num_docs] operand to serialized
    per-update RMW against HBM (measured ~88ms for 262k updates at 8.8M
    docs, vs near-zero for the same updates into a [Q, 65536] operand that
    stays on-chip).  So: sort updates by doc (carrying value + query row),
    find each 64k-doc tile's update range with one searchsorted over the
    sorted docs, then per tile dynamic-slice the [Q, TILE] window, apply its
    updates on-chip in ceil(count/WIN) masked windows (a while_loop, so
    skewed tiles stay exact), and write the tile back.  Total cost: one
    device sort of E entries + one read+write sweep of the scores array —
    ~6x cheaper than the flat scatter at MSMARCO scale.
    """
    q, n_pad = scores.shape
    e = d.shape[0]
    n_tiles = n_pad // _SCATTER_TILE
    # spread padding entries (value 0) pseudo-uniformly so no tile absorbs
    # them all — a zero add at any in-range position is harmless
    pad_docs = (jnp.arange(e, dtype=jnp.int32) * 97) % n_pad
    d = jnp.where(valid, d, pad_docs)
    sd, sv, sr = jax.lax.sort((d, v, r), num_keys=1)
    tile_bounds = jnp.searchsorted(
        sd, jnp.arange(n_tiles + 1, dtype=jnp.int32) * _SCATTER_TILE
    ).astype(jnp.int32)
    # pad the sorted arrays so the windowed dynamic_slice never clamps
    zpad = jnp.zeros(_SCATTER_WIN, jnp.int32)
    sd = jnp.concatenate([sd, zpad])
    sr = jnp.concatenate([sr, zpad])
    sv = jnp.concatenate([sv, zpad.astype(sv.dtype)])

    def tile_body(t, scores):
        lo = tile_bounds[t]
        hi = tile_bounds[t + 1]
        tile = jax.lax.dynamic_slice(scores, (0, t * _SCATTER_TILE), (q, _SCATTER_TILE))

        def win_cond(state):
            j, _ = state
            return lo + j * _SCATTER_WIN < hi

        def win_body(state):
            j, tile = state
            s0 = lo + j * _SCATTER_WIN
            dd = jax.lax.dynamic_slice(sd, (s0,), (_SCATTER_WIN,))
            vv = jax.lax.dynamic_slice(sv, (s0,), (_SCATTER_WIN,))
            rr = jax.lax.dynamic_slice(sr, (s0,), (_SCATTER_WIN,))
            ok = s0 + jnp.arange(_SCATTER_WIN, dtype=jnp.int32) < hi
            dd = jnp.where(ok, dd - t * _SCATTER_TILE, 0)
            rr = jnp.where(ok, rr, 0)
            vv = jnp.where(ok, vv, 0.0)
            return j + 1, tile.at[rr, dd].add(vv)

        _, tile = jax.lax.while_loop(win_cond, win_body, (jnp.int32(0), tile))
        return jax.lax.dynamic_update_slice(scores, tile, (0, t * _SCATTER_TILE))

    return jax.lax.fori_loop(0, n_tiles, tile_body, scores)


def _apply_tail_partitioned(scores, d, v, r, tile_bounds):
    """Tile sweep over host-pre-partitioned updates — no per-batch sort.

    Same VMEM-tile-resident apply as ``_apply_tail_tiled``, but the per-tile
    update ranges arrive from the host: when the index's tail postings are
    doc-sorted within each term at load time (``_partition_tail_by_doc``),
    query prep splits every term's posting range at 64k-doc tile boundaries
    with one table lookup, orders the chunk table by tile, and hands the
    flat gathered stream's tile boundaries straight to this sweep.  The
    device sort of E updates — the dominant scatter cost at MSMARCO posting
    density (738ms/batch at 388M postings, benchmarks/INDEX_BUILD_8M8.json)
    — disappears entirely; what remains is one read+write pass over the
    score matrix plus the masked on-tile windows.

    ``tile_bounds``: int32 [n_tiles + 1] positions into the flat update
    stream, chunk-aligned (multiples of TAIL_CHUNK).  Real entries inside a
    tile's range are in that tile by construction; chunk-padding entries
    carry v == 0 and an arbitrary doc (the gather clamps their position to
    0), so their index is clamped into the tile and they add zero.
    """
    q, n_pad = scores.shape
    n_tiles = n_pad // _SCATTER_TILE
    zpad = jnp.zeros(_SCATTER_WIN, jnp.int32)
    d = jnp.concatenate([d, zpad])
    r = jnp.concatenate([r, zpad])
    v = jnp.concatenate([v, zpad.astype(v.dtype)])

    def tile_body(t, scores):
        lo = tile_bounds[t]
        hi = tile_bounds[t + 1]
        tile = jax.lax.dynamic_slice(scores, (0, t * _SCATTER_TILE), (q, _SCATTER_TILE))

        def win_cond(state):
            j, _ = state
            return lo + j * _SCATTER_WIN < hi

        def win_body(state):
            j, tile = state
            s0 = lo + j * _SCATTER_WIN
            dd = jax.lax.dynamic_slice(d, (s0,), (_SCATTER_WIN,))
            vv = jax.lax.dynamic_slice(v, (s0,), (_SCATTER_WIN,))
            rr = jax.lax.dynamic_slice(r, (s0,), (_SCATTER_WIN,))
            ok = s0 + jnp.arange(_SCATTER_WIN, dtype=jnp.int32) < hi
            dd = jnp.clip(dd - t * _SCATTER_TILE, 0, _SCATTER_TILE - 1)
            vv = jnp.where(ok, vv, 0.0)
            rr = jnp.where(ok, rr, 0)
            return j + 1, tile.at[rr, dd].add(vv)

        _, tile = jax.lax.while_loop(win_cond, win_body, (jnp.int32(0), tile))
        return jax.lax.dynamic_update_slice(scores, tile, (0, t * _SCATTER_TILE))

    return jax.lax.fori_loop(0, n_tiles, tile_body, scores)


def partition_tail_csr(
    doc_ids: np.ndarray,
    impacts: np.ndarray,
    term_start: np.ndarray,
    term_len: np.ndarray,
    tail_tids: np.ndarray,
    n_pad: int,
    block: int = 32 << 20,
) -> np.ndarray:
    """Doc-sort the given terms' postings in place; return the per-term
    tile-boundary table (uint32 positions relative to ``term_start``).

    The load-time half of the sort-free partitioned tail (see
    ``_apply_tail_partitioned``): posting order inside one term's list is
    free for scoring — the reference accumulates a per-doc sum
    (inverted_index.py:55-62) — so trading impact order for doc order turns
    the per-batch device sort into this one-time host pass.  Used by both
    the single-chip engine (``HybridSearchEngine._partition_tail_by_doc``)
    and the per-shard blocks of ``ShardedSearchEngine``.

    Terms are processed in slabs bounded BOTH by ~``block`` postings
    (composite-key stable argsort working set) and by term count (the
    per-slab probe table is [terms, n_tiles + 1] x 8B, which posting count
    alone does not bound — advisor round 4)."""
    n_tiles = n_pad // _SCATTER_TILE
    n_terms = len(term_len)
    bounds = np.zeros((n_terms, n_tiles + 1), dtype=np.uint32)
    tail_tids = tail_tids[term_len[tail_tids] > 0]
    if not len(tail_tids):
        return bounds
    lens = term_len[tail_tids].astype(np.int64)
    cum = np.cumsum(lens)
    grp = np.searchsorted(cum, np.arange(0, int(cum[-1]) + block, block))
    # term-count cap: keep probes + b (2 x [terms, n_tiles+1] int64)
    # within ~block bytes per slab
    max_terms = max(1, block // (16 * (n_tiles + 1)))
    grp = np.concatenate(
        [grp, np.arange(0, len(tail_tids) + max_terms, max_terms)]
    )
    grp = np.unique(np.concatenate([grp, [len(tail_tids)]]))
    grp = grp[grp <= len(tail_tids)]
    probes_t = np.arange(n_tiles + 1, dtype=np.int64) * _SCATTER_TILE
    n_pad64 = np.int64(n_pad)
    for g0, g1 in zip(grp[:-1], grp[1:]):
        tids = tail_tids[g0:g1]
        if not len(tids):
            continue
        tlens = term_len[tids].astype(np.int64)
        lo = int(term_start[tids[0]])
        hi = int(term_start[tids[-1]] + tlens[-1])
        tl = np.repeat(np.arange(len(tids), dtype=np.int64), tlens)
        key = tl * n_pad64 + doc_ids[lo:hi]
        order = np.argsort(key, kind="stable")
        key = key[order]
        doc_ids[lo:hi] = doc_ids[lo:hi][order]
        impacts[lo:hi] = impacts[lo:hi][order]
        probes = (
            np.arange(len(tids), dtype=np.int64)[:, None] * n_pad64
            + probes_t[None, :]
        )
        b = np.searchsorted(key, probes.ravel()).reshape(len(tids), -1)
        offs = np.concatenate([[0], np.cumsum(tlens)[:-1]])
        bounds[tids] = (b - offs[:, None]).astype(np.uint32)
    return bounds


def partitioned_chunk_table(
    bounds_rel: np.ndarray,
    term_start: np.ndarray,
    t_q: np.ndarray,
    t_tid: np.ndarray,
    n_tiles: int,
):
    """Per-batch chunk table for the partitioned tail: split each query
    term's doc-sorted posting range at tile boundaries (one row lookup in
    ``bounds_rel``), order chunks by tile, and return the flat tile bounds.
    The (query row, tile) pair rides through ``expand_tail_chunks`` as one
    packed label.  Returns (chunk_starts, chunk_lengths, chunk_rows,
    tile_bounds)."""
    if not len(t_tid):
        chunks = (np.empty(0, np.int32),) * 3
        return (*chunks, np.zeros(n_tiles + 1, np.int32))
    rel = bounds_rel[t_tid].astype(np.int64)  # [K, n_tiles+1]
    base = term_start[t_tid][:, None]
    seg_s = (base + rel[:, :-1]).ravel()
    seg_e = (base + rel[:, 1:]).ravel()
    label = (
        t_q[:, None] * n_tiles + np.arange(n_tiles, dtype=np.int64)[None, :]
    ).ravel()
    cs, cl, clab = expand_tail_chunks(seg_s, seg_e, label, TAIL_CHUNK)
    if not len(cs):
        return cs, cl, clab, np.zeros(n_tiles + 1, np.int32)
    tile = clab % n_tiles
    order = np.argsort(tile, kind="stable")
    tile = tile[order]
    # positions into the flat update stream must stay int32 for the
    # device sweep; a huge batch x many tiles can exceed 2**31 slots —
    # fail loudly instead of silently wrapping negative (advisor round 4)
    assert len(cs) * TAIL_CHUNK < 2**31, (
        f"partitioned tail chunk stream overflows int32 positions "
        f"({len(cs)} chunks x {TAIL_CHUNK}); split the query batch"
    )
    cb = (
        np.searchsorted(tile, np.arange(n_tiles + 1)) * TAIL_CHUNK
    ).astype(np.int32)
    return (
        cs[order],
        cl[order],
        (clab[order] // n_tiles).astype(np.int32),
        cb,
    )


def build_dense_rows(
    doc_ids,
    impacts,
    heavy_starts: np.ndarray,
    t_heavy: int,
    n_pad: int,
    chunk_rows: int = 64,
    force_fp32: bool = False,
):
    """Scatter-accumulate dense heavy rows [t_heavy, n_pad] on the device
    holding ``doc_ids``/``impacts``.

    ``doc_ids`` (int32) / ``impacts`` (fp32) are device arrays containing
    exactly the heavy postings in dense-row order; ``heavy_starts`` is the
    host-side [t_heavy + 1] row-boundary table.  A pre-built host dense
    matrix would cost its full bytes in host RAM and host->device transfer
    (multi-GB at corpus scale); this costs one searchsorted + a chunked
    on-device scatter.

    fp32 accumulation in row chunks reproduces host np.add.at exactly
    (duplicate (term, doc) postings must sum like the scatter/host paths);
    rows downcast to bf16 only when every cell <= 256, where bf16 is exact
    for 8-bit quantized impact sums."""
    p_heavy = int(heavy_starts[-1])
    if t_heavy == 0 or p_heavy == 0:
        return jax.device_put(np.zeros((max(t_heavy, 1), n_pad), dtype=jnp.bfloat16))
    assert p_heavy < 2**31, "int32 posting positions"

    ch = min(chunk_rows, t_heavy)
    chunk_lens = [
        int(heavy_starts[min(r0 + ch, t_heavy)] - heavy_starts[r0])
        for r0 in range(0, t_heavy, ch)
    ]
    # One static posting-slice width for every chunk: the whole build is
    # ONE compiled program called per chunk with device scalars (each
    # distinct shape costs a fresh XLA compile — ~30s+ through the relay).
    width = _bucket(max(max(chunk_lens), 1))
    # Slice straight from the caller's CSR arrays — a padded copy of the
    # heavy region (3 arrays + a per-posting row-id table) costs ~5x
    # P_heavy x 4B of transient HBM, which OOMed engine init at 8.8M docs
    # / 389M postings.  Row ids come from searchsorted over the tiny row
    # boundary table per chunk instead.  dynamic_slice clamps the start so
    # the window always stays in range; validity is decided by GLOBAL
    # posting position against the chunk's [lo, hi) so a clamped window
    # still masks correctly.  Padding is needed only in the rare case the
    # power-of-two width exceeds the whole array.
    if width > doc_ids.shape[0]:
        deficit = width - doc_ids.shape[0]
        doc_ids = jnp.concatenate([doc_ids, jnp.zeros(deficit, doc_ids.dtype)])
        impacts = jnp.concatenate([impacts, jnp.zeros(deficit, impacts.dtype)])
    bounds = jnp.asarray(heavy_starts[1:].astype(np.int32))

    @partial(jax.jit, static_argnums=(7,))
    def scatter_chunk(docs_a, vals_a, bounds, lo, hi, start, r0, dtype):
        # clamp explicitly (mirroring dynamic_slice) so pos matches the
        # window the slice actually reads
        start = jnp.clip(start, 0, docs_a.shape[0] - width)
        pos = start + jnp.arange(width, dtype=jnp.int32)
        docs = jax.lax.dynamic_slice(docs_a, (start,), (width,))
        vals = jax.lax.dynamic_slice(vals_a, (start,), (width,))
        valid = (pos >= lo) & (pos < hi)
        rows = jnp.searchsorted(bounds, pos, side="right").astype(jnp.int32)
        rows = jnp.where(valid, rows - r0, 0)  # padding lands at [0, 0] += 0
        docs = jnp.where(valid, docs, 0)
        vals = jnp.where(valid, vals, 0.0)
        acc = jnp.zeros((ch, n_pad), jnp.float32)
        acc = acc.at[rows, docs].add(vals)
        # cast INSIDE the jit: the fp32 accumulator stays a transient
        # (holding all fp32 chunks host-side OOMed a 16GB chip at 8.8M docs)
        return acc.astype(dtype), jnp.max(acc)

    # Donated placement: the dense buffer is updated in place, so peak
    # memory is dense + ONE chunk (a final concatenate would double the
    # dense bytes and OOM large budgets).
    @partial(jax.jit, donate_argnums=(0,))
    def place(dense, chunk, r0):
        return jax.lax.dynamic_update_slice(dense, chunk, (r0, 0))

    def build(dtype):
        dense = jnp.zeros((t_heavy, n_pad), dtype)
        maxes = []
        for r0 in range(0, t_heavy, ch):
            r1 = min(r0 + ch, t_heavy)
            s0 = int(heavy_starts[r0])
            s1 = int(heavy_starts[r1])
            acc, mx = scatter_chunk(
                doc_ids, impacts, bounds,
                jnp.int32(s0), jnp.int32(s1), jnp.int32(s0), jnp.int32(r0),
                dtype,
            )
            dense = place(dense, acc if r1 - r0 == ch else acc[: r1 - r0],
                          jnp.int32(r0))
            maxes.append(mx)
        return dense, max(float(m) for m in maxes)

    # bf16 represents integers <= 256 exactly — enough for 8-bit
    # quantized impacts.  If accumulation pushed any cell past that
    # (duplicate postings), rebuild in fp32: 2x bytes, still exact.
    # force_fp32: non-integer float impacts are never bf16-exact.
    if force_fp32:
        dense, _ = build(jnp.float32)
        dense.block_until_ready()
        return dense
    dense, mx = build(jnp.bfloat16)
    if mx > 256:
        del dense
        dense, _ = build(jnp.float32)
    dense.block_until_ready()
    return dense


def _finish_topk(scores, num_docs: int, top_k: int, approx: bool, integer_scores: bool):
    k = min(top_k, num_docs)
    if approx:
        vals, idx = jax.lax.approx_max_k(scores[:, :num_docs], k, recall_target=0.99)
        idx = idx.astype(jnp.int32)
    elif integer_scores:
        from ..ops import exact_topk as _et

        if not (_et._PALLAS_COUNT and scores.shape[1] % (1 << 14) == 0):
            # default: drop the padding before selection (fewer columns)
            scores = scores[:, :num_docs]
        # else keep the tile-padded width: padded columns score 0 and zero
        # is never selected (s_k >= 1), and the aligned width lets the
        # Pallas threshold-count kernel stream whole tiles
        vals, idx = exact_topk_integer(scores, k)
    else:
        scores = scores[:, :num_docs]
        # float impacts (e.g. SparseSearch's unquantized in-memory index):
        # the n-ary threshold search needs an integer score lattice, so fall
        # back to the exact sort-based top_k
        vals, idx = jax.lax.top_k(scores, k)
        idx = idx.astype(jnp.int32)
    # Pack (scores, indices) into one int32 array: a single host fetch per
    # batch (the axon relay charges ~30ms latency per transfer).
    return jnp.stack([jax.lax.bitcast_convert_type(vals, jnp.int32), idx], axis=1)


def _gather_tail(doc_ids, impacts, starts, lengths, rows, slice_gather=False):
    """Expand the chunk table into flat (doc, value, row) update arrays.

    Two gather lowerings, picked by the caller's scatter regime (the flag
    is trace-time static):

    - ``slice_gather=True`` (tiled regime, >= _TILED_MIN_DOCS): each chunk
      reads TAIL_CHUNK *contiguous* postings, so gather whole chunks with
      a vmapped ``dynamic_slice`` — XLA lowers it to 2KB block copies.
      The element-wise ``jnp.take`` lowers to a random gather and ran
      477ms for 8.4M slots at the 388M-posting store vs ~115ms for the
      ENTIRE rest of the batch — it, not the device sort (+39ms), was the
      scaling frontier (QBENCH_GATHER_388M.json: 87 -> 282 q/s pipelined).
      INVARIANT: callers pad ``doc_ids``/``impacts`` with >= TAIL_CHUNK
      trailing zeros (the engines pad at init) so a partial chunk at the
      array end never clamp-shifts; padded lanes are masked by ``valid``.
    - ``slice_gather=False`` (flat-scatter regime, small corpora): keep
      ``jnp.take`` — XLA fuses it into the flat scatter-add, and the
      materialized slice intermediate measured ~15% SLOWER end-to-end at
      1M docs (648 vs 788 q/s pipelined, same-process A/B 2026-08-20).
    """
    offs = jnp.arange(TAIL_CHUNK, dtype=jnp.int32)[None, :]
    valid = offs < lengths[:, None]
    if slice_gather:
        d = jax.vmap(
            lambda s: jax.lax.dynamic_slice(doc_ids, (s,), (TAIL_CHUNK,))
        )(starts)
        v = jax.vmap(
            lambda s: jax.lax.dynamic_slice(impacts, (s,), (TAIL_CHUNK,))
        )(starts)
    else:
        pos = starts[:, None] + offs
        pos = jnp.where(valid, pos, 0)
        d = jnp.take(doc_ids, pos, axis=0)
        v = jnp.take(impacts, pos, axis=0)
    v = jnp.where(valid, v, 0.0)
    r = jnp.broadcast_to(rows[:, None], d.shape)
    return d.reshape(-1), v.reshape(-1), r.reshape(-1), valid.reshape(-1)


@partial(jax.jit, static_argnums=(10, 11, 12, 13, 14, 15, 16))
def _score_and_topk_pallas(
    dense: jnp.ndarray,      # [T_h, N_pad] dense heavy rows
    w: jnp.ndarray,          # [Q, T_h] bf16 one-hot (dense_impl == "matmul")
    ids: jnp.ndarray,        # [H_b] int32 unique hit dense rows
    pairs: jnp.ndarray,      # [P_b, 2] int32 (query row, ids slot)
    counts: jnp.ndarray,     # [2] int32 (n hit rows, n pairs)
    doc_ids: jnp.ndarray,
    impacts: jnp.ndarray,
    starts: jnp.ndarray,
    lengths: jnp.ndarray,
    rows: jnp.ndarray,
    nq: int,
    num_docs: int,
    top_k: int,
    dense_impl: str,         # "gather" | "matmul" | "none"
    tail_impl: str,          # "pallas" | "none"
    approx: bool,
    interpret: bool = False,
):
    """TPU scoring path: Pallas hit-row gather + Pallas tail scatter.

    Used when the index is quantized (integer scores), n_pad is
    65536-aligned, and the batch fits the kernels' VMEM gates; exact
    by construction (integer lattice in bf16/fp32).  ``interpret`` runs
    the kernels through the Pallas interpreter so CPU tests can cover
    this whole path (dispatch logic included), not just the kernels.
    """
    from ..ops.gather_rows import accumulate_rows
    from ..ops.scatter_scores import apply_tail_updates

    n_pad = dense.shape[1]
    if dense_impl == "gather":
        scores = accumulate_rows(dense, ids, pairs, counts, nq, interpret=interpret)
    elif dense_impl == "matmul":
        scores = jax.lax.dot_general(
            w.astype(dense.dtype),
            dense,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        scores = jnp.zeros((nq, n_pad), dtype=jnp.float32)

    if tail_impl == "pallas":
        d, v, r, _ = _gather_tail(
            doc_ids, impacts, starts, lengths, rows,
            slice_gather=n_pad >= _TILED_MIN_DOCS,
        )
        scores = apply_tail_updates(scores, d, v, r, interpret=interpret)

    return _finish_topk(scores, num_docs, top_k, approx, True)


@partial(jax.jit, static_argnums=(8, 9, 10, 11, 12, 13, 14))
def _score_and_topk(
    dense: jnp.ndarray,      # [T_h, N_pad] bf16 dense heavy rows
    w: jnp.ndarray,          # [Q, T_h] bf16 one-hot heavy query terms
    doc_ids: jnp.ndarray,    # [P] int32 tail postings
    impacts: jnp.ndarray,    # [P] float32 tail impacts
    starts: jnp.ndarray,     # [C] int32 tail chunk starts
    lengths: jnp.ndarray,    # [C] int32 tail chunk lengths
    rows: jnp.ndarray,       # [C] int32 tail chunk query row
    tile_bounds: jnp.ndarray,  # [n_tiles + 1] int32 (partitioned mode; [1] dummy otherwise)
    num_docs: int,
    top_k: int,
    use_dense: bool,
    use_tail: bool,
    approx: bool,
    integer_scores: bool = True,
    tail_partitioned: bool = False,
):
    q = w.shape[0]
    n_pad = dense.shape[1]
    if use_dense:
        # precision=HIGHEST: on TPU the default matmul precision truncates
        # fp32 operands to bf16 on the MXU (measured: a dense cell of 257.0
        # scores as 256.0), silently breaking the exact-score contract
        # whenever the dense matrix is fp32 — the duplicate-posting rebuild
        # and the float-impact mode.  For bf16 operands it is a no-op.
        scores = jax.lax.dot_general(
            w.astype(dense.dtype),
            dense,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        scores = jnp.zeros((q, n_pad), dtype=jnp.float32)

    if use_tail:
        d, v, r, valid = _gather_tail(
            doc_ids, impacts, starts, lengths, rows,
            slice_gather=n_pad >= _TILED_MIN_DOCS,
        )
        if tail_partitioned:
            scores = _apply_tail_partitioned(scores, d, v, r, tile_bounds)
        elif n_pad >= _TILED_MIN_DOCS and n_pad % _SCATTER_TILE == 0:
            scores = _apply_tail_tiled(scores, d, v, r, valid)
        else:
            # small corpora: the whole scores operand is VMEM-resident, the
            # flat scatter is already on-chip
            scores = scores.at[r, d].add(v)

    return _finish_topk(scores, num_docs, top_k, approx, integer_scores)


class HybridSearchEngine:
    """Batched exact scoring over a quantized inverted index, corpus scale."""

    def __init__(
        self,
        index: InvertedIndexData,
        config: SearchConfig = SearchConfig(),
        heavy_min: int = 1024,
        dense_budget_bytes: int = 4 << 30,
        integer_scores: bool = True,
        use_pallas: Optional[bool] = None,
        tail_partitioned: Optional[bool] = None,
    ):
        self.config = config
        # True for quantized indexes (scores are exact small-integer sums:
        # exact_topk_integer applies); False for float impact values
        # (SparseSearch's in-memory index), which use sort-based top_k and
        # an fp32 dense matrix
        self.integer_scores = integer_scores
        self.vocab: Dict[str, int] = index.term_to_id
        self.num_docs = max(int(index.num_docs), 1)
        if self.num_docs >= _PALLAS_MIN_DOCS:
            # tile-aligned (<= 12.5% pad at this size) so the Pallas
            # gather/scatter kernels — and the XLA tiled scatter above
            # _TILED_MIN_DOCS — can work on whole [Q, 65536] tiles; below
            # this the flat scatter runs, which only needs 128-lane
            # alignment (full tile alignment there would waste up to ~2x
            # dense-matrix HBM: 65537 docs would pad to 131072)
            self.n_pad = -(-self.num_docs // _SCATTER_TILE) * _SCATTER_TILE
        else:
            self.n_pad = ((self.num_docs + 127) // 128) * 128
        # Pallas kernels need a real TPU backend (CPU tests keep the XLA
        # paths), the integer impact lattice (bf16 one-hot exactness), and
        # tile-aligned padding.  AUTO at corpus scale, by measurement: at
        # 8.8M docs / 388M postings the Pallas tail wins 282.5 vs 199.3
        # q/s pipelined, rank-exact in-run (QBENCH_GATHER_388M.json), and
        # the 40-batch TPU stress gate is clean (0/40 failures, 0/64
        # mismatches vs XLA — benchmarks/tpu_validation.log 2026-08-18).
        # Below the tiled regime the XLA path stays the measured winner
        # (453/470 vs 413/272 q/s at 1M docs: the per-stage kernel wins
        # don't survive pipelining there), so the auto gate follows
        # _TILED_MIN_DOCS.  A runtime Pallas failure degrades the engine
        # to the XLA path permanently (_log_pallas_fallback) — serving
        # keeps answering, exactly.  Tests flip _pallas on with
        # _pallas_interpret so the dispatch path runs through the Pallas
        # interpreter on CPU.
        pallas_ok = (
            integer_scores
            and self.n_pad % _SCATTER_TILE == 0
            and jax.default_backend() == "tpu"
        )
        if use_pallas is None:
            use_pallas = self.num_docs >= _TILED_MIN_DOCS
        self._pallas = bool(use_pallas) and pallas_ok
        self._pallas_interpret = False
        self.offsets = np.asarray(index.offsets, dtype=np.int64)
        lengths = np.diff(self.offsets)

        # Pick heavy terms: longest lists first, bounded by the HBM budget
        # for the bf16 dense matrix.
        max_rows = max(1, dense_budget_bytes // (2 * self.n_pad))
        heavy_tids = np.nonzero(lengths >= heavy_min)[0]
        if len(heavy_tids) > max_rows:
            order = np.argsort(lengths[heavy_tids])[::-1]
            heavy_tids = np.sort(heavy_tids[order[:max_rows]])
        self.heavy_row: Dict[int, int] = {int(t): i for i, t in enumerate(heavy_tids)}
        # dense tid -> dense-row map for vectorized query prep (-1 = tail)
        self.heavy_row_arr = np.full(len(lengths), -1, dtype=np.int32)
        self.heavy_row_arr[heavy_tids] = np.arange(len(heavy_tids), dtype=np.int32)
        self.t_heavy = len(heavy_tids)

        doc_ids = np.asarray(index.doc_ids, dtype=np.int64)
        impacts = np.asarray(index.impacts, dtype=np.float32)
        n_postings = len(doc_ids)
        is_heavy = np.zeros(len(lengths), dtype=bool)
        is_heavy[heavy_tids] = True
        self.is_heavy = is_heavy

        # Permute postings heavy-first (in dense-row order) so the device-side
        # dense build reads contiguous slices of the SAME posting arrays the
        # tail path needs anyway.  Uploading a pre-built dense matrix instead
        # costs dense_budget_bytes of host->device transfer (~7 min for 4.3GB
        # through the axon relay); this way the only bulk upload is the
        # ~9B/posting CSR arrays.
        heavy_lengths = lengths[heavy_tids]
        if self.t_heavy:
            heavy_idx = np.concatenate(
                [np.arange(self.offsets[t], self.offsets[t + 1]) for t in heavy_tids]
            )
            tail_mask = np.ones(n_postings, dtype=bool)
            tail_mask[heavy_idx] = False
            perm = np.concatenate([heavy_idx, np.nonzero(tail_mask)[0]])
        else:
            perm = np.arange(n_postings)
        doc_ids = doc_ids[perm]
        impacts = impacts[perm]

        # Per-term (start, length) in the permuted layout.
        heavy_starts = np.concatenate([[0], np.cumsum(heavy_lengths)]).astype(np.int64)
        p_heavy = int(heavy_starts[-1])
        heavy_before = np.zeros(len(lengths) + 1, dtype=np.int64)
        heavy_before[1:][heavy_tids] = heavy_lengths
        heavy_before = np.cumsum(heavy_before)  # heavy postings among terms < t
        self.term_start = p_heavy + self.offsets[:-1] - heavy_before[:-1]
        self.term_start[heavy_tids] = heavy_starts[:-1]
        self.term_len = lengths

        # Partitioned tail: doc-sort each tail term's in-HBM postings once at
        # load so per-batch scoring never sorts.  OPT-IN ONLY — it lost the
        # same-run A/B at both measured densities (see
        # recommend_tail_partitioned for the numbers and the diagnosis).
        if tail_partitioned is None:
            tail_partitioned, _ = self.recommend_tail_partitioned(
                lengths, is_heavy, self.n_pad, self.num_docs
            )
        elif tail_partitioned:
            _, gate_stats = self.recommend_tail_partitioned(
                lengths, is_heavy, self.n_pad, self.num_docs
            )
            import logging

            logging.getLogger(
                "improving_learned_index_tpu.hybrid_engine"
            ).warning(
                "partitioned tail FORCED on (posting-weighted tail segment "
                "length %.0f over %d tiles); it lost the same-run A/B at "
                "every measured density — A/B against the default before "
                "serving with this",
                gate_stats["segment_len"],
                gate_stats["n_tiles"],
            )
        self._tail_partitioned = bool(
            tail_partitioned
            and not self._pallas
            and self.n_pad % _SCATTER_TILE == 0
            and n_postings > p_heavy
        )
        self._tail_bounds_rel: Optional[np.ndarray] = None
        if self._tail_partitioned:
            self._tail_bounds_rel = self._partition_tail_by_doc(doc_ids, impacts)

        # >= TAIL_CHUNK trailing zeros: _gather_tail slices whole chunks
        # with dynamic_slice, which must never clamp-shift at the array end
        zpad_i = np.zeros(TAIL_CHUNK, np.int32)
        zpad_f = np.zeros(TAIL_CHUNK, np.float32)
        self.doc_ids = jax.device_put(
            np.concatenate([doc_ids.astype(np.int32), zpad_i])
        )
        self.impacts = jax.device_put(
            np.concatenate([impacts.astype(np.float32), zpad_f])
        )

        if self.t_heavy:
            self.dense = self._build_dense_on_device(heavy_starts)
        else:
            self.dense = jax.device_put(np.zeros((1, self.n_pad), dtype=jnp.bfloat16))

        # Heavy postings live ONLY in the dense rows after the build; keeping
        # them in the device CSR wastes p_heavy x 8B of HBM (1.4GB at the
        # 388M-posting MSMARCO store, where dense covers ~46% of postings).
        # Re-upload just the tail slice and rebase the tail term starts —
        # the reclaimed HBM is exactly what lets --dense_budget_gb grow,
        # which shrinks the tail scatter (the measured per-batch bottleneck:
        # XLA's serialized in-window scatter applies ~12M updates/s).
        p_heavy = int(heavy_starts[-1]) if self.t_heavy else 0
        if p_heavy > 0:
            del self.doc_ids, self.impacts  # free the full CSR first
            self.doc_ids = jax.device_put(
                np.concatenate([doc_ids[p_heavy:].astype(np.int32), zpad_i])
            )
            self.impacts = jax.device_put(
                np.concatenate([impacts[p_heavy:].astype(np.float32), zpad_f])
            )
            self.term_start = self.term_start - p_heavy
            self.term_start[heavy_tids] = 0  # dense-only; never gathered

    _DENSE_CHUNK_ROWS = 32  # fp32 scatter buffer: 32 rows x n_pad (1.13GB at 8.8M docs)

    @staticmethod
    def recommend_tail_partitioned(
        lengths: np.ndarray,
        is_heavy: np.ndarray,
        n_pad: int,
        num_docs: int,
    ) -> Tuple[bool, dict]:
        """Density auto-gate for the sort-free partitioned tail: always
        False — the path is OPT-IN (--tail_partitioned), by measurement.

        The partitioned tail was built on the theory that the per-batch
        device sort dominated the tail scatter.  Same-run A/Bs on v5e-1
        falsified it at BOTH ends of the density range: at 8.8M docs / 40M
        postings / 100k vocab (~3-posting segments, 99% chunk padding) it
        is ~5x slower (59 vs 312 q/s pipelined, QBENCH_PART_8M8.json), and
        at the MSMARCO-density design target — 8.8M docs / 388M postings /
        30k vocab, exactly the regime it was built for — it is still 3.4x
        slower (22.5 vs 77.1 q/s sync, 24.3 vs 87.2 pipelined,
        QBENCH_PART_388M.json).  Diagnosis: the dominant cost is the
        serialized in-window scatter apply (~12M updates/s in XLA), which
        scales with PADDED chunk slots; partitioning doubles those slots
        (one >=TAIL_CHUNK chunk per non-empty (term, tile) segment) while
        removing a sort that was never the bottleneck.  Even at zero
        padding the best case is parity minus a small sort.  The measured
        response to the frontier is the opposite lever: shrink the tail by
        growing the dense row budget (heavy-CSR trim + --dense_budget_gb,
        QBENCH_TRIM_388M.json).

        Returns (decision, stats): the stats still describe the density so
        operators forcing --tail_partitioned can see what they're choosing;
        auto mode never enables the path.
        """
        n_tiles = max(n_pad // _SCATTER_TILE, 1)
        tail_lens = lengths[~is_heavy].astype(np.float64)
        p_tail = tail_lens.sum()
        wavg = float((tail_lens**2).sum() / p_tail) if p_tail else 0.0
        seg = wavg / n_tiles
        return False, {
            "segment_len": seg,
            "threshold": TAIL_CHUNK,
            "n_tiles": n_tiles,
            "wavg_tail_len": wavg,
            "tail_postings": float(p_tail),
        }

    def _build_dense_on_device(self, heavy_starts: np.ndarray):
        # full arrays, not [:p_heavy] slices — the slice is a device COPY
        # (~1.2GB at 389M postings); build_dense_rows only reads the heavy
        # prefix, masked by global position
        return build_dense_rows(
            self.doc_ids,
            self.impacts,
            heavy_starts,
            self.t_heavy,
            self.n_pad,
            chunk_rows=self._DENSE_CHUNK_ROWS,
            force_fp32=not self.integer_scores,
        )

    def _partition_tail_by_doc(
        self, doc_ids: np.ndarray, impacts: np.ndarray, block: int = 32 << 20
    ) -> np.ndarray:
        """Doc-sort every tail term's postings in place; return the per-term
        tile-boundary table (see ``partition_tail_csr``).  The
        impact-descending order only matters in the serialized .dat, which
        this in-HBM copy never writes back."""
        tail_tids = np.nonzero(~self.is_heavy & (self.term_len > 0))[0]
        return partition_tail_csr(
            doc_ids, impacts, self.term_start, self.term_len,
            tail_tids, self.n_pad, block,
        )

    @classmethod
    def from_term_impacts(
        cls,
        per_doc_impacts,  # iterable of [(term, float score), ...] per doc
        config: SearchConfig = SearchConfig(),
        heavy_min: int = 1024,
        dense_budget_bytes: int = 4 << 30,
    ) -> "HybridSearchEngine":
        """In-memory float-impact engine straight from encoder output (the
        reference SparseSearch index semantics, nano_beir_evaluator.py:78-101:
        keep score > 0, no quantization) — for eval corpora too large for the
        device engine's flat [Q, num_docs] scatter."""
        from .device_engine import csr_from_term_impacts

        vocab, offsets, doc_ids, impacts, n_docs = csr_from_term_impacts(
            per_doc_impacts
        )

        class _FloatCSR:  # duck-typed InvertedIndexData with float impacts
            pass

        idx = _FloatCSR()
        idx.term_to_id = vocab
        idx.offsets = offsets
        idx.doc_ids = doc_ids
        idx.impacts = impacts
        idx.num_docs = n_docs
        return cls(
            idx,
            config,
            heavy_min=heavy_min,
            dense_budget_bytes=dense_budget_bytes,
            integer_scores=False,
        )

    def _tables(self, query_term_sets: Sequence[Set[str]]):
        """Host-side prep: heavy one-hot W + tail chunk table (+ tile bounds).

        Vectorized: the only Python-loop work left is one dict lookup per
        query term; the per-term chunk expansion is numpy
        (``expand_tail_chunks``), so host prep stays a few percent of batch
        latency at serving batch sizes (benchmarks/host_prep_bench.py).

        Returns (w, chunk_starts, chunk_lengths, chunk_rows, heavy_q,
        heavy_rows, tile_bounds); ``tile_bounds`` is None unless the engine
        runs the partitioned tail, in which case the chunk table is grouped
        by 64k-doc tile and ``tile_bounds`` marks each tile's range in the
        flat gathered update stream."""
        nq = len(query_term_sets)
        w = np.zeros((nq, max(self.t_heavy, 1)), dtype=np.float32)
        qs: List[int] = []
        tids: List[int] = []
        get = self.vocab.get
        for q, terms in enumerate(query_term_sets):
            for term in terms:
                tid = get(term)
                if tid is not None:
                    qs.append(q)
                    tids.append(tid)
        empty = np.empty(0, np.int32)
        if not tids:
            e = (empty, empty.copy(), empty.copy(), empty.copy(), empty.copy())
            return (w, *e, self._empty_tile_bounds())
        q_arr = np.asarray(qs, dtype=np.int64)
        tid_arr = np.asarray(tids, dtype=np.int64)
        hrow = self.heavy_row_arr[tid_arr]
        heavy = hrow >= 0
        heavy_q = q_arr[heavy].astype(np.int32)
        heavy_rows = hrow[heavy]
        w[heavy_q, heavy_rows] = 1.0
        t_q, t_tid = q_arr[~heavy], tid_arr[~heavy]
        if self._tail_partitioned:
            cs, cl, crow, cb = self._tail_tables_partitioned(t_q, t_tid)
            return w, cs, cl, crow, heavy_q, heavy_rows, cb
        starts = self.term_start[t_tid]
        return (
            w,
            *expand_tail_chunks(starts, starts + self.term_len[t_tid], t_q, TAIL_CHUNK),
            heavy_q,
            heavy_rows,
            None,
        )

    def _empty_tile_bounds(self) -> Optional[np.ndarray]:
        if not self._tail_partitioned:
            return None
        return np.zeros(self.n_pad // _SCATTER_TILE + 1, np.int32)

    def _tail_tables_partitioned(self, t_q: np.ndarray, t_tid: np.ndarray):
        """Chunk table for the partitioned tail: split each query term's
        doc-sorted posting range at tile boundaries (one row lookup in
        ``_tail_bounds_rel``), order chunks by tile, and return the flat
        tile bounds.  The (query row, tile) pair rides through
        ``expand_tail_chunks`` as one packed label."""
        return partitioned_chunk_table(
            self._tail_bounds_rel, self.term_start, t_q, t_tid,
            self.n_pad // _SCATTER_TILE,
        )

    def warmup(
        self,
        max_batch: int = 64,
        top_k: Optional[int] = None,
        max_chunks: int = 4096,
    ) -> int:
        """Pre-compile the serving shape lattice; returns compile-call count.

        ``score_batch_async`` buckets its operands — query count to the next
        power of two (base 8), the tail chunk table to the next power of two
        (base 16) — so each bucket combination that first appears in LIVE
        traffic pays its XLA compile mid-request.  On the round-3 TPU serve
        bench that put multi-second compile stalls in the measured tail
        (p99 2.8s vs p50 43ms, benchmarks/SERVE_BENCH_TPU.json) even after a
        traffic-shaped warmup, because client-arrival jitter makes the set
        of live bucket combos unpredictable.  This compiles the whole
        lattice up front: every nq bucket up to ``max_batch`` crossed with
        every chunk bucket up to ``max_chunks`` (dense+tail, the shape any
        mixed query batch takes) plus the no-tail variant per nq bucket.
        Calls execute on zero tables (a zero-length chunk scatters nothing),
        so cost is one device pass per combo; with the persistent
        compilation cache enabled, restarts replay from disk.

        Which dense/tail variants get warmed follows the index: an engine
        with no heavy terms (small corpora never reach ``heavy_min``) takes
        the tail-only shape on EVERY query, so that is what gets compiled;
        with heavy rows present, dense+tail and dense-only are the live
        shapes and the all-tail variant (no query term heavy — rare under
        Zipf) is left to compile on first use, as are per-request ``k``
        overrides outside ``top_k``.  The opt-in Pallas path has extra
        operand buckets (hit-row and pair tables); for it this warms one
        representative combo per nq bucket and leaves the rest to the disk
        cache.
        """
        if top_k is None:
            top_k = self.config.top_k
        k = min(top_k, self.num_docs)
        nq_buckets = []
        b = 8
        while b < _bucket(max_batch, base=8):
            nq_buckets.append(b)
            b *= 2
        nq_buckets.append(b)
        c_buckets = []
        c = 16
        while c < _bucket(max(max_chunks, 1)):
            c_buckets.append(c)
            c *= 2
        c_buckets.append(c)

        w0 = jnp.zeros((1, max(self.t_heavy, 1)), jnp.bfloat16)
        calls = []
        for nq in nq_buckets:
            w = jnp.broadcast_to(w0, (nq, w0.shape[1]))
            if self._pallas:
                # one representative Pallas combo per nq bucket (gather rows
                # sized for this batch); XLA combos below stay the fallback
                from ..ops.gather_rows import can_use_pallas_gather

                h_b = _bucket(min(nq * 8, max(self.t_heavy, 1)), base=64)
                if can_use_pallas_gather(self.n_pad, nq, h_b):
                    calls.append(_score_and_topk_pallas(
                        self.dense, w,
                        jnp.zeros(h_b, jnp.int32),
                        jnp.zeros((h_b, 2), jnp.int32),
                        jnp.zeros(2, jnp.int32),
                        self.doc_ids, self.impacts,
                        jnp.zeros(16, jnp.int32), jnp.zeros(16, jnp.int32),
                        jnp.zeros(16, jnp.int32),
                        nq, self.num_docs, k,
                        "gather", "pallas",
                        self.config.approx_top_k, self._pallas_interpret,
                    ))
            use_dense = self.t_heavy > 0
            tb0 = jnp.asarray(
                self._empty_tile_bounds()
                if self._tail_partitioned
                else np.zeros(1, np.int32)
            )
            for cb in c_buckets:
                z = jnp.zeros(cb, jnp.int32)
                calls.append(_score_and_topk(
                    self.dense, w, self.doc_ids, self.impacts, z, z, z, tb0,
                    self.num_docs, k, use_dense, True,
                    self.config.approx_top_k, self.integer_scores,
                    self._tail_partitioned,
                ))
            if use_dense:
                calls.append(_score_and_topk(
                    self.dense, w, self.doc_ids, self.impacts,
                    jnp.zeros(16, jnp.int32), jnp.zeros(16, jnp.int32),
                    jnp.zeros(16, jnp.int32), tb0,
                    self.num_docs, k, True, False,
                    self.config.approx_top_k, self.integer_scores,
                    self._tail_partitioned,
                ))
        for out in calls:
            out.block_until_ready()
        return len(calls)

    def _log_pallas_fallback(self) -> None:
        """Degrade to the XLA scoring path permanently for this engine."""
        import logging

        logging.getLogger("improving_learned_index_tpu.hybrid_engine").warning(
            "pallas scoring failed; this engine falls back to the XLA path",
            exc_info=True,
        )
        self._pallas = False

    def release(self) -> None:
        """Free the engine's device buffers (dense heavy rows + CSR posting
        arrays) ahead of a staged hot-swap: two corpus-scale engines do not
        co-fit in a 16GB HBM budget, so ``RetrievalServer.swap_engine_staged``
        releases the outgoing engine BEFORE constructing its replacement.
        In-flight batches are unaffected (the XLA runtime keeps buffers
        alive until dispatched executions complete); new score calls raise.
        Idempotent."""
        self._released = True
        self.dense = None
        self.doc_ids = None
        self.impacts = None

    def score_batch_async(
        self,
        query_term_sets: Sequence[Set[str]],
        top_k: Optional[int] = None,
    ):
        """Dispatch a batch and return a zero-arg finalizer.

        Dispatch is asynchronous: call this for batch i+1 before finalizing
        batch i and the device computes while results stream back — the
        pattern that hides the relay's per-transfer latency in serving.
        """
        if getattr(self, "_released", False):
            raise RuntimeError("engine released (staged swap in progress)")
        if top_k is None:
            top_k = self.config.top_k
        nq = len(query_term_sets)
        if nq == 0:
            return lambda: []
        if self._pallas and nq > 64:
            # the Pallas kernels' VMEM gate is 64 queries per dispatch;
            # larger batches become pipelined 64-query sub-dispatches
            subs = [
                self.score_batch_async(query_term_sets[i : i + 64], top_k)
                for i in range(0, nq, 64)
            ]
            return lambda: [row for fin in subs for row in fin()]
        k = min(top_k, self.num_docs)
        w, starts, lengths, rows, heavy_q, heavy_rows, tile_bounds = self._tables(
            query_term_sets
        )
        use_dense = bool(w.any())
        use_tail = len(starts) > 0
        if tile_bounds is None:
            tile_bounds = np.zeros(1, np.int32)
        if not use_dense and not use_tail:
            return lambda: [[] for _ in range(nq)]

        nq_b = _bucket(nq, base=8)
        if nq_b > nq:
            w = np.concatenate([w, np.zeros((nq_b - nq, w.shape[1]), w.dtype)])
        c = _bucket(max(len(starts), 1))
        pad = c - len(starts)
        zpad = np.zeros(pad, dtype=np.int32)
        starts_a = np.concatenate([starts, zpad])
        lengths_a = np.concatenate([lengths, zpad])
        rows_a = np.concatenate([rows, zpad])

        packed = None
        if self._pallas and nq_b <= 64:
            from ..ops.gather_rows import can_use_pallas_gather

            uniq, inv = np.unique(heavy_rows, return_inverse=True)
            if (
                use_dense
                and self.dense.dtype == jnp.bfloat16
                and can_use_pallas_gather(self.n_pad, nq_b, len(uniq))
            ):
                dense_impl = "gather"
                h_b = _bucket(len(uniq), base=64)
                ids_a = np.zeros(h_b, np.int32)
                ids_a[: len(uniq)] = uniq
                p_b = _bucket(len(heavy_q), base=64)
                pairs_a = np.zeros((p_b, 2), np.int32)
                pairs_a[: len(heavy_q), 0] = heavy_q
                pairs_a[: len(heavy_q), 1] = inv
                counts = np.array([len(uniq), len(heavy_q)], np.int32)
            else:
                # fp32 dense (duplicate-posting fallback) or too many hit
                # rows for the row buffer: stream the whole dense matrix
                dense_impl = "matmul" if use_dense else "none"
                ids_a = np.zeros(1, np.int32)
                pairs_a = np.zeros((1, 2), np.int32)
                counts = np.zeros(2, np.int32)
            try:
                packed = _score_and_topk_pallas(
                    self.dense,
                    jnp.asarray(w.astype(jnp.bfloat16)),
                    jnp.asarray(ids_a),
                    jnp.asarray(pairs_a),
                    jnp.asarray(counts),
                    self.doc_ids,
                    self.impacts,
                    jnp.asarray(starts_a),
                    jnp.asarray(lengths_a),
                    jnp.asarray(rows_a),
                    nq_b,
                    self.num_docs,
                    k,
                    dense_impl,
                    "pallas" if use_tail else "none",
                    self.config.approx_top_k,
                    self._pallas_interpret,
                )
            except Exception:
                self._log_pallas_fallback()
        if packed is None:
            packed = _score_and_topk(
                self.dense,
                jnp.asarray(w.astype(jnp.bfloat16)),
                self.doc_ids,
                self.impacts,
                jnp.asarray(starts_a),
                jnp.asarray(lengths_a),
                jnp.asarray(rows_a),
                jnp.asarray(tile_bounds),
                self.num_docs,
                k,
                use_dense,
                use_tail,
                self.config.approx_top_k,
                self.integer_scores,
                self._tail_partitioned,
            )

        used_pallas = self._pallas

        def finalize() -> List[List[Tuple[int, float]]]:
            try:
                host = np.asarray(packed)  # one transfer: [nq_b, 2, k] int32
            except Exception:
                if not used_pallas:
                    raise
                # Runtime failure in the opt-in Pallas path: degrade this
                # engine to the XLA path permanently and recompute the
                # batch — serving keeps answering, exactly, just slower.
                self._log_pallas_fallback()
                return self.score_batch(query_term_sets, top_k)
            top_scores = host[:nq, 0].view(np.float32)
            top_docs = host[:nq, 1]
            return [
                [
                    (int(d), float(s))
                    for d, s in zip(top_docs[i], top_scores[i])
                    if s > 0
                ]
                for i in range(nq)
            ]

        return finalize

    def score_batch(
        self,
        query_term_sets: Sequence[Set[str]],
        top_k: Optional[int] = None,
    ) -> List[List[Tuple[int, float]]]:
        return self.score_batch_async(query_term_sets, top_k)()

    def score_stream(self, query_batches, top_k: Optional[int] = None, depth: int = 2):
        """Pipelined scoring of an iterable of query batches: keeps ``depth``
        batches in flight so host transfer overlaps device compute."""
        from collections import deque

        pending = deque()
        for batch in query_batches:
            pending.append(self.score_batch_async(batch, top_k))
            if len(pending) > depth:
                yield pending.popleft()()
        while pending:
            yield pending.popleft()()
