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
- **Exact top-k without sorting** via ops.exact_topk (threshold binary
  search + cumsum + searchsorted): integer impact sums make the k-th score
  findable in ~18 bandwidth passes; boundary ties resolve in doc-id order
  like the reference's heapq over insertion-ordered dicts.

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


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _score_and_topk(
    dense: jnp.ndarray,      # [T_h, N_pad] bf16 dense heavy rows
    w: jnp.ndarray,          # [Q, T_h] bf16 one-hot heavy query terms
    doc_ids: jnp.ndarray,    # [P] int32 tail postings
    impacts: jnp.ndarray,    # [P] float32 tail impacts
    starts: jnp.ndarray,     # [C] int32 tail chunk starts
    lengths: jnp.ndarray,    # [C] int32 tail chunk lengths
    rows: jnp.ndarray,       # [C] int32 tail chunk query row
    num_docs: int,
    top_k: int,
    use_dense: bool,
    use_tail: bool,
    approx: bool,
):
    q = w.shape[0]
    n_pad = dense.shape[1]
    if use_dense:
        scores = jax.lax.dot_general(
            w.astype(dense.dtype),
            dense,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        scores = jnp.zeros((q, n_pad), dtype=jnp.float32)

    if use_tail:
        offs = jnp.arange(TAIL_CHUNK, dtype=jnp.int32)[None, :]
        pos = starts[:, None] + offs
        valid = offs < lengths[:, None]
        pos = jnp.where(valid, pos, 0)
        d = jnp.take(doc_ids, pos, axis=0)
        v = jnp.take(impacts, pos, axis=0)
        v = jnp.where(valid, v, 0.0)
        r = jnp.broadcast_to(rows[:, None], d.shape)
        scores = scores.at[r.reshape(-1), d.reshape(-1)].add(v.reshape(-1))

    scores = scores[:, :num_docs]
    k = min(top_k, num_docs)
    if approx:
        vals, idx = jax.lax.approx_max_k(scores, k, recall_target=0.99)
        idx = idx.astype(jnp.int32)
    else:
        vals, idx = exact_topk_integer(scores, k)
    # Pack (scores, indices) into one int32 array: a single host fetch per
    # batch (the axon relay charges ~30ms latency per transfer).
    return jnp.stack([jax.lax.bitcast_convert_type(vals, jnp.int32), idx], axis=1)


class HybridSearchEngine:
    """Batched exact scoring over a quantized inverted index, corpus scale."""

    def __init__(
        self,
        index: InvertedIndexData,
        config: SearchConfig = SearchConfig(),
        heavy_min: int = 1024,
        dense_budget_bytes: int = 4 << 30,
    ):
        self.config = config
        self.vocab: Dict[str, int] = index.term_to_id
        self.num_docs = max(int(index.num_docs), 1)
        self.n_pad = ((self.num_docs + 127) // 128) * 128
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
        self.t_heavy = len(heavy_tids)

        doc_ids = np.asarray(index.doc_ids, dtype=np.int64)
        impacts = np.asarray(index.impacts, dtype=np.float32)

        if self.t_heavy:
            dense = np.zeros((self.t_heavy, self.n_pad), dtype=np.float32)
            row_of = np.repeat(
                np.arange(self.t_heavy), lengths[heavy_tids]
            )
            flat_idx = np.concatenate(
                [np.arange(self.offsets[t], self.offsets[t + 1]) for t in heavy_tids]
            ) if len(heavy_tids) else np.empty(0, np.int64)
            # add (not assign): duplicate (term, doc) postings, while not
            # produced by our indexer, must accumulate exactly like the
            # scatter/host paths do.
            np.add.at(dense, (row_of, doc_ids[flat_idx]), impacts[flat_idx])
            # bf16 represents integers <= 256 exactly — enough for 8-bit
            # quantized impacts.  If accumulation pushed any cell past that
            # (duplicate postings), keep fp32 rows: 2x bytes, still exact.
            dtype = jnp.bfloat16 if dense.max() <= 256 else jnp.float32
            self.dense = jax.device_put(dense.astype(dtype))
        else:
            self.dense = jax.device_put(np.zeros((1, self.n_pad), dtype=jnp.bfloat16))

        # Tail postings stay in CSR form for the gather + scatter path.
        is_heavy = np.zeros(len(lengths), dtype=bool)
        is_heavy[heavy_tids] = True
        self.tail_offsets = self.offsets
        self.is_heavy = is_heavy
        has = len(doc_ids) > 0
        self.doc_ids = jax.device_put(
            doc_ids.astype(np.int32) if has else np.zeros(1, np.int32)
        )
        self.impacts = jax.device_put(impacts if has else np.zeros(1, np.float32))

    def _tables(self, query_term_sets: Sequence[Set[str]]):
        """Host-side prep: heavy one-hot W + tail chunk table."""
        nq = len(query_term_sets)
        w = np.zeros((nq, max(self.t_heavy, 1)), dtype=np.float32)
        starts: List[int] = []
        lengths: List[int] = []
        rows: List[int] = []
        for q, terms in enumerate(query_term_sets):
            for term in terms:
                tid = self.vocab.get(term)
                if tid is None:
                    continue
                row = self.heavy_row.get(tid)
                if row is not None:
                    w[q, row] = 1.0
                    continue
                s, e = int(self.offsets[tid]), int(self.offsets[tid + 1])
                while s < e:
                    starts.append(s)
                    lengths.append(min(TAIL_CHUNK, e - s))
                    rows.append(q)
                    s += TAIL_CHUNK
        return w, starts, lengths, rows

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
        if top_k is None:
            top_k = self.config.top_k
        nq = len(query_term_sets)
        if nq == 0:
            return lambda: []
        k = min(top_k, self.num_docs)
        w, starts, lengths, rows = self._tables(query_term_sets)
        use_dense = bool(w.any())
        use_tail = len(starts) > 0
        if not use_dense and not use_tail:
            return lambda: [[] for _ in range(nq)]

        nq_b = _bucket(nq, base=8)
        if nq_b > nq:
            w = np.concatenate([w, np.zeros((nq_b - nq, w.shape[1]), w.dtype)])
        c = _bucket(max(len(starts), 1))
        pad = c - len(starts)
        starts_a = np.asarray(starts + [0] * pad, dtype=np.int32)
        lengths_a = np.asarray(lengths + [0] * pad, dtype=np.int32)
        rows_a = np.asarray(rows + [0] * pad, dtype=np.int32)

        packed = _score_and_topk(
            self.dense,
            jnp.asarray(w.astype(jnp.bfloat16)),
            self.doc_ids,
            self.impacts,
            jnp.asarray(starts_a),
            jnp.asarray(lengths_a),
            jnp.asarray(rows_a),
            self.num_docs,
            k,
            use_dense,
            use_tail,
            self.config.approx_top_k,
        )

        def finalize() -> List[List[Tuple[int, float]]]:
            host = np.asarray(packed)  # one transfer: [nq_b, 2, k] int32
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
