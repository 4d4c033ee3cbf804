"""On-device batched query scoring.

Replaces the reference's per-query Python postings loop — the query-time hot
path (src/deep_impact/inverted_index/inverted_index.py:55-62) — with a
device-resident pipeline:

1. postings (doc_ids, impacts) live in HBM as flat int32/float32 arrays;
2. a query batch ships only a *chunk table* — (start, row) pairs addressing
   fixed-size postings windows — a few bytes per 2048 postings instead of the
   postings themselves;
3. one jitted call gathers the windows, masks the tails, scatter-adds into a
   dense [Q, num_docs] accumulator, and takes top-k per row.

All shapes are static per bucket so XLA compiles a handful of variants.

Tie-break note: scores match the host/native engines exactly, but documents
*tied at the k-th score boundary* may differ — the TPU top_k does not
guarantee index-order tie-breaking.  Metrics (MRR/NDCG@k) are unaffected
beyond boundary noise.

Scale guidance (measured, v5e-1 vs 1 CPU core): this engine wins when the
corpus fits comfortably in a [Q, num_docs] accumulator and queries arrive in
batches (NanoBEIR-scale in-training eval, float impacts).  For quantized
corpus-scale retrieval use search.hybrid_engine.HybridSearchEngine: dense
heavy-term matmul + exact integer top-k, measured 819 q/s exact at 1M docs /
5.7M postings vs 101 q/s for the native C++ engine on the same workload
(benchmarks/query_bench.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SearchConfig
from ..index.inverted import InvertedIndexData

DEFAULT_CHUNK = 2048


def _pick_chunk(offsets: np.ndarray) -> int:
    """Chunk size ~ p95 posting-list length, pow2-rounded into [256, 8192]:
    short lists (in-memory eval corpora) waste far less gather bandwidth
    than a fixed 2048 window, long lists still stream in few chunks."""
    lengths = np.diff(offsets)
    lengths = lengths[lengths > 0]
    if len(lengths) == 0:
        return 256
    p95 = float(np.percentile(lengths, 95))
    c = 256
    while c < p95 and c < 8192:
        c *= 2
    return c


def _bucket(n: int, base: int = 16) -> int:
    b = base
    while b < n:
        b *= 2
    return b


def csr_from_term_impacts(per_doc_impacts):
    """Build CSR arrays (vocab, offsets, doc_ids, impacts, num_docs) from an
    iterable of per-doc [(term, float score), ...] lists, keeping score > 0 —
    the reference SparseSearch in-memory index semantics
    (nano_beir_evaluator.py:78-101).  Shared by the device and hybrid
    engines' ``from_term_impacts`` constructors."""
    vocab: dict = {}
    term_ids, docs, vals = [], [], []
    n_docs = 0
    for doc_id, impacts in enumerate(per_doc_impacts):
        n_docs += 1
        for term, score in impacts:
            if score <= 0:
                continue
            tid = vocab.setdefault(term, len(vocab))
            term_ids.append(tid)
            docs.append(doc_id)
            vals.append(score)
    tid_arr = np.asarray(term_ids, dtype=np.int64)
    order = np.argsort(tid_arr, kind="stable")
    counts = (
        np.bincount(tid_arr, minlength=len(vocab))
        if len(tid_arr)
        else np.zeros(len(vocab), np.int64)
    )
    offsets = np.zeros(len(vocab) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    doc_arr = (
        np.asarray(docs, dtype=np.int64)[order] if len(order) else np.empty(0, np.int64)
    )
    val_arr = (
        np.asarray(vals, dtype=np.float32)[order]
        if len(order)
        else np.empty(0, np.float32)
    )
    return vocab, offsets, doc_arr, val_arr, n_docs


from functools import partial


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10))
def _score_chunks(
    doc_ids: jnp.ndarray,  # [P] int32 postings doc ids (device-resident)
    impacts: jnp.ndarray,  # [P] float32 postings impacts (device-resident)
    starts: jnp.ndarray,  # [C] int32 chunk start offsets into postings
    lengths: jnp.ndarray,  # [C] int32 valid postings per chunk (<= chunk)
    rows: jnp.ndarray,  # [C] int32 query row per chunk
    num_queries: int,
    num_docs: int,
    top_k: int,
    chunk: int = DEFAULT_CHUNK,
    approx: bool = False,
    recall_target: float = 0.99,
):
    offs = jnp.arange(chunk, dtype=jnp.int32)[None, :]  # [1, chunk]
    pos = starts[:, None] + offs  # [C, CHUNK]
    valid = offs < lengths[:, None]
    pos = jnp.where(valid, pos, 0)
    d = jnp.take(doc_ids, pos, axis=0)  # [C, CHUNK]
    v = jnp.take(impacts, pos, axis=0)
    v = jnp.where(valid, v, 0.0)
    r = jnp.broadcast_to(rows[:, None], d.shape)

    scores = jnp.zeros((num_queries, num_docs), dtype=jnp.float32)
    scores = scores.at[r.reshape(-1), d.reshape(-1)].add(v.reshape(-1))
    if approx:
        # jax.lax.approx_max_k: 7.4x faster than exact top_k at 1M docs
        # (30ms vs 223ms for [64, 1M] k=1000 on v5e-1, recall 0.984)
        top_scores, top_docs = jax.lax.approx_max_k(
            scores, top_k, recall_target=recall_target
        )
    else:
        top_scores, top_docs = jax.lax.top_k(scores, top_k)
    return top_scores, top_docs


class DeviceSearchEngine:
    """Batched impact scoring with postings resident in device memory."""

    def __init__(
        self,
        index: Optional[InvertedIndexData] = None,
        config: SearchConfig = SearchConfig(),
        *,
        vocab: Optional[dict] = None,
        offsets: Optional[np.ndarray] = None,
        doc_ids: Optional[np.ndarray] = None,
        impacts: Optional[np.ndarray] = None,
        num_docs: Optional[int] = None,
    ):
        self.config = config
        if index is not None:
            vocab = index.term_to_id
            offsets = index.offsets
            doc_ids = index.doc_ids
            impacts = index.impacts
            num_docs = index.num_docs
        self.vocab = vocab
        self.offsets = np.asarray(offsets, dtype=np.int64)  # host [V+1]
        self.chunk = _pick_chunk(self.offsets)
        self.num_docs = max(int(num_docs), 1)
        has = len(doc_ids) > 0
        self.doc_ids = jax.device_put(
            np.ascontiguousarray(np.asarray(doc_ids, dtype=np.int32))
            if has
            else np.zeros(1, np.int32)
        )
        self.impacts = jax.device_put(
            np.ascontiguousarray(np.asarray(impacts, dtype=np.float32))
            if has
            else np.zeros(1, np.float32)
        )

    @classmethod
    def from_term_impacts(
        cls,
        per_doc_impacts,  # iterable of [(term, float score), ...] per doc
        config: SearchConfig = SearchConfig(),
    ) -> "DeviceSearchEngine":
        """Build an in-memory float-impact engine straight from encoder
        output — the reference SparseSearch in-memory index semantics
        (nano_beir_evaluator.py:78-101: keep score > 0, no quantization)."""
        vocab, offsets, doc_ids, impacts, n_docs = csr_from_term_impacts(
            per_doc_impacts
        )
        return cls(
            config=config,
            vocab=vocab,
            offsets=offsets,
            doc_ids=doc_ids,
            impacts=impacts,
            num_docs=n_docs,
        )

    def _chunk_table(
        self, query_term_sets: Sequence[Set[str]]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        starts: List[int] = []
        lengths: List[int] = []
        rows: List[int] = []
        for row, terms in enumerate(query_term_sets):
            for term in terms:
                tid = self.vocab.get(term)
                if tid is None:
                    continue
                s, e = int(self.offsets[tid]), int(self.offsets[tid + 1])
                while s < e:
                    take = min(self.chunk, e - s)
                    starts.append(s)
                    lengths.append(take)
                    rows.append(row)
                    s += take
        return (
            np.asarray(starts, dtype=np.int32),
            np.asarray(lengths, dtype=np.int32),
            np.asarray(rows, dtype=np.int32),
        )

    def score_batch(
        self,
        query_term_sets: Sequence[Set[str]],
        top_k: Optional[int] = None,
    ) -> List[List[Tuple[int, float]]]:
        """Top-k (doc_id, score) per query; scores sum quantized impacts
        (reference SparseSearch semantics, nano_beir_evaluator.py:103-137)."""
        if top_k is None:
            top_k = self.config.top_k
        nq = len(query_term_sets)
        if nq == 0:
            return []
        k = min(top_k, self.num_docs)
        starts, lengths, rows = self._chunk_table(query_term_sets)
        if len(starts) == 0:
            return [[] for _ in range(nq)]
        c = _bucket(len(starts))
        pad = c - len(starts)
        if pad:
            starts = np.concatenate([starts, np.zeros(pad, np.int32)])
            lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])
            rows = np.concatenate([rows, np.zeros(pad, np.int32)])
        nq_b = _bucket(nq, base=8)
        top_scores, top_docs = _score_chunks(
            self.doc_ids,
            self.impacts,
            jnp.asarray(starts),
            jnp.asarray(lengths),
            jnp.asarray(rows),
            nq_b,
            self.num_docs,
            k,
            self.chunk,
            self.config.approx_top_k,
            self.config.approx_recall_target,
        )
        top_scores = np.asarray(top_scores)[:nq]
        top_docs = np.asarray(top_docs)[:nq]
        out: List[List[Tuple[int, float]]] = []
        for i in range(nq):
            row = [
                (int(d), float(s))
                for d, s in zip(top_docs[i], top_scores[i])
                if s > 0
            ]
            out.append(row)
        return out
