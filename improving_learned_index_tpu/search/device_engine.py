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
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SearchConfig
from ..index.inverted import InvertedIndexData

CHUNK = 2048


def _bucket(n: int, base: int = 16) -> int:
    b = base
    while b < n:
        b *= 2
    return b


from functools import partial


@partial(jax.jit, static_argnums=(5, 6, 7))
def _score_chunks(
    doc_ids: jnp.ndarray,  # [P] int32 postings doc ids (device-resident)
    impacts: jnp.ndarray,  # [P] float32 postings impacts (device-resident)
    starts: jnp.ndarray,  # [C] int32 chunk start offsets into postings
    lengths: jnp.ndarray,  # [C] int32 valid postings per chunk (<= CHUNK)
    rows: jnp.ndarray,  # [C] int32 query row per chunk
    num_queries: int,
    num_docs: int,
    top_k: int,
):
    offs = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]  # [1, CHUNK]
    pos = starts[:, None] + offs  # [C, CHUNK]
    valid = offs < lengths[:, None]
    pos = jnp.where(valid, pos, 0)
    d = jnp.take(doc_ids, pos, axis=0)  # [C, CHUNK]
    v = jnp.take(impacts, pos, axis=0)
    v = jnp.where(valid, v, 0.0)
    r = jnp.broadcast_to(rows[:, None], d.shape)

    scores = jnp.zeros((num_queries, num_docs), dtype=jnp.float32)
    scores = scores.at[r.reshape(-1), d.reshape(-1)].add(v.reshape(-1))
    top_scores, top_docs = jax.lax.top_k(scores, top_k)
    return top_scores, top_docs


class DeviceSearchEngine:
    """Batched impact scoring with postings resident in device memory."""

    def __init__(self, index: InvertedIndexData, config: SearchConfig = SearchConfig()):
        self.config = config
        self.vocab = index.term_to_id
        self.offsets = index.offsets  # host int64 [V+1]
        self.num_docs = max(int(index.num_docs), 1)
        n = max(len(index.doc_ids), 1)
        self.doc_ids = jax.device_put(
            np.ascontiguousarray(index.doc_ids[:n].astype(np.int32))
            if len(index.doc_ids)
            else np.zeros(1, np.int32)
        )
        self.impacts = jax.device_put(
            np.ascontiguousarray(index.impacts[:n].astype(np.float32))
            if len(index.impacts)
            else np.zeros(1, np.float32)
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
                    take = min(CHUNK, e - s)
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
