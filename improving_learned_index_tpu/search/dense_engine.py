"""Dense MXU scoring for in-memory evaluation corpora.

The reference scores NanoBEIR queries with a Python dict-accumulation loop
(src/deep_impact/evaluation/nano_beir_evaluator.py:112-133).  The TPU-native
formulation when the corpus is small enough: materialize the term-impact
matrix M [V, D] once in HBM and score a query batch as ONE matmul,

    scores[B, D] = onehot_queries[B, V] @ M[V, D]

which runs on the MXU instead of a serialized scatter.  Numerics are exact:
impacts are <= 255 (exactly representable in bf16), the one-hot is 0/1, and
accumulation uses fp32 (``preferred_element_type``), so sums match the
host engine bit-for-bit.

Use when V * D fits the memory budget (NanoBEIR-scale: tens of MB).  The
chunked DeviceSearchEngine and the native C++ engine cover large corpora.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SearchConfig
from ..index.inverted import InvertedIndexData


def _bucket(n: int, base: int = 64) -> int:
    b = base
    while b < n:
        b *= 2
    return b


@partial(jax.jit, static_argnums=(3,))
def _dense_scores(
    impact_matrix: jnp.ndarray,  # [V+1, D] (device-resident; last row zero)
    term_ids: jnp.ndarray,  # [B, T] int32, padded with V (the zero row)
    term_valid: jnp.ndarray,  # [B, T] bool
    num_docs: int,
):
    v_rows = impact_matrix.shape[0]
    bsz, t = term_ids.shape
    # sparse one-hot build: B*T scatter-sets, not a [B, T, V] materialization
    rows = jnp.broadcast_to(jnp.arange(bsz, dtype=jnp.int32)[:, None], (bsz, t))
    cols = jnp.where(term_valid, term_ids, v_rows - 1)
    qvec = jnp.zeros((bsz, v_rows), dtype=impact_matrix.dtype)
    qvec = qvec.at[rows.reshape(-1), cols.reshape(-1)].max(1.0)
    qvec = qvec.at[:, v_rows - 1].set(0.0)  # pad row contributes nothing
    # HIGHEST: TPU's default matmul precision truncates fp32 operands to
    # bf16 on the MXU, breaking exact-score parity with the host engine.
    scores = jnp.dot(
        qvec,
        impact_matrix,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return scores[:, :num_docs]
    # top-k happens on the host: measured on v5e-1, lax.top_k(k=1000) over a
    # [1024, 5120] matrix costs ~1s while fetching the dense scores and
    # numpy-partitioning costs ~300ms total.


def host_topk(scores: np.ndarray, k: int):
    """Rows of (doc, score) pairs, score desc then doc asc, zeros dropped."""
    out = []
    k = min(k, scores.shape[1])
    if k < scores.shape[1]:
        part = np.argpartition(scores, -k, axis=1)[:, -k:]
    else:
        part = np.broadcast_to(np.arange(scores.shape[1]), scores.shape)
    for i in range(scores.shape[0]):
        idx = part[i]
        vals = scores[i, idx]
        keep = vals > 0
        idx, vals = idx[keep], vals[keep]
        order = np.lexsort((idx, -vals))
        out.append([(int(d), float(s)) for d, s in zip(idx[order], vals[order])])
    return out


class DenseSearchEngine:
    """Batched scoring via one-hot @ impact-matrix on the MXU."""

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
        self.num_docs = max(int(num_docs), 1)
        v = len(vocab)
        d_pad = max(_bucket(self.num_docs, base=128), 128)
        # [V+1, D]: one extra all-zero row addressed by padded term slots
        matrix = np.zeros((v + 1, d_pad), dtype=np.float32)
        offsets = np.asarray(offsets)
        term_of_posting = np.repeat(np.arange(v), np.diff(offsets))
        impacts = np.asarray(impacts, dtype=np.float32)
        matrix[term_of_posting, np.asarray(doc_ids, dtype=np.int64)] = impacts
        # int impacts (quantized indexes) are exact in bf16 (values <= 255);
        # float impacts keep fp32 to match the host engine bit-for-bit.
        is_int = np.allclose(impacts, np.round(impacts)) and (
            impacts.max(initial=0.0) <= 256
        )
        dtype = jnp.bfloat16 if is_int else jnp.float32
        self.impact_matrix = jax.device_put(jnp.asarray(matrix, dtype=dtype))

    @classmethod
    def fits(cls, num_terms: int, num_docs: int, budget_bytes: int = 1 << 30) -> bool:
        # conservative fp32 sizing (float-impact matrices stay fp32)
        return (num_terms + 1) * max(_bucket(num_docs, 128), 128) * 4 <= budget_bytes

    @classmethod
    def from_term_impacts(cls, per_doc_impacts, config: SearchConfig = SearchConfig()):
        from .device_engine import DeviceSearchEngine

        base = DeviceSearchEngine.from_term_impacts(per_doc_impacts, config)
        return cls(
            config=config,
            vocab=base.vocab,
            offsets=base.offsets,
            doc_ids=np.asarray(base.doc_ids),
            impacts=np.asarray(base.impacts),
            num_docs=base.num_docs,
        )

    def score_batch(
        self, query_term_sets: Sequence[Set[str]], top_k: Optional[int] = None
    ) -> List[List[Tuple[int, float]]]:
        if top_k is None:
            top_k = self.config.top_k
        nq = len(query_term_sets)
        if nq == 0:
            return []
        k = min(top_k, self.num_docs)
        v = len(self.vocab)
        max_t = max(1, max(len(q) for q in query_term_sets))
        t_pad = _bucket(max_t, base=8)
        nq_pad = _bucket(nq, base=64)
        term_ids = np.full((nq_pad, t_pad), v, dtype=np.int32)  # pad -> zero row
        valid = np.zeros((nq_pad, t_pad), dtype=bool)
        for i, terms in enumerate(query_term_sets):
            j = 0
            for term in terms:
                tid = self.vocab.get(term)
                if tid is not None:
                    term_ids[i, j] = tid
                    valid[i, j] = True
                    j += 1
        scores = np.asarray(
            _dense_scores(
                self.impact_matrix,
                jnp.asarray(term_ids),
                jnp.asarray(valid),
                self.num_docs,
            )
        )[:nq]
        return host_topk(scores, k)
