"""SparseSearch: encode a corpus in memory and score queries on device.

Capability parity with the reference SparseSearch
(src/deep_impact/evaluation/nano_beir_evaluator.py:70-137): builds an
in-memory inverted index from ``get_impact_scores_batch`` keeping only
positive scores, then scores each query by summing matched impacts and
taking top-k.  The per-query Python accumulation loop becomes one batched
device call (search.device_engine).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..core.config import SearchConfig
from ..core.logging import get_logger
from ..search.device_engine import DeviceSearchEngine
from ..search.select import HYBRID_MIN_DOCS

logger = get_logger("sparse_search", stream=False)


class SparseSearch:
    def __init__(
        self,
        model,
        batch_size: int = 16,
        verbose: bool = False,
        use_packing: bool = True,
    ):
        self.model = model
        self.batch_size = batch_size
        self.verbose = verbose
        self.use_packing = use_packing
        self.engine: Optional[DeviceSearchEngine] = None
        self.corpus_ids: List[str] = []

    def _build_index(self, corpus: Dict[str, str]) -> None:
        self.corpus_ids = list(corpus.keys())
        texts = list(corpus.values())

        # sequence-packed encode when the model supports it: the in-training
        # NanoBEIR corpora are short documents, so packing cuts the encode
        # FLOPs ~(max_length / mean_doc_tokens)x at identical scores
        packed = (
            getattr(self.model, "get_impact_scores_batch_packed", None)
            if self.use_packing
            else None
        )

        def impacts():
            for i in range(0, len(texts), self.batch_size):
                batch = texts[i : i + self.batch_size]
                rows = (
                    packed(batch)
                    if packed is not None
                    else self.model.get_impact_scores_batch(batch)
                )
                for doc_impacts in rows:
                    yield doc_impacts

        if len(texts) >= HYBRID_MIN_DOCS:
            # corpus-scale eval: the flat [Q, num_docs] scatter accumulator
            # stops being the right shape; use the hybrid engine in
            # float-exact mode (sort-based top_k, fp32 dense rows)
            from ..search.hybrid_engine import HybridSearchEngine

            self.engine = HybridSearchEngine.from_term_impacts(impacts())
        else:
            # chunked device engine: measured fastest end-to-end at eval scale
            # (2149 q/s vs 1845 for the dense-matmul engine on v5e-1; the dense
            # engine in search.dense_engine remains available as an alternative)
            self.engine = DeviceSearchEngine.from_term_impacts(impacts())
        if self.verbose:
            logger.info(
                f"built in-memory index: {len(self.engine.vocab)} terms over "
                f"{len(self.corpus_ids)} docs"
            )

    def search(
        self, queries: Dict[str, str], corpus: Dict[str, str], k: int = 1000
    ) -> Dict[str, Dict[str, float]]:
        if self.engine is None:
            self._build_index(corpus)
        qids = list(queries.keys())
        term_sets = [self.model.process_query(queries[qid]) for qid in qids]
        results: Dict[str, Dict[str, float]] = {}
        # scoring is device-side: large batches amortize dispatch latency
        bs = max(self.batch_size, 512)
        for i in range(0, len(qids), bs):
            batch_sets = term_sets[i : i + bs]
            scored = self.engine.score_batch(batch_sets, top_k=k)
            for qid, ranked in zip(qids[i : i + bs], scored):
                results[qid] = {
                    self.corpus_ids[doc]: float(score) for doc, score in ranked
                }
        return results
