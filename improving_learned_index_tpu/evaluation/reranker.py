"""Impact-score reranking of a top-k run file.

Capability parity with the reference ReRanker (src/deep_impact/evaluation/
reranker.py:13-113): for each query, encode its candidate documents on
demand (cached across queries), score = sum of impacts of query-matching
terms, re-sort the top-1000.  Device encode is batched; DataParallel and the
tokenizer process pool are subsumed by the jitted batched forward.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple, Union

from ..core.logging import get_logger
from ..data.datasets import Collection, Queries, RunFile, TopKRunFile

logger = get_logger("reranker")


class ReRanker:
    def __init__(
        self,
        model,
        top_k_run_file_path: Union[str, Path],
        queries_path: Union[str, Path],
        collection_path: Union[str, Path],
        output_path: Union[str, Path],
        batch_size: int = 128,
        final_k: int = 1000,
    ):
        self.model = model
        self.top_k = TopKRunFile(top_k_run_file_path)
        self.queries = Queries(queries_path)
        self.collection = Collection(collection_path)
        self.run_file = RunFile(output_path)
        self.batch_size = batch_size
        self.final_k = final_k
        self.cache: Dict[str, Dict[str, float]] = {}

    def _encode(self, pids: List[str]) -> None:
        docs = [self.collection[pid] for pid in pids]
        for pid, term_impacts in zip(pids, self.model.get_impact_scores_batch(docs)):
            self.cache[pid] = dict(term_impacts)

    def score(self, pid: str, query_terms) -> float:
        return sum(self.cache[pid].get(t, 0) for t in query_terms)

    def rerank(self, qid: str, pids: List[str]) -> List[Tuple[str, float]]:
        query_terms = self.model.process_query(self.queries[qid])
        missing = [pid for pid in pids if pid not in self.cache]
        for i in range(0, len(missing), self.batch_size):
            self._encode(missing[i : i + self.batch_size])
        scores = [(pid, self.score(pid, query_terms)) for pid in pids]
        return sorted(scores, key=lambda x: x[1], reverse=True)[: self.final_k]

    def run(self) -> int:
        n = 0
        for qid, pids in self.top_k:
            self.run_file.writelines(qid, self.rerank(qid, pids))
            n += 1
            if n % 50 == 0:
                logger.info(f"reranked {n}/{len(self.top_k)} queries")
        return n


class CrossEncoderReRanker:
    """Rerank a top-k file with the cross-encoder model (reference
    evaluation/cross_encoder_reranker.py:12-62)."""

    def __init__(
        self,
        model,  # models.DeepImpactCrossEncoder
        top_k_path: Union[str, Path],
        collection_path: Union[str, Path],
        output_path: Union[str, Path],
        batch_size: int = 32,
    ):
        from ..data.datasets import TopKDataset

        self.model = model
        self.top_k = TopKDataset(top_k_path)
        self.collection = Collection(collection_path)
        self.run_file = RunFile(output_path)
        self.batch_size = batch_size

    def rerank(self, qid: str) -> List[Tuple[str, float]]:
        query = self.top_k.queries[qid]
        pids = self.top_k[qid]
        scores: List[float] = []
        for i in range(0, len(pids), self.batch_size):
            batch = [self.collection[p] for p in pids[i : i + self.batch_size]]
            encs = self.model.process_cross_encoder_documents_and_query(batch, query)
            scores.extend(self.model.score_batch(encs).tolist())
        return sorted(zip(pids, scores), key=lambda x: x[1], reverse=True)

    def run(self) -> int:
        n = 0
        for qid in self.top_k.keys():
            self.run_file.writelines(qid, self.rerank(qid))
            n += 1
        return n
