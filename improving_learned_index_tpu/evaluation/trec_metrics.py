"""TREC-style retrieval metrics: NDCG / MAP / Recall / P @ k.

Drop-in for what the reference obtains from ``beir.retrieval.evaluation.
EvaluateRetrieval.evaluate`` (reference nano_beir_evaluator.py:230-232),
which wraps pytrec_eval: graded-gain NDCG with log2 discount, MAP with the
full-relevant denominator, recall against all relevant docs, precision at
cutoff.  Implemented in numpy — no external eval dependency.

Inputs match the beir calling convention:
    qrels   : {qid: {doc_id: relevance}}
    results : {qid: {doc_id: score}}
    k_values: [10, 100, 1000]
Returns the beir 4-tuple of dicts: (ndcg, map, recall, precision).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple


def _sorted_docs(result: Dict[str, float]) -> List[str]:
    # trec_eval tie-break: score desc, then doc id.
    return sorted(result, key=lambda d: (-result[d], d))


def evaluate(
    qrels: Dict[str, Dict[str, int]],
    results: Dict[str, Dict[str, float]],
    k_values: Sequence[int] = (10, 100, 1000),
) -> Tuple[Dict[str, float], Dict[str, float], Dict[str, float], Dict[str, float]]:
    ndcg = {f"NDCG@{k}": 0.0 for k in k_values}
    _map = {f"MAP@{k}": 0.0 for k in k_values}
    recall = {f"Recall@{k}": 0.0 for k in k_values}
    precision = {f"P@{k}": 0.0 for k in k_values}

    num_q = 0
    for qid, rel_docs in qrels.items():
        rels = {d: r for d, r in rel_docs.items() if r > 0}
        if not rels:
            continue
        num_q += 1
        ranked = _sorted_docs(results.get(qid, {}))
        gains = [rels.get(d, 0) for d in ranked]
        ideal = sorted(rels.values(), reverse=True)
        total_rel = len(rels)

        for k in k_values:
            top = gains[:k]
            # NDCG@k
            dcg = sum(g / math.log2(i + 2) for i, g in enumerate(top) if g > 0)
            idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal[:k]))
            ndcg[f"NDCG@{k}"] += dcg / idcg if idcg > 0 else 0.0
            # MAP@k (denominator: all relevant docs, trec_eval map_cut)
            hits = 0
            ap = 0.0
            for i, g in enumerate(top):
                if g > 0:
                    hits += 1
                    ap += hits / (i + 1)
            _map[f"MAP@{k}"] += ap / total_rel
            # Recall@k / P@k
            n_hit = sum(1 for g in top if g > 0)
            recall[f"Recall@{k}"] += n_hit / total_rel
            precision[f"P@{k}"] += n_hit / k

    for d in (ndcg, _map, recall, precision):
        for key in d:
            d[key] = round(d[key] / max(num_q, 1), 5)
    return ndcg, _map, recall, precision
