"""CLI: rank queries over an inverted index into a run file
(reference: python -m src.deep_impact.rank, rank.py:6-22)."""

from __future__ import annotations

import argparse
from pathlib import Path

from ..evaluation.ranker import Ranker
from .common import add_model_args, build_tokenizer


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    add_model_args(parser)
    parser.add_argument("--index_path", type=Path, required=True)
    parser.add_argument("--queries_path", type=Path, required=True)
    parser.add_argument("--output_path", type=Path, required=True)
    parser.add_argument("--qrels_path", type=Path, default=None)
    parser.add_argument("--dataset_type", choices=["msmarco", "beir"], default="msmarco")
    parser.add_argument("--pairwise", action="store_true")
    parser.add_argument("--engine",
                        choices=["auto", "device", "hybrid", "host", "native"],
                        default="auto",
                        help="auto (default) picks the measured-best TPU "
                        "engine by corpus size: hybrid at corpus scale, "
                        "device for small eval corpora")
    parser.add_argument("--top_k", type=int, default=1000)
    parser.add_argument("--approx_top_k", action="store_true",
                        help="hardware-friendly approximate top-k (device engine)")
    parser.add_argument("--dense_budget_gb", type=float, default=4.0,
                        help="hybrid engine: HBM budget for dense heavy-term "
                        "rows.  4GB is the measured sweet spot at 8.8M docs "
                        "since the chunk-slice gather fix (8GB measured "
                        "SLOWER: engine-wide HBM pressure outweighs the "
                        "smaller tail — QBENCH_TRIM_388M.json vs "
                        "QBENCH_GATHER_388M.json)")
    parser.add_argument("--use_pallas", action="store_true", default=None,
                        help="force the Pallas gather/scatter scoring "
                        "kernels on (TPU only; exact; default: auto — on at "
                        ">= 4M docs, where they win 282 vs 199 q/s "
                        "pipelined at 388M postings)")
    parser.add_argument("--no_use_pallas", dest="use_pallas",
                        action="store_false")
    parser.add_argument("--tail_partitioned", action="store_true", default=None,
                        help="hybrid engine: doc-partition tail postings at "
                        "load so scoring never sorts.  OPT-IN: lost "
                        "the same-run A/B at every measured density "
                        "(QBENCH_PART_388M.json) - A/B before serving")
    parser.add_argument("--no_tail_partitioned", dest="tail_partitioned",
                        action="store_false")
    args = parser.parse_args(argv)

    ranker = Ranker(
        index_path=args.index_path,
        queries_path=args.queries_path,
        output_path=args.output_path,
        tokenizer=build_tokenizer(args),
        qrels_path=args.qrels_path,
        dataset_type=args.dataset_type,
        pairwise=args.pairwise,
        engine=args.engine,
        top_k=args.top_k,
        approx_top_k=args.approx_top_k,
        dense_budget_bytes=int(args.dense_budget_gb * (1 << 30)),
        use_pallas=args.use_pallas,
        tail_partitioned=args.tail_partitioned,
    )
    n = ranker.run()
    print(f"ranked {n} queries -> {args.output_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
