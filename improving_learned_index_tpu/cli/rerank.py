"""CLI: impact-score rerank of a top-k run file
(reference: python -m src.deep_impact.rerank, rerank.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

from ..evaluation.reranker import ReRanker
from .common import add_model_args, build_model


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    add_model_args(parser)
    parser.add_argument("--top_k_run_file_path", type=Path, required=True)
    parser.add_argument("--queries_path", type=Path, required=True)
    parser.add_argument("--collection_path", type=Path, required=True)
    parser.add_argument("--output_path", type=Path, required=True)
    parser.add_argument("--batch_size", type=int, default=128)
    args = parser.parse_args(argv)
    rr = ReRanker(
        build_model(args),
        args.top_k_run_file_path,
        args.queries_path,
        args.collection_path,
        args.output_path,
        batch_size=args.batch_size,
    )
    print(f"reranked {rr.run()} queries -> {args.output_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
