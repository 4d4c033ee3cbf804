"""CLI: cross-encoder rerank of a top-k file
(reference: python -m src.deep_impact.cross_encoder_rerank)."""

from __future__ import annotations

import argparse
from pathlib import Path

from ..evaluation.reranker import CrossEncoderReRanker
from .common import add_model_args, build_model


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    add_model_args(parser)
    parser.add_argument("--top_k_path", type=Path, required=True)
    parser.add_argument("--collection_path", type=Path, required=True)
    parser.add_argument("--output_path", type=Path, required=True)
    parser.add_argument("--batch_size", type=int, default=32)
    args = parser.parse_args(argv)
    args.model_kind = "cross_encoder"
    rr = CrossEncoderReRanker(
        build_model(args),
        args.top_k_path,
        args.collection_path,
        args.output_path,
        batch_size=args.batch_size,
    )
    print(f"reranked {rr.run()} queries -> {args.output_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
