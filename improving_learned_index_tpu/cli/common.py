"""Shared CLI plumbing: model/tokenizer construction from flags.

The reference hardwires model classes per entry point (e.g. index.py:26
defaults to XLM-R); here every CLI takes ``--model-kind`` /
``--tokenizer`` / ``--vocab-path`` / ``--hf-name`` / ``--checkpoint`` and
builds the same stack.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..core.config import EncoderConfig
from ..models import DeepImpact, DeepImpactCrossEncoder
from ..models.pairwise import DeepPairwiseImpact
from ..text import ImpactTokenizer, WordPieceVocab, make_segmenter

MODEL_KINDS = {
    "deepimpact": (DeepImpact, "bert_base", "relu"),
    "xlmr": (DeepImpact, "xlmr_base", "softplus"),
    "phobert": (DeepImpact, "phobert_base", "relu"),
    "pairwise": (DeepPairwiseImpact, "bert_base", "relu"),
    "cross_encoder": (DeepImpactCrossEncoder, "bert_base", "relu"),
}


def add_model_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--model_kind", choices=sorted(MODEL_KINDS), default="deepimpact")
    parser.add_argument("--checkpoint", type=Path, default=None,
                        help="msgpack params checkpoint (core.checkpoint)")
    parser.add_argument("--hf_name", type=str, default=None,
                        help="HF model id/dir to import trunk weights from")
    parser.add_argument("--vocab_path", type=Path, default=None,
                        help="WordPiece vocab.txt for the built-in tokenizer")
    parser.add_argument("--hf_tokenizer", type=str, default=None,
                        help="HF tokenizer id/dir (uses text.hf_adapter)")
    parser.add_argument("--segmenter", choices=["whitespace", "vncorenlp"],
                        default="whitespace")
    parser.add_argument("--vncorenlp_path", type=Path, default=None)
    parser.add_argument("--max_length", type=int, default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny random model (tests/smoke)")


def build_tokenizer(args):
    max_length = args.max_length or 512
    if args.hf_tokenizer:
        from ..text.hf_adapter import load_hf_tokenizer

        tok = load_hf_tokenizer(args.hf_tokenizer, max_length)
        if args.segmenter == "vncorenlp":
            tok._segmenter = make_segmenter(
                "vncorenlp", save_dir=str(args.vncorenlp_path) if args.vncorenlp_path else None
            )
        return tok
    if not args.vocab_path:
        raise SystemExit("--vocab_path or --hf_tokenizer is required")
    segmenter = None
    if args.segmenter == "vncorenlp":
        segmenter = make_segmenter(
            "vncorenlp", save_dir=str(args.vncorenlp_path) if args.vncorenlp_path else None
        )
    return ImpactTokenizer(
        WordPieceVocab.load(args.vocab_path), max_length, segmenter=segmenter
    )


def enable_compilation_cache() -> None:
    """Point jax at the repo-local on-disk compilation cache (remote TPU
    compiles through the relay cost 30s-25min; a cache hit is free).  Safe
    to call on any backend; a caller-set JAX_COMPILATION_CACHE_DIR wins."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path(__file__).resolve().parent.parent.parent / ".jax_cache"),
        )
    except Exception:
        pass


def build_model(args):
    enable_compilation_cache()
    tokenizer = build_tokenizer(args)
    cls, cfg_factory, activation = MODEL_KINDS[args.model_kind]
    if args.tiny:
        vocab_size = len(tokenizer.vocab) if hasattr(tokenizer, "vocab") else 512
        config = EncoderConfig.tiny(vocab_size=vocab_size, impact_activation=activation)
    else:
        config = getattr(EncoderConfig, cfg_factory)()
    model = cls(config, tokenizer)
    if args.hf_name:
        from ..models.hf_import import load_hf_checkpoint

        model.params = load_hf_checkpoint(args.hf_name, config)
    if args.checkpoint:
        from ..core.checkpoint import load_params

        model.params = load_params(args.checkpoint, like=model.params)
    return model
