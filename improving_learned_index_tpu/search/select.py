"""Corpus-size-based engine selection.

The repo ships several query engines with different scaling sweet spots
(measured on v5e-1, benchmarks/BENCHMARKS.md):

- ``device`` (search.device_engine): flat [Q, num_docs] scatter accumulator.
  Wins at eval-scale corpora (NanoBEIR in-training eval, float impacts) where
  the whole accumulator is small — 2149 q/s at 4k docs.
- ``hybrid`` (search.hybrid_engine): dense heavy-term matmul + chunked tail
  scatter + exact integer top-k.  Wins at corpus scale — 916 q/s exact at 1M
  docs where the device engine's flat scatter drops to ~4x slower, 431 q/s at
  MSMARCO scale (8.8M docs).

``choose_engine`` picks per corpus size so the measured-best path is the
default (the reference has one engine — the per-query Python loop,
src/deep_impact/inverted_index/inverted_index.py:55-62 — so engine choice is
new surface; this keeps it zero-config).
"""

from __future__ import annotations

# Measured endpoints: device wins at <= ~10^4 docs, hybrid wins at >= 10^6
# (4x at 1M).  The crossover was swept on v5e-1 (benchmarks/BENCHMARKS.md
# "engine crossover"): at 100k docs the hybrid engine already matches or
# beats the flat scatter, and its memory footprint scales with postings
# rather than Q * num_docs — so the boundary sits at 100k.
HYBRID_MIN_DOCS = 100_000


def choose_engine(num_docs: int) -> str:
    """Return the engine name ("device" | "hybrid") measured fastest for a
    corpus of ``num_docs`` documents."""
    return "hybrid" if num_docs >= HYBRID_MIN_DOCS else "device"
