"""Corpus-size-based engine selection.

The repo ships several query engines with different scaling sweet spots
(measured on v5e-1, benchmarks/BENCHMARKS.md):

- ``device`` (search.device_engine): flat [Q, num_docs] scatter accumulator.
  Simple and compile-cheap; competitive only at eval-scale corpora.
- ``hybrid`` (search.hybrid_engine): dense heavy-term matmul + chunked tail
  scatter + exact integer top-k, with pipelined batches.

``choose_engine`` picks per corpus size so the measured-best path is the
default (the reference has one engine — the per-query Python loop,
src/deep_impact/inverted_index/inverted_index.py:55-62 — so engine choice is
new surface; this keeps it zero-config).
"""

from __future__ import annotations

# Quantized (integer-score) disk indexes — the rank CLI path.  The full
# device-vs-hybrid sweep (benchmarks/crossover_bench.py, CROSSOVER.json,
# 64-query batches / 8 terms / k=1000 exact) measured the hybrid engine
# ahead at EVERY size down to 4k docs (772 vs 561 q/s at 4k; 787 vs 281 at
# 100k; 730 vs 52 at 1M), so the boundary sits at the smallest measured
# point rather than 0: below it the sweep has no data and the flat-scatter
# engine's one-shape compile is cheaper.
HYBRID_MIN_DOCS_QUANTIZED = 4_000

# Float-impact in-memory corpora (SparseSearch / NanoBEIR in-training eval):
# hybrid must run float-exact mode (fp32 dense rows + sort-based top_k —
# exact_topk_integer needs the integer score lattice), which is unmeasured
# below this scale; the flat device engine is the measured eval-scale
# default (NANO_BEIR_10K.json runs it at 10k docs).
HYBRID_MIN_DOCS = 100_000


def choose_engine(num_docs: int, integer_scores: bool = True) -> str:
    """Return the engine name ("device" | "hybrid") measured fastest for a
    corpus of ``num_docs`` documents with the given score lattice."""
    bound = HYBRID_MIN_DOCS_QUANTIZED if integer_scores else HYBRID_MIN_DOCS
    return "hybrid" if num_docs >= bound else "device"


def build_engine(
    index_path,
    engine: str = "auto",
    approx_top_k: bool = False,
    dense_budget_bytes: int = 4 << 30,
    use_pallas=None,  # None = engine auto (Pallas tail at corpus scale)
    num_docs: int = 0,
    tail_partitioned=None,
):
    """Construct a query engine from a saved index — the one construction
    path shared by the rank CLI, the serving daemon, and library users.
    ``engine``: auto | device | hybrid | host | native."""
    if engine == "native":
        from .native import NativeSearchEngine

        return NativeSearchEngine(index_path)
    from ..core.config import SearchConfig
    from ..core.logging import get_logger
    from ..index.inverted import InvertedIndexData

    index = InvertedIndexData.load(index_path, num_docs=num_docs)
    if engine == "auto":
        engine = choose_engine(int(index.num_docs))
        get_logger("select").info(
            f"auto-selected engine '{engine}' for {int(index.num_docs)} docs"
        )
    if engine == "device":
        from .device_engine import DeviceSearchEngine

        return DeviceSearchEngine(index, SearchConfig(approx_top_k=approx_top_k))
    if engine == "hybrid":
        from .hybrid_engine import HybridSearchEngine

        return HybridSearchEngine(
            index,
            SearchConfig(approx_top_k=approx_top_k),
            dense_budget_bytes=dense_budget_bytes,
            use_pallas=use_pallas,
            tail_partitioned=tail_partitioned,
        )
    if engine == "host":
        from .engine import InvertedIndex

        return InvertedIndex(index)
    raise ValueError(f"unknown engine {engine!r}")
