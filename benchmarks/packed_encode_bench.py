"""Sequence-packed vs padded encode throughput at realistic document lengths.

The corpus-encode workload the reference actually runs (MSMARCO passages,
~60-80 tokens) pads every document to max_length=256
(src/deep_impact/models/original.py:200-226) — so does our unpacked path.
Packing (text/packing.py) fills each 256-token row with ~3 documents under
block-diagonal attention: same scores, ~3x fewer FLOPs per document.

Measures docs/s through ``Indexer.encode_document_rows`` (full pipeline:
host tokenize -> pack -> device encode -> flat term gather -> host split)
for pack_sequences False/True on the same synthetic 60-word corpus used by
index_build_bench, plus the packing density achieved.

Writes benchmarks/PACKED_ENCODE.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from improving_learned_index_tpu.core.config import EncoderConfig, IndexConfig
from improving_learned_index_tpu.models import DeepImpact
from improving_learned_index_tpu.text import ImpactTokenizer, WordPieceVocab

NUM_DOCS = 30000
WORDS_PER_DOC = 60
SEQ = 256
ROWS = 256  # packed rows per batch == unpacked docs per batch


def make_corpus(n=NUM_DOCS, seed=0):
    rng = np.random.default_rng(seed)
    vocab_words = [f"w{i:05d}" for i in range(30000)]
    p = 1.0 / np.arange(1, len(vocab_words) + 1)
    p /= p.sum()
    return [
        " ".join(
            vocab_words[j]
            for j in rng.choice(len(vocab_words), size=WORDS_PER_DOC, p=p)
        )
        for _ in range(n)
    ]


def main():
    print("building corpus + vocab ...", file=sys.stderr)
    corpus = make_corpus()
    vocab = WordPieceVocab.build(corpus[:5000], max_size=30522)
    tokenizer = ImpactTokenizer(vocab, max_length=SEQ)
    config = EncoderConfig(
        vocab_size=max(len(vocab), 30522),
        hidden_size=768,
        num_layers=12,
        num_heads=12,
        intermediate_size=3072,
        max_position_embeddings=512,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    model = DeepImpact(config, tokenizer, seed=0)

    # packing density on this corpus
    from improving_learned_index_tpu.text.packing import pack_documents

    sample = [model.process_document(d) for d in corpus[:2000]]
    mean_tokens = float(np.mean([sum(e.attention_mask) for e in sample]))
    batches = list(pack_documents(sample, SEQ, 64))
    used_rows = sum(int((b.segment_ids.max(axis=1) > 0).sum()) for b in batches)
    density = len(sample) / used_rows

    results = {}
    from improving_learned_index_tpu.index.indexer import Indexer

    for packed in (False, True):
        cfg = IndexConfig(
            max_length=SEQ, max_terms=SEQ, model_batch_size=ROWS, pack_sequences=packed
        )
        indexer = Indexer(model, cfg)
        # warmup/compile on a slice
        for _ in indexer.encode_document_rows(corpus[:ROWS * 2]):
            pass
        n = 0
        start = time.time()
        for _ in indexer.encode_document_rows(corpus):
            n += 1
        dt = time.time() - start
        key = "packed" if packed else "padded"
        results[key] = {"docs_per_s": round(n / dt, 1), "seconds": round(dt, 1), "docs": n}
        print(f"{key}: {n} docs in {dt:.1f}s -> {n/dt:.1f} docs/s", file=sys.stderr)

    out = {
        "workload": f"{NUM_DOCS} docs x {WORDS_PER_DOC} words (~{mean_tokens:.0f} tokens), "
        f"bert-base, S={SEQ}, rows/batch={ROWS}",
        "mean_tokens_per_doc": round(mean_tokens, 1),
        "packing_density_docs_per_row": round(density, 2),
        **results,
        "speedup": round(
            results["packed"]["docs_per_s"] / results["padded"]["docs_per_s"], 2
        ),
    }
    path = Path(__file__).parent / "PACKED_ENCODE.json"
    path.write_text(json.dumps(out, indent=2) + "\n", encoding="utf-8")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
