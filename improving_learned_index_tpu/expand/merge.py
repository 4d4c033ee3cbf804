"""Merge generated queries into the collection (novel terms only).

Capability parity with the reference merge CLI
(src/llama2/merge.py:15-50 + src/utils/utils.py:6-23): zip collection lines
with expansion JSONL, assert doc-id alignment, append only query terms not
already in the document (underscores -> spaces, whitespace collapsed).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Union

from ..core.logging import get_logger
from ..data.datasets import CollectionParser
from ..utils.text_utils import merge_document_and_queries

logger = get_logger("merge")


def merge_collection_and_expansions(
    collection_path: Union[str, Path],
    queries_path: Union[str, Path],
    output_path: Union[str, Path],
    tokenizer,
    collection_type: str = "msmarco",
) -> int:
    n = 0
    with open(collection_path, encoding="utf-8") as f, open(
        queries_path, encoding="utf-8"
    ) as q, open(output_path, "w", encoding="utf-8") as out:
        # zip stops at the shorter file — expansion may cover a prefix only
        for line, query_line in zip(f, q):
            doc_id, doc = CollectionParser.parse(line, collection_type)
            expansion = json.loads(query_line)
            if doc_id != str(expansion["doc_id"]):
                # hard error, not assert: under python -O a drifted expansion
                # file would silently append another document's queries to
                # every row (reference merge.py:46 asserts the same contract)
                raise ValueError(
                    f"Doc id mismatch: {doc_id} != {expansion['doc_id']}"
                )
            merged = merge_document_and_queries(doc, expansion["queries"], tokenizer)
            out.write(f"{doc_id}\t{merged}\n")
            n += 1
    logger.info(f"merged {n} documents")
    return n
