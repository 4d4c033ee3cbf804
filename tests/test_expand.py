"""doc2query expansion pipeline: generation loop with resume-by-count,
merge-unique-terms, and the merge alignment assertion."""

import json

import jax
import numpy as np
import pytest

from improving_learned_index_tpu.core.config import GenerationConfig
from improving_learned_index_tpu.expand import (
    QueryGenerator,
    count_lines,
    generate_expansions,
    merge_collection_and_expansions,
)
from improving_learned_index_tpu.models.llama import LlamaConfig, init_llama_params


class ByteTokenizer:
    """Toy byte-level tokenizer: ids = byte values + 3 (0=pad, 1=bos, 2=eos)."""

    def encode(self, text):
        return [1] + [b + 3 for b in text.encode("utf-8")[:200]]

    def decode(self, ids):
        data = bytes(i - 3 for i in ids if i >= 3)
        return data.decode("utf-8", errors="ignore")


@pytest.fixture(scope="module")
def generator():
    cfg = LlamaConfig.tiny(vocab_size=259)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    gen = GenerationConfig(num_return_sequences=3, max_new_tokens=8, top_k=20, top_p=0.9)
    return QueryGenerator(params, cfg, ByteTokenizer(), gen)


def test_generate_shapes(generator):
    queries = generator.generate(["hello world", "foxes jump"], seed=0)
    assert len(queries) == 2
    assert all(len(q) == 3 for q in queries)
    assert all(isinstance(s, str) for q in queries for s in q)


def test_generate_expansions_resume(generator, tmp_path):
    collection = tmp_path / "collection.tsv"
    collection.write_text("d0\talpha doc\nd1\tbeta doc\nd2\tgamma doc\nd3\tdelta doc\n")
    out = tmp_path / "expansions.jsonl"

    n = generate_expansions(
        generator, collection, out, batch_size=2, num_docs=2, seed=0
    )
    assert n == 2 and count_lines(out) == 2

    # resume: picks up where it left off, doesn't redo the first two
    n = generate_expansions(generator, collection, out, batch_size=2, seed=0)
    assert n == 2 and count_lines(out) == 4
    records = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["doc_id"] for r in records] == ["d0", "d1", "d2", "d3"]
    assert all(len(r["queries"]) == 3 for r in records)


def test_merge_unique_terms(tiny_tokenizer, tmp_path):
    collection = tmp_path / "collection.tsv"
    collection.write_text("d0\tthe quick brown fox\nd1\tlazy dog\n")
    expansions = tmp_path / "exp.jsonl"
    with open(expansions, "w") as f:
        f.write(json.dumps({"doc_id": "d0", "queries": ["quick animal", "fox colour"]}) + "\n")
        f.write(json.dumps({"doc_id": "d1", "queries": ["sleepy_dog naps"]}) + "\n")
    out = tmp_path / "merged.tsv"
    n = merge_collection_and_expansions(collection, expansions, out, tiny_tokenizer)
    assert n == 2
    lines = dict(l.split("\t", 1) for l in out.read_text().splitlines())
    # novel terms appended; existing terms (quick, fox) not duplicated
    d0_terms = lines["d0"].split()
    assert d0_terms[:4] == ["the", "quick", "brown", "fox"]
    assert "animal" in d0_terms and "colour" in d0_terms
    assert d0_terms.count("quick") == 1 and d0_terms.count("fox") == 1
    # underscores replaced by spaces (compound segmenter artifacts)
    assert "sleepy" in lines["d1"].split() and "sleepy_dog" not in lines["d1"]


def test_merge_doc_id_mismatch_raises(tiny_tokenizer, tmp_path):
    collection = tmp_path / "c.tsv"
    collection.write_text("d0\tsome doc\n")
    expansions = tmp_path / "e.jsonl"
    expansions.write_text(json.dumps({"doc_id": "WRONG", "queries": ["x"]}) + "\n")
    # ValueError, not assert: the alignment contract must survive python -O
    with pytest.raises(ValueError, match="Doc id mismatch"):
        merge_collection_and_expansions(
            collection, expansions, tmp_path / "m.tsv", tiny_tokenizer
        )


def test_encode_prompt_truncates_document_not_separator(generator):
    """Over-budget prompts must lose DOCUMENT tokens, never the trailing
    '\\n---\\n' separator — tail truncation leaves the model mid-document
    with no cue to start generating queries."""
    import dataclasses

    gen = dataclasses.replace(generator.gen, max_tokens=64)
    g = QueryGenerator(
        generator.params, generator.config, ByteTokenizer(), gen,
        prompt_template=generator.prompt_template,
    )
    long_doc = "word " * 300
    ids = g._encode_prompt(long_doc)
    assert len(ids) <= 64
    sep_tail = ByteTokenizer().encode(
        generator.prompt_template.format(doc="")
    )
    # the template's suffix after {doc} is '\n---\n'; its byte ids must
    # close the truncated prompt
    suffix = [b + 3 for b in "\n---\n".encode("utf-8")]
    assert ids[-len(suffix):] == suffix
    del sep_tail


def test_prompt_padding_is_bucketed(generator):
    """Prompt rows pad to 64-token buckets (bounded compile count), capped
    at max_tokens."""
    ids, mask = generator.prompt_and_tokenize(["short doc", "another short doc"])
    assert ids.shape[1] % 64 == 0 or ids.shape[1] == generator.gen.max_tokens
    # left padding preserved
    assert mask[0, -1] == 1 and mask[0, 0] == 0


def test_generate_expansions_skips_blank_lines(generator, tmp_path):
    collection = tmp_path / "c_blank.tsv"
    collection.write_text("d0\talpha doc\n\nd1\tbeta doc\n\n\nd2\tgamma doc\n")
    out = tmp_path / "e_blank.jsonl"
    n = generate_expansions(generator, collection, out, batch_size=2, seed=0)
    assert n == 3
    records = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["doc_id"] for r in records] == ["d0", "d1", "d2"]
    # resume counts non-blank lines: a rerun adds nothing and redoes nothing
    assert generate_expansions(generator, collection, out, batch_size=2, seed=0) == 0
    assert count_lines(out) == 3
