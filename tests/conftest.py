"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Real TPU pods aren't available in CI; multi-chip sharding code is exercised
on ``--xla_force_host_platform_device_count=8`` CPU devices instead
(SURVEY.md §4).  Must run before any jax backend initialization.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon sitecustomize may have already imported jax with the TPU platform
# pinned; override it explicitly.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert devices[0].platform == "cpu"
    return devices


@pytest.fixture(scope="session")
def tiny_corpus():
    return [
        "the quick brown fox jumps over the lazy dog",
        "a fast auburn fox leaped across a sleepy canine",
        "neural networks learn sparse representations of text",
        "inverted indexes map terms to document postings",
        "impact scores quantize term importance into bytes",
        "tpu systolic arrays multiply matrices in bfloat16",
        "retrieval systems rank documents for user queries",
        "the dog sleeps while the fox runs through fields",
    ]


@pytest.fixture(scope="session")
def tiny_tokenizer(tiny_corpus):
    from improving_learned_index_tpu.text import ImpactTokenizer, WordPieceVocab

    vocab = WordPieceVocab.build(tiny_corpus, max_size=512)
    return ImpactTokenizer(vocab, max_length=32)
