"""TPU-native learned sparse retrieval framework (DeepImpact family).

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``improving-learned-index`` codebase (DeeperImpact, arXiv:2405.17093):

- ``models``     : DeepImpact term-impact encoders (BERT/RoBERTa/XLM-R trunks)
                   as flax modules with bf16 MXU-friendly compute.
- ``text``       : host-side pluggable normalizer/segmenter/subword stack that
                   produces fixed-shape device batches plus term->first-token
                   slot maps.
- ``ops``        : device kernels — quantization, postings scoring, top-k.
- ``parallel``   : jax.sharding mesh construction and partition specs
                   (data/model axes) + sharded host data iterators.
- ``train``      : pjit data-parallel training (pairwise CE, distillation
                   KL / MarginMSE, in-batch negatives) with checkpoint/resume.
- ``index``      : corpus encode -> impact extraction -> 8-bit quantize ->
                   inverted index build + binary serialization.
- ``search``     : query-time engines (on-device batched scorer; host engine
                   over the binary index format).
- ``expand``     : doc2query expansion with sharded JAX decoding + LoRA.
- ``evaluation`` : NanoBEIR harness, MRR/Recall run-file metrics, rerankers,
                   BM25 baseline.
"""

__version__ = "0.1.0"
