"""Term-dependency analysis: cross-attention between term pairs.

Capability parity with the reference term_dependencies study
(src/term_dependencies/attention.py:21-69): for every pair of document
terms, the max over directions of the mean-head attention between their
first tokens, reported per layer.  The reference forked a ProcessPool per
document; here the batch runs through one jitted forward with
``output_attentions`` and the pair gather is vectorized.
"""

from __future__ import annotations

from itertools import combinations
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.encoder import TransformerEncoder
from ..text.processor import batch_arrays


def extract_term_pair_attention(
    model,  # models.DeepImpact
    documents: Sequence[str],
) -> List[Dict[Tuple[str, str], np.ndarray]]:
    """Per document: {(term1, term2): per-layer max-direction mean-head
    attention} for all term pairs (token order)."""
    config = model.config
    encoder = TransformerEncoder(config)
    encodings = [model.process_document(d) for d in documents]
    arrays = batch_arrays(encodings)

    @jax.jit
    def forward(params, ids, mask, type_ids):
        _, attentions = encoder.apply(
            {"params": params}, ids, mask, type_ids, output_attentions=True
        )
        # [layers, B, L, L] mean over heads
        return jnp.stack([a.mean(axis=1) for a in attentions], axis=0)

    mean_attn = np.asarray(
        forward(
            model.params["encoder"],
            arrays["input_ids"],
            arrays["attention_mask"],
            arrays["type_ids"],
        )
    )

    results: List[Dict[Tuple[str, str], np.ndarray]] = []
    for b, enc in enumerate(encodings):
        items = sorted(enc.term_to_token_index.items(), key=lambda x: x[1])
        pair_attn: Dict[Tuple[str, str], np.ndarray] = {}
        for (t1, i), (t2, j) in combinations(items, 2):
            per_layer = np.maximum(mean_attn[:, b, i, j], mean_attn[:, b, j, i])
            pair_attn[(t1, t2)] = per_layer
        results.append(pair_attn)
    return results
