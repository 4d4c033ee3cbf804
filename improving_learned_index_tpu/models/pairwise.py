"""DeepPairwiseImpact: term-*pair* impact scores.

Capability parity with the reference pairwise model
(src/deep_impact/models/pairwise_impact.py): in addition to per-term
impacts, score term pairs with features = [max cross-layer attention between
the pair's first tokens (detached), hidden(i), hidden(j)] through a
``Linear(2H+1, 1) + ReLU`` head, emitting ``term1|term2`` composite postings.

TPU-first re-design: the reference loops Python lists of ragged pair indices
per document (pairwise_impact.py:58-95); here pairs are a fixed-shape
[B, max_pairs, 2] slot array with a validity mask, the attention feature is
one vectorized gather over the stacked mean-head attention maps, and the
whole forward jits.
"""

from __future__ import annotations

from itertools import combinations
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderConfig
from ..text.processor import DocumentEncoding, batch_arrays
from .deep_impact import DeepImpact, _bucket
from .encoder import ImpactHead, TransformerEncoder


class PairwiseImpactModel(nn.Module):
    """Trunk + per-token impact head + pair head."""

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids,  # [B, L]
        attention_mask,
        type_ids,
        pair_indices,  # [B, P, 2] int32 token indices (first tokens of terms)
        pair_mask,  # [B, P] bool
        deterministic: bool = True,
    ):
        c = self.config
        hidden, attentions = TransformerEncoder(c, name="encoder")(
            input_ids, attention_mask, type_ids, deterministic, output_attentions=True
        )
        single = ImpactHead(c.impact_activation, name="impact_head")(hidden)

        # mean over heads, stacked over layers: [layers, B, L, L]
        mean_attn = jnp.stack([a.mean(axis=1) for a in attentions], axis=0)
        b_idx = jnp.arange(hidden.shape[0])[:, None]  # [B, 1]
        i_idx, j_idx = pair_indices[..., 0], pair_indices[..., 1]  # [B, P]
        # attention(i->j) and (j->i) per layer, max over both and layers
        a_ij = mean_attn[:, b_idx, i_idx, j_idx]  # [layers, B, P]
        a_ji = mean_attn[:, b_idx, j_idx, i_idx]
        max_attn = jnp.max(jnp.maximum(a_ij, a_ji), axis=0)  # [B, P]
        max_attn = jax.lax.stop_gradient(max_attn)  # detached (reference :66)

        h_i = jnp.take_along_axis(hidden, i_idx[..., None], axis=1)  # [B, P, H]
        h_j = jnp.take_along_axis(hidden, j_idx[..., None], axis=1)
        feat = jnp.concatenate([max_attn[..., None], h_i, h_j], axis=-1)  # [B,P,2H+1]
        pair_scores = nn.relu(
            nn.Dense(1, dtype=jnp.float32, name="pairwise_head")(feat)
        )[..., 0]
        pair_scores = jnp.where(pair_mask, pair_scores, 0.0)
        max_attn = jnp.where(pair_mask, max_attn, 0.0)
        return single, pair_scores, max_attn


def build_pair_slots(
    token_indices: Sequence[Sequence[int]], max_pairs: int, directed: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed-shape pair index arrays from per-doc first-token indices.

    Undirected (indexing): combinations of the sorted indices (reference
    compute_term_impacts, pairwise_impact.py:120).  Directed (training):
    both orders (reference training/pairwise_trainer.py:11-17).
    """
    bsz = len(token_indices)
    pairs = np.zeros((bsz, max_pairs, 2), dtype=np.int32)
    mask = np.zeros((bsz, max_pairs), dtype=bool)
    for b, idxs in enumerate(token_indices):
        idxs = sorted(idxs)
        combos = list(combinations(idxs, 2))
        if directed:
            combos = combos + [(j, i) for i, j in combos]
        combos = combos[:max_pairs]
        for p, (i, j) in enumerate(combos):
            pairs[b, p] = (i, j)
            mask[b, p] = True
    return pairs, mask


class DeepPairwiseImpact(DeepImpact):
    """Wrapper with the pairwise forward and composite-term impact API."""

    def __init__(
        self,
        config: EncoderConfig,
        tokenizer,
        params: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        mesh=None,
        max_pairs: int = 256,
    ):
        self.config = config
        self.tokenizer = tokenizer
        self.module = PairwiseImpactModel(config)
        self.max_pairs = max_pairs
        self.mesh = mesh
        self.max_length = getattr(tokenizer, "max_length", config.max_position_embeddings)
        if params is None:
            rng = jax.random.PRNGKey(seed)
            dummy = jnp.ones((1, 8), dtype=jnp.int32)
            pair_idx = jnp.zeros((1, 4, 2), dtype=jnp.int32)
            pair_mask = jnp.zeros((1, 4), dtype=bool)
            params = self.module.init(
                {"params": rng},
                dummy,
                jnp.ones_like(dummy),
                jnp.zeros_like(dummy),
                pair_idx,
                pair_mask,
            )["params"]
        self.params = params

        @jax.jit
        def _forward(params, input_ids, attention_mask, type_ids, pair_idx, pair_mask):
            return self.module.apply(
                {"params": params}, input_ids, attention_mask, type_ids, pair_idx, pair_mask
            )

        self._forward = _forward

    def __call__(self, input_ids, attention_mask, type_ids, pair_indices, pair_mask):
        return self._forward(
            self.params, input_ids, attention_mask, type_ids, pair_indices, pair_mask
        )

    def get_impact_scores_batch(
        self, documents: Sequence[str]
    ) -> List[List[Tuple[str, float]]]:
        """Single-term impacts plus ``term1|term2`` pair impacts, pairs in
        token order, zero (rounded to 3dp) pairs dropped, all sorted by score
        descending (reference pairwise_impact.py:97-129)."""
        encodings = [self.process_document(d) for d in documents]
        n = len(encodings)
        b = _bucket(n)
        arrays = batch_arrays(encodings)
        sorted_items = [
            sorted(e.term_to_token_index.items(), key=lambda x: x[1]) for e in encodings
        ]
        pair_idx, pair_mask = build_pair_slots(
            [[i for _, i in items] for items in sorted_items], self.max_pairs
        )
        if b != n:
            pad = b - n
            arrays = {k: np.concatenate([v, np.tile(v[-1:], (pad, 1))]) for k, v in arrays.items()}
            pair_idx = np.concatenate([pair_idx, np.tile(pair_idx[-1:], (pad, 1, 1))])
            pair_mask = np.concatenate([pair_mask, np.zeros((pad,) + pair_mask.shape[1:], bool)])
        single, pair_scores, _ = self._forward(
            self.params,
            arrays["input_ids"],
            arrays["attention_mask"],
            arrays["type_ids"],
            pair_idx,
            pair_mask,
        )
        single = np.asarray(single)[..., 0]
        pair_scores = np.asarray(pair_scores)

        out: List[List[Tuple[str, float]]] = []
        for d, items in enumerate(sorted_items):
            impacts = [(term, float(single[d, tok])) for term, tok in items]
            terms_in_order = [t for t, _ in items]
            for p, (t1, t2) in enumerate(combinations(terms_in_order, 2)):
                if p >= self.max_pairs:
                    break
                score = float(pair_scores[d, p])
                if round(score, 3):
                    impacts.append((f"{t1}|{t2}", score))
            impacts.sort(key=lambda x: x[1], reverse=True)
            out.append(impacts)
        return out
