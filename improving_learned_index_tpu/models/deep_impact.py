"""DeepImpact model wrapper: tokenizer + flax encoder + jitted term scoring.

Provides the reference's model API surface
(src/deep_impact/models/original.py:96-333, xlmr_original.py:87-267):
``process_query`` / ``process_document`` / ``process_query_and_document`` /
``compute_term_impacts`` / ``get_impact_scores`` / ``get_impact_scores_batch``
— but TPU-first:

- the forward is a jitted pure function; batches are padded to fixed bucket
  sizes so XLA compiles a handful of shapes, then every call reuses them;
- the term-score gather happens **on device**: the [B, L] token scores are
  indexed at the term slots and only [B, max_terms] values cross back to the
  host (the reference pulls the full output to CPU first, original.py:282);
- multi-device encode shards the batch over the mesh's ``data`` axis
  (replacing torch DataParallel, reference indexing/indexer.py:25-26).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderConfig
from ..text.processor import (
    DocumentEncoding,
    ImpactTokenizer,
    batch_arrays,
    batch_term_slots,
)
from .encoder import CrossEncoderModel, DeepImpactModel, init_params

_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


class DeepImpact:
    """Term-impact encoder with pluggable tokenizer (RoBERTa/BERT/XLM-R trunk)."""

    def __init__(
        self,
        config: EncoderConfig,
        tokenizer,
        params: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        mesh=None,
    ):
        self.config = config
        self.tokenizer = tokenizer
        self.module = DeepImpactModel(config)
        if params is None:
            params = init_params(self.module, config, jax.random.PRNGKey(seed))
        self.params = params
        self.mesh = mesh
        self.max_length = getattr(tokenizer, "max_length", config.max_position_embeddings)

        @jax.jit
        def _forward(params, input_ids, attention_mask, type_ids):
            return self.module.apply(
                {"params": params}, input_ids, attention_mask, type_ids
            )

        @jax.jit
        def _term_scores(params, input_ids, attention_mask, type_ids, slots):
            out = self.module.apply(
                {"params": params}, input_ids, attention_mask, type_ids
            )  # [B, L, 1]
            tok_scores = out[..., 0]
            return jnp.take_along_axis(tok_scores, slots, axis=1)  # [B, T]

        @jax.jit
        def _packed_term_scores(params, input_ids, segment_ids, type_ids, flat_slots):
            # sequence-packed encode (text/packing.py): block-diagonal
            # attention via segment ids, then ONE flat gather of every
            # document's term slots — [P] values cross back to the host,
            # no per-doc padding in the transfer at all.
            out = self.module.apply(
                {"params": params},
                input_ids,
                (segment_ids > 0).astype(jnp.int32),
                type_ids,
                segment_ids=segment_ids,
            )  # [R, S, 1]
            return jnp.take(out[..., 0].reshape(-1), flat_slots)  # [P]

        self._forward = _forward
        self._term_scores = _term_scores
        self._packed_term_scores = _packed_term_scores

    # -- text API (delegates to the pluggable tokenizer) ---------------------
    def process_query(self, query: str) -> Set[str]:
        return self.tokenizer.process_query(query)

    def process_document(
        self, document: str, max_length: Optional[int] = None
    ) -> DocumentEncoding:
        return self.tokenizer.process_document(document, max_length=max_length)

    def process_query_and_document(
        self, query: str, document: str, max_length: Optional[int] = None
    ):
        return self.tokenizer.process_query_and_document(
            query, document, max_length=max_length
        )

    # -- forward --------------------------------------------------------------
    def __call__(self, input_ids, attention_mask, type_ids=None):
        if type_ids is None:
            type_ids = jnp.zeros_like(input_ids)
        return self._forward(self.params, input_ids, attention_mask, type_ids)

    def encode_term_scores(
        self,
        encodings: Sequence[DocumentEncoding],
        max_terms: Optional[int] = None,
        materialize: bool = True,
        pad_to: Optional[int] = None,
    ) -> Tuple[np.ndarray, List[List[str]]]:
        """Encode documents, returning ([B, T] term scores, per-doc term lists).

        Pads the batch to a bucket size to bound the number of compiled
        shapes.  ``materialize=False`` returns the scores as a device array
        (dispatch only, no host sync) so callers can pipeline batches.
        ``pad_to`` pins the padded batch dimension outright — a streaming
        caller that already runs at a fixed batch size passes it so the
        trailing partial batch reuses the steady-state compiled shape
        instead of compiling a fresh bucket (~30s through the axon relay).
        """
        if not encodings:
            return np.zeros((0, 0), dtype=np.float32), []
        if max_terms is None:
            max_terms = self.max_length
        n = len(encodings)
        b = pad_to if pad_to is not None and pad_to >= n else _bucket(n)
        n_data = 1
        if self.mesh is not None:
            n_data = int(self.mesh.shape.get("data", self.mesh.devices.size))
            b = max(b, n_data)  # batch must divide over the data axis
        arrays = batch_arrays(encodings)
        slots, _, terms = batch_term_slots(encodings, max_terms)
        if b != n:
            pad = b - n
            arrays = {
                k: np.concatenate([v, np.tile(v[-1:], (pad, 1))]) for k, v in arrays.items()
            }
            slots = np.concatenate([slots, np.tile(slots[-1:], (pad, 1))])
        if n_data > 1:
            # data-parallel encode: batch sharded over the mesh's data axis,
            # params replicated (replaces torch DataParallel scatter,
            # reference indexing/indexer.py:25-26)
            from ..parallel.mesh import data_sharding, replicated

            if not getattr(self, "_params_placed", False):
                self.params = jax.device_put(self.params, replicated(self.mesh))
                self._params_placed = True
            sh = data_sharding(self.mesh, 2)
            arrays = {k: jax.device_put(v, sh) for k, v in arrays.items()}
            slots = jax.device_put(slots, sh)
        scores = self._term_scores(
            self.params,
            arrays["input_ids"],
            arrays["attention_mask"],
            arrays["type_ids"],
            slots,
        )[:n]
        return (np.asarray(scores) if materialize else scores), terms

    def encode_packed(self, batch, materialize: bool = True):
        """Encode one ``text.packing.PackedBatch``; returns the flat [P]
        term-score array (device array when ``materialize=False`` so callers
        can pipeline).  Split per document with ``batch.term_offsets``."""
        ids, seg, typ, slots = (
            batch.input_ids,
            batch.segment_ids,
            batch.type_ids,
            batch.flat_slots,
        )
        if self.mesh is not None:
            n_data = int(self.mesh.shape.get("data", self.mesh.devices.size))
            if n_data > 1:
                from ..parallel.mesh import data_sharding, replicated

                if not getattr(self, "_params_placed", False):
                    self.params = jax.device_put(self.params, replicated(self.mesh))
                    self._params_placed = True
                sh = data_sharding(self.mesh, 2)
                ids = jax.device_put(ids, sh)
                seg = jax.device_put(seg, sh)
                typ = jax.device_put(typ, sh)
                slots = jax.device_put(slots, data_sharding(self.mesh, 1))
        scores = self._packed_term_scores(self.params, ids, seg, typ, slots)
        return np.asarray(scores) if materialize else scores

    def get_impact_scores_batch_packed(
        self, documents: Sequence[str], rows: Optional[int] = None
    ) -> List[List[Tuple[str, float]]]:
        """``get_impact_scores_batch`` through the sequence-packed encode
        path — same output, ~(max_length / mean_doc_tokens)x fewer FLOPs on
        short-document corpora."""
        from ..text.packing import pack_documents

        if not documents:
            return []
        encodings = [self.process_document(d) for d in documents]
        if rows is None:
            # enough rows for the whole batch at ~85% fill, bucketed so the
            # compiled [rows, S] shapes stay bounded across calls
            total = sum(sum(e.attention_mask) for e in encodings)
            need = -(-int(total * 1.18) // self.max_length) or 1
            rows = _bucket(min(need, len(encodings)))
        out: List[List[Tuple[str, float]]] = []
        for batch in pack_documents(encodings, self.max_length, rows):
            scores = self.encode_packed(batch)
            offs = batch.term_offsets
            for i, terms in enumerate(batch.terms):
                row = scores[offs[i] : offs[i + 1]]
                out.append([(t, float(row[j])) for j, t in enumerate(terms)])
        return out

    # -- reference-parity impact API -------------------------------------------
    @staticmethod
    def compute_term_impacts(
        documents_term_to_token_index_map: Sequence[Dict[str, int]],
        outputs,
    ) -> List[List[Tuple[str, float]]]:
        """Gather per-term impacts from raw [B, L, 1] outputs
        (reference original.py:271-291)."""
        impact_scores = np.asarray(outputs)[..., 0]
        term_impacts = []
        for i, term_map in enumerate(documents_term_to_token_index_map):
            term_impacts.append(
                [(term, float(impact_scores[i][idx])) for term, idx in term_map.items()]
            )
        return term_impacts

    def get_impact_scores(self, document: str) -> List[Tuple[str, float]]:
        return self.get_impact_scores_batch([document])[0]

    def get_impact_scores_batch(
        self, documents: Sequence[str]
    ) -> List[List[Tuple[str, float]]]:
        encodings = [self.process_document(d) for d in documents]
        scores, terms = self.encode_term_scores(encodings)
        out: List[List[Tuple[str, float]]] = []
        for i, doc_terms in enumerate(terms):
            out.append([(t, float(scores[i, j])) for j, t in enumerate(doc_terms)])
        return out

    # -- persistence ------------------------------------------------------------
    def save(self, path) -> None:
        from ..core.checkpoint import save_params

        save_params(path, self.params)

    @classmethod
    def load(
        cls,
        config: EncoderConfig,
        tokenizer,
        checkpoint_path=None,
        **kwargs,
    ) -> "DeepImpact":
        model = cls(config, tokenizer, **kwargs)
        if checkpoint_path is not None:
            from ..core.checkpoint import load_params

            model.params = load_params(checkpoint_path, like=model.params)
        return model


class DeepImpactCrossEncoder(DeepImpact):
    """Relevance scoring from the [CLS] state of "{doc} [SEP] {query}"
    (reference models/cross_encoder.py)."""

    def __init__(self, config, tokenizer, params=None, seed=0, mesh=None):
        self.config = config
        self.tokenizer = tokenizer
        self.module = CrossEncoderModel(config)
        if params is None:
            params = init_params(self.module, config, jax.random.PRNGKey(seed))
        self.params = params
        self.mesh = mesh
        self.max_length = getattr(tokenizer, "max_length", config.max_position_embeddings)

        @jax.jit
        def _forward(params, input_ids, attention_mask, type_ids):
            return self.module.apply(
                {"params": params}, input_ids, attention_mask, type_ids
            )

        self._forward = _forward

    def process_cross_encoder_document_and_query(
        self, document: str, query: str
    ) -> DocumentEncoding:
        return self.tokenizer.process_document(f"{document} [SEP] {query}")

    def process_cross_encoder_documents_and_query(
        self, documents: Sequence[str], query: str
    ) -> List[DocumentEncoding]:
        return [
            self.process_cross_encoder_document_and_query(d, query) for d in documents
        ]

    def score_batch(self, encodings: Sequence[DocumentEncoding]) -> np.ndarray:
        if not encodings:
            return np.zeros((0,), dtype=np.float32)
        n = len(encodings)
        b = _bucket(n)
        arrays = batch_arrays(encodings)
        if b != n:
            pad = b - n
            arrays = {
                k: np.concatenate([v, np.tile(v[-1:], (pad, 1))]) for k, v in arrays.items()
            }
        out = self._forward(
            self.params, arrays["input_ids"], arrays["attention_mask"], arrays["type_ids"]
        )
        return np.asarray(out)[:n, 0]
