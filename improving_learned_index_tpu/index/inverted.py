"""Inverted index: CSR postings + reference-compatible binary serialization.

In memory the index is three flat numpy arrays (CSR layout) — exactly what
the device scoring kernels consume after a single host->HBM transfer:

    offsets : int64[V+1]   postings range per term id
    doc_ids : uint32[P]
    impacts : uint8[P]     8-bit quantized, sorted descending within a term

On disk the layout is bit-for-bit the reference format
(src/deep_impact/inverted_index/create.py:19-51, utils/defaults.py:22-37):
``vocab.txt`` (sorted terms, one per line), ``inverted_index.dat`` (packed
little-endian uint32 doc_id + uint8 impact records), ``inverted_index.idx``
(two uint64 byte offsets [start, end) per term, vocab order).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterable, Iterator, List, Sequence, Tuple, Union

import numpy as np

from ..core.config import (
    DOC_SCORE_BLOCK_BYTES,
    INVERTED_INDEX_DATA,
    INVERTED_INDEX_INDEX,
    INVERTED_INDEX_VOCAB,
)

PathLike = Union[str, Path]

_RECORD_DTYPE = np.dtype([("doc_id", "<u4"), ("impact", "u1")])
_LOC_DTYPE = np.dtype("<u8")


class InvertedIndexData:
    """CSR postings over a term vocabulary."""

    def __init__(
        self,
        vocab: List[str],
        offsets: np.ndarray,
        doc_ids: np.ndarray,
        impacts: np.ndarray,
        num_docs: int = 0,
        zero_offsets: np.ndarray = None,
        zero_doc_ids: np.ndarray = None,
    ):
        assert offsets.shape == (len(vocab) + 1,)
        assert doc_ids.shape == impacts.shape
        self.vocab = vocab
        self.term_to_id: Dict[str, int] = {t: i for i, t in enumerate(vocab)}
        self.offsets = offsets.astype(np.int64)
        self.doc_ids = doc_ids.astype(np.uint32)
        self.impacts = impacts.astype(np.uint8)
        # Zero-quantized postings: never scored (the reference reader stops at
        # the first zero impact, inverted_index.py:49-51) but written to .dat
        # by the reference creator (create.py:41-46 writes every int(val),
        # including 0) — kept in a side CSR purely for byte-parity save().
        if zero_offsets is None:
            zero_offsets = np.zeros(len(vocab) + 1, dtype=np.int64)
            zero_doc_ids = np.empty(0, dtype=np.uint32)
        self.zero_offsets = zero_offsets.astype(np.int64)
        self.zero_doc_ids = zero_doc_ids.astype(np.uint32)
        self.num_docs = num_docs or (int(doc_ids.max()) + 1 if len(doc_ids) else 0)

    def __len__(self) -> int:
        return len(self.vocab)

    @property
    def num_postings(self) -> int:
        return int(self.offsets[-1])

    def term_postings(self, term: str) -> Tuple[np.ndarray, np.ndarray]:
        tid = self.term_to_id.get(term)
        if tid is None:
            return np.empty(0, np.uint32), np.empty(0, np.uint8)
        s, e = self.offsets[tid], self.offsets[tid + 1]
        return self.doc_ids[s:e], self.impacts[s:e]

    # -- construction ---------------------------------------------------------
    @classmethod
    def build(
        cls,
        doc_term_impacts: Iterable[Tuple[int, Dict[str, float]]],
        num_docs: int = 0,
    ) -> "InvertedIndexData":
        """Build from (doc_id, {term: quantized_impact}) pairs.

        Postings within a term sort by impact descending with stable doc
        order for ties (reference create.py:41 sorted(..., reverse=True)).
        Zero impacts never enter the scored CSR (they terminate reads in the
        reference's term_docs loop, inverted_index.py:49-51) but are retained
        in the zero side-CSR because the reference creator writes them to
        .dat (create.py:44-46) — byte parity requires them on save().
        """
        terms: List[str] = []
        term_ids: List[int] = []
        docs: List[int] = []
        vals: List[int] = []
        vocab_map: Dict[str, int] = {}
        max_doc = -1
        for doc_id, impacts in doc_term_impacts:
            max_doc = max(max_doc, doc_id)
            for term, val in impacts.items():
                v = max(0, int(val))
                tid = vocab_map.get(term)
                if tid is None:
                    tid = len(vocab_map)
                    vocab_map[term] = tid
                    terms.append(term)
                term_ids.append(tid)
                docs.append(doc_id)
                vals.append(v)

        # Re-map term ids to sorted-vocab order (reference vocab.txt is sorted).
        order = np.argsort(terms, kind="stable")
        sorted_vocab = [terms[i] for i in order]
        remap = np.empty(len(terms), dtype=np.int64)
        remap[order] = np.arange(len(terms))

        tid_arr = remap[np.asarray(term_ids, dtype=np.int64)] if term_ids else np.empty(0, np.int64)
        doc_arr = np.asarray(docs, dtype=np.int64)
        val_arr = np.asarray(vals, dtype=np.int64)

        # Sort by (term_id asc, impact desc) with stable doc order:
        # lexsort on (doc-order implicit via stability, -impact, term).
        if len(tid_arr):
            sort_idx = np.lexsort((-val_arr, tid_arr))
            tid_arr, doc_arr, val_arr = tid_arr[sort_idx], doc_arr[sort_idx], val_arr[sort_idx]

        nvocab = len(sorted_vocab)
        nonzero = val_arr > 0
        main_tid, main_doc, main_val = tid_arr[nonzero], doc_arr[nonzero], val_arr[nonzero]
        zero_tid, zero_doc = tid_arr[~nonzero], doc_arr[~nonzero]

        def _offsets(tids):
            counts = (
                np.bincount(tids, minlength=nvocab) if len(tids) else np.zeros(nvocab, np.int64)
            )
            out = np.zeros(nvocab + 1, dtype=np.int64)
            np.cumsum(counts, out=out[1:])
            return out

        return cls(
            sorted_vocab,
            _offsets(main_tid),
            main_doc.astype(np.uint32),
            main_val.astype(np.uint8),
            num_docs=max(num_docs, max_doc + 1),
            zero_offsets=_offsets(zero_tid),
            zero_doc_ids=zero_doc.astype(np.uint32),
        )

    @classmethod
    def from_forward_index(cls, index_path: PathLike, num_docs: int = 0) -> "InvertedIndexData":
        from .forward_index import iter_forward_index

        return cls.build(iter_forward_index(index_path), num_docs=num_docs)

    # -- serialization (reference binary layout) -------------------------------
    def save(self, output_path: PathLike) -> None:
        out = Path(output_path)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / INVERTED_INDEX_VOCAB, "w", encoding="utf-8") as f:
            for term in self.vocab:
                f.write(term + "\n")

        # Per term: scored (nonzero) records first — already impact-sorted —
        # then the zero-impact records, matching the reference's descending
        # sort where zeros land last (create.py:41-46).
        n_main = np.diff(self.offsets)
        n_zero = np.diff(self.zero_offsets)
        full_offsets = np.zeros(len(self.vocab) + 1, dtype=np.int64)
        np.cumsum(n_main + n_zero, out=full_offsets[1:])

        total = int(full_offsets[-1])
        records = np.empty(total, dtype=_RECORD_DTYPE)
        if len(self.doc_ids):
            term_of = np.repeat(np.arange(len(self.vocab)), n_main)
            within = np.arange(len(self.doc_ids)) - self.offsets[term_of]
            pos = full_offsets[term_of] + within
            records["doc_id"][pos] = self.doc_ids
            records["impact"][pos] = self.impacts
        if len(self.zero_doc_ids):
            term_of = np.repeat(np.arange(len(self.vocab)), n_zero)
            within = np.arange(len(self.zero_doc_ids)) - self.zero_offsets[term_of]
            pos = full_offsets[term_of] + n_main[term_of] + within
            records["doc_id"][pos] = self.zero_doc_ids
            records["impact"][pos] = 0
        records.tofile(out / INVERTED_INDEX_DATA)

        locs = np.empty(2 * len(self.vocab), dtype=_LOC_DTYPE)
        byte_offsets = full_offsets * DOC_SCORE_BLOCK_BYTES
        locs[0::2] = byte_offsets[:-1].astype(np.uint64)
        locs[1::2] = byte_offsets[1:].astype(np.uint64)
        locs.tofile(out / INVERTED_INDEX_INDEX)

    @classmethod
    def load(cls, index_path: PathLike, num_docs: int = 0) -> "InvertedIndexData":
        path = Path(index_path)
        with open(path / INVERTED_INDEX_VOCAB, encoding="utf-8") as f:
            vocab = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        records = np.fromfile(path / INVERTED_INDEX_DATA, dtype=_RECORD_DTYPE)
        locs = np.fromfile(path / INVERTED_INDEX_INDEX, dtype=_LOC_DTYPE).reshape(-1, 2)
        assert locs.shape[0] == len(vocab), "idx/vocab size mismatch"
        full_offsets = np.zeros(len(vocab) + 1, dtype=np.int64)
        if len(vocab):
            full_offsets[:-1] = locs[:, 0] // DOC_SCORE_BLOCK_BYTES
            full_offsets[-1] = locs[-1, 1] // DOC_SCORE_BLOCK_BYTES
            # Reference .idx ranges are contiguous; trust ends for safety.
            assert np.all(
                locs[:, 1] // DOC_SCORE_BLOCK_BYTES == full_offsets[1:]
            ), "non-contiguous postings"

        # Split zero-impact records (a per-term suffix under the descending
        # sort; the reference reader never scores them) into the side CSR so
        # a save() round-trips byte-for-bit.
        impacts = records["impact"]
        nonzero = impacts != 0
        nz_pref = np.zeros(len(records) + 1, dtype=np.int64)
        np.cumsum(nonzero, out=nz_pref[1:])
        offsets = nz_pref[full_offsets]
        z_pref = np.zeros(len(records) + 1, dtype=np.int64)
        np.cumsum(~nonzero, out=z_pref[1:])
        zero_offsets = z_pref[full_offsets]
        return cls(
            vocab,
            offsets,
            records["doc_id"][nonzero].copy(),
            impacts[nonzero].copy(),
            num_docs=num_docs,
            zero_offsets=zero_offsets,
            zero_doc_ids=records["doc_id"][~nonzero].copy(),
        )
