"""Pluggable external word segmenters.

The reference's PhoBERT path segments Vietnamese text with VnCoreNLP (a JVM
process; reference src/deep_impact/models/original.py:29-39,129-145) and
normalizes with ``underthesea.text_normalize``.  Here any segmenter is just a
``Callable[[str], List[str]]`` plugged into the tokenizer stack; the JVM
bridge stays optional and is constructed lazily.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from .normalize import normalize, pretokenize


def whitespace_segmenter(text: str) -> List[str]:
    """Default: normalize + whitespace/punctuation split."""
    return pretokenize(normalize(text))


class VnCoreNLPSegmenter:
    """Lazy adapter over py_vncorenlp word segmentation (wseg annotator).

    Mirrors reference semantics: lowercase + text_normalize, then word
    segmentation producing underscore-joined compound words; errors fall back
    to an empty segmentation (reference original.py:135-145).
    """

    def __init__(self, save_dir: Optional[str] = None):
        self.save_dir = save_dir
        self._impl = None

    def _get(self):
        if self._impl is None:
            import py_vncorenlp  # gated: requires JVM + model download

            self._impl = py_vncorenlp.VnCoreNLP(
                save_dir=self.save_dir, annotators=["wseg"]
            )
        return self._impl

    def __call__(self, text: str) -> List[str]:
        try:
            from underthesea import text_normalize  # gated
            text = text_normalize(text.lower())
        except ImportError:
            text = text.lower()
        try:
            sents = self._get().word_segment(text)
        except Exception:
            sents = []
        return [term for sent in sents for term in sent.split(" ")]


def make_segmenter(kind: str = "whitespace", **kwargs) -> Callable[[str], List[str]]:
    if kind == "whitespace":
        return whitespace_segmenter
    if kind == "vncorenlp":
        return VnCoreNLPSegmenter(**kwargs)
    raise ValueError(f"unknown segmenter kind: {kind}")
