"""Impact quantization: global-max linear scale to b-bit integers.

Exact semantic parity with the reference 2-pass scheme
(src/deep_impact/indexing/quantize.py:13-47): ``scale = (2^b - 1) / max``,
``q = int(score * scale)`` (truncation toward zero), terms quantizing to 0
are dropped.  Host path uses float64 like CPython; the device path provides
the same formula as a jittable op for the on-device index build.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import IMPACT_SCORE_QUANTIZATION_BITS


def quantize_scale(max_val: float, bits: int = IMPACT_SCORE_QUANTIZATION_BITS) -> float:
    return ((1 << bits) - 1) / max_val


def quantize_value(value: float, scale: float) -> int:
    return int(value * scale)


def quantize_array(
    values: np.ndarray, scale: float
) -> np.ndarray:
    """Vectorized host quantization (float64, truncation)."""
    return np.trunc(np.asarray(values, dtype=np.float64) * scale).astype(np.int64)


@jax.jit
def quantize_device(values: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Device quantization: trunc(score * scale) as int32.  Scores are
    non-negative (ReLU/Softplus heads) so trunc == floor."""
    return jnp.floor(values.astype(jnp.float32) * scale).astype(jnp.int32)


def global_max(chunks: Iterable[np.ndarray]) -> float:
    """Pass 1: global max over impact score chunks."""
    m = 0.0
    for c in chunks:
        if c.size:
            m = max(m, float(np.max(c)))
    return m
