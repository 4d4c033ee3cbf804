"""Pallas tail-scatter: apply sparse (query, doc, impact) updates to a
dense score matrix at HBM streaming rate.

Replaces XLA's scatter-add for the hybrid engine's tail postings
(reference semantics: the per-posting ``scores[doc] += impact`` loop in
src/deep_impact/inverted_index/inverted_index.py:55-62).  XLA lowers a
scatter-add into a [Q, num_docs] operand to a serialized per-update RMW
(~22M updates/s measured on v5e-1 at 400k updates x 1M docs — latency,
not bandwidth, bound).  This kernel instead:

1. sorts updates by doc id on-device (one ``lax.sort`` — MXU-adjacent
   sort networks beat scalar RMW by orders of magnitude),
2. packs them into [8, 128]-shaped int32 *pages* (the DMA-legal unit:
   Mosaic requires copies to cover whole (8, 128) tiles, so a page of
   1024 updates is the smallest slice of the sorted stream a kernel can
   fetch at a dynamic index),
3. walks 65536-doc tiles of the score matrix with the updates for each
   tile VMEM-resident, and applies every page as a one-hot matmul:
   ``contrib[q, c] = sum_w v_w * [r_w == q] * [d_w == base + c]`` —
   two broadcast-compare builds and one [Q, PAGE] x [SEG, PAGE]^T MXU
   dot per 2048-column segment.  Integer impacts <= 255 are exact in
   the bf16 one-hot operands; accumulation is fp32.

Measured on v5e-1 (amortized, 400k updates, [64, 1M] fp32 scores):
7.9 ms vs 18 ms for the XLA flat scatter and 79 ms for a dispatch-bound
single-shot call.  Cost scales with update pages + one read+write sweep
of the score matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1 << 16  # docs per score tile; [nq, TILE] fp32 stays VMEM-resident
SEG = 2048      # columns per one-hot matmul segment
PAGE = 1024     # updates per DMA page = 8 sublanes x 128 lanes
_SENTINEL = jnp.int32(1 << 30)  # padding doc id: sorts past every tile


def _tail_kernel(lo_ref, hi_ref, in_ref, pages_ref, out_ref, pagebuf, sems):
    t = pl.program_id(0)
    out_ref[...] = in_ref[...]
    lo = lo_ref[t]
    hi = hi_ref[t]
    nq = out_ref.shape[0]

    def dma(p, slot):
        return pltpu.make_async_copy(pages_ref.at[p], pagebuf.at[slot], sems.at[slot])

    @pl.when(lo < hi)
    def _():
        dma(lo, 0).start()

    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, PAGE), 0)
    iseg = jax.lax.broadcasted_iota(jnp.int32, (SEG, PAGE), 0)

    def page_body(p, _):
        slot = jax.lax.rem(p - lo, 2)
        dma(p, slot).wait()

        @pl.when(p + 1 < hi)
        def _():
            dma(p + 1, 1 - slot).start()

        # page rows -> one [1, PAGE] lane vector per field (1D reshapes of
        # vectors are not legal on TPU; lane-concat of [1, 128] rows is)
        d = jnp.concatenate([pagebuf[slot, 0, pl.ds(j, 1), :] for j in range(8)], axis=1)
        v = jnp.concatenate([pagebuf[slot, 1, pl.ds(j, 1), :] for j in range(8)], axis=1)
        r = jnp.concatenate([pagebuf[slot, 2, pl.ds(j, 1), :] for j in range(8)], axis=1)
        local = d - t * TILE
        # v > 0 drops sort padding; doc-range mask handles pages straddling
        # a tile boundary (processed by both neighbouring tiles)
        valid = ((local >= 0) & (local < TILE) & (v > 0)).astype(jnp.int32)

        def seg_cond(rem):
            return jnp.any(rem > 0)

        def seg_body(rem):
            remaining = rem > 0
            base = jnp.min(jnp.where(remaining, local, TILE))
            base = jnp.minimum(base & ~127, TILE - SEG)
            inseg = remaining & (local >= base) & (local < base + SEG)
            a = jnp.where((r == iq) & inseg, v.astype(jnp.float32), 0.0).astype(
                jnp.bfloat16
            )
            bt = jnp.where((local - base == iseg) & inseg, 1.0, 0.0).astype(
                jnp.bfloat16
            )
            contrib = jax.lax.dot_general(
                a, bt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            out_ref[:, pl.ds(pl.multiple_of(base, 128), SEG)] += contrib
            return jnp.where(inseg, 0, rem)

        # sorted pages span few columns, so this usually runs 1-3 segments
        jax.lax.while_loop(seg_cond, seg_body, valid)
        return 0

    jax.lax.fori_loop(lo, hi, page_body, 0)


def can_use_pallas_tail(n_pad: int, nq: int) -> bool:
    """Shape gate: score tiles must align and the [nq, TILE] fp32 block must
    fit VMEM alongside the page buffers (nq <= 64 keeps it at 16MB)."""
    return n_pad % TILE == 0 and nq <= 64


def apply_tail_updates(scores, d, v, r, *, interpret: bool = False):
    """scores[r[i], d[i]] += v[i] for every i, exactly.

    ``scores``: [nq, n_pad] fp32 with n_pad % 65536 == 0; ``d``/``r``
    int32 and ``v`` fp32 flat update arrays whose length is a multiple of
    1024 (the engine's bucketed chunk tables guarantee this).  Updates
    with v == 0 are padding and ignored.  Impacts must be positive
    integers <= 255 (quantized-impact lattice) for bf16 one-hot
    exactness.
    """
    nq, n_pad = scores.shape
    e_pad = d.shape[0]
    assert n_pad % TILE == 0 and e_pad % PAGE == 0
    sd, sv, sr = jax.lax.sort(
        (jnp.where(v > 0, d, _SENTINEL), v, r), num_keys=1
    )
    n_pages = e_pad // PAGE
    pages = jnp.stack(
        [
            sd.reshape(n_pages, 8, 128),
            sv.astype(jnp.int32).reshape(n_pages, 8, 128),
            sr.reshape(n_pages, 8, 128),
        ],
        axis=1,
    )
    first = sd[::PAGE]
    n_tiles = n_pad // TILE
    edges = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE
    lo = jnp.maximum(
        jnp.searchsorted(first, edges[:-1], side="right").astype(jnp.int32) - 1, 0
    )
    hi = jnp.searchsorted(first, edges[1:], side="left").astype(jnp.int32)
    hi = jnp.maximum(hi, lo)

    return pl.pallas_call(
        _tail_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((nq, TILE), lambda t, *_: (0, t)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((nq, TILE), lambda t, *_: (0, t)),
            scratch_shapes=[
                pltpu.VMEM((2, 3, 8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nq, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lo, hi, scores, pages)
