"""Pallas blocked-TAAT scoring kernel (hybrid heavy/tail).

The query-time hot path reformulated for the MXU (see
/opt/skills/guides/pallas_guide.md; scatter-as-one-hot-matmul): XLA lowers
the [Q, num_docs] scatter-add of posting impacts to a serialized scatter —
measured 232ms per 64-query batch at 1M docs on v5e-1.

Design (driven by v5e constraints hit while bringing this up):

- postings are re-sorted by (term, doc) so a (term, doc-block) subrange is
  contiguous; chunk windows start 128-aligned (Mosaic HBM slicing) with
  head/tail row masks;
- **heavy** posting lists (>= HEAVY_MIN postings) go through the kernel:
  grid (query_group, doc_block), per-cell chunk ranges in scalar-prefetch
  SMEM (~1MB budget -> CH=1024 windows, (lo, hi) packed into one int32),
  each window processed as 4 sub-tiles of 256 rows whose one-hot against the
  block's columns feeds an MXU matmul accumulated in VMEM fp32;
- **tail** lists (a few postings spread across many blocks) would explode
  the chunk table one-chunk-per-block; they are scored by the XLA gather +
  scatter-add path instead and merged into the kernel's dense scores inside
  the same jit, before top-k.

Scores are exact (impacts <= 255 exact in bf16, fp32 accumulation).

Measured (v5e-1, 1M docs / 5.7M postings / 64 queries, k=1000): this kernel
203 q/s with approx top-k vs ~244 q/s for the XLA gather+scatter path — the
one-hot reformulation costs BLK VPU-ops per posting, and XLA's scatter on
v5e turns out to be strong at this postings density.  The kernel is kept as
a correct, tested alternative (DMA double-buffering, scalar-prefetch chunk
tables, MXU accumulation).  The production corpus-scale path is
search.hybrid_engine (dense heavy-term rows: the matmul formulation taken to
its limit — density 1.0 — where the MXU wins outright; 819 q/s exact at 1M
docs vs 203 q/s for this kernel).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 4096  # docs per block (multiple of 128)
CH = 1024  # postings per DMA window
SUB = 256  # rows per one-hot sub-tile
QG = 8  # queries per grid cell (output sublane tiling needs >= 8 rows)
HEAVY_MIN = 4096  # lists shorter than this go to the XLA tail path
TAIL_CHUNK = 1024


def _score_kernel(
    # scalar prefetch (SMEM budget ~1MB)
    cell_off_ref,  # [QGROUPS*NB + 1] int32: chunk range per (q-group, block)
    cstart_ref,  # [C] int32: 128-aligned window starts
    cmeta_ref,  # [C] int32: (qi << 28) | (lo << 14) | hi
    # inputs
    docs_hbm,  # [1, P_pad] int32 (HBM)
    vals_hbm,  # [1, P_pad] float32 (HBM)
    # output tile
    out_ref,  # (QG, BLK) fp32 at (qg, b)
    # scratch
    docs_v,  # (2, 1, CH) int32 VMEM (double buffered)
    vals_v,  # (2, 1, CH) float32 VMEM
    acc_ref,  # (QG, BLK) fp32 VMEM
    sem_d,  # DMA (2,)
    sem_v,  # DMA (2,)
):
    qg = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    block_base = b * BLK
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (SUB, BLK), 1)
    qrow_ids = jax.lax.broadcasted_iota(jnp.int32, (QG, SUB), 0)
    prow_ids = jax.lax.broadcasted_iota(jnp.int32, (QG, SUB), 1)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    cell = qg * nb + b
    lo_c = cell_off_ref[cell]
    hi_c = cell_off_ref[cell + 1]

    def dma_pair(slot, i):
        start = pl.multiple_of(cstart_ref[i], 128)
        return (
            pltpu.make_async_copy(
                docs_hbm.at[:, pl.ds(start, CH)], docs_v.at[slot], sem_d.at[slot]
            ),
            pltpu.make_async_copy(
                vals_hbm.at[:, pl.ds(start, CH)], vals_v.at[slot], sem_v.at[slot]
            ),
        )

    @pl.when(lo_c < hi_c)
    def _():
        d0, v0 = dma_pair(0, lo_c)
        d0.start()
        v0.start()

    def body(i, _):
        slot = jax.lax.rem(i - lo_c, 2)
        next_slot = jax.lax.rem(i + 1 - lo_c, 2)

        @pl.when(i + 1 < hi_c)
        def _():
            dn, vn = dma_pair(next_slot, i + 1)
            dn.start()
            vn.start()

        dc, vc = dma_pair(slot, i)
        dc.wait()
        vc.wait()

        meta = cmeta_ref[i]
        qi = meta >> 28
        lo_row = (meta >> 14) & 0x3FFF
        hi_row = meta & 0x3FFF
        for t in range(CH // SUB):  # unrolled sub-tiles
            base = t * SUB
            local = docs_v[slot, :, base : base + SUB].reshape(SUB, 1) - block_base
            # the [lo, hi) row mask (aligned-window head/tail reads
            # neighboring terms' postings) folds into the SMALL vals tensor
            # [QG, SUB] instead of the big one-hot [SUB, BLK]: a masked-out
            # posting contributes 0 regardless of its one-hot column.
            onehot = (local == col_ids).astype(jnp.bfloat16)  # [SUB, BLK]
            r = prow_ids + base
            keep = (qrow_ids == qi) & (r >= lo_row) & (r < hi_row)  # [QG, SUB]
            vals = jnp.where(keep, vals_v[slot, :, base : base + SUB], 0.0).astype(
                jnp.bfloat16
            )
            acc_ref[...] += jax.lax.dot_general(
                vals,
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    jax.lax.fori_loop(lo_c, hi_c, body, None)
    out_ref[...] = acc_ref[...]


@partial(
    jax.jit,
    static_argnums=(6, 7, 8, 9, 10, 11),
    static_argnames=("interpret",),
)
def _hybrid_scores_topk(
    cell_offsets,  # [Q*NB + 1] int32 (heavy chunks)
    chunk_starts,  # [C] int32 (128-aligned)
    chunk_lohi,  # [C] int32 packed
    tail_table,  # [3, CT] int32: (starts, lens, rows) for the XLA tail path
    docs,  # [1, P_pad] int32
    vals,  # [1, P_pad] float32
    num_queries: int,
    num_blocks: int,
    num_docs: int,
    top_k: int,
    approx: bool,
    use_kernel: bool,
    interpret: bool = False,
):
    if use_kernel:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_queries // QG, num_blocks),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # docs stay in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # vals stay in HBM
            ],
            out_specs=pl.BlockSpec((QG, BLK), lambda qg, b, *_: (qg, b)),
            scratch_shapes=[
                pltpu.VMEM((2, 1, CH), jnp.int32),
                pltpu.VMEM((2, 1, CH), jnp.float32),
                pltpu.VMEM((QG, BLK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        scores = pl.pallas_call(
            _score_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (num_queries, num_blocks * BLK), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(cell_offsets, chunk_starts, chunk_lohi, docs, vals)
    else:
        scores = jnp.zeros((num_queries, num_blocks * BLK), dtype=jnp.float32)

    # tail merge: standard gather + scatter-add over the same postings arrays
    t_starts, t_lens, t_rows = tail_table[0], tail_table[1], tail_table[2]
    offs = jnp.arange(TAIL_CHUNK, dtype=jnp.int32)[None, :]
    pos = t_starts[:, None] + offs
    t_valid = offs < t_lens[:, None]
    pos = jnp.where(t_valid, pos, 0)
    d = jnp.take(docs[0], pos, axis=0)
    v = jnp.take(vals[0], pos, axis=0)
    v = jnp.where(t_valid & (d >= 0), v, 0.0)
    d = jnp.where(d >= 0, d, 0)
    r = jnp.broadcast_to(t_rows[:, None], d.shape)
    scores = scores.at[r.reshape(-1), d.reshape(-1)].add(v.reshape(-1))

    scores = scores[:, :num_docs]
    k = min(top_k, num_docs)
    if approx and not interpret:
        return jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return jax.lax.top_k(scores, k)


class PallasBlockedEngine:
    """Query scoring over doc-sorted postings via the blocked Pallas kernel
    (heavy lists) + XLA scatter (tail lists)."""

    def __init__(self, index, approx_top_k: bool = True, interpret: bool = False):
        self.vocab = index.term_to_id
        self.num_docs = max(int(index.num_docs), 1)
        self.num_blocks = -(-self.num_docs // BLK)
        self.approx_top_k = approx_top_k
        self.interpret = interpret

        offsets = np.asarray(index.offsets, dtype=np.int64)
        term_of = np.repeat(np.arange(len(index.vocab)), np.diff(offsets))
        order = np.lexsort((np.asarray(index.doc_ids, np.int64), term_of))
        docs_sorted = np.asarray(index.doc_ids, np.int64)[order]
        vals_sorted = np.asarray(index.impacts, np.float32)[order]
        self.offsets = offsets
        self.docs_host = docs_sorted
        # aligned windows never run off the end; pad to 128 multiple + CH
        p_pad = ((len(docs_sorted) + 127) // 128) * 128 + CH
        docs_dev = np.full((1, p_pad), -1, dtype=np.int32)
        vals_dev = np.zeros((1, p_pad), dtype=np.float32)
        docs_dev[0, : len(docs_sorted)] = docs_sorted
        vals_dev[0, : len(vals_sorted)] = vals_sorted
        self.docs = jax.device_put(docs_dev)
        self.vals = jax.device_put(vals_dev)

    def _tables(self, query_term_sets):
        nq = len(query_term_sets)
        nb = self.num_blocks
        n_groups = nq // QG
        block_edges = np.arange(nb + 1, dtype=np.int64) * BLK
        per_cell: List[List[Tuple[int, int]]] = [[] for _ in range(n_groups * nb)]
        t_starts: List[int] = []
        t_lens: List[int] = []
        t_rows: List[int] = []
        for q, terms in enumerate(query_term_sets):
            for term in terms:
                tid = self.vocab.get(term)
                if tid is None:
                    continue
                s, e = int(self.offsets[tid]), int(self.offsets[tid + 1])
                if s == e:
                    continue
                if e - s < HEAVY_MIN:
                    # tail: XLA scatter path, posting order irrelevant
                    cs = s
                    while cs < e:
                        t_starts.append(cs)
                        t_lens.append(min(TAIL_CHUNK, e - cs))
                        t_rows.append(q)
                        cs += TAIL_CHUNK
                    continue
                seg = self.docs_host[s:e]
                bounds = s + np.searchsorted(seg, block_edges)
                qg, qi = divmod(q, QG)
                for b in range(nb):
                    cs, ce = int(bounds[b]), int(bounds[b + 1])
                    astart = (cs // 128) * 128
                    while astart < ce:
                        lo = max(cs, astart) - astart
                        hi = min(ce, astart + CH) - astart
                        per_cell[qg * nb + b].append(
                            (astart, (qi << 28) | (lo << 14) | hi)
                        )
                        astart += CH

        cell_offsets = np.zeros(n_groups * nb + 1, dtype=np.int32)
        starts: List[int] = []
        lohi: List[int] = []
        for cell, chunks in enumerate(per_cell):
            for astart, packed in chunks:
                starts.append(astart)
                lohi.append(packed)
            cell_offsets[cell + 1] = len(starts)
        if not starts:
            starts, lohi = [0], [0]
        if not t_starts:
            t_starts, t_lens, t_rows = [0], [0], [0]
        tail = np.stack(
            [
                np.asarray(t_starts, dtype=np.int32),
                np.asarray(t_lens, dtype=np.int32),
                np.asarray(t_rows, dtype=np.int32),
            ]
        )
        return (
            cell_offsets,
            np.asarray(starts, dtype=np.int32),
            np.asarray(lohi, dtype=np.int32),
            tail,
        )

    def score_batch(
        self, query_term_sets: Sequence[Set[str]], top_k: int = 1000
    ) -> List[List[Tuple[int, float]]]:
        nq = len(query_term_sets)
        if nq == 0:
            return []
        padded = list(query_term_sets)
        while len(padded) % QG:
            padded.append(set())
        cell_offsets, chunk_starts, chunk_lohi, tail = self._tables(padded)
        use_kernel = bool(cell_offsets[-1] > 0)
        ts, td = _hybrid_scores_topk(
            jnp.asarray(cell_offsets),
            jnp.asarray(chunk_starts),
            jnp.asarray(chunk_lohi),
            jnp.asarray(tail),
            self.docs,
            self.vals,
            len(padded),
            self.num_blocks,
            self.num_docs,
            min(top_k, self.num_docs),
            self.approx_top_k,
            use_kernel,
            interpret=self.interpret,
        )
        ts, td = np.asarray(ts)[:nq], np.asarray(td)[:nq]
        return [
            [(int(d), float(s)) for d, s in zip(td[i], ts[i]) if s > 0]
            for i in range(nq)
        ]
