"""Multi-chip sharded query scoring: docs partitioned over the mesh.

Scales search.hybrid_engine beyond one chip's HBM the TPU-native way
(SURVEY §2.7): the dense heavy-term matrix and tail postings shard by
**document range** over the mesh's ``data`` axis.  Each device scores its
doc shard locally (same dense matmul + tail scatter + exact integer top-k
as the single-chip engine), then the per-shard [Q, k] candidates — provably
a superset of every global top-k member in that shard — ``all_gather`` over
ICI (k * n_shards entries per query, NOT the [Q, num_docs] score matrix)
and a final tiny top-k merges them.  Communication per batch is
O(Q * k * n_shards * 8 bytes): ~4MB for 64 queries x k=1000 on 8 chips.

Built on ``shard_map`` so the collective is explicit; the index arrays are
placed per-device (doc ranges differ per shard, so this is MPMD-style data,
not a replicated weight) via ``jax.device_put`` with per-shard host slices.

The reference has no multi-GPU query path at all (retrieval is a
single-process Python loop, inverted_index.py:55-62; its scale-out story is
delegating to Anserini/PISA, README.md:138-139).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import SearchConfig
from ..index.inverted import InvertedIndexData
from ..ops.exact_topk import exact_topk_integer
from .hybrid_engine import (
    _PALLAS_MIN_DOCS as _PALLAS_MIN,
    _SCATTER_TILE as _TILE,
    _TILED_MIN_DOCS as _TILED_MIN,
)

TAIL_CHUNK = 512


def _bucket(n: int, base: int = 16) -> int:
    b = base
    while b < n:
        b *= 2
    return b


class ShardedSearchEngine:
    """Doc-sharded batched scoring over a (data,)-axis mesh."""

    def __init__(
        self,
        index: InvertedIndexData,
        mesh: Mesh,
        config: SearchConfig = SearchConfig(),
        heavy_min: int = 1024,
        dense_budget_bytes: int = 4 << 30,
        axis: str = "data",
        use_pallas: bool = False,  # opt-in per-shard Pallas tail scatter
        tail_partitioned: Optional[bool] = None,
    ):
        self.config = config
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        if mesh.devices.size != self.n_shards:
            raise ValueError(
                f"mesh must be 1-D over '{axis}' for doc sharding "
                f"(got {dict(mesh.shape)})"
            )
        self.vocab: Dict[str, int] = index.term_to_id
        self.num_docs = max(int(index.num_docs), 1)
        # equal doc ranges, each padded to a lane multiple — or, past the
        # tiled-scatter threshold, to a tile multiple so the local tail
        # scatter can use the VMEM-tiled path (hybrid_engine._apply_tail_tiled).
        # Below that threshold the flat scatter runs and only needs 128-lane
        # alignment; tile-aligning there would waste up to ~2x dense HBM.
        per = -(-self.num_docs // self.n_shards)
        if per >= _PALLAS_MIN:
            # tile-aligned (<= 12.5% pad at this size) so both the Pallas
            # tail scatter and the XLA tiled path work on whole tiles
            self.shard_docs = -(-per // _TILE) * _TILE
        else:
            self.shard_docs = ((per + 127) // 128) * 128
        self.doc_lo = np.arange(self.n_shards) * self.shard_docs
        # same opt-in gate as hybrid_engine: exact kernels, pending a TPU
        # stress pass; tests flip _pallas/_pallas_interpret directly
        self._pallas = (
            bool(use_pallas)
            and self.shard_docs % _TILE == 0
            and jax.default_backend() == "tpu"
        )
        self._pallas_interpret = False

        offsets = np.asarray(index.offsets, dtype=np.int64)
        lengths = np.diff(offsets)
        heavy_tids = np.nonzero(lengths >= heavy_min)[0]
        # per-shard dense budget caps the row count, longest lists first
        # (same rule as the single-chip engine; each device holds
        # [T_heavy, shard_docs] bf16)
        max_rows = max(1, dense_budget_bytes // (2 * self.shard_docs))
        if len(heavy_tids) > max_rows:
            order = np.argsort(lengths[heavy_tids])[::-1]
            heavy_tids = np.sort(heavy_tids[order[:max_rows]])
        self.heavy_row = {int(t): i for i, t in enumerate(heavy_tids)}
        self.heavy_row_arr = np.full(len(lengths), -1, dtype=np.int32)
        self.heavy_row_arr[heavy_tids] = np.arange(len(heavy_tids), dtype=np.int32)
        self.t_heavy = max(len(heavy_tids), 1)

        doc_ids = np.asarray(index.doc_ids, dtype=np.int64)
        impacts = np.asarray(index.impacts, dtype=np.float32)
        shard_of = np.minimum(doc_ids // self.shard_docs, self.n_shards - 1)

        devices = mesh.devices.reshape(-1)
        dense_shards = []
        is_heavy = np.zeros(len(lengths), dtype=bool)
        is_heavy[heavy_tids] = True
        term_of = np.repeat(np.arange(len(lengths)), lengths)
        heavy_mask = is_heavy[term_of]
        row_of_all = np.zeros(len(lengths), dtype=np.int64)
        row_of_all[heavy_tids] = np.arange(len(heavy_tids))

        # Single-pass shard split: ONE stable radix argsort on the composite
        # key (shard, heavy|tail, dense-row-or-term) orders every posting
        # into per-shard heavy blocks (dense-row-sorted) and tail blocks
        # (term-sorted) at once — O(P) + one sort, instead of the previous
        # S boolean passes + S argsorts over the full posting arrays.
        V = len(lengths)
        M = max(V, self.t_heavy, 1)
        row_or_term = np.where(heavy_mask, row_of_all[term_of], term_of)
        key = (shard_of * 2 + (~heavy_mask)) * M + row_or_term
        from ..utils.sorting import radix_argsort

        order = radix_argsort(key)
        s_docs = doc_ids[order]
        s_vals = impacts[order]
        s_key = key[order]
        del order, key, row_or_term
        block_bounds = np.searchsorted(
            s_key, np.arange(2 * self.n_shards + 1, dtype=np.int64) * M
        )

        # Dense heavy rows build ON each shard's device from its heavy
        # postings (hybrid_engine.build_dense_rows) — a host-built dense
        # matrix would cost t_heavy * shard_docs * 4 bytes of host RAM and
        # transfer PER SHARD (tens of GB at pod scale).
        from .hybrid_engine import build_dense_rows

        self.tail_offsets: List[np.ndarray] = []
        max_tail = 1
        tail_data = []
        for s in range(self.n_shards):
            h0, h1 = block_bounds[2 * s], block_bounds[2 * s + 1]
            h_docs = (s_docs[h0:h1] - self.doc_lo[s]).astype(np.int32)
            h_vals = s_vals[h0:h1]
            counts = np.bincount(
                s_key[h0:h1] - (2 * s) * M, minlength=self.t_heavy
            )
            heavy_starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            if len(h_docs):
                dense_s = build_dense_rows(
                    jax.device_put(h_docs, devices[s]),
                    jax.device_put(h_vals, devices[s]),
                    heavy_starts,
                    self.t_heavy,
                    self.shard_docs,
                )
            else:
                dense_s = jax.device_put(
                    np.zeros((self.t_heavy, self.shard_docs), np.float32).astype(
                        jnp.bfloat16
                    ),
                    devices[s],
                )
            dense_shards.append(dense_s)

            t0, t1 = block_bounds[2 * s + 1], block_bounds[2 * s + 2]
            t_docs = (s_docs[t0:t1] - self.doc_lo[s]).astype(np.int32)
            t_vals = s_vals[t0:t1]
            counts = np.bincount(s_key[t0:t1] - (2 * s + 1) * M, minlength=V)
            offs = np.zeros(V + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            self.tail_offsets.append(offs)
            max_tail = max(max_tail, len(t_docs))
            tail_data.append((t_docs, t_vals))

        # Per-shard sort-free partitioned tail (same trade as the single-chip
        # engine, hybrid_engine._apply_tail_partitioned): doc-sort each
        # shard's tail blocks once at load, split query ranges at local 64k
        # tile boundaries per batch, skip the per-batch device sort.  Gated
        # by the same posting-weighted density rule, evaluated on SHARD
        # geometry (lists 1/S as long, tiles 1/S as many).
        if tail_partitioned is None:
            from .hybrid_engine import HybridSearchEngine

            tail_lens = np.concatenate(
                [np.diff(o) for o in self.tail_offsets]
            ) if self.n_shards else np.zeros(0, np.int64)
            tail_partitioned, _ = HybridSearchEngine.recommend_tail_partitioned(
                tail_lens, np.zeros(len(tail_lens), bool),
                self.shard_docs, self.shard_docs,
            )
        self._tail_partitioned = bool(
            tail_partitioned and self.shard_docs % _TILE == 0 and not self._pallas
        )
        self._tail_bounds_rel: List[np.ndarray] = []
        if self._tail_partitioned:
            from .hybrid_engine import partition_tail_csr

            for s, (t_docs, t_vals) in enumerate(tail_data):
                offs = self.tail_offsets[s]
                lens = np.diff(offs)
                self._tail_bounds_rel.append(
                    partition_tail_csr(
                        t_docs, t_vals, offs[:-1], lens,
                        np.nonzero(lens > 0)[0], self.shard_docs,
                    )
                )

        self.dense_dtype = (
            jnp.float32
            if any(d.dtype == np.float32 for d in dense_shards)
            else jnp.bfloat16
        )
        dense_shards = [d.astype(self.dense_dtype) for d in dense_shards]

        # Per-device placement: stack along a sharded leading axis.
        dense_sharding = NamedSharding(mesh, P(axis, None, None))
        self.dense = jax.make_array_from_single_device_arrays(
            (self.n_shards, self.t_heavy, self.shard_docs),
            dense_sharding,
            [jax.device_put(d[None], dev) for d, dev in zip(dense_shards, devices)],
        )
        # + TAIL_CHUNK: the chunk gather slices whole chunks (see
        # hybrid_engine._gather_tail) and must never clamp-shift at the end
        pad = _bucket(max_tail + TAIL_CHUNK, base=128)
        tdocs = np.zeros((self.n_shards, pad), np.int32)
        tvals = np.zeros((self.n_shards, pad), np.float32)
        for s, (d, v) in enumerate(tail_data):
            tdocs[s, : len(d)] = d
            tvals[s, : len(v)] = v
        arr_sharding = NamedSharding(mesh, P(axis, None))
        self.tail_docs = jax.device_put(tdocs, arr_sharding)
        self.tail_vals = jax.device_put(tvals, arr_sharding)

        mesh_ = mesh
        axis_ = axis
        shard_docs = self.shard_docs
        n_shards = self.n_shards

        @partial(jax.jit, static_argnums=(7, 8, 9))
        def score(
            dense, w, tail_docs, tail_vals, tail_table, tile_bounds, doc_lo,
            k_local, k_final, tail_impl="xla",
        ):
            def local(dense_s, tail_docs_s, tail_vals_s, tail_table_s,
                      tile_bounds_s, doc_lo_s):
                # dense_s: [1, T_h, shard_docs]; tail_table_s: [1, 3, C]
                # HIGHEST: TPU's default precision truncates fp32 operands
                # to bf16 (loses 1 from a 257 cell); no-op for bf16 dense.
                scores = jax.lax.dot_general(
                    w.astype(dense_s.dtype),
                    dense_s[0],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                starts, lens, rows = (
                    tail_table_s[0, 0],
                    tail_table_s[0, 1],
                    tail_table_s[0, 2],
                )
                # regime-gated chunk gather (see hybrid_engine._gather_tail):
                # whole-chunk dynamic_slice in the tiled regime (the shard
                # arrays carry >= TAIL_CHUNK trailing zeros so slices never
                # clamp-shift), fused element-wise take below it
                offs = jnp.arange(TAIL_CHUNK, dtype=jnp.int32)[None, :]
                valid = offs < lens[:, None]
                td, tv = tail_docs_s[0], tail_vals_s[0]
                if shard_docs >= _TILED_MIN:
                    d = jax.vmap(
                        lambda s: jax.lax.dynamic_slice(td, (s,), (TAIL_CHUNK,))
                    )(starts)
                    v = jax.vmap(
                        lambda s: jax.lax.dynamic_slice(tv, (s,), (TAIL_CHUNK,))
                    )(starts)
                else:
                    pos = jnp.where(valid, starts[:, None] + offs, 0)
                    d = jnp.take(td, pos, axis=0)
                    v = jnp.take(tv, pos, axis=0)
                v = jnp.where(valid, v, 0.0)
                r = jnp.broadcast_to(rows[:, None], d.shape)
                if tail_impl.startswith("pallas"):
                    # per-shard Pallas paged tail scatter (ops/scatter_scores)
                    from ..ops.scatter_scores import apply_tail_updates

                    scores = apply_tail_updates(
                        scores, d.reshape(-1), v.reshape(-1), r.reshape(-1),
                        interpret=tail_impl == "pallas_interpret",
                    )
                elif tail_impl == "partitioned":
                    # sort-free: chunks arrive tile-grouped per shard with
                    # host-computed flat-stream tile bounds
                    from .hybrid_engine import _apply_tail_partitioned

                    scores = _apply_tail_partitioned(
                        scores, d.reshape(-1), v.reshape(-1), r.reshape(-1),
                        tile_bounds_s[0],
                    )
                elif shard_docs >= _TILED_MIN and shard_docs % _TILE == 0:
                    # doc-sorted VMEM-tiled scatter (see hybrid_engine)
                    from .hybrid_engine import _apply_tail_tiled

                    scores = _apply_tail_tiled(
                        scores, d.reshape(-1), v.reshape(-1), r.reshape(-1),
                        valid.reshape(-1),
                    )
                else:
                    scores = scores.at[r.reshape(-1), d.reshape(-1)].add(v.reshape(-1))
                vals, idx = exact_topk_integer(scores, k_local)
                gidx = jnp.where(vals > 0, idx + doc_lo_s[0], 0)
                # gather every shard's candidates onto every device
                vals_all = jax.lax.all_gather(vals, axis_)  # [S, Q, k]
                gidx_all = jax.lax.all_gather(gidx, axis_)
                q = vals.shape[0]
                vals_cat = jnp.swapaxes(vals_all, 0, 1).reshape(q, -1)
                gidx_cat = jnp.swapaxes(gidx_all, 0, 1).reshape(q, -1)
                mvals, morder = jax.lax.top_k(vals_cat, k_final)
                midx = jnp.take_along_axis(gidx_cat, morder, axis=1)
                packed = jnp.stack(
                    [jax.lax.bitcast_convert_type(mvals, jnp.int32), midx], axis=1
                )
                return packed[None]  # re-add the shard axis (replicated result)

            out = shard_map(
                local,
                mesh=mesh_,
                in_specs=(
                    P(axis_, None, None),
                    P(axis_, None),
                    P(axis_, None),
                    P(axis_, None, None),
                    P(axis_, None),
                    P(axis_),
                ),
                out_specs=P(axis_, None, None, None),
                check_vma=False,
            )(dense, tail_docs, tail_vals, tail_table, tile_bounds, doc_lo)
            return out[0]

        self._score = score
        self._doc_lo_dev = jax.device_put(
            self.doc_lo.astype(np.int32), NamedSharding(mesh, P(axis))
        )

    def _tables(self, query_term_sets: Sequence[Set[str]]):
        """W is shared; the tail chunk table is per shard (ranges differ).
        Vectorized like hybrid_engine._tables: one dict lookup per query
        term, numpy chunk expansion per shard.  Returns (w, table,
        tile_bounds) — ``tile_bounds`` [S, n_tiles + 1] marks each shard's
        tile ranges in its flat update stream (partitioned mode; zeros
        otherwise)."""
        from .hybrid_engine import expand_tail_chunks, partitioned_chunk_table

        n_tiles = self.shard_docs // _TILE if self._tail_partitioned else 0
        tb = np.zeros((self.n_shards, n_tiles + 1), dtype=np.int32)
        nq = len(query_term_sets)
        w = np.zeros((nq, self.t_heavy), dtype=np.float32)
        qs: List[int] = []
        tids: List[int] = []
        get = self.vocab.get
        for q, terms in enumerate(query_term_sets):
            for term in terms:
                tid = get(term)
                if tid is not None:
                    qs.append(q)
                    tids.append(tid)
        if not tids:
            return w, np.zeros((self.n_shards, 3, _bucket(1)), dtype=np.int32), tb
        q_arr = np.asarray(qs, dtype=np.int64)
        tid_arr = np.asarray(tids, dtype=np.int64)
        hrow = self.heavy_row_arr[tid_arr]
        heavy = hrow >= 0
        w[q_arr[heavy], hrow[heavy]] = 1.0
        t_q, t_tid = q_arr[~heavy], tid_arr[~heavy]
        if self._tail_partitioned:
            per_shard = []
            for s in range(self.n_shards):
                cs, cl, cr, cb = partitioned_chunk_table(
                    self._tail_bounds_rel[s], self.tail_offsets[s][:-1],
                    t_q, t_tid, n_tiles,
                )
                per_shard.append((cs, cl, cr))
                tb[s] = cb
        else:
            per_shard = [
                expand_tail_chunks(
                    self.tail_offsets[s][t_tid],
                    self.tail_offsets[s][t_tid + 1],
                    t_q,
                    TAIL_CHUNK,
                )
                for s in range(self.n_shards)
            ]
        c = _bucket(max(max((len(p[0]) for p in per_shard), default=1), 1))
        table = np.zeros((self.n_shards, 3, c), dtype=np.int32)
        for s, (cs, cl, cr) in enumerate(per_shard):
            table[s, 0, : len(cs)] = cs
            table[s, 1, : len(cs)] = cl
            table[s, 2, : len(cs)] = cr
        return w, table, tb

    def score_batch_async(
        self,
        query_term_sets: Sequence[Set[str]],
        top_k: Optional[int] = None,
    ):
        """Dispatch a batch; returns a zero-arg finalizer (same pipelined
        serving pattern as hybrid_engine.score_batch_async)."""
        if top_k is None:
            top_k = self.config.top_k
        nq = len(query_term_sets)
        if nq == 0:
            return lambda: []
        k_local = min(top_k, self.shard_docs)
        k_final = min(top_k, self.num_docs, self.n_shards * k_local)
        w, table, tile_bounds = self._tables(query_term_sets)
        nq_b = _bucket(nq, base=8)
        if nq_b > nq:
            w = np.concatenate([w, np.zeros((nq_b - nq, w.shape[1]), w.dtype)])
        if self._pallas and nq_b <= 64:
            tail_impl = "pallas_interpret" if self._pallas_interpret else "pallas"
        elif self._tail_partitioned:
            tail_impl = "partitioned"
        else:
            tail_impl = "xla"
        packed = self._score(
            self.dense,
            jnp.asarray(w),
            self.tail_docs,
            self.tail_vals,
            jax.device_put(table, NamedSharding(self.mesh, P(self.axis, None, None))),
            jax.device_put(
                tile_bounds, NamedSharding(self.mesh, P(self.axis, None))
            ),
            self._doc_lo_dev,
            k_local,
            k_final,
            tail_impl,
        )

        def finalize() -> List[List[Tuple[int, float]]]:
            host = np.asarray(packed)
            scores = host[:nq, 0].view(np.float32)
            docs = host[:nq, 1]
            return [
                [(int(d), float(s)) for d, s in zip(docs[i], scores[i]) if s > 0]
                for i in range(nq)
            ]

        return finalize

    def score_batch(
        self,
        query_term_sets: Sequence[Set[str]],
        top_k: Optional[int] = None,
    ) -> List[List[Tuple[int, float]]]:
        return self.score_batch_async(query_term_sets, top_k)()

    def score_stream(self, query_batches, top_k: Optional[int] = None, depth: int = 2):
        """Pipelined scoring: keep ``depth`` batches in flight."""
        from collections import deque

        pending = deque()
        for batch in query_batches:
            pending.append(self.score_batch_async(batch, top_k))
            if len(pending) > depth:
                yield pending.popleft()()
        while pending:
            yield pending.popleft()()
