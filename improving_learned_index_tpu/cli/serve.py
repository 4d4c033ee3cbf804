"""CLI: retrieval serving daemon — load the index once, serve queries over
TCP with dynamic micro-batching (serve/server.py; no reference equivalent —
the reference only ships the batch rank CLI).

    python -m improving_learned_index_tpu.cli.serve \
        --index_path inverted/ --vocab_path vocab.txt --port 7700 \
        --engine auto --max_batch 64 --max_wait_ms 5

    echo '{"id": 1, "query": "quick brown foxes"}' | nc localhost 7700
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..search.select import build_engine
from ..serve import RetrievalServer
from .common import add_model_args, build_tokenizer, enable_compilation_cache


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    add_model_args(parser)
    parser.add_argument("--index_path", type=Path, default=None)
    parser.add_argument("--shards", type=str, default=None,
                        help="router mode: comma-separated "
                        "host:port[:doc_offset] shard daemons — this daemon "
                        "fans queries out and merges exact top-k "
                        "(serve/router.py); tiers compose")
    parser.add_argument("--shard_timeout", type=float, default=15.0,
                        help="router mode: per-shard connect/read timeout "
                        "in seconds (a hung shard cannot stall the router)")
    parser.add_argument("--allow_partial", action="store_true",
                        help="router mode: answer from the surviving shards "
                        "when one fails, flagging each response with an "
                        "explicit degraded.failed_shards field (default: "
                        "exact-or-error)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7700)
    parser.add_argument("--engine",
                        choices=["auto", "device", "hybrid", "host", "native"],
                        default="auto")
    parser.add_argument("--num_docs", type=int, default=0)
    parser.add_argument("--top_k", type=int, default=1000)
    parser.add_argument("--max_batch", type=int, default=64)
    parser.add_argument("--max_wait_ms", type=float, default=5.0)
    parser.add_argument("--pairwise", action="store_true")
    parser.add_argument("--dense_budget_gb", type=float, default=4.0)
    parser.add_argument("--use_pallas", action="store_true", default=None,
                        help="force the Pallas scoring kernels on (default: "
                        "auto — on at >= 4M docs, where they win 282 vs 199 "
                        "q/s pipelined at 388M postings)")
    parser.add_argument("--no_use_pallas", dest="use_pallas",
                        action="store_false")
    parser.add_argument("--tail_partitioned", action="store_true", default=None,
                        help="hybrid engine: doc-partition tail postings at "
                        "load so scoring never sorts.  OPT-IN: lost "
                        "the same-run A/B at every measured density "
                        "(QBENCH_PART_388M.json) - A/B before serving")
    parser.add_argument("--no_tail_partitioned", dest="tail_partitioned",
                        action="store_false")
    parser.add_argument("--allow_remote_shutdown", action="store_true",
                        help="honor {\"op\": \"shutdown\"} requests")
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip the startup warmup batch (first request "
                        "pays the jit compile instead)")
    parser.add_argument("--warmup_max_chunks", type=int, default=None,
                        help="largest tail-chunk-table bucket to pre-compile "
                        "(default 4096; auto-scaled up when the engine runs "
                        "the partitioned tail, whose chunk tables grow with "
                        "the tile count — un-warmed buckets are mid-request "
                        "compile stalls)")
    args = parser.parse_args(argv)

    if (args.index_path is None) == (args.shards is None):
        parser.error("need exactly one of --index_path or --shards")
    # a daemon restart must replay warmup compiles from disk, not the relay
    enable_compilation_cache()
    if args.shards:
        from ..serve.router import RemoteShardedEngine

        engine = RemoteShardedEngine(
            args.shards,
            shard_timeout=args.shard_timeout,
            allow_partial=args.allow_partial,
        )
    else:
        engine = build_engine(
            args.index_path,
            engine=args.engine,
            dense_budget_bytes=int(args.dense_budget_gb * (1 << 30)),
            use_pallas=args.use_pallas,
            tail_partitioned=args.tail_partitioned,
            num_docs=args.num_docs,
        )
    tokenizer = None
    if args.vocab_path or args.hf_tokenizer:
        tokenizer = build_tokenizer(args)
    if not args.no_warmup:
        if hasattr(engine, "warmup"):
            # compile the engine's whole serving shape lattice before
            # accepting traffic — a bucket combo first seen in live traffic
            # is a mid-request compile stall (hybrid_engine.warmup)
            max_chunks = args.warmup_max_chunks
            if max_chunks is None:
                max_chunks = 4096
                if getattr(engine, "_tail_partitioned", False):
                    # partitioned chunk tables carry >= one TAIL_CHUNK chunk
                    # per non-empty (term, 64k-tile) segment, so live batches
                    # land far past the default lattice: scale by the tile
                    # count and a typical 8-terms-per-query batch
                    n_tiles = engine.n_pad // 65536
                    max_chunks = max(4096, args.max_batch * 8 * n_tiles)
            n = engine.warmup(
                max_batch=args.max_batch, top_k=args.top_k,
                max_chunks=max_chunks,
            )
            print(f"warmup done: {n} shape combos compiled "
                  f"(chunk lattice <= {max_chunks})")
        else:
            # compile the serving batch shape before accepting traffic
            vocab = getattr(engine, "vocab", None)
            terms = {next(iter(vocab))} if vocab else {"warmup"}
            engine.score_batch([terms] * args.max_batch, min(args.top_k, 10))
            print("warmup batch done")
    server = RetrievalServer(
        engine,
        tokenizer=tokenizer,
        top_k=args.top_k,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        pairwise=args.pairwise,
        host=args.host,
        port=args.port,
        allow_shutdown=args.allow_remote_shutdown,
    )
    server.start()
    src = args.index_path if args.index_path else f"router[{args.shards}]"
    print(f"serving {src} on {args.host}:{server.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
