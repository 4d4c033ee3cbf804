"""Serving-daemon benchmark: q/s and latency through cli.serve's TCP +
dynamic micro-batching loop vs direct engine calls on the same engine.

Two modes:

- ``--engine host`` (default): numpy engine, small index — isolates the
  daemon's own cost (protocol parse, queueing, batching, serialization).
- ``--engine hybrid``: the TPU ``HybridSearchEngine`` at corpus scale
  (``--num_docs 1000000``) — the daemon as actually deployed; measures
  p50/p95/p99 under concurrent clients and, with ``--hot_swap``, the
  latency blip of a staged live engine swap under load.

``--sweep CxI,CxI,...`` runs the client load at several (clients x
in-flight-per-client) points — total outstanding = C*I — and reports each;
the daemon saturates only when outstanding requests approach the engine's
batch sweet spot (64), which a 16x1 load can never reach (round-4
SERVE_BENCH_TPU.json: 37% of direct at 16 outstanding).

    python benchmarks/serve_bench.py [--n_queries 2000] [--clients 16]
    python benchmarks/serve_bench.py --engine hybrid --num_docs 1000000 \
        --vocab 100000 --postings_per_doc 6 --hot_swap \
        --sweep 16x1,16x4,32x2,32x4,64x2 --out SERVE_BENCH_TPU.json
"""

from __future__ import annotations

import argparse
import json
import socket
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:  # replay warmup compiles from disk like cli.serve does on restart
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
except Exception:
    pass


def build_index(num_docs=20_000, vocab=2_000, per_doc=20, seed=0):
    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, vocab + 1) ** 0.9
    p /= p.sum()
    if num_docs <= 50_000:
        def gen():
            for d in range(num_docs):
                ids = rng.choice(vocab, size=per_doc, p=p)
                yield d, {f"t{i}": int(rng.integers(1, 255)) for i in ids}

        return InvertedIndexData.build(gen(), num_docs=num_docs)
    # corpus scale: array-speed CSR construction (a python dict per doc
    # costs minutes at 1M docs and is not what this bench measures).
    # Dedupe (term, doc) pairs like a real index — duplicates would force
    # the engine's fp32 dense rebuild (2x HBM).
    n = num_docs * per_doc
    tids = rng.choice(vocab, size=n, p=p).astype(np.int64)
    docs = np.repeat(np.arange(num_docs, dtype=np.int64), per_doc)
    keys = np.unique(tids * num_docs + docs)
    tids = keys // num_docs
    docs = (keys % num_docs).astype(np.uint32)
    n = len(keys)
    vals = rng.integers(1, 255, n).astype(np.uint8)
    counts = np.bincount(tids, minlength=vocab)
    offsets = np.zeros(vocab + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return InvertedIndexData(
        [f"t{i}" for i in range(vocab)], offsets, docs, vals, num_docs=num_docs,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_queries", type=int, default=2000)
    parser.add_argument("--clients", type=int, default=16)
    parser.add_argument("--terms_per_query", type=int, default=8)
    parser.add_argument("--max_batch", type=int, default=64)
    parser.add_argument("--engine", choices=["host", "hybrid"], default="host")
    parser.add_argument("--num_docs", type=int, default=20_000)
    parser.add_argument("--postings_per_doc", type=int, default=20)
    parser.add_argument("--vocab", type=int, default=2_000)
    parser.add_argument("--hot_swap", action="store_true",
                        help="staged swap_engine mid-run under full client "
                        "load (old engine released, replacement built live); "
                        "report the latency blip around the swap")
    parser.add_argument("--inflight", type=int, default=1,
                        help="requests each client keeps outstanding "
                        "(1 = strict request/response; >1 models a frontend "
                        "multiplexing many users over one connection, which "
                        "lets the daemon form full batches and pipeline)")
    parser.add_argument("--sweep", type=str, default=None,
                        help="comma list of CLIENTSxINFLIGHT load points, "
                        "e.g. 16x1,16x4,32x4,64x2; default: one point at "
                        "--clients x --inflight")
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="daemon batches in flight at the engine")
    parser.add_argument("--out", type=Path, default=Path(__file__).parent / "SERVE_BENCH.json")
    args = parser.parse_args(argv)

    from improving_learned_index_tpu.search.engine import InvertedIndex
    from improving_learned_index_tpu.serve import RetrievalServer

    t_build = time.time()
    index = build_index(args.num_docs, args.vocab, args.postings_per_doc)

    def make_engine():
        if args.engine == "hybrid":
            from improving_learned_index_tpu.search.hybrid_engine import (
                HybridSearchEngine,
            )

            return HybridSearchEngine(index)
        return InvertedIndex(index)

    engine = make_engine()
    build_s = time.time() - t_build
    rng = np.random.default_rng(1)
    vocab = index.vocab
    # Zipf-weighted query terms (frequent corpus terms are frequent in
    # queries too — same distribution as query_bench.py)
    qp = 1.0 / np.arange(1, len(vocab) + 1) ** 0.9
    qp /= qp.sum()
    queries = [
        [vocab[i] for i in rng.choice(len(vocab), size=args.terms_per_query, p=qp)]
        for _ in range(args.n_queries)
    ]

    # warmup (hybrid: jit compile of the serving batch shape).  The full
    # shape-lattice warmup is what cli.serve runs at startup; without it,
    # bucket combos first hit by live traffic are mid-request compile
    # stalls in the measured p99 (round-3 run: p99 2790ms vs p50 43ms).
    t_w = time.time()
    warm_combos = (engine.warmup(max_batch=args.max_batch, top_k=10)
                   if hasattr(engine, "warmup") else 0)
    engine_warmup_s = time.time() - t_w
    engine.score_batch([set(q) for q in queries[: args.max_batch]], 10)

    # direct baselines: the same batches the daemon would form, (a) strict
    # sequential, (b) pipelined (score_stream) — (b) is the engine ceiling
    # a saturated daemon is measured against
    t0 = time.time()
    for lo in range(0, len(queries), args.max_batch):
        engine.score_batch([set(q) for q in queries[lo : lo + args.max_batch]], 10)
    direct_s = time.time() - t0
    direct_pipe_s = None
    if hasattr(engine, "score_stream"):
        batches = [
            [set(q) for q in queries[lo : lo + args.max_batch]]
            for lo in range(0, len(queries), args.max_batch)
        ]
        t0 = time.time()
        for _ in engine.score_stream(batches, 10, depth=3):
            pass
        direct_pipe_s = time.time() - t0

    srv = RetrievalServer(engine, top_k=10, max_batch=args.max_batch,
                          max_wait_ms=2.0, pipeline_depth=args.pipeline_depth)
    srv.start()

    # Warmup THROUGH the daemon at measurement concurrency: the engine
    # buckets batch sizes (nq -> multiples of 8), and each new bucket shape
    # is a jit compile — without this, a handful of multi-second compile
    # stalls land in the measured p99.
    def warm_client(cid, n):
        sock = socket.create_connection(("127.0.0.1", srv.port))
        f = sock.makefile("rb")
        for i in range(n):
            sock.sendall((json.dumps({"id": i, "terms": queries[(cid + i) % len(queries)]}) + "\n").encode())
            json.loads(f.readline())
        sock.close()

    t_warm = time.time()
    for conc in (args.clients, max(1, args.clients // 2), 1):
        ws = [threading.Thread(target=warm_client, args=(c, 8)) for c in range(conc)]
        for t in ws:
            t.start()
        for t in ws:
            t.join()
    warm_s = time.time() - t_warm

    def run_load(clients: int, inflight: int, hot_swap: bool = False):
        """Drive the daemon with ``clients`` connections keeping
        ``inflight`` requests outstanding each; returns the measured point
        (q/s, latency percentiles, optional staged-swap blip)."""
        srv.stats.reset()  # compile/warmup stalls must not pollute percentiles
        per_client = len(queries) // clients
        lat: list = []
        lock = threading.Lock()

        def client(cid):
            sock = socket.create_connection(("127.0.0.1", srv.port))
            f = sock.makefile("rb")
            mine = queries[cid * per_client : (cid + 1) * per_client]
            my_lat = []
            # sliding window of `inflight` outstanding requests
            sent_at = {}
            next_i = 0
            while next_i < len(mine) and len(sent_at) < inflight:
                sent_at[next_i] = time.time()
                sock.sendall((json.dumps({"id": next_i, "terms": mine[next_i]}) + "\n").encode())
                next_i += 1
            while sent_at:
                resp = json.loads(f.readline())
                assert "results" in resp, resp
                now = time.time()
                my_lat.append((now, (now - sent_at.pop(resp["id"])) * 1e3))
                if next_i < len(mine):
                    sent_at[next_i] = time.time()
                    sock.sendall((json.dumps({"id": next_i, "terms": mine[next_i]}) + "\n").encode())
                    next_i += 1
            with lock:
                lat.extend(my_lat)
            sock.close()

        swap_info = {}

        def swapper(t_start):
            # staged swap once the run is ~halfway through, under full
            # client load: the old engine's device buffers are released
            # BEFORE the replacement is built (swap_engine_staged), so peak
            # HBM stays one engine — the build happens mid-traffic with the
            # host postings engine answering in the window
            while time.time() - t_start < max(daemon_eta / 2, 0.5):
                time.sleep(0.05)
            t_sw = time.time()
            fallback = InvertedIndex(index)
            srv.swap_engine_staged(make_engine, fallback_engine=fallback)
            swap_info["swap_at_s"] = round(t_sw - t_start, 2)
            swap_info["staged_swap_s"] = round(time.time() - t_sw, 2)

        daemon_eta = direct_s  # rough ETA for scheduling the mid-run swap
        t0 = time.time()
        threads = [threading.Thread(target=client, args=(c,)) for c in range(clients)]
        if hot_swap:
            threads.append(threading.Thread(target=swapper, args=(t0,)))
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        daemon_s = time.time() - t0

        n = clients * per_client
        if swap_info:
            # latency blip: worst latency in the 2s window after the swap
            # vs the run's overall p99
            t_sw = t0 + swap_info["swap_at_s"]
            window = [l for te, l in lat if t_sw <= te <= t_sw + 2.0]
            swap_info["post_swap_max_ms"] = round(max(window), 2) if window else None
            swap_info["post_swap_queries"] = len(window)
        slat = sorted(l for _, l in lat)
        point = {
            "clients": clients,
            "inflight_per_client": inflight,
            "outstanding": clients * inflight,
            "n_queries": n,
            "daemon_q_per_s": round(n / daemon_s, 1),
            "latency_ms": {
                "p50": round(slat[len(slat) // 2], 2),
                "p95": round(slat[int(len(slat) * 0.95)], 2),
                "p99": round(slat[int(len(slat) * 0.99)], 2),
            },
            "stats": srv.stats.snapshot(),
        }
        if swap_info:
            point["hot_swap"] = swap_info
        return point

    hot_swap_point = None
    if args.sweep:
        points = []
        for spec in args.sweep.split(","):
            c, x, f = spec.partition("x")
            clients, inflight = int(c), int(f) if x else 1
            points.append(run_load(clients, inflight))
            print(f"sweep {spec}: {points[-1]['daemon_q_per_s']} q/s "
                  f"p99={points[-1]['latency_ms']['p99']}ms", file=sys.stderr)
        best = max(points, key=lambda p: p["daemon_q_per_s"])
        if args.hot_swap:
            # dedicated point: the staged swap rebuilds the engine mid-run
            # (host-fallback window), so its q/s is NOT a saturation number
            hot_swap_point = run_load(args.clients, args.inflight,
                                      hot_swap=True)
    else:
        points = [run_load(args.clients, args.inflight, hot_swap=args.hot_swap)]
        best = points[0]
    srv.stop()

    direct_pipe_qps = (round(len(queries) / direct_pipe_s, 1)
                       if direct_pipe_s else None)
    report = {
        "engine": args.engine,
        "index": {"num_docs": args.num_docs, "vocab": args.vocab,
                  "postings": int(index.num_postings),
                  "build_and_engine_init_s": round(build_s, 1)},
        "engine_warmup": {"combos": warm_combos, "seconds": round(engine_warmup_s, 1)},
        "warmup_s": round(warm_s, 1),
        "pipeline_depth": srv.pipeline_depth,
        "max_batch": args.max_batch,
        "direct_q_per_s": round(len(queries) / direct_s, 1),
        "direct_pipelined_q_per_s": direct_pipe_qps,
        "daemon_q_per_s": best["daemon_q_per_s"],
        "daemon_vs_direct_pipelined": (
            round(best["daemon_q_per_s"] / direct_pipe_qps, 3)
            if direct_pipe_qps else None
        ),
        "best_point": {k: best[k] for k in
                       ("clients", "inflight_per_client", "outstanding",
                        "latency_ms")},
        "sweep": points,
        **({"hot_swap_point": hot_swap_point} if hot_swap_point else {}),
    }
    args.out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
