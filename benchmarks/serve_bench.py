"""Serving-daemon overhead benchmark: q/s and latency through cli.serve's
TCP + dynamic micro-batching loop vs direct ``engine.score_batch`` calls on
the same engine.

Runs the host (numpy) engine by default so the measured delta is the
daemon itself (protocol parse, queueing, batching, response serialization)
— on TPU the same daemon wraps the hybrid engine and the delta is the same
host-side cost.

    python benchmarks/serve_bench.py [--n_queries 2000] [--clients 16]
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


def build_index(num_docs=20_000, vocab=2_000, per_doc=20, seed=0):
    from improving_learned_index_tpu.index.inverted import InvertedIndexData

    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, vocab + 1) ** 0.9
    p /= p.sum()

    def gen():
        for d in range(num_docs):
            ids = rng.choice(vocab, size=per_doc, p=p)
            yield d, {f"t{i}": int(rng.integers(1, 255)) for i in ids}

    return InvertedIndexData.build(gen(), num_docs=num_docs)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_queries", type=int, default=2000)
    parser.add_argument("--clients", type=int, default=16)
    parser.add_argument("--terms_per_query", type=int, default=8)
    parser.add_argument("--max_batch", type=int, default=64)
    parser.add_argument("--out", type=Path, default=Path(__file__).parent / "SERVE_BENCH.json")
    args = parser.parse_args(argv)

    from improving_learned_index_tpu.search.engine import InvertedIndex
    from improving_learned_index_tpu.serve import RetrievalServer

    index = build_index()
    engine = InvertedIndex(index)
    rng = np.random.default_rng(1)
    vocab = index.vocab
    queries = [
        [vocab[i] for i in rng.choice(len(vocab), size=args.terms_per_query)]
        for _ in range(args.n_queries)
    ]

    # direct baseline: same batches the daemon would form
    t0 = time.time()
    for lo in range(0, len(queries), args.max_batch):
        engine.score_batch([set(q) for q in queries[lo : lo + args.max_batch]], 10)
    direct_s = time.time() - t0

    srv = RetrievalServer(engine, top_k=10, max_batch=args.max_batch, max_wait_ms=2.0)
    srv.start()
    per_client = len(queries) // args.clients
    lat: list = []
    lock = threading.Lock()

    def client(cid):
        sock = socket.create_connection(("127.0.0.1", srv.port))
        f = sock.makefile("rb")
        mine = queries[cid * per_client : (cid + 1) * per_client]
        my_lat = []
        for i, q in enumerate(mine):
            t = time.time()
            sock.sendall((json.dumps({"id": i, "terms": q}) + "\n").encode())
            json.loads(f.readline())
            my_lat.append((time.time() - t) * 1e3)
        with lock:
            lat.extend(my_lat)
        sock.close()

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(c,)) for c in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    daemon_s = time.time() - t0
    srv.stop()

    n = args.clients * per_client
    lat.sort()
    report = {
        "engine": "host (numpy)",
        "n_queries": n,
        "clients": args.clients,
        "direct_q_per_s": round(len(queries) / direct_s, 1),
        "daemon_q_per_s": round(n / daemon_s, 1),
        "daemon_overhead_us_per_query": round((daemon_s - direct_s * n / len(queries)) / n * 1e6, 1),
        "latency_ms": {
            "p50": round(lat[len(lat) // 2], 2),
            "p95": round(lat[int(len(lat) * 0.95)], 2),
            "p99": round(lat[int(len(lat) * 0.99)], 2),
        },
        "stats": srv.stats.snapshot(),
    }
    args.out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
