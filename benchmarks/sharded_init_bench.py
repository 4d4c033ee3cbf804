"""ShardedSearchEngine init-time measurement (VERDICT round-2 weak #5).

Measures the host-side shard split + per-device placement for an 8-way
doc-sharded engine at 1M docs / 5.7M postings.  Runs on the virtual 8-device
CPU mesh (multi-chip TPU hardware is not available here); the host split
cost is identical either way, the per-shard dense builds are device work.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/sharded_init_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main() -> int:
    sys.path.insert(0, str(REPO / "benchmarks"))
    from crossover_bench import build

    from improving_learned_index_tpu.search.sharded_engine import ShardedSearchEngine

    index, queries = build(1_000_000)
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices), axis_names=("data",))

    t0 = time.time()
    engine = ShardedSearchEngine(index, mesh)
    init_s = time.time() - t0

    t0 = time.time()
    res = engine.score_batch(queries, 1000)
    first_query_s = time.time() - t0
    assert len(res) == len(queries)

    report = {
        "num_docs": index.num_docs,
        "postings": index.num_postings,
        "n_shards": 8,
        "init_seconds": round(init_s, 2),
        "first_query_batch_seconds": round(first_query_s, 2),
        "notes": (
            "virtual 8-device CPU mesh: host single-pass radix shard split + "
            "per-device CSR/dense placement; dense builds run per device"
        ),
    }
    out = Path(__file__).parent / "SHARDED_INIT.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
