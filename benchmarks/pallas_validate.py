"""TPU validation for the opt-in engine Pallas kernels (gather_rows /
scatter_scores): stress stability, exactness vs the XLA path, and a
same-run pipelined A/B on a real 1M-doc index.

This is the gate for flipping `HybridSearchEngine(use_pallas=...)` to
default-on: a sporadic INVALID_ARGUMENT appeared ONCE right before a
relay outage (2026-08-17) and is unattributed — require 0/40 stress
failures before trusting the kernels in the serving default.

Run on the real chip, serialized (one TPU client at a time), under
nohup — never timeout-kill a TPU client mid-RPC:

    nohup python benchmarks/pallas_validate.py > /tmp/pv.log 2>&1 &
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
import numpy as np  # noqa: E402

from improving_learned_index_tpu.index.inverted import InvertedIndexData  # noqa: E402
from improving_learned_index_tpu.search.hybrid_engine import HybridSearchEngine  # noqa: E402

INDEX_DIR = Path("/tmp/index_build_bench/inverted")


def load_or_build_index():
    if INDEX_DIR.exists():
        return InvertedIndexData.load(INDEX_DIR, num_docs=1_000_000)
    # fall back to the synthetic 1M-doc workload from query_bench
    sys.path.insert(0, str(REPO / "benchmarks"))
    from query_bench import build_index

    index, _ = build_index(Path("/tmp/pallas_validate_idx"))
    return index


def main():
    print("devices:", jax.devices(), flush=True)
    index = load_or_build_index()
    eng = HybridSearchEngine(index, use_pallas=True)
    print("pallas:", eng._pallas, "t_heavy:", eng.t_heavy, flush=True)
    vt = index.vocab
    p = 1.0 / np.arange(1, len(vt) + 1) ** 0.5
    p /= p.sum()

    # ---- stage 1: stress (distinct random batches, count failures) ----
    rng = np.random.default_rng(5)
    fails = 0
    t0 = time.time()
    for bi in range(40):
        batch = [{vt[i] for i in rng.choice(len(vt), size=8, p=p)} for _ in range(64)]
        try:
            eng.score_batch(batch, 1000)
        except Exception as ex:
            fails += 1
            print(f"batch {bi}: {str(ex)[:800]}", flush=True)
    print(f"STRESS pallas fails: {fails}/40 in {time.time()-t0:.0f}s", flush=True)

    # ---- stage 2: exactness vs the XLA path ----
    rng = np.random.default_rng(9)
    batch = [{vt[i] for i in rng.choice(len(vt), size=8, p=p)} for _ in range(64)]
    got = eng.score_batch(batch, 1000)
    eng._pallas = False
    ref = eng.score_batch(batch, 1000)
    mism = sum(dict(a) != dict(b) for a, b in zip(ref, got))
    print(f"CORRECTNESS mismatched queries vs XLA: {mism}/64", flush=True)

    # ---- stage 3: same-run pipelined A/B (interleaved to cancel drift) ----
    def run(n_batches=12, depth=3):
        rng = np.random.default_rng(3)
        batches = [
            [{vt[i] for i in rng.choice(len(vt), size=8, p=p)} for _ in range(64)]
            for _ in range(n_batches)
        ]
        for _ in eng.score_stream(batches[:2], top_k=1000, depth=depth):
            pass  # warm
        t0 = time.time()
        n = 0
        for r in eng.score_stream(batches, top_k=1000, depth=depth):
            n += len(r)
        return n / (time.time() - t0)

    for use_pallas in (False, True, False, True):
        eng._pallas = use_pallas
        print(f"AB pallas={use_pallas}: {run():.0f} q/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
