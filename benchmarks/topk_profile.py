"""Per-stage timing of exact_topk_integer at serving shapes.

Decomposes the 125ms ([32, 8.8M], k=1000) into: threshold search (while
loop), block rank-table pass, and the rank->position gather stage, to find
where a Pallas kernel would pay.  Run on the real chip; all shapes compile
once.  No kills: run under nohup and poll."""
import sys, time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
import jax.numpy as jnp
import numpy as np
from functools import partial
from improving_learned_index_tpu.ops import exact_topk as et

print("devices:", jax.devices(), flush=True)


def timeit(fn, *args, iters=6, label=""):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[..., :1]), out)  # sync via fetch
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x[..., :1]), out)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{label}: {ts[len(ts)//2]*1000:.1f} ms (min {ts[0]*1000:.1f})", flush=True)


@partial(jax.jit, static_argnums=(1,))
def stage_search(scores, k):
    q, n = scores.shape
    lo = jnp.ones((q, 1), jnp.float32)
    hi = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), 1.0)
    frac = jnp.arange(1, et._ARITY, dtype=jnp.float32) / et._ARITY

    def cond(lh):
        lo, hi = lh
        return jnp.any(lo < hi)

    def body(lh):
        lo, hi = lh
        width = hi - lo + 1.0
        t = jnp.minimum(lo + jnp.ceil(frac[None, :] * width), hi)
        counts = jnp.sum((scores[:, :, None] >= t[:, None, :]).astype(jnp.int32), axis=1)
        ok = counts >= k
        new_lo = jnp.max(jnp.where(ok, t, lo), axis=1, keepdims=True)
        new_hi = jnp.minimum(jnp.min(jnp.where(ok, jnp.inf, t), axis=1, keepdims=True) - 1.0, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.while_loop(cond, body, (lo, hi))
    return lo


@jax.jit
def stage_one_pass(scores, t):
    """One threshold-count pass in isolation (15 thresholds)."""
    return jnp.sum((scores[:, :, None] >= t[:, None, :]).astype(jnp.int32), axis=1)


@jax.jit
def stage_blocks(scores, s_k):
    q, n = scores.shape
    nb = n // et._BLOCK
    blocks = scores.reshape(q, nb, et._BLOCK)
    s_k3 = s_k[:, :, None]
    packed = jnp.sum(
        (blocks > s_k3).astype(jnp.float32) * 65536.0 + (blocks == s_k3).astype(jnp.float32),
        axis=2,
    ).astype(jnp.int32)
    return packed


@partial(jax.jit, static_argnums=(1,))
def full(scores, k):
    return et.exact_topk_integer(scores, k)


from improving_learned_index_tpu.ops.count_ge import count_ge


@jax.jit
def stage_pallas_pass(scores, t):
    return count_ge(scores, t)


for q, n in ((32, 8_847_360), (64, 1_048_576)):
    rng = np.random.default_rng(0)
    # realistic impact-sum distribution: sparse positives, max ~2k
    s = np.zeros((q, n), np.float32)
    hit = rng.random((q, n)) < 0.03
    s[hit] = rng.integers(1, 2000, hit.sum()).astype(np.float32)
    scores = jax.device_put(jnp.asarray(s))
    del s, hit
    t15 = jnp.asarray(rng.integers(1, 2000, (q, et._ARITY - 1)).astype(np.float32))
    print(f"--- [{q}, {n}] k=1000", flush=True)
    timeit(lambda x: full(x, 1000), scores, label="full exact_topk")
    timeit(lambda x: stage_search(x, 1000), scores, label="threshold search (while)")
    timeit(stage_one_pass, scores, t15, label="one 7-threshold count pass (XLA)")
    if n % (1 << 14) == 0:
        ref = np.asarray(stage_one_pass(scores, t15))
        got = np.asarray(stage_pallas_pass(scores, t15))
        print("  pallas count matches XLA:", bool((ref == got).all()), flush=True)
        timeit(stage_pallas_pass, scores, t15, label="one 7-threshold count pass (pallas)")
    sk = stage_search(scores, 1000)
    timeit(stage_blocks, scores, sk, label="block rank-table pass")
print("DONE", flush=True)
