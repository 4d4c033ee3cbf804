"""Training-step throughput: BERT-base pairwise-CE on v5e-1 vs torch CPU.

The reference trains bert-base-class encoders with pairwise CE at batch
16-64/GPU (README.md:108-109, train.py:249-251).  This measures the full
jitted step (forward + backward + AdamW with clip-norm 2.0) at the same
geometry and the torch-CPU equivalent step, and prints one JSON line.

Usage: python benchmarks/train_bench.py [--batch 16] [--seq 256]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GEOM = dict(
    vocab_size=30522,
    hidden_size=768,
    num_layers=12,
    num_heads=12,
    intermediate_size=3072,
    max_position_embeddings=512,
)


def measure_jax(batch: int, seq: int, iters: int = 6) -> float:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    import jax.numpy as jnp
    import optax

    from improving_learned_index_tpu.core.config import EncoderConfig
    from improving_learned_index_tpu.models.encoder import DeepImpactModel, init_params
    from improving_learned_index_tpu.train.losses import pairwise_ce
    from improving_learned_index_tpu.train.trainer import masked_doc_scores

    config = EncoderConfig(**GEOM, impact_activation="relu",
                           hidden_dropout=0.0, attention_dropout=0.0)
    module = DeepImpactModel(config)
    params = init_params(module, config, jax.random.PRNGKey(0), max_length=16)
    tx = optax.chain(optax.clip_by_global_norm(2.0), optax.adamw(3e-6))
    opt_state = tx.init(params)

    n_docs = 2 * batch  # pos+neg per query (reference collate, train.py:18)
    rng = np.random.default_rng(0)
    b = {
        "input_ids": jnp.asarray(rng.integers(1, GEOM["vocab_size"], (n_docs, seq)), jnp.int32),
        "attention_mask": jnp.ones((n_docs, seq), jnp.int32),
        "type_ids": jnp.zeros((n_docs, seq), jnp.int32),
        "masks": jnp.asarray((rng.random((n_docs, seq)) < 0.2), jnp.float32),
    }

    def loss_fn(p, batch_):
        out = module.apply({"params": p}, batch_["input_ids"],
                           batch_["attention_mask"], batch_["type_ids"],
                           deterministic=True)
        scores = masked_doc_scores(out, batch_["masks"]).reshape(batch, 2)
        return pairwise_ce(scores)

    @jax.jit
    def step(p, o, batch_):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch_)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, b)
    print(f"train compile+first: {time.time()-t0:.1f}s loss={float(loss):.4f}",
          file=sys.stderr)
    times = []
    for _ in range(iters):
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, b)
        float(loss)  # data-dependent fetch
        times.append(time.time() - t0)
    med = statistics.median(times)
    print(f"train iters(ms): {[round(t*1000,1) for t in times]}", file=sys.stderr)
    return n_docs / med


def measure_jax_realistic(batch: int, seq: int, doc_tokens: int, pack: bool,
                          loss: str = "pairwise_ce", group: int = 8,
                          iters: int = 6) -> tuple:
    """Full jitted step at realistic document lengths (~doc_tokens real
    tokens right-padded to seq), optionally sequence-packed via
    train/packed.pack_collated — the exact production train path
    (trainer.make_loss_fn branches on the packed keys).  ``loss`` is
    pairwise_ce (2 docs/query) or distil_kl/distil_mse (``group``
    teacher-scored passages per query, the reference's flagship
    distillation workload)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    import optax

    from improving_learned_index_tpu.core.config import EncoderConfig
    from improving_learned_index_tpu.models.encoder import DeepImpactModel, init_params
    from improving_learned_index_tpu.train.packed import pack_collated
    from improving_learned_index_tpu.train.trainer import make_loss_fn

    config = EncoderConfig(**GEOM, impact_activation="relu",
                           hidden_dropout=0.0, attention_dropout=0.0)
    module = DeepImpactModel(config)
    params = init_params(module, config, jax.random.PRNGKey(0), max_length=16)
    tx = optax.chain(optax.clip_by_global_norm(2.0), optax.adamw(3e-6))
    opt_state = tx.init(params)

    per_query = group if loss.startswith("distil") else 2
    n_docs = per_query * batch
    rng = np.random.default_rng(0)
    lengths = rng.integers(doc_tokens - 20, doc_tokens + 21, n_docs).clip(1, seq)
    ids = np.zeros((n_docs, seq), np.int32)
    att = np.zeros((n_docs, seq), np.int32)
    msk = np.zeros((n_docs, seq), np.float32)
    for i, ln in enumerate(lengths):
        ids[i, :ln] = rng.integers(1, GEOM["vocab_size"], ln)
        att[i, :ln] = 1
        msk[i, :ln] = rng.random(ln) < 0.2
    arrays = {"input_ids": ids, "attention_mask": att,
              "type_ids": np.zeros((n_docs, seq), np.int32), "masks": msk,
              "group_size": per_query}
    if loss.startswith("distil"):
        arrays["scores"] = rng.normal(size=(batch, group)).astype(np.float32)
    rows = n_docs
    if pack:
        arrays = pack_collated(arrays)
        rows = arrays["input_ids"].shape[0]
    arrays.pop("group_size")  # static metadata; Trainer._put_batch drops it too
    loss_fn = make_loss_fn(module, loss)

    @jax.jit
    def step(p, o, batch_):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch_)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, arrays)
    print(f"{'packed' if pack else 'padded'} compile+first: "
          f"{time.time()-t0:.1f}s loss={float(loss):.4f} rows={rows}",
          file=sys.stderr)
    times = []
    for _ in range(iters):
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, arrays)
        float(loss)
        times.append(time.time() - t0)
    med = statistics.median(times)
    print(f"iters(ms): {[round(t*1000,1) for t in times]}", file=sys.stderr)
    return n_docs / med, rows


def measure_torch(seq: int) -> float:
    import torch
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=GEOM["vocab_size"], hidden_size=GEOM["hidden_size"],
        num_hidden_layers=GEOM["num_layers"], num_attention_heads=GEOM["num_heads"],
        intermediate_size=GEOM["intermediate_size"],
        max_position_embeddings=GEOM["max_position_embeddings"],
    )
    model = BertModel(cfg)
    head = torch.nn.Linear(GEOM["hidden_size"], 1)
    opt = torch.optim.AdamW(list(model.parameters()) + list(head.parameters()), lr=3e-6)
    n_docs = 2  # 1 query group; CPU throughput is batch-insensitive
    ids = torch.randint(1, GEOM["vocab_size"], (n_docs, seq))
    mask = torch.ones_like(ids)
    qmask = (torch.rand(n_docs, seq) < 0.2).float()

    def step():
        opt.zero_grad()
        out = model(input_ids=ids, attention_mask=mask).last_hidden_state
        scores = (torch.relu(head(out))[..., 0] * qmask).sum(-1).reshape(1, 2)
        loss = torch.nn.functional.cross_entropy(
            scores, torch.zeros(1, dtype=torch.long))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 2.0)
        opt.step()

    step()  # warmup (first steps also pay allocator churn)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        step()
        best = min(best, time.time() - t0)
    return n_docs / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--realistic", action="store_true",
                    help="packed-vs-padded A/B at ~--doc_tokens real tokens "
                    "per document (the MSMARCO training shape) instead of "
                    "the full-row headline measurement")
    ap.add_argument("--doc_tokens", type=int, default=62)
    ap.add_argument("--loss", default="pairwise_ce",
                    choices=["pairwise_ce", "distil_kl", "distil_mse"])
    ap.add_argument("--group", type=int, default=8,
                    help="teacher-scored passages per query (distil losses)")
    args = ap.parse_args()

    if args.realistic:
        per_query = args.group if args.loss.startswith("distil") else 2
        padded, _ = measure_jax_realistic(args.batch, args.seq, args.doc_tokens,
                                          False, args.loss, args.group)
        packed, rows = measure_jax_realistic(args.batch, args.seq, args.doc_tokens,
                                             True, args.loss, args.group)
        out = {
            "metric": "train_docs_per_s_realistic",
            "loss": args.loss,
            "workload": f"~{args.doc_tokens}-token docs, bert-base S={args.seq}, "
                        f"B={args.batch} queries ({per_query*args.batch} docs/step)",
            "padded_docs_per_s": round(padded, 1),
            "packed_docs_per_s": round(packed, 1),
            "packed_rows_per_step": rows,
            "speedup": round(packed / padded, 2),
        }
        name = "PACKED_TRAIN_DISTIL.json" if args.loss.startswith("distil") \
            else "PACKED_TRAIN.json"
        (REPO / "benchmarks" / name).write_text(json.dumps(out, indent=1))
        print(json.dumps(out))
        return

    tpu = measure_jax(args.batch, args.seq)
    cache = REPO / ".bench_baseline.json"
    data = json.loads(cache.read_text()) if cache.exists() else {}
    if "torch_cpu_train_docs_per_s" not in data:
        data["torch_cpu_train_docs_per_s"] = measure_torch(args.seq)
        cache.write_text(json.dumps(data))
    base = data["torch_cpu_train_docs_per_s"]
    print(json.dumps({
        "metric": "train_docs_per_s",
        "value": round(tpu, 2),
        "unit": "docs/s (fwd+bwd+adamw, bert-base S=%d, B=%d queries)" % (args.seq, args.batch),
        "vs_baseline": round(tpu / base, 2),
        "baseline_torch_cpu": round(base, 3),
    }))


if __name__ == "__main__":
    main()
