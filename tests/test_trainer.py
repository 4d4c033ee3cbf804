"""Training loop tests: every objective takes a step and reduces loss;
checkpoint resume restores state; batches shard over an 8-device mesh."""

import numpy as np
import pytest

from improving_learned_index_tpu.core.config import EncoderConfig, TrainConfig
from improving_learned_index_tpu.models import DeepImpact, DeepImpactCrossEncoder
from improving_learned_index_tpu.parallel import make_mesh
from improving_learned_index_tpu.parallel.dataloader import BatchLoader
from improving_learned_index_tpu.train import COLLATES, Trainer
from improving_learned_index_tpu.core.config import MeshConfig


TRIPLES = [
    ("quick fox", "the quick brown fox jumps", "sleepy dog naps inside"),
    ("lazy dog", "the lazy dog sleeps here", "fast fox runs far away"),
    ("sparse index", "inverted indexes map terms postings", "the fox is quick"),
    ("neural text", "neural networks learn text", "dogs and foxes play"),
] * 4


def _model(tiny_tokenizer, cls=DeepImpact, act="relu"):
    cfg = EncoderConfig.tiny(vocab_size=len(tiny_tokenizer.vocab), impact_activation=act)
    return cls(cfg, tiny_tokenizer, seed=0)


def _batches(tokenizer, loss, batch_size=2, max_length=32):
    collate = COLLATES[loss]
    if loss in ("distil_kl", "distil_mse"):
        items = [
            (q, [(pos, 9.0), (neg, 1.0)]) for q, pos, neg in TRIPLES
        ]
    else:
        items = TRIPLES
    loader = BatchLoader(
        items,
        batch_size,
        lambda b: collate(b, tokenizer, max_length),
        shuffle=False,
    )
    return list(loader)


@pytest.mark.parametrize(
    "loss", ["pairwise_ce", "distil_kl", "distil_mse", "in_batch_negatives"]
)
def test_losses_train_and_decrease(tiny_tokenizer, tmp_path, loss):
    model = _model(tiny_tokenizer)
    cfg = TrainConfig(batch_size=2, lr=1e-3, save_every=1000, eval_every=10**9, loss=loss)
    trainer = Trainer(model, cfg, tmp_path / loss)
    batches = _batches(tiny_tokenizer, loss)
    first_loss = float(trainer._grad_step(trainer.params, trainer._put_batch(batches[0]))[0][0])
    trainer.train(batches, total_steps=8)
    last_loss = float(trainer._grad_step(trainer.params, trainer._put_batch(batches[0]))[0][0])
    assert np.isfinite(first_loss) and np.isfinite(last_loss)
    assert last_loss < first_loss  # it learned something


def test_cross_encoder_trains(tiny_tokenizer, tmp_path):
    model = _model(tiny_tokenizer, cls=DeepImpactCrossEncoder)
    cfg = TrainConfig(batch_size=2, lr=1e-3, save_every=1000, eval_every=10**9, loss="cross_encoder")
    trainer = Trainer(model, cfg, tmp_path)
    batches = _batches(tiny_tokenizer, "cross_encoder")
    avg = trainer.train(batches, total_steps=4)
    assert np.isfinite(avg)


def test_grad_accumulation_equivalence(tiny_tokenizer, tmp_path):
    """accum=2 over two identical microbatches == one step on that batch."""
    batches = _batches(tiny_tokenizer, "pairwise_ce")
    b = batches[0]

    m1 = _model(tiny_tokenizer)
    t1 = Trainer(m1, TrainConfig(batch_size=2, lr=1e-3, save_every=10**6, eval_every=10**9), tmp_path / "a")
    t1.train([b], total_steps=1)

    m2 = _model(tiny_tokenizer)
    t2 = Trainer(
        m2,
        TrainConfig(batch_size=2, lr=1e-3, save_every=10**6, eval_every=10**9, grad_accumulation_steps=2),
        tmp_path / "b",
    )
    t2.train([b, b], total_steps=2)

    import jax

    for a, c in zip(jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_checkpoint_resume_skips_batches(tiny_tokenizer, tmp_path):
    batches = _batches(tiny_tokenizer, "pairwise_ce")
    ckpt = tmp_path / "resume"

    # Train 3 steps, checkpointing every step.
    m1 = _model(tiny_tokenizer)
    cfg = TrainConfig(batch_size=2, lr=1e-3, save_every=1, eval_every=10**9)
    t1 = Trainer(m1, cfg, ckpt)
    t1.train(batches[:3], total_steps=3)
    step_after = t1.manager.step

    # Fresh trainer resumes from latest and skips the seen batches.
    m2 = _model(tiny_tokenizer)
    t2 = Trainer(m2, cfg, ckpt)
    skip = t2.maybe_resume()
    assert skip == step_after
    import jax

    for a, c in zip(jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c))
    # Continue training from there without error.
    t2.train(batches[:5], total_steps=2)
    assert t2.manager.step > step_after


def test_multi_device_data_parallel(tiny_tokenizer, tmp_path, cpu_devices):
    """Batch sharded over an 8-device data axis: same loss trajectory as
    single-device (the psum replaces DDP all-reduce)."""
    assert len(cpu_devices) == 8
    mesh = make_mesh(MeshConfig(data=8, model=1))
    batches = _batches(tiny_tokenizer, "pairwise_ce", batch_size=4)

    m1 = _model(tiny_tokenizer)
    t1 = Trainer(m1, TrainConfig(batch_size=4, lr=1e-3, save_every=10**6, eval_every=10**9), tmp_path / "s")
    m2 = _model(tiny_tokenizer)
    t2 = Trainer(
        m2,
        TrainConfig(batch_size=4, lr=1e-3, save_every=10**6, eval_every=10**9),
        tmp_path / "m",
        mesh=mesh,
    )
    # Same batch: sharded and unsharded losses and grads agree (up to bf16 +
    # reduction-order noise). Comparing raw grads, not params-after-Adam —
    # Adam's normalization amplifies numerical noise unboundedly.
    import jax

    b = batches[0]
    (l1, _), g1 = t1._grad_step(t1.params, t1._put_batch(b))
    (l2, _), g2 = t2._grad_step(t2.params, t2._put_batch(b))
    assert abs(float(l1) - float(l2)) < 1e-4
    for a, c in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-4, rtol=0.05)
    # And the sharded trainer actually trains.
    avg = t2.train(batches[:3], total_steps=3)
    assert np.isfinite(avg)


def test_grad_accum_trailing_flush_and_opt_step_count(tiny_tokenizer, tmp_path):
    """accum=2 over 3 batches: the trailing partial window is flushed (params
    move past the full-window point) and manager.step counts optimizer steps
    (2), not micro-batches (3)."""
    import jax

    batches = _batches(tiny_tokenizer, "pairwise_ce")[:3]
    cfg = dict(batch_size=2, lr=1e-3, save_every=10**6, eval_every=10**9,
               grad_accumulation_steps=2)

    m1 = _model(tiny_tokenizer)
    t1 = Trainer(m1, TrainConfig(**cfg), tmp_path / "flush")
    t1.train(batches, total_steps=3)
    assert t1.manager.step == 2  # one full window + one flushed partial

    m2 = _model(tiny_tokenizer)
    t2 = Trainer(m2, TrainConfig(**cfg), tmp_path / "noflush")
    t2.train(batches[:2], total_steps=2)  # the full window only
    assert t2.manager.step == 1

    pairs = zip(jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t2.params))
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in pairs)


def test_resume_with_accum_matches_unbroken_run(tiny_tokenizer, tmp_path):
    """Optimizer-step-counted resume under accum=2: split run (4 batches,
    checkpoint, resume, 2 more) matches the unbroken 6-batch run exactly."""
    import jax

    batches = _batches(tiny_tokenizer, "pairwise_ce")[:6]
    cfg = TrainConfig(batch_size=2, lr=1e-3, save_every=1, eval_every=10**9,
                      grad_accumulation_steps=2)

    m1 = _model(tiny_tokenizer)
    t1 = Trainer(m1, cfg, tmp_path / "unbroken")
    t1.train(batches)
    assert t1.manager.step == 3

    m2 = _model(tiny_tokenizer)
    t2 = Trainer(m2, cfg, tmp_path / "split")
    t2.train(batches[:4])

    m3 = _model(tiny_tokenizer)
    t3 = Trainer(m3, cfg, tmp_path / "split")
    skip = t3.maybe_resume()
    assert skip == 4  # 2 optimizer steps x accum 2 micro-batches
    t3.train(batches, skip=skip)
    assert t3.manager.step == 3

    for a, b in zip(jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_load_params_unwraps_manager_payload(tiny_tokenizer, tmp_path):
    """Trainer checkpoints ({'params','opt_state'}) must load via
    load_params(like=...) so train-CLI output feeds the index/rank CLIs
    (reference ModelCheckpoint.load unwraps model_state_dict)."""
    import jax
    import optax

    from improving_learned_index_tpu.core.checkpoint import CheckpointManager, load_params

    m = _model(tiny_tokenizer)
    mgr = CheckpointManager(tmp_path, name="DeepImpact", save_every=1)
    opt_state = optax.adam(1e-3).init(m.params)
    mgr.save("latest", m.params, opt_state)

    loaded = load_params(tmp_path / "DeepImpact_latest.msgpack", like=m.params)
    for a, b in zip(jax.tree_util.tree_leaves(m.params), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # like=None path unwraps too
    raw = load_params(tmp_path / "DeepImpact_latest.msgpack")
    assert "params" not in raw or "opt_state" not in raw  # bare params tree


def test_initialize_distributed_single_host(tmp_path):
    """parallel.mesh.initialize_distributed stands in for torchrun/NCCL
    process groups (SURVEY §2.7): a single-host coordination service comes
    up, process rank/count are visible, and a mesh builds over the forced
    CPU devices.  Runs in a subprocess because jax.distributed must
    initialize before the backend."""
    import os
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import os, sys
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        os.environ["JAX_PLATFORMS"] = "cpu"
        sys.path.insert(0, %r)
        from improving_learned_index_tpu.core.config import MeshConfig
        from improving_learned_index_tpu.parallel.mesh import (
            initialize_distributed, make_mesh)
        initialize_distributed("localhost:19731", num_processes=1, process_id=0)
        import jax
        jax.config.update("jax_platforms", "cpu")
        assert jax.process_count() == 1 and jax.process_index() == 0
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_mesh(MeshConfig(data=2, model=2))
        x = jax.device_put(jnp.arange(8.0), NamedSharding(mesh, P("data")))
        print("dist ok:", float(jnp.sum(x)), jax.device_count())
        """
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=240
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dist ok: 28.0 4" in proc.stdout


def test_eval_stall_seconds_logged(tiny_tokenizer, tmp_path):
    """Every in-training eval writes its wall-clock stall into metrics.txt
    (the operator's cadence dial: eval cost vs train progress)."""
    import json as _json

    class _Ev:
        def evaluate_all(self, model):
            return {"avg": ({"NDCG@10": 1.0},) * 4}

    model = _model(tiny_tokenizer)
    cfg = TrainConfig(batch_size=2, lr=1e-3, save_every=10**6, eval_every=2)
    trainer = Trainer(model, cfg, tmp_path, evaluator=_Ev())
    trainer.train(_batches(tiny_tokenizer, "pairwise_ce"), total_steps=4)
    records = [
        _json.loads(line)
        for line in (tmp_path / "metrics.txt").read_text().splitlines()
    ]
    evals = [r for r in records if "eval_stall_seconds" in r]
    assert evals and all(r["eval_stall_seconds"] >= 0 for r in evals)
