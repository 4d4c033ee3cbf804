"""Orbax async checkpoint backend: save/load round trip, step rescale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

from improving_learned_index_tpu.core.orbax_checkpoint import OrbaxCheckpointManager


def _tree(seed):
    k = jax.random.PRNGKey(seed)
    return {
        "dense": {"kernel": jax.random.normal(k, (8, 4)), "bias": jnp.zeros(4)},
        "emb": jax.random.normal(k, (16, 8)),
    }


def test_save_load_roundtrip(tmp_path):
    mgr = OrbaxCheckpointManager(tmp_path, name="M", save_every=2, batch_size=4)
    params = _tree(0)
    opt = {"mu": _tree(1)}
    mgr.on_step(params, opt, metric=1.0)  # step 1: no save
    mgr.on_step(params, opt, metric=0.5)  # step 2: saves 2 + latest
    mgr.wait()
    assert mgr.exists()

    mgr2 = OrbaxCheckpointManager(tmp_path, name="M", save_every=2)
    restored = mgr2.load(_tree(9), {"mu": _tree(8)})
    assert restored["step"] == 2 and restored["batch_size"] == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(opt), jax.tree_util.tree_leaves(restored["opt_state"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # rescale: global batch 4 -> 8 halves the step
    assert mgr2.rescale_step_for_batch(8) == 1


def test_best_snapshot(tmp_path):
    mgr = OrbaxCheckpointManager(tmp_path, name="B", save_every=100, save_best=True)
    params = _tree(0)
    mgr.on_step(params, metric=2.0)
    mgr.on_step(params, metric=1.0)
    mgr.on_step(params, metric=3.0)
    mgr.wait()
    assert (tmp_path / "B_best").exists()
    assert mgr.best_metric == 1.0
