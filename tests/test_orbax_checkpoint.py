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


def _sharded_tree(mesh, spec_fn):
    """A param tree device_put with the given per-leaf PartitionSpec fn."""
    from jax.sharding import NamedSharding

    tree = {
        "wide": {"kernel": np.arange(64 * 16, dtype=np.float32).reshape(64, 16)},
        "emb": np.arange(128 * 8, dtype=np.float32).reshape(128, 8),
        "bias": np.arange(16, dtype=np.float32),
    }
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_fn(x))), tree
    )


def test_restore_across_mesh_shapes(tmp_path, cpu_devices):
    """Save under a (4,2) mesh with model-sharded leaves, restore under (8,1)
    and single-device meshes: tree equality everywhere (the TPU-pod resharding
    story — orbax restores to whatever sharding the template carries)."""
    from jax.sharding import PartitionSpec as P

    from improving_learned_index_tpu.core.config import MeshConfig
    from improving_learned_index_tpu.parallel.mesh import make_mesh

    def spec42(x):
        return P("model", None) if x.ndim == 2 else P()

    def spec81(x):
        return P("data", None) if x.ndim == 2 and x.shape[0] % 8 == 0 else P()

    mesh42 = make_mesh(MeshConfig(data=4, model=2))
    params = _sharded_tree(mesh42, spec42)
    mgr = OrbaxCheckpointManager(tmp_path, name="S", save_every=1, batch_size=4)
    mgr.on_step(params)
    mgr.wait()

    expected = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]

    # restore under an (8,1) mesh with a different sharding layout
    mesh81 = make_mesh(MeshConfig(data=8, model=1))
    like81 = _sharded_tree(mesh81, spec81)
    r81 = OrbaxCheckpointManager(tmp_path, name="S").load(like81)
    for exp, got in zip(expected, jax.tree_util.tree_leaves(r81["params"])):
        np.testing.assert_array_equal(exp, np.asarray(got))
        # restored arrays carry the new mesh's sharding
    shardings = [x.sharding for x in jax.tree_util.tree_leaves(r81["params"])]
    assert any(getattr(s, "mesh", None) is not None for s in shardings)

    # restore single-device (replicated template)
    like1 = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.zeros_like(np.asarray(x)), cpu_devices[0]),
        {"wide": {"kernel": np.zeros((64, 16), np.float32)},
         "emb": np.zeros((128, 8), np.float32),
         "bias": np.zeros(16, np.float32)},
    )
    r1 = OrbaxCheckpointManager(tmp_path, name="S").load(like1)
    for exp, got in zip(expected, jax.tree_util.tree_leaves(r1["params"])):
        np.testing.assert_array_equal(exp, np.asarray(got))
