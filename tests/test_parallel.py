"""Multi-chip data parallelism tests on the 8-device virtual CPU mesh.

The TPU-native analog of the reference's fake-backend testing (SURVEY.md
§4): the same pjit/Mesh code paths the driver dry-runs, validated without
TPU hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from livae_tpu.models.rvae import RVAE
from livae_tpu.models.vae import VAE
from livae_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_eval_step,
    shard_train_step,
)
from livae_tpu.train.engine import make_eval_step, make_rvae_train_step, make_train_step
from livae_tpu.train.state import TrainState, make_optimizer


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


P = 32
B = 16  # 2 per device


def test_mesh_creation(mesh):
    assert mesh.shape == {"data": 8}


def test_vae_data_parallel_step_matches_single_device(mesh):
    model = VAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adam")
    x = jnp.asarray(np.random.default_rng(0).random((B, P, P, 1), dtype=np.float32))
    key = jax.random.key(7)

    step = make_train_step(model, tx, grad_max_norm=5.0)

    # single-device result
    state1 = TrainState.create(params, tx)
    s1, m1 = step(state1, x, key, 1.0, 0.0)

    # sharded result
    pstep = shard_train_step(step, mesh, n_batch_args=1, donate_state=False)
    state2 = replicate(TrainState.create(params, tx), mesh)
    xs = shard_batch(x, mesh)
    s2, m2 = pstep(state2, xs, key, 1.0, 0.0)

    # identical math: global-mean loss => same grads => same params
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_rvae_paired_parallel_step(mesh):
    model = RVAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adamw", weight_decay=1e-5)
    step = make_rvae_train_step(model, tx, canonical_weight=0.2)
    pstep = shard_train_step(step, mesh, n_batch_args=3, donate_state=False)

    rng = np.random.default_rng(1)
    x = shard_batch(jnp.asarray(rng.random((B, P, P, 1), dtype=np.float32)), mesh)
    x_rot = shard_batch(jnp.asarray(rng.random((B, P, P, 1), dtype=np.float32)), mesh)
    angle = shard_batch(jnp.asarray(rng.uniform(0, 6.28, B).astype(np.float32)), mesh)
    state = replicate(TrainState.create(params, tx), mesh)

    new_state, metrics = pstep(state, x, x_rot, angle, jax.random.key(2), 10.0, 10.0)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params updated and still replicated
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, new_state.params
    )
    assert max(jax.tree.leaves(d)) > 0


def test_eval_step_sharded(mesh):
    model = VAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    estep = make_eval_step(model)
    pestep = shard_eval_step(estep, mesh, n_batch_args=1)
    x = shard_batch(
        jnp.asarray(np.random.default_rng(0).random((B, P, P, 1), dtype=np.float32)),
        mesh,
    )
    metrics = pestep(replicate(params, mesh), x, jax.random.key(1), 1.0, 0.0)
    assert np.isfinite(float(metrics["loss"]))


def test_mesh_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh(1024)
