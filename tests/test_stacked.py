"""Vmapped stacked trials (livae_tpu.sweep.stacked).

Identity contract: a K-lane stacked step is the SAME experiment as K
sequential fused-step runs — per-lane lr/wd via injected optax
hyperparams, per-lane beta/gamma/keys/batches — just vmapped over a trial
axis. Pinned here in f32 at engine level; the sweep driver's grouping
and reporting semantics are pinned against a fake trainable.
"""

import json

import numpy as np
import optax
import pytest
import jax
import jax.numpy as jnp

from livae_tpu.data.pipeline import pad_frames
from livae_tpu.models.rvae import RVAE
from livae_tpu.sweep import choice, loguniform, run_search_stacked
from livae_tpu.sweep.stacked import (
    make_stacked_fns,
    set_stacked_hyperparams,
    stack_trees,
    unstack_tree,
)
from livae_tpu.train.engine import make_fused_eval, make_fused_vae_train_step
from livae_tpu.train.state import TrainState

P = 32
B = 16


@pytest.fixture(scope="module")
def site_table():
    padding = 8
    roi = P + 2 * padding + 16
    margin = roi // 2 + 8
    H = 4 * roi
    rng = np.random.default_rng(3)
    frames_padded = pad_frames(
        jnp.asarray(rng.random((1, H, H), dtype=np.float32)), margin
    )
    img_idx = jnp.zeros((64,), jnp.int32)
    coords = jnp.asarray(
        rng.uniform(roi // 2, H - roi // 2, (64, 2)).astype(np.float32)
    )
    return frames_padded, img_idx, coords, margin, padding


def test_stack_unstack_roundtrip():
    trees = [
        {"a": jnp.full((3,), float(i)), "b": jnp.full((2, 2), float(-i))}
        for i in range(4)
    ]
    stacked = stack_trees(trees)
    assert stacked["a"].shape == (4, 3)
    back = unstack_tree(stacked, 4)
    for t0, t1 in zip(trees, back):
        for k in t0:
            np.testing.assert_array_equal(np.asarray(t0[k]), np.asarray(t1[k]))


@pytest.mark.slow
def test_stacked_step_matches_sequential(site_table):
    """Two lanes with different lr/wd/beta/gamma/seeds, one stacked epoch
    == the same two runs through the plain jitted fused step."""
    from livae_tpu.data.pipeline import AugmentConfig  # noqa: F401

    frames_padded, img_idx, coords, margin, padding = site_table
    model = RVAE(latent_dim=4, patch_size=P)  # f32 for exact comparison
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=1e-3, weight_decay=1e-5
    )
    kwargs = dict(
        patch_size=P, padding=padding, cfg=None, margin=margin,
        grad_max_norm=20.0,
    )
    step = make_fused_vae_train_step(model, tx, **kwargs)
    step_impl = make_fused_vae_train_step(model, tx, **kwargs, return_impl=True)
    eval_impl = make_fused_eval(
        model, patch_size=P, padding=padding, margin=margin, return_impl=True
    )
    stacked_step, stacked_eval = make_stacked_fns(step_impl, eval_impl)

    lanes = [
        dict(seed=0, lr=1e-3, wd=1e-5, beta=1.0, gamma=0.0),
        dict(seed=1, lr=3e-4, wd=1e-4, beta=4.0, gamma=0.0),
    ]
    idx_batches = jnp.arange(2 * B, dtype=jnp.int32).reshape(2, B)

    def init_state(seed):
        k, ik, sk = jax.random.split(jax.random.key(seed), 3)
        params = model.init(
            {"params": ik, "sample": sk}, jnp.zeros((1, P, P, 1))
        )
        return k, TrainState.create(params, tx)

    # sequential reference runs
    seq_states, seq_metrics = [], []
    for lane in lanes:
        k, st = init_state(lane["seed"])
        hp = dict(st.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lane["lr"], jnp.float32)
        hp["weight_decay"] = jnp.asarray(lane["wd"], jnp.float32)
        st = st.replace(opt_state=st.opt_state._replace(hyperparams=hp))
        st, m = step(
            st, frames_padded, img_idx, coords, idx_batches,
            jax.random.fold_in(k, 7), lane["beta"], lane["gamma"],
        )
        seq_states.append(st)
        seq_metrics.append(m)

    # stacked run
    keys, states = [], []
    for lane in lanes:
        k, st = init_state(lane["seed"])
        keys.append(jax.random.fold_in(k, 7))
        states.append(st)
    state = stack_trees(states)
    state = set_stacked_hyperparams(
        state, [l["lr"] for l in lanes], [l["wd"] for l in lanes]
    )
    state, m = stacked_step(
        state, frames_padded, img_idx, coords,
        jnp.stack([idx_batches] * 2), jnp.stack(keys),
        jnp.asarray([l["beta"] for l in lanes], jnp.float32),
        jnp.asarray([l["gamma"] for l in lanes], jnp.float32),
    )

    for i, (seq_st, seq_m) in enumerate(zip(seq_states, seq_metrics)):
        np.testing.assert_allclose(
            float(seq_m["loss"]), float(np.asarray(m["loss"])[i]), rtol=1e-5
        )
        lane_params = unstack_tree(state.params, 2)[i]
        for a, b in zip(jax.tree.leaves(seq_st.params), jax.tree.leaves(lane_params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )

    # stacked eval returns per-lane [S] metric rows
    ev = stacked_eval(
        state.params, frames_padded, img_idx, coords,
        jnp.stack([idx_batches] * 2), jnp.stack(keys),
        jnp.asarray([1.0, 4.0], jnp.float32), jnp.zeros(2, jnp.float32),
    )
    assert np.asarray(ev["loss"]).shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(ev["loss"])))


def test_run_search_stacked_grouping(tmp_path):
    """Configs group by structural signature; every trial reports, gets a
    status, lands in results.json; observations feed later rounds."""
    calls = []

    def fake_stacked_trainable(configs, report):
        calls.append(configs)
        assert len({c["latent_dim"] for c in configs}) == 1, (
            "stack must be structurally homogeneous"
        )
        for lane, cfg in enumerate(configs):
            for epoch in (1, 2):
                report(lane, epoch, loss=cfg["lr"] * epoch, val_loss=cfg["lr"])

    trials = run_search_stacked(
        fake_stacked_trainable,
        {"lr": loguniform(1e-5, 1e-2), "latent_dim": choice([4, 8])},
        num_samples=6,
        stack_size=3,
        results_dir=tmp_path,
        seed=0,
        search_alg="random",
    )
    assert len(trials) == 6
    assert all(t.status == "done" for t in trials)
    assert all(len(t.history) == 2 for t in trials)
    assert sum(len(c) for c in calls) == 6
    results = json.loads((tmp_path / "results.json").read_text())
    assert len(results) == 6


def test_run_search_stacked_tolerates_group_failure(tmp_path):
    def exploding(configs, report):
        raise RuntimeError("boom")

    trials = run_search_stacked(
        exploding,
        {"lr": loguniform(1e-5, 1e-2)},
        num_samples=2,
        stack_size=2,
        results_dir=tmp_path,
        seed=0,
        search_alg="random",
    )
    assert len(trials) == 2
    assert all(t.status == "error" and "boom" in t.error for t in trials)
