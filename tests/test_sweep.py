"""Sweep engine tests: search space, ASHA early stopping, PBT exploit,
results.json artifacts, best-config retrieval."""

import json

import numpy as np
import pytest

from livae_tpu.sweep import (
    ASHAScheduler,
    PBTScheduler,
    choice,
    get_best_result,
    loguniform,
    run_search,
    sample_config,
    uniform,
)


class TestSearchSpace:
    def test_samplers(self):
        rng = np.random.default_rng(0)
        space = {
            "lr": loguniform(1e-5, 1e-2),
            "u": uniform(0.0, 1.0),
            "dim": choice([8, 16, 32]),
            "fixed": 42,
        }
        for _ in range(100):
            c = sample_config(space, rng)
            assert 1e-5 <= c["lr"] <= 1e-2
            assert 0.0 <= c["u"] <= 1.0
            assert c["dim"] in (8, 16, 32)
            assert c["fixed"] == 42

    def test_loguniform_is_log_spread(self):
        rng = np.random.default_rng(1)
        vals = [loguniform(1e-6, 1e-2).sample(rng) for _ in range(2000)]
        logs = np.log10(vals)
        assert -5.5 < np.median(logs) < -2.5  # roughly centered in log space


def quadratic_trainable(config, report):
    """Loss = (x - 3)^2 decaying over epochs; optimum x=3."""
    x = config["x"]
    for epoch in range(1, config["epochs"] + 1):
        loss = (x - 3.0) ** 2 + 10.0 / epoch
        report(epoch=epoch, loss=loss, val_loss=loss)


class TestRunSearch:
    def test_random_search_finds_good_x(self, tmp_path):
        trials = run_search(
            quadratic_trainable,
            {"x": uniform(0.0, 6.0), "epochs": 5},
            num_samples=20,
            results_dir=tmp_path,
            seed=0,
        )
        best = get_best_result(trials)
        assert abs(best.config["x"] - 3.0) < 1.0
        # artifacts written
        rows = json.loads((tmp_path / "results.json").read_text())
        assert len(rows) == 20
        assert all(r["status"] == "done" for r in rows)

    def test_asha_stops_bad_trials(self, tmp_path):
        sched = ASHAScheduler(metric="loss", max_t=20, grace_period=2, reduction_factor=2)
        trials = run_search(
            quadratic_trainable,
            {"x": uniform(0.0, 6.0), "epochs": 20},
            num_samples=12,
            scheduler=sched,
            results_dir=tmp_path,
            seed=1,
        )
        stopped = [t for t in trials if t.status == "stopped"]
        done = [t for t in trials if t.status == "done"]
        assert len(stopped) > 0, "ASHA should early-stop some trials"
        assert len(done) > 0, "ASHA should let good trials finish"
        # survivors are better than the stopped median
        best = get_best_result(trials)
        assert best.status == "done"

    def test_trial_errors_tolerated(self, tmp_path):
        def flaky(config, report):
            if config["x"] > 3:
                raise RuntimeError("boom")
            report(epoch=1, loss=config["x"])

        trials = run_search(
            flaky, {"x": choice([1, 2, 4, 5])}, num_samples=8,
            results_dir=tmp_path, seed=0,
        )
        assert any(t.status == "error" for t in trials)
        best = get_best_result(trials)
        assert best is not None and best.config["x"] <= 3

    def test_no_successful_trials(self, tmp_path):
        def always_fail(config, report):
            raise RuntimeError("nope")

        trials = run_search(always_fail, {"x": 1}, num_samples=3, results_dir=tmp_path)
        assert get_best_result(trials) is None


class TestPBT:
    def test_exploit_payload_reaches_trainable(self, tmp_path):
        sched = PBTScheduler(
            metric="loss", perturbation_interval=2,
            hyperparam_mutations={"lr": loguniform(1e-5, 1e-1)},
            quantile_fraction=0.5,
        )
        exploited = []

        def trainable(config, report):
            lr = config["lr"]
            for epoch in range(1, 7):
                loss = abs(np.log10(lr) + 3)  # optimum lr = 1e-3
                out = report(epoch=epoch, loss=loss, checkpoint=f"ckpt_lr{lr:.2g}")
                if out is not None:
                    exploited.append(out)
                    lr = out["config"]["lr"]

        run_search(
            trainable, {"lr": loguniform(1e-5, 1e-1)}, num_samples=6,
            scheduler=sched, results_dir=tmp_path, seed=0,
        )
        assert len(exploited) > 0, "PBT should trigger exploit for laggards"
        assert all("config" in e and "checkpoint" in e for e in exploited)
