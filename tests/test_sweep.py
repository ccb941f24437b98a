"""Sweep engine tests: search space, ASHA early stopping, PBT exploit,
results.json artifacts, best-config retrieval, concurrent executors,
live-population PBT, and the native TPE searcher."""

import itertools
import json
import math
import os
import threading
import time

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
from livae_tpu.sweep.search import TPESearcher


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


class TestConcurrency:
    def test_concurrent_trials_overlap(self, tmp_path):
        """Two trials must be in flight simultaneously: each waits on a
        2-party barrier that only releases if both run at once."""
        barrier = threading.Barrier(2, timeout=30)

        def trainable(config, report):
            barrier.wait()
            report(epoch=1, loss=config["x"])

        trials = run_search(
            trainable, {"x": uniform(0.0, 1.0)}, num_samples=2,
            results_dir=tmp_path, max_concurrent=2,
        )
        assert all(t.status == "done" for t in trials)

    def test_pbt_exploits_live_peer(self, tmp_path):
        """A lagging trial must exploit a donor that is STILL RUNNING
        (the population-based dynamics sequential execution cannot give)."""
        counter = itertools.count()
        lock = threading.Lock()
        finished: set[int] = set()
        n_good_reports = [0]
        goods_reported = threading.Event()
        got = []

        def trainable(config, report):
            my = next(counter)
            if my < 2:  # two good, slow trials
                for epoch in range(1, 8):
                    report(epoch=epoch, loss=0.1, checkpoint=f"ck{my}")
                    with lock:
                        n_good_reports[0] += 1
                        if n_good_reports[0] >= 2:
                            goods_reported.set()
                    time.sleep(0.02)
                with lock:
                    finished.add(my)
            else:  # the laggard: report once both donors have metrics
                assert goods_reported.wait(timeout=10)
                out = report(epoch=1, loss=10.0, checkpoint="ck_bad")
                with lock:
                    got.append((set(finished), out))

        sched = PBTScheduler(
            metric="loss", perturbation_interval=1,
            hyperparam_mutations={"lr": loguniform(1e-5, 1e-1)},
            quantile_fraction=0.34,
        )
        run_search(
            trainable, {"lr": loguniform(1e-5, 1e-1)}, num_samples=3,
            scheduler=sched, results_dir=tmp_path, max_concurrent=3, seed=0,
        )
        assert got, "laggard never reported"
        finished_at_exploit, payload = got[0]
        assert isinstance(payload, dict), "laggard should receive an exploit payload"
        assert payload["checkpoint"] in ("ck0", "ck1")
        assert len(finished_at_exploit) < 2, (
            "exploit must come from a live population (a donor still running)"
        )

    @pytest.mark.slow
    def test_process_executor_pins_env_per_slot(self, tmp_path):
        trials = run_search(
            _proc_trainable, {"x": uniform(0.0, 1.0)}, num_samples=3,
            results_dir=tmp_path, max_concurrent=2, executor="process",
            trial_env=lambda slot: {"SWEEP_SLOT": str(slot)},
        )
        assert all(t.status == "done" for t in trials)
        pids = {t.last("pid") for t in trials}
        assert len(pids) >= 2, "trials should run in separate processes"
        slots = {t.last("slot") for t in trials}
        assert slots == {"0", "1"}, f"both env-pinned slots should be used: {slots}"
        assert os.environ.get("SWEEP_SLOT") is None, "pinning must not leak to parent"
        # the executor exports a deterministic trial id (not the pid) so
        # child seeds/checkpoint names reproduce across runs
        env_ids = {t.last("env_trial_id") for t in trials}
        assert env_ids == {"0", "1", "2"}, env_ids


def _proc_trainable(config, report):
    """Module-level trial fn for the spawn-based process executor."""
    report(
        epoch=1, loss=config["x"], pid=os.getpid(),
        slot=os.environ.get("SWEEP_SLOT", ""),
        env_trial_id=os.environ.get("LIVAE_TRIAL_ID", ""),
    )


class TestTPE:
    def test_tpe_suggest_concentrates_near_optimum(self):
        space = {"lr": loguniform(1e-6, 1.0)}
        tpe = TPESearcher(space, seed=0, n_startup=8)
        obs = []
        for i in range(40):
            cfg = tpe.suggest(obs)
            loss = (math.log10(cfg["lr"]) + 3.0) ** 2  # optimum lr = 1e-3
            obs.append((cfg, loss))
        early = [abs(math.log10(c["lr"]) + 3.0) for c, _ in obs[:8]]
        late = [abs(math.log10(c["lr"]) + 3.0) for c, _ in obs[-10:]]
        assert np.mean(late) < np.mean(early), "TPE should concentrate sampling"

    def test_tpe_beats_random_on_toy_objective(self, tmp_path):
        def trainable(config, report):
            report(epoch=1, loss=(math.log10(config["lr"]) + 3.0) ** 2)

        space = {"lr": loguniform(1e-6, 1.0)}

        def best_of(alg, seed):
            trials = run_search(
                trainable, space, num_samples=30,
                results_dir=tmp_path / f"{alg}_{seed}", seed=seed, search_alg=alg,
            )
            return get_best_result(trials).best("loss", "min")

        seeds = (0, 1, 2)
        tpe = np.mean([best_of("tpe", s) for s in seeds])
        rnd = np.mean([best_of("random", s) for s in seeds])
        assert tpe < rnd, f"TPE ({tpe:.4f}) should beat random ({rnd:.4f})"

    def test_tpe_handles_choice_params(self):
        space = {"dim": choice([8, 16, 32]), "lr": loguniform(1e-5, 1e-1)}
        tpe = TPESearcher(space, seed=1, n_startup=5)
        obs = []
        for _ in range(30):
            cfg = tpe.suggest(obs)
            assert cfg["dim"] in (8, 16, 32)
            loss = 0.0 if cfg["dim"] == 16 else 1.0  # 16 is best
            obs.append((cfg, loss))
        late_dims = [tpe.suggest(obs)["dim"] for _ in range(10)]
        assert late_dims.count(16) >= 6, "TPE should favor the winning category"
