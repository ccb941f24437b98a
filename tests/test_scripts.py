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
