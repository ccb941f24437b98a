#!/usr/bin/env python
"""Compare standard training vs hyperparameter-search training.

Capability parity with the reference (reference:
scripts/compare_training_methods.py — comparison plots and a summary
table between a standard train_rvae run and a sweep's best trial). Reads
a standard-run checkpoint (for its best_val/args) and a sweep
results.json, and writes a side-by-side summary + bar plot.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_standard(ckpt_path: Path) -> dict | None:
    if not ckpt_path.exists():
        return None
    from livae_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(ckpt_path)
    return {
        "method": "standard",
        "val_loss": float(payload.get("best_val", float("nan"))),
        "epochs": int(payload.get("epoch", -1)) + 1,
        "config": {
            k: payload.get("args", {}).get(k)
            for k in ("lr", "latent_dim", "beta", "batch_size")
        },
    }


def load_sweep(results_dir: Path) -> dict | None:
    path = results_dir / "results.json"
    if not path.exists():
        return None
    trials = json.loads(path.read_text())
    ok = [t for t in trials if t.get("val_loss") is not None]
    if not ok:
        return None
    best = min(ok, key=lambda t: t["val_loss"])
    return {
        "method": "sweep (best trial)",
        "val_loss": best["val_loss"],
        "epochs": best["epochs"],
        "config": {
            k: best["config"].get(k)
            for k in ("lr", "latent_dim", "beta", "batch_size")
        },
        "n_trials": len(trials),
    }


def main():
    parser = argparse.ArgumentParser(description="Compare training methods")
    parser.add_argument("--checkpoint", type=str, default="checkpoints/rvae_best.pt")
    parser.add_argument("--results-dir", type=str, default="ray_results/rvae_tune")
    parser.add_argument("--out", type=str, default="plots/method_comparison.png")
    args = parser.parse_args()

    rows = []
    std = load_standard(Path(args.checkpoint))
    if std:
        rows.append(std)
    swp = load_sweep(Path(args.results_dir))
    if swp:
        rows.append(swp)

    if not rows:
        raise SystemExit("Nothing to compare: no checkpoint and no sweep results found")

    print(f"{'method':<22} {'val_loss':>10} {'epochs':>7}  config")
    print("-" * 78)
    for r in rows:
        cfg = ", ".join(f"{k}={v}" for k, v in r["config"].items() if v is not None)
        print(f"{r['method']:<22} {r['val_loss']:>10.4f} {r['epochs']:>7}  {cfg}")

    if len(rows) == 2 and all(np.isfinite(r["val_loss"]) for r in rows):
        better = min(rows, key=lambda r: r["val_loss"])
        delta = abs(rows[0]["val_loss"] - rows[1]["val_loss"])
        print(f"\n{better['method']} is better by {delta:.4f} val loss")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(5, 4))
    plt.bar(
        [r["method"] for r in rows],
        [r["val_loss"] for r in rows],
        color=["tab:blue", "tab:orange"][: len(rows)],
    )
    plt.ylabel("best val loss")
    plt.title("Standard vs sweep training")
    plt.tight_layout()
    plt.savefig(out, dpi=150)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
