#!/usr/bin/env bash
# Quickstart: 5-trial ASHA demo sweep (the reference's raytune_quickstart.sh analog).
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/train_rvae_raytune.py \
  --synthetic 1 --synthetic-size 1024 \
  --patch-size 128 --padding 32 --batch-sizes 256 \
  --num-samples 5 --epochs 6 --grace-period 2 --scheduler asha \
  --experiment-name quickstart
python scripts/analyze_raytune_results.py --results-dir ray_results/quickstart --plots
