#!/usr/bin/env bash
# Smoke test: 1 trial x 1 epoch on synthetic data (the reference's
# scripts/test_raytune.sh analog — a sweep integration test without a cluster).
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/train_rvae_raytune.py \
  --synthetic 1 --synthetic-size 512 \
  --patch-size 64 --padding 16 --batch-sizes 64 \
  --num-samples 1 --epochs 1 --scheduler none \
  --experiment-name smoke_test \
  --save-best-config /tmp/smoke_best_config.json
echo "Sweep smoke test passed"
