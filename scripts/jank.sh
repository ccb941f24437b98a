#!/usr/bin/env bash
# Batch-queue wrapper for the sweep (the reference's SLURM jank.sh analog,
# reference scripts/jank.sh: sbatch + nix develop; here: a plain TPU-VM/SLURM
# submission stub — adapt the scheduler directives to your cluster).
#SBATCH --job-name=livae-sweep
#SBATCH --partition=tpu
#SBATCH --time=12:00:00
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/train_rvae_raytune.py "$@"
