#!/usr/bin/env bash
# Full test-suite runner with the timing structure this repo needs.
#
# The fast selection (-m "not slow") gates in ~5 min. The slow set (torch
# differential suites, 8-device mesh compiles, end-to-end script smokes)
# needs ~14 min and is split into two halves so each stays under a 10-min
# CI step timeout. Everything runs on the CPU backend (tests/conftest.py
# pins it), so this never claims the single-client TPU tunnel.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== fast selection ==="
python -m pytest tests/ -m "not slow" -q

echo "=== slow half 1 (parity + parallel + engine) ==="
python -m pytest tests/test_elbo_parity.py tests/test_parallel.py tests/test_train.py -m slow -q

echo "=== slow half 2 (data + scripts + sweep) ==="
python -m pytest tests/test_data.py tests/test_scripts.py tests/test_sweep.py tests/test_stacked.py -m slow -q

echo "=== 8-device multichip dryrun ==="
python __graft_entry__.py 8
