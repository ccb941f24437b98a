#!/usr/bin/env python
"""Test sweep-engine dependencies.

Capability parity with the reference dependency check (reference:
scripts/test_raytune_deps.py, which imports ray.tune + hyperopt and exits
0/1). The TPU framework sweeps with the native engine in livae_tpu.sweep,
so the equivalent check verifies those symbols import — and reports
whether Ray/hyperopt are additionally present (optional; the native
engine is used either way, see train_rvae_raytune.py).
"""

import sys


def main() -> int:
    try:
        from livae_tpu.sweep import (  # noqa: F401
            ASHAScheduler,
            PBTScheduler,
            TPESearcher,
            choice,
            get_best_result,
            loguniform,
            run_search,
        )

        print("OK: native sweep engine imports (livae_tpu.sweep)")
    except ImportError as e:
        print(f"FAIL: native sweep engine import error: {e}")
        print("Run from the repo root (or pip install -e .)")
        return 1

    for optional in ("ray", "hyperopt"):
        try:
            mod = __import__(optional)
            ver = getattr(mod, "__version__", "?")
            print(f"OK: optional {optional} present (version {ver})")
        except ImportError:
            print(f"note: optional {optional} not installed (native engine is used)")

    print("\nAll sweep dependencies are available.")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    sys.exit(main())
