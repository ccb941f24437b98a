#!/usr/bin/env python
"""Environment verification for the sweep harness.

Capability parity with the reference's root-level verify_raytune.py
(syntax compile, imports, data-file presence, directory checks, argparser
construction) adapted to the native TPU sweep engine.
"""

from __future__ import annotations

import py_compile
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

CHECKS: list[tuple[str, bool, str]] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    CHECKS.append((name, ok, detail))
    print(f"  [{'OK' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))


def main() -> int:
    print("1. Syntax compile of sweep scripts")
    for script in ("scripts/train_rvae_raytune.py", "scripts/train_rvae_with_best.py",
                   "scripts/analyze_raytune_results.py"):
        try:
            py_compile.compile(str(ROOT / script), doraise=True)
            check(f"compile {script}", True)
        except Exception as e:
            check(f"compile {script}", False, str(e))

    print("2. Imports")
    try:
        from livae_tpu.sweep import ASHAScheduler, PBTScheduler, run_search  # noqa

        check("livae_tpu.sweep imports", True)
    except Exception as e:
        check("livae_tpu.sweep imports", False, str(e))
    try:
        import ray  # noqa

        check("ray available (optional)", True)
    except ImportError:
        check("ray available (optional)", True, "absent; native engine will be used")

    print("3. Data")
    h5 = sorted((ROOT / "data").glob("*.h5")) if (ROOT / "data").exists() else []
    check(
        "h5 data or synthetic fallback",
        True,
        f"{len(h5)} files found" if h5 else "none found; use --synthetic N",
    )

    print("4. Directories")
    for d in ("checkpoints", "ray_results"):
        (ROOT / d).mkdir(exist_ok=True)
        check(f"{d}/ writable", (ROOT / d).is_dir())

    print("5. Argparser")
    try:
        import train_rvae_raytune

        parser = train_rvae_raytune.build_argparser()
        args = parser.parse_args(["--num-samples", "1", "--epochs", "1", "--synthetic", "1"])
        check("argparser builds and parses", args.num_samples == 1)
    except Exception as e:
        check("argparser builds and parses", False, str(e))

    failed = [c for c in CHECKS if not c[1]]
    print(f"\n{len(CHECKS) - len(failed)}/{len(CHECKS)} checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
