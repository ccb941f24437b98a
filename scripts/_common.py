"""Shared CLI plumbing for the training scripts.

Data resolution mirrors the reference scripts (default data/*.h5, optional
--dataset-name path inside the files; reference scripts/train_rvae.py:27-65)
with one addition: because the reference repo's HAADF .h5 files are git-LFS
blobs missing from the snapshot, `--synthetic N` generates ground-truthed
synthetic MoS2 frames instead (livae_tpu.data.synthetic).
"""

from __future__ import annotations

import functools
import glob
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from livae_tpu.data.h5 import load_image_from_h5  # noqa: E402
from livae_tpu.data.synthetic import synthetic_mos2_frame  # noqa: E402


def maybe_force_cpu(args) -> None:
    """Honor --cpu by pinning the JAX CPU backend (before any device query).

    The reference's --cpu selects torch CPU; here it forces the XLA CPU
    backend — useful for smoke tests without claiming the single-client
    TPU tunnel. Must run before the first jax device lookup.
    """
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
        print("note: --cpu forces the XLA CPU backend")
    # NOTE: jax's persistent compilation cache was evaluated here and
    # removed: the tunneled TPU's 2-5 min first-jit warmup is server-side
    # (a warm on-disk cache saved <15%), and reloading cached CPU AOT
    # entries across host-feature variations spews loader errors.


def resolve_images(args) -> list[np.ndarray]:
    """Load frames from --data h5 paths, data/*.h5, or --synthetic."""
    if getattr(args, "synthetic", 0):
        size = getattr(args, "synthetic_size", 1024)
        kwargs = {}
        if getattr(args, "synthetic_vacancy_rate", None) is not None:
            kwargs["vacancy_rate"] = args.synthetic_vacancy_rate
        if getattr(args, "synthetic_s_amplitude", None) is not None:
            kwargs["s_amplitude"] = args.synthetic_s_amplitude
        print(f"Generating {args.synthetic} synthetic MoS2 frames ({size}x{size})...")
        return [
            synthetic_mos2_frame(size=size, spacing=40.0, seed=s, **kwargs)[0]
            for s in range(args.synthetic)
        ]
    paths = args.data if args.data else sorted(glob.glob("data/*.h5"))
    if not paths:
        raise SystemExit(
            "No input data: pass --data <files.h5> or --synthetic N "
            "(the reference's HAADF .h5 files are not shipped)"
        )
    print(f"Loading {len(paths)} HDF5 frames...")
    return [load_image_from_h5(p, getattr(args, "dataset_name", None)) for p in paths]


def add_data_flags(parser) -> None:
    parser.add_argument("--data", nargs="*", help="Paths to H5 files (default: data/*.h5)")
    parser.add_argument(
        "--dataset-name",
        type=str,
        default=None,
        help="Dataset path inside H5 file; auto-detects a 2D dataset if omitted",
    )
    parser.add_argument(
        "--synthetic",
        type=int,
        default=0,
        help="Generate N synthetic MoS2 frames instead of loading .h5 data",
    )
    parser.add_argument(
        "--synthetic-size", type=int, default=1024, help="Synthetic frame size"
    )
    parser.add_argument(
        "--synthetic-vacancy-rate", type=float, default=None,
        help="S-vacancy rate for synthetic frames (default: generator's 0.03; "
        "the BASELINE.md vacancy regime uses 0.12)",
    )
    parser.add_argument(
        "--synthetic-s-amplitude", type=float, default=None,
        help="S-site amplitude for synthetic frames (vacancy regime: 0.45)",
    )


@functools.lru_cache(maxsize=4)
def _vis_forward(model):
    """Jitted full forward for the TB visualization path (compiled once per
    model; the raw model.apply would dispatch op-by-op on the tunneled TPU)."""
    import jax

    @jax.jit
    def fwd(params, x, key):
        return model.apply(params, x, rngs={"sample": key})

    return fwd


def split_indices(n: int, val_split: float, seed: int = 0):
    """Deterministic train/val index split (reference uses random_split 10%)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_split))
    return perm[n_val:], perm[:n_val]


def batched(indices: np.ndarray, batch_size: int, drop_last: bool = True):
    n = len(indices)
    stop = n - (n % batch_size) if drop_last else n
    for i in range(0, max(stop, 0), batch_size):
        yield indices[i : i + batch_size]
    if not drop_last and stop < n:
        yield indices[stop:]
