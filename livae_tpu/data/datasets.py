"""Dataset classes: device-resident frame store + site tables + batch samplers.

Capability parity with the reference's three datasets (reference:
src/livae/data.py:151-735) with a TPU-native execution model:

* build time (host, once per frame): bandpass(20,100)+normalize
  preprocessing, lattice-constant estimation, peak detection, adaptive
  lattice extrapolation — identical algorithms to the reference, producing
  a flat site table (coords, labels, img_idx).
* run time (device, jitted): whole preprocessed frames live in HBM;
  `sample_batch` / `iter_epoch` extract+augment whole batches on device
  via livae_tpu.data.pipeline. `__len__`/`__getitem__` keep the
  reference's indexing API (including its linear global->local index
  mapping and IndexError contract, data.py:478-491) so existing host code
  ports directly.

`default_transform` is re-exported as the reference-compatible default
augmentation; it is a static `AugmentConfig`, not a host callable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.fft import host_bandpass_normalize
from ..ops.lattice import build_adaptive_lattice, estimate_lattice_constant
from ..ops.peaks import get_clean_peaks
from .pipeline import AugmentConfig, extract_batch, extract_batch_paired, pad_frames

__all__ = [
    "default_transform",
    "PatchDataset",
    "AdaptiveLatticeDataset",
    "PairedAdaptiveLatticeDataset",
]

# Reference default_transform: scale 0.9-1.1, flips p=0.5, jitter +-4,
# rotation off unless requested (src/livae/data.py:78-116).
default_transform = AugmentConfig()


class _SiteDatasetBase:
    """Shared frame preprocessing + site table + device batch machinery."""

    def __init__(self, images, patch_size, padding, transform):
        self.patch_size = int(patch_size)
        self.padding = int(padding)
        if transform is not None and not isinstance(transform, AugmentConfig):
            raise TypeError(
                "transform must be an AugmentConfig (e.g. default_transform) "
                "or None; arbitrary callables cannot run inside the jitted "
                "device pipeline"
            )
        self.transform = transform

        frames = []
        self.lattice_spacings: list[float] = []
        for img in images:
            filtered = host_bandpass_normalize(np.asarray(img), 20, 100)
            frames.append(filtered)
            self.lattice_spacings.append(estimate_lattice_constant(filtered))
        self.images = frames  # host copies (reference-compatible attribute)

        self._build_sites()

        shapes = {f.shape for f in frames}
        if len(shapes) != 1:
            raise ValueError(f"All frames must share a shape, got {shapes}")

        P2 = self.patch_size + 2 * self.padding
        roi = P2 + 16
        self._margin = roi // 2 + 8
        self.frames_padded = pad_frames(
            jnp.asarray(np.stack(frames), dtype=jnp.float32), self._margin
        )

        counts = [len(c) for c in self.sample_coords]
        self._counts = counts
        self._img_idx = np.concatenate(
            [np.full(n, i, dtype=np.int32) for i, n in enumerate(counts)]
        ) if counts else np.zeros(0, np.int32)
        self._coords_flat = (
            np.concatenate(self.sample_coords, axis=0).astype(np.float32)
            if counts
            else np.zeros((0, 2), np.float32)
        )
        self._img_idx_dev = jnp.asarray(self._img_idx)
        self._coords_dev = jnp.asarray(self._coords_flat)

    # --- site construction: overridden per dataset flavor ---
    def _build_sites(self):  # pragma: no cover
        raise NotImplementedError

    # --- reference-compatible indexing API ---
    def __len__(self) -> int:
        return int(sum(self._counts))

    def _locate(self, idx: int) -> int:
        if idx < 0 or idx >= len(self):
            raise IndexError(
                f"Index {idx} out of range for dataset of size {len(self)}"
            )
        return idx

    # --- device batch API ---
    def _extract(self, indices, key, cfg, normalize):
        return extract_batch(
            self.frames_padded,
            self._img_idx_dev[indices],
            self._coords_dev[indices],
            key,
            self.patch_size,
            self.padding,
            cfg=cfg,
            normalize=normalize,
            margin=self._margin,
        )

    _NORMALIZE = True

    def sample_batch(self, key: jax.Array, batch_size: int) -> jax.Array:
        """Uniformly sample an augmented device batch [B, P, P, 1]."""
        kidx, kaug = jax.random.split(key)
        indices = jax.random.randint(kidx, (batch_size,), 0, len(self))
        return self._extract(indices, kaug, self.transform, self._NORMALIZE)

    def batch_at(self, indices, key: jax.Array | None = None) -> jax.Array:
        """Extract specific sites; key=None -> no augmentation (encode path)."""
        indices = jnp.asarray(indices, dtype=jnp.int32)
        cfg = self.transform if key is not None else None
        return self._extract(indices, key, cfg, self._NORMALIZE)

    def iter_epoch(self, key: jax.Array, batch_size: int, drop_last: bool = True):
        """Shuffled epoch iterator of device batches (replaces DataLoader)."""
        n = len(self)
        kperm, kaug = jax.random.split(key)
        perm = jax.random.permutation(kperm, n)
        n_batches = n // batch_size if drop_last else -(-n // batch_size)
        for b in range(n_batches):
            chunk = perm[b * batch_size : (b + 1) * batch_size]
            if len(chunk) < batch_size and drop_last:
                break
            yield self.batch_at(chunk, jax.random.fold_in(kaug, b))

    def epoch_index_batches(self, key: jax.Array, batch_size: int) -> jax.Array:
        """[steps, batch_size] shuffled site indices for one epoch.

        Feeds the fused whole-epoch train step (extraction happens inside
        the jitted step; this is the only host-side epoch work).
        """
        n = len(self)
        steps = n // batch_size
        perm = jax.random.permutation(key, n)[: steps * batch_size]
        return perm.reshape(steps, batch_size).astype(jnp.int32)

    @property
    def device_site_table(self):
        """(frames_padded, img_idx, coords, margin) for fused train steps."""
        return self.frames_padded, self._img_idx_dev, self._coords_dev, self._margin

    def __getitem__(self, idx: int):
        idx = self._locate(int(idx))
        key = jax.random.key(np.random.randint(0, 2**31)) if self.transform else None
        batch = self.batch_at(jnp.asarray([idx]), key)
        return np.asarray(batch[0])


class AdaptiveLatticeDataset(_SiteDatasetBase):
    """Adaptive lattice sites (atoms + vacancies) with augmentation.

    Reference: src/livae/data.py:292-613. Defaults padding=48,
    detection_threshold=0.6. `normalize=False` skips the reference's
    per-patch min-max (src/livae/data.py:553-558) — the BASELINE.md
    accuracy-program ablation showed that normalization collapses vacancy
    clustering, so the no-norm recipe is first-class across the unpaired
    (encode/eval) path too, keeping train and encode distributions matched.
    """

    def __init__(
        self,
        images,
        patch_size: int,
        padding: int = 48,
        transform: AugmentConfig | None = default_transform,
        detection_threshold: float = 0.6,
        device_peaks: bool = False,
        normalize: bool = True,
    ):
        self.detection_threshold = detection_threshold
        self.device_peaks = device_peaks
        self._NORMALIZE = bool(normalize)
        super().__init__(images, patch_size, padding, transform)

    def _build_sites(self):
        self.sample_coords = []
        self.labels = []
        for img, spacing in zip(self.images, self.lattice_spacings):
            sites, labels, _ = build_adaptive_lattice(
                img,
                self.patch_size,
                self.padding,
                self.detection_threshold,
                lattice_spacing=spacing,
                device_peaks=self.device_peaks,
            )
            n_atoms = int((labels == 1).sum())
            print(
                f"Adaptive lattice: {len(sites)} unique sites - "
                f"{n_atoms} with atoms, {len(sites) - n_atoms} empty sites"
            )
            self.sample_coords.append(sites)
            self.labels.append(labels)


class PairedAdaptiveLatticeDataset(AdaptiveLatticeDataset):
    """(patch, rotated_patch, angle_rad) triplets for STN cycle training.

    Reference: src/livae/data.py:616-735. `normalize=False` skips the
    per-patch min-max (BASELINE.md accuracy-program ablation); the kwarg
    is inherited from AdaptiveLatticeDataset.
    """

    def sample_batch(self, key: jax.Array, batch_size: int):
        kidx, kaug = jax.random.split(key)
        indices = jax.random.randint(kidx, (batch_size,), 0, len(self))
        return self._extract_paired(indices, kaug)

    def batch_at(self, indices, key: jax.Array | None = None):
        indices = jnp.asarray(indices, dtype=jnp.int32)
        if key is None:
            key = jax.random.key(0)
        return self._extract_paired(indices, key)

    def _extract_paired(self, indices, key):
        return extract_batch_paired(
            self.frames_padded,
            self._img_idx_dev[indices],
            self._coords_dev[indices],
            key,
            self.patch_size,
            self.padding,
            cfg=self.transform,
            margin=self._margin,
            normalize=self._NORMALIZE,
        )

    def iter_epoch(self, key: jax.Array, batch_size: int, drop_last: bool = True):
        n = len(self)
        kperm, kaug = jax.random.split(key)
        perm = jax.random.permutation(kperm, n)
        n_batches = n // batch_size if drop_last else -(-n // batch_size)
        for b in range(n_batches):
            chunk = perm[b * batch_size : (b + 1) * batch_size]
            if len(chunk) < batch_size and drop_last:
                break
            yield self.batch_at(chunk, jax.random.fold_in(kaug, b))

    def __getitem__(self, idx: int):
        idx = self._locate(int(idx))
        key = jax.random.key(np.random.randint(0, 2**31))
        patch, rotated, angle = self.batch_at(jnp.asarray([idx]), key)
        return np.asarray(patch[0]), np.asarray(rotated[0]), float(angle[0])


class PatchDataset(_SiteDatasetBase):
    """Detected-atom patches with rotation augmentation, no per-patch norm.

    Reference: src/livae/data.py:151-250 (default padding=4; transform runs
    with rotation=True; images are pre-normalized so no per-patch min-max).
    """

    _NORMALIZE = False

    def __init__(
        self,
        images,
        patch_size: int,
        padding: int = 4,
        transform: AugmentConfig | None = default_transform,
    ):
        if isinstance(transform, AugmentConfig):
            transform = AugmentConfig(
                scale_min=transform.scale_min,
                scale_max=transform.scale_max,
                flip_prob=transform.flip_prob,
                jitter=transform.jitter,
                rotation=True,
            )
        super().__init__(images, patch_size, padding, transform)

    def plot_peaks(
        self,
        img_idx: int,
        size: int | None = None,
        offset: tuple[int, int] = (0, 0),
        save_path: str | None = None,
    ) -> None:
        """Plot detected atom positions overlaid on the (filtered) image.

        Debug visualization with the reference's semantics (reference:
        src/livae/data.py:252-289): optional square crop of `size` pixels
        at `offset` (y, x), detected peaks re-based into the crop, red
        scatter overlay, axes off. `save_path` writes a PNG instead of
        showing (headless-friendly addition).
        """
        import matplotlib

        if save_path is not None:
            matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        img = self.images[img_idx]
        coords = np.asarray(self.atom_coords[img_idx])
        if size is not None:
            y_off, x_off = offset
            img = img[y_off : y_off + size, x_off : x_off + size]
            keep = (
                (coords[:, 0] >= y_off)
                & (coords[:, 0] < y_off + size)
                & (coords[:, 1] >= x_off)
                & (coords[:, 1] < x_off + size)
            )
            coords = coords[keep] - np.array([y_off, x_off])
        plt.figure(figsize=(6, 6))
        plt.imshow(img, cmap="gray")
        if len(coords):
            plt.scatter(coords[:, 1], coords[:, 0], s=30, c="red", marker="o", alpha=0.8)
        plt.axis("off")
        if save_path is not None:
            plt.savefig(save_path, bbox_inches="tight", dpi=120)
            plt.close()
        else:
            plt.show()

    def _build_sites(self):
        self.sample_coords = []
        self.atom_coords = self.sample_coords  # reference-compatible alias
        for img, spacing in zip(self.images, self.lattice_spacings):
            coords = get_clean_peaks(img, min_distance=int(spacing * 0.15))
            half = self.patch_size // 2 + self.padding
            if len(coords):
                mask = (
                    (coords[:, 0] >= half)
                    & (coords[:, 0] <= img.shape[0] - half)
                    & (coords[:, 1] >= half)
                    & (coords[:, 1] <= img.shape[1] - half)
                )
                print(
                    f"Detected {len(coords)} atoms, {int(mask.sum())} after edge exclusion."
                )
                coords = coords[mask]
            self.sample_coords.append(np.asarray(coords, dtype=np.float64))
