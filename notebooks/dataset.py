# %% [markdown]
# # Dataset walkthrough: detection, adaptive lattice, patch extraction
#
# Capability parity with the reference's notebooks/dataset.ipynb: build all
# three datasets at patch 128, visualize detected peaks and adaptive-lattice
# sites (atoms vs vacancies), and check padding sufficiency on extracted
# patches. jupytext py:percent format.

# %%
import sys
from pathlib import Path

# __file__ exists when run as a script; Jupyter kernels don't define it
_REPO = (
    Path(__file__).resolve().parent.parent
    if "__file__" in globals()
    else (Path.cwd().parent if Path.cwd().name == "notebooks" else Path.cwd())
)
sys.path.insert(0, str(_REPO))

import matplotlib.pyplot as plt
import numpy as np
import jax

from livae_tpu.data.datasets import (
    AdaptiveLatticeDataset,
    PairedAdaptiveLatticeDataset,
    PatchDataset,
)
from livae_tpu.data.synthetic import synthetic_mos2_frame

# %% Build a frame with known vacancies
frame, truth = synthetic_mos2_frame(
    size=1024, spacing=40.0, mo_vacancy_rate=0.04, s_amplitude=0.08, seed=3
)
print(f"{len(truth['mo_sites'])} Mo sites, {len(truth['mo_vacancies'])} Mo vacancies")

# %% All three dataset flavors at patch 128
patch_ds = PatchDataset([frame], patch_size=128, padding=4)
adaptive_ds = AdaptiveLatticeDataset([frame], patch_size=128, padding=32)
paired_ds = PairedAdaptiveLatticeDataset([frame], patch_size=128, padding=32)
print(f"PatchDataset: {len(patch_ds)} | Adaptive: {len(adaptive_ds)} | Paired: {len(paired_ds)}")

# %% Detected sites: atoms (red) vs vacancy sites (blue) on the filtered frame
img = adaptive_ds.images[0]
coords = adaptive_ds.sample_coords[0]
labels = adaptive_ds.labels[0]
plt.figure(figsize=(8, 8))
plt.imshow(img[:512, :512], cmap="gray")
view = (coords[:, 0] < 512) & (coords[:, 1] < 512)
a = coords[view & (labels == 1)]
v = coords[view & (labels == 0)]
plt.scatter(a[:, 1], a[:, 0], s=24, c="red", marker="o", alpha=0.7, label="atom")
plt.scatter(v[:, 1], v[:, 0], s=36, c="cyan", marker="x", label="vacancy site")
plt.legend()
plt.axis("off")
plt.savefig("notebooks/_adaptive_sites.png", dpi=120)

# %% A batch of augmented patches + a paired (patch, rotated, angle) triple
batch = adaptive_ds.sample_batch(jax.random.key(0), 8)
p, p_rot, angle = paired_ds.sample_batch(jax.random.key(1), 8)
fig, axes = plt.subplots(3, 8, figsize=(16, 6))
for i in range(8):
    axes[0, i].imshow(np.asarray(batch[i, :, :, 0]), cmap="gray")
    axes[1, i].imshow(np.asarray(p[i, :, :, 0]), cmap="gray")
    axes[2, i].imshow(np.asarray(p_rot[i, :, :, 0]), cmap="gray")
    axes[2, i].set_xlabel(f"{float(angle[i]):.2f} rad")
for ax in axes.ravel():
    ax.set_xticks([])
    ax.set_yticks([])
axes[0, 0].set_ylabel("augmented")
axes[1, 0].set_ylabel("paired: orig")
axes[2, 0].set_ylabel("paired: rotated")
plt.tight_layout()
plt.savefig("notebooks/_patches.png", dpi=120)

# %% Padding sufficiency: rotated patches must not show zero-fill corners
corners = np.asarray(p_rot)[:, :8, :8, 0].mean(axis=(1, 2))
print("rotated-patch corner means (should be > 0, no black corners):", corners.round(3))
print("saved notebooks/_adaptive_sites.png and notebooks/_patches.png")
