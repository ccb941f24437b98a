# %% [markdown]
# # Explore HAADF-STEM data structure
#
# Notebook-style walkthrough (jupytext py:percent format — open directly in
# Jupyter or run as a script). Capability parity with the reference's
# notebooks/explore_data_structure.ipynb: inspect the HDF5 layout
# (`Measurement_000/Channel_000/HAADF/HAADF`, 2048x2048 frames), visualize a
# frame, its FFT spectrum, and the bandpass-filtered result.
#
# The reference's real .h5 files are git-LFS blobs absent from the snapshot,
# so this walkthrough synthesizes a ground-truthed MoS2 frame and writes it
# in the same HDF5 layout first.

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

import h5py
import matplotlib.pyplot as plt
import numpy as np

from livae_tpu.data.h5 import load_image_from_h5
from livae_tpu.data.synthetic import save_frame_h5, synthetic_mos2_frame
from livae_tpu.ops.fft import fft_spectra, host_bandpass_normalize

DATA = Path("data")
DATA.mkdir(exist_ok=True)

# %% Write a synthetic frame in the reference HDF5 layout (skip if real data exists)
paths = sorted(DATA.glob("*.h5"))
if not paths:
    frame, truth = synthetic_mos2_frame(size=2048, spacing=40.0, seed=0)
    save_frame_h5(DATA / "HAADF1.h5", frame)
    paths = [DATA / "HAADF1.h5"]
    print(f"Wrote synthetic frame with {len(truth['mo_sites'])} Mo sites")

# %% Walk the HDF5 tree (the reference data lives at Measurement_000/...)
with h5py.File(paths[0], "r") as f:
    f.visititems(lambda name, obj: print(name, getattr(obj, "shape", "")))

# %% Load and look at the raw frame
img = load_image_from_h5(paths[0])
print("frame:", img.shape, img.dtype, "range:", img.min(), img.max())
plt.figure(figsize=(6, 6))
plt.imshow(img[:512, :512], cmap="gray")
plt.title("Raw HAADF frame (512x512 crop)")
plt.axis("off")
plt.savefig("notebooks/_frame_raw.png", dpi=120)

# %% FFT magnitude spectrum — the lattice shows as a hexagonal ring of peaks
mag, _ = fft_spectra(img)
mag = np.asarray(mag)
c = img.shape[0] // 2
plt.figure(figsize=(6, 6))
plt.imshow(np.log1p(mag[c - 150 : c + 150, c - 150 : c + 150]), cmap="magma")
plt.title("log FFT magnitude (center)")
plt.axis("off")
plt.savefig("notebooks/_frame_fft.png", dpi=120)

# %% Bandpass(20, 100) + normalize: the preprocessing every dataset applies
filtered = host_bandpass_normalize(img, 20, 100)
plt.figure(figsize=(6, 6))
plt.imshow(filtered[:512, :512], cmap="gray")
plt.title("Bandpass(20,100) + normalized")
plt.axis("off")
plt.savefig("notebooks/_frame_filtered.png", dpi=120)
print("saved notebooks/_frame_{raw,fft,filtered}.png")
