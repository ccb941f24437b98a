"""Reference-compatible checkpointing and weight conversion.

The reference persists checkpoints with torch.save as
{model_state, optimizer_state, epoch, best_val, args} (reference:
scripts/train_rvae.py:262-317, scripts/train_vae.py:211-227), an STN-only
form {"rotation_stn": state} (scripts/pretrain_stn.py:154-160), and strips
torch.compile's `_orig_mod.` prefixes on load via clean_state_dict
(src/livae/utils.py:188-196). Downstream viz scripts reconstruct models
from the saved `args` (scripts/visualizations.py:253-263).

This module preserves all of that: Flax NHWC parameter trees convert
losslessly to/from the reference's exact torch state-dict key layout —
including the NCHW->NHWC flatten-order permutation of every Linear that
touches a flattened conv feature map — so checkpoints written here load
into the PyTorch reference models (and vice versa) with bit-identical
forward passes. Files are written with torch.save so existing notebooks
can `torch.load` them unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

__all__ = [
    "clean_state_dict",
    "vae_spec",
    "rvae_spec",
    "params_to_torch_state",
    "torch_state_to_params",
    "save_checkpoint",
    "load_checkpoint",
    "save_reference_checkpoint",
    "load_reference_checkpoint",
]


def clean_state_dict(state_dict: dict) -> dict:
    """Strip `_orig_mod.` prefixes (torch.compile artifacts)."""
    return {k.replace("_orig_mod.", ""): v for k, v in state_dict.items()}


# ---------------------------------------------------------------------------
# Conversion specs: (flax_path, torch_key_prefix, kind, extra)
#
# kinds:
#   conv            Conv2d             torch [O, I, kh, kw]   <-> HWIO
#   convT           ConvTranspose2d    torch [I, O, kh, kw]   <-> HWIO
#   linear          Linear             torch [out, in]        <-> [in, out]
#   linear_flat_in  Linear after NCHW flatten; extra=(C, H, W) of input map
#   linear_flat_out Linear whose output reshapes to (C, H, W); extra=(C, H, W)
# ---------------------------------------------------------------------------

def vae_spec(patch_size: int, latent_dim: int) -> list[tuple]:
    s = patch_size // 16
    spec = []
    for i, conv_idx in enumerate((0, 2, 4, 6)):
        spec.append(
            (("encoder", f"conv{i}", "conv"), f"encoder.conv_layers.{conv_idx}", "conv", None)
        )
    spec.append((("encoder", "fc_mu", "dense"), "encoder.fc_mu", "linear_flat_in", (256, s, s)))
    spec.append(
        (("encoder", "fc_logvar", "dense"), "encoder.fc_logvar", "linear_flat_in", (256, s, s))
    )
    spec.append((("decoder", "fc", "dense"), "decoder.fc", "linear_flat_out", (256, s, s)))
    for i, conv_idx in enumerate((0, 2, 4, 6)):
        spec.append(
            (("decoder", f"deconv{i}"), f"decoder.deconv_layers.{conv_idx}", "convT", None)
        )
    return spec


def rvae_spec(patch_size: int, latent_dim: int) -> list[tuple]:
    s = patch_size // 16
    q = patch_size // 4
    spec = [
        (("encoder", "rotation_stn", "loc_conv0", "conv"), "encoder.rotation_stn.localization.0", "conv", None),
        (("encoder", "rotation_stn", "loc_conv1", "conv"), "encoder.rotation_stn.localization.3", "conv", None),
        (("encoder", "rotation_stn", "loc_fc0", "dense"), "encoder.rotation_stn.localization.7", "linear_flat_in", (32, q, q)),
        (("encoder", "rotation_stn", "loc_fc1"), "encoder.rotation_stn.localization.9", "linear", None),
    ]
    for i, conv_idx in enumerate((0, 2, 4, 6)):
        spec.append(
            (("encoder", f"conv{i}", "conv"), f"encoder.conv_layers.{conv_idx}", "conv", None)
        )
    spec.append((("encoder", "fc_mu", "dense"), "encoder.fc_mu", "linear_flat_in", (256, s, s)))
    spec.append(
        (("encoder", "fc_logvar", "dense"), "encoder.fc_logvar", "linear_flat_in", (256, s, s))
    )
    spec.append((("decoder", "fc", "dense"), "decoder.fc", "linear_flat_out", (256, s, s)))
    for i, conv_idx in enumerate((2, 6, 10, 14)):
        spec.append(
            (("decoder", f"up_conv{i}", "conv"), f"decoder.deconv_layers.{conv_idx}", "conv", None)
        )
    return spec


def stn_spec(patch_size: int) -> list[tuple]:
    """RotationSTN-only spec, rooted at the STN subtree.

    Produces the reference's pretrain_stn checkpoint layout
    {"rotation_stn": {"localization.N.weight"/".bias"}}
    (reference: scripts/pretrain_stn.py:154-160, loaded at
    scripts/train_rvae.py:172-182).
    """
    q = patch_size // 4
    return [
        (("loc_conv0", "conv"), "localization.0", "conv", None),
        (("loc_conv1", "conv"), "localization.3", "conv", None),
        (("loc_fc0", "dense"), "localization.7", "linear_flat_in", (32, q, q)),
        (("loc_fc1",), "localization.9", "linear", None),
    ]


def _get(tree: dict, path: tuple):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree: dict, path: tuple, leaf_name: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def _flax_to_torch(kind: str, extra, kernel: np.ndarray, bias: np.ndarray):
    if kind == "conv":
        return kernel.transpose(3, 2, 0, 1), bias  # HWIO -> OIHW
    if kind == "convT":
        return kernel.transpose(2, 3, 0, 1), bias  # HWIO -> IOHW
    if kind == "linear":
        return kernel.T, bias
    if kind == "linear_flat_in":
        C, H, W = extra
        out = kernel.shape[1]
        # flax kernel [H*W*C, out] -> torch [out, C*H*W]
        w = kernel.reshape(H, W, C, out).transpose(3, 2, 0, 1).reshape(out, C * H * W)
        return w, bias
    if kind == "linear_flat_out":
        C, H, W = extra
        inp = kernel.shape[0]
        # flax kernel [in, H*W*C] -> torch [C*H*W, in]
        w = kernel.reshape(inp, H, W, C).transpose(3, 1, 2, 0).reshape(C * H * W, inp)
        b = bias.reshape(H, W, C).transpose(2, 0, 1).reshape(-1)
        return w, b
    raise ValueError(kind)


def _torch_to_flax(kind: str, extra, weight: np.ndarray, bias: np.ndarray):
    if kind == "conv":
        return weight.transpose(2, 3, 1, 0), bias  # OIHW -> HWIO
    if kind == "convT":
        return weight.transpose(2, 3, 0, 1), bias  # IOHW -> HWIO
    if kind == "linear":
        return weight.T, bias
    if kind == "linear_flat_in":
        C, H, W = extra
        out = weight.shape[0]
        k = weight.reshape(out, C, H, W).transpose(2, 3, 1, 0).reshape(H * W * C, out)
        return k, bias
    if kind == "linear_flat_out":
        C, H, W = extra
        inp = weight.shape[1]
        k = weight.reshape(C, H, W, inp).transpose(1, 2, 0, 3).reshape(H * W * C, inp)
        b = bias.reshape(C, H, W).transpose(1, 2, 0).reshape(-1)
        return k.T, b
    raise ValueError(kind)


def params_to_torch_state(params: dict, spec: list[tuple]) -> dict[str, np.ndarray]:
    """Flax param tree -> reference torch state dict (numpy leaves)."""
    params = params.get("params", params)
    state: dict[str, np.ndarray] = {}
    for flax_path, torch_key, kind, extra in spec:
        node = _get(params, flax_path)
        kernel = np.asarray(node["kernel"], dtype=np.float32)
        bias = np.asarray(node["bias"], dtype=np.float32)
        w, b = _flax_to_torch(kind, extra, kernel, bias)
        state[f"{torch_key}.weight"] = w
        state[f"{torch_key}.bias"] = b
    return state


def torch_state_to_params(state: dict, spec: list[tuple]) -> dict:
    """Reference torch state dict -> flax param tree {'params': ...}."""
    state = clean_state_dict(state)
    tree: dict = {}
    for flax_path, torch_key, kind, extra in spec:
        weight = _to_numpy(state[f"{torch_key}.weight"])
        bias = _to_numpy(state[f"{torch_key}.bias"])
        k, b = _torch_to_flax(kind, extra, weight, bias)
        _set(tree, flax_path, "kernel", k)
        _set(tree, flax_path, "bias", b)
    return {"params": tree}


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _to_torch_tensors(obj: Any) -> Any:
    import torch

    if isinstance(obj, dict):
        return {k: _to_torch_tensors(v) for k, v in obj.items()}
    if isinstance(obj, np.ndarray):
        return torch.from_numpy(np.ascontiguousarray(obj).copy())
    if hasattr(obj, "dtype") and hasattr(obj, "shape"):  # jax array
        return torch.from_numpy(np.ascontiguousarray(np.asarray(obj)).copy())
    return obj


def save_checkpoint(path: str | Path, payload: dict) -> None:
    """Write a torch.load-compatible checkpoint file.

    Arrays (numpy or jax) become torch tensors; everything else is
    pickled as-is — matching the reference's torch.save layout.
    """
    import torch

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(_to_torch_tensors(payload), path)


def load_checkpoint(path: str | Path) -> dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def save_reference_checkpoint(
    path: str | Path,
    params: dict,
    spec: list[tuple],
    *,
    optimizer_state: Any = None,
    epoch: int = 0,
    best_val: float = float("inf"),
    args: dict | None = None,
    extra: dict | None = None,
) -> None:
    """Write the reference's {model_state, optimizer_state, epoch, best_val, args}."""
    payload = {
        "model_state": params_to_torch_state(params, spec),
        "optimizer_state": optimizer_state,
        "epoch": epoch,
        "best_val": best_val,
        "args": args or {},
    }
    if extra:
        payload.update(extra)
    save_checkpoint(path, payload)


def load_reference_checkpoint(path: str | Path, spec: list[tuple]) -> tuple[dict, dict]:
    """Read a reference-format checkpoint -> (flax params, full payload)."""
    payload = load_checkpoint(path)
    params = torch_state_to_params(payload["model_state"], spec)
    return params, payload
