"""Train state, optimizers, and schedules (optax).

Capability parity with the reference's optimizer setups:

* Adam + CosineAnnealingWarmRestarts(T_0=10, T_mult=2) for the plain VAE
  (reference: scripts/train_vae.py:142-149).
* AdamW(weight_decay=1e-5) with a separate STN parameter group / learning
  rate and CosineAnnealingLR for the rVAE (reference:
  scripts/train_rvae.py:143-163), plus --freeze-stn
  (train_rvae.py:184-187).
* Linear beta-annealing with warmup (reference: train_vae.py:174-180,
  train_rvae.py:209-221).

Gradient clipping lives in the train step (so the pre/post-clip norm can
be logged the way the reference does), not in the optax chain.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

__all__ = [
    "TrainState",
    "cosine_annealing",
    "cosine_warm_restarts",
    "make_optimizer",
    "beta_at_epoch",
]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def cosine_annealing(lr: float, total_steps: int, eta_min: float = 0.0):
    """CosineAnnealingLR(T_max=total_steps) equivalent."""
    return optax.cosine_decay_schedule(lr, max(total_steps, 1), alpha=eta_min / lr if lr else 0.0)


def cosine_warm_restarts(
    lr: float, t0_steps: int, t_mult: int = 2, total_steps: int | None = None, eta_min: float = 0.0
):
    """CosineAnnealingWarmRestarts(T_0, T_mult) equivalent via joined cosines."""
    schedules = []
    boundaries = []
    t = max(t0_steps, 1)
    covered = 0
    alpha = eta_min / lr if lr else 0.0
    horizon = total_steps if total_steps is not None else t0_steps * 32
    while covered < horizon:
        schedules.append(optax.cosine_decay_schedule(lr, t, alpha=alpha))
        covered += t
        boundaries.append(covered)
        t *= t_mult
    return optax.join_schedules(schedules, boundaries[:-1])


def _is_stn_path(path) -> bool:
    return any(getattr(p, "key", None) == "rotation_stn" for p in path)


def make_optimizer(
    learning_rate,
    *,
    optimizer: str = "adam",
    weight_decay: float = 0.0,
    stn_learning_rate=None,
    freeze_stn: bool = False,
    params=None,
):
    """Build the optax transform, optionally with an STN param group.

    stn_learning_rate / freeze_stn require `params` (to derive the label
    tree), mirroring the reference's per-group construction
    (scripts/train_rvae.py:143-159, 184-187).
    """

    def base(lr):
        if optimizer == "adamw":
            return optax.adamw(lr, weight_decay=weight_decay)
        if optimizer == "adam":
            return optax.adam(lr)
        raise ValueError(f"Unknown optimizer: {optimizer}")

    if stn_learning_rate is None and not freeze_stn:
        return base(learning_rate)

    if params is None:
        raise ValueError("params required for STN param-group optimizers")

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "stn" if _is_stn_path(path) else "main", params
    )
    stn_tx = (
        optax.set_to_zero()
        if freeze_stn
        else base(stn_learning_rate if stn_learning_rate is not None else learning_rate)
    )
    return optax.multi_transform({"main": base(learning_rate), "stn": stn_tx}, labels)


def beta_at_epoch(
    epoch: int,
    beta: float,
    anneal: bool = False,
    warmup_epochs: int = 5,
    ramp_epochs: int = 15,
) -> float:
    """Reference beta-annealing: 0 during warmup, linear ramp, then beta.

    Reference: scripts/train_rvae.py:209-221.
    """
    if not anneal:
        return beta
    if epoch < warmup_epochs:
        return 0.0
    t = (epoch - warmup_epochs) / max(ramp_epochs, 1)
    return beta * min(1.0, t)
