"""Training/evaluation engine: jitted steps + host epoch loops.

Capability parity with the reference training engine (reference:
src/livae/train.py): the generic arity-dispatched train/eval loops
(train.py:33-278), the rVAE paired loops with cycle consistency and
canonical-frame loss (train.py:286-556), rotate_to_canonical
(train.py:670-677), MetricLogger (train.py:559-573), the rotation-
invariance evaluator (train.py:680-788), and the TensorBoard logging
helpers (train.py:791-936) — same metric names, same tag schema.

TPU-native execution model: each train/eval step is one jitted function
(forward + loss + grad + clip + optimizer update + all device-side
metrics). Per-batch metrics accumulate ON DEVICE into a single pytree;
the host reads back once per epoch, so an epoch is a stream of async
dispatches with a single sync point (critical given dispatch latency).

Two reference bugs are fixed, not replicated (SURVEY.md §7):
evaluate_rvae's last-batch-only averaging (train.py:521-541) and the
theta[0, 1] indexing in evaluate_rotation_invariance (train.py:753).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import rvae_loss, vae_loss
from ..metrics import latent_stats, psnr, ssim
from ..ops.resample import rotate_image_fast
from .state import TrainState

__all__ = [
    "MetricLogger",
    "metrics_to_host",
    "rotate_to_canonical",
    "make_train_step",
    "make_rvae_train_step",
    "make_fused_rvae_train_step",
    "make_fused_vae_train_step",
    "make_fused_encode",
    "make_fused_eval",
    "make_fused_rvae_eval",
    "make_eval_step",
    "make_rvae_eval_step",
    "train_one_epoch",
    "evaluate",
    "evaluate_fused",
    "train_rvae_one_epoch",
    "evaluate_rvae",
    "evaluate_rotation_invariance",
    "log_scalar_metrics_tensorboard",
    "log_reconstructions_tensorboard",
    "compute_psnr",
    "compute_ssim",
]

# Re-exported for reference API parity (train.py also exports these)
from ..metrics import compute_psnr, compute_ssim  # noqa: E402


class MetricLogger:
    """Dict-of-lists metric accumulator (reference train.py:559-573)."""

    def __init__(self):
        self.metrics = defaultdict(list)

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if hasattr(v, "item"):
                v = v.item()
            self.metrics[k].append(v)

    def get_averages(self) -> dict[str, Any]:
        return {k: float(np.mean(v)) for k, v in self.metrics.items()}

    def reset(self):
        self.metrics.clear()


def rotate_to_canonical(x: jax.Array, theta: jax.Array) -> jax.Array:
    """Rotate images to the canonical frame by the predicted angles.

    Reference: src/livae/train.py:670-677 (grid built from +theta,
    reflection padding) — the same operation the STN applies.
    """
    return rotate_image_fast(x, theta, padding_mode="reflection")


def _clip_by_global_norm(grads, max_norm):
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), jnp.minimum(gnorm, max_norm)


def _common_metrics(recon, x, mu, logvar, theta):
    ls = latent_stats(mu, logvar)
    m = {
        "psnr": psnr(recon, x),
        "ssim": ssim(recon, x),
        "latent_mean_abs": ls["latent_mean_abs"],
        "latent_std": ls["latent_std_mean"],
    }
    if theta is not None:
        m["rotation_std"] = jnp.std(theta, ddof=1)
    return m


def make_train_step(
    model,
    tx,
    *,
    beta_gamma_static: bool = False,
    use_diversity: bool = False,
    canonical_weight: float = 0.0,
    grad_max_norm: float = 5.0,
) -> Callable:
    """Generic arity-dispatched train step (VAE or rVAE on unpaired data).

    Mirrors reference train_one_epoch semantics (train.py:33-165): VAE
    uses VAELoss; a 5-output model trains with the same mean-reduced
    VAELoss on the rotated reconstruction (the Ray Tune trial path,
    reference train_rvae_raytune.py:140-161), with optional diversity
    rotation term when gamma > 0.

    Returns jitted step(state, x, key, beta, gamma) -> (state, metrics).
    """

    def loss_fn(params, x, key, beta, gamma):
        outputs = model.apply(params, x, rngs={"sample": key})
        if len(outputs) == 3:
            recon, mu, logvar = outputs
            total, rl, kl = vae_loss(recon, x, mu, logvar, beta=1.0)
            # beta is traced: recompose total with the traced weight
            total = rl + beta * kl
            aux = dict(recon=recon, canonical=None, theta=None, mu=mu, logvar=logvar,
                       rl=rl, kl=kl, cyc=jnp.asarray(0.0), canon_l=jnp.asarray(0.0))
        else:
            rotated_recon, canonical, theta, mu, logvar = outputs
            total, rl, kl = vae_loss(rotated_recon, x, mu, logvar, beta=1.0)
            total = rl + beta * kl
            cyc = jnp.asarray(0.0)
            if use_diversity:
                from ..losses import rotation_diversity_loss

                cyc = rotation_diversity_loss(theta)
                total = total + gamma * cyc
            canon_l = jnp.asarray(0.0)
            if canonical_weight > 0:
                canonical_input = rotate_to_canonical(x, theta)
                canon_l = jnp.mean((canonical - canonical_input) ** 2)
                total = total + canonical_weight * canon_l
            aux = dict(recon=rotated_recon, canonical=canonical, theta=theta, mu=mu,
                       logvar=logvar, rl=rl, kl=kl, cyc=cyc, canon_l=canon_l)
        return total, aux

    @jax.jit
    def step(state: TrainState, x, key, beta, gamma):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, key, beta, gamma
        )
        grads, gnorm = _clip_by_global_norm(grads, grad_max_norm)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)

        metrics = {
            "loss": total,
            "recon_loss": aux["rl"],
            "kld_loss": aux["kl"],
            "cycle_loss": aux["cyc"],
            "canonical_loss": aux["canon_l"],
            "grad_norm": gnorm,
        }
        metrics.update(_common_metrics(aux["recon"], x, aux["mu"], aux["logvar"], aux["theta"]))
        if aux["canonical"] is not None and canonical_weight > 0:
            canonical_input = rotate_to_canonical(x, aux["theta"])
            metrics["canonical_psnr"] = psnr(aux["canonical"], canonical_input)
            metrics["canonical_ssim"] = ssim(aux["canonical"], canonical_input)
        return new_state, metrics

    return step


def _rvae_paired_loss(model, params, x, x_rot, angle, key, beta, gamma,
                      use_diversity, canonical_weight):
    """The ONE paired rVAE objective body, shared by the per-batch step,
    the fused whole-epoch step, and the eval metrics.

    Mirrors reference train_rvae_one_epoch (train.py:286-445): full
    forward on x, a theta-only localization pass on x_rotated (the
    reference runs a full encoder forward there, train.py:347-351, but
    only theta is consumed — mu/logvar receive zero gradient),
    RVAELoss(beta, gamma) with cycle (or diversity) term, plus
    canonical_weight * MSE(canonical_recon, canonical_input). The
    canonical target is train_forward's 6th output — the STN's internal
    canonicalizing resample, i.e. rotate_to_canonical(x, theta) computed
    in the model's compute dtype (identical at float32; bf16-rounded
    under the mixed-precision policy, the reference-AMP analog —
    see models/rvae.py:train_forward).

    Returns (total, aux) with every term the callers' metrics need.
    """
    rotated_recon, canonical, theta, mu, logvar, canonical_input, theta_rot = (
        model.apply(
            params, x, x_rot, rngs={"sample": key}, method="train_forward_paired"
        )
    )
    total, rl, kl, cyc = rvae_loss(
        rotated_recon, x, mu, logvar, theta, theta_rot, angle,
        beta=1.0, gamma=1.0, use_diversity=use_diversity,
    )
    total = rl + beta * kl + gamma * cyc
    canon_l = jnp.mean((canonical - canonical_input) ** 2)
    if canonical_weight > 0:
        total = total + canonical_weight * canon_l
    aux = dict(recon=rotated_recon, canonical=canonical,
               canonical_input=canonical_input, theta=theta, mu=mu,
               logvar=logvar, rl=rl, kl=kl, cyc=cyc, canon_l=canon_l)
    return total, aux


def make_rvae_train_step(
    model,
    tx,
    *,
    use_diversity: bool = False,
    canonical_weight: float = 0.2,
    grad_max_norm: float = 20.0,
) -> Callable:
    """Paired rVAE train step (see _rvae_paired_loss for the objective).

    Returns jitted step(state, x, x_rot, angle, key, beta, gamma).
    """

    def loss_fn(params, x, x_rot, angle, key, beta, gamma):
        return _rvae_paired_loss(
            model, params, x, x_rot, angle, key, beta, gamma,
            use_diversity, canonical_weight,
        )

    @jax.jit
    def step(state: TrainState, x, x_rot, angle, key, beta, gamma):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, x_rot, angle, key, beta, gamma
        )
        grads, gnorm = _clip_by_global_norm(grads, grad_max_norm)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)

        metrics = {
            "loss": total,
            "recon_loss": aux["rl"],
            "kld_loss": aux["kl"],
            "cycle_loss": aux["cyc"],
            "canonical_loss": aux["canon_l"],
            "grad_norm": gnorm,
            "canonical_psnr": psnr(aux["canonical"], aux["canonical_input"]),
            "canonical_ssim": ssim(aux["canonical"], aux["canonical_input"]),
        }
        metrics.update(_common_metrics(aux["recon"], x, aux["mu"], aux["logvar"], aux["theta"]))
        return new_state, metrics

    return step


def _jit_fused(step_impl, mesh, *, donate_state: bool = True, state_out: bool = True):
    """jit a fused whole-epoch fn, optionally data-parallel over `mesh`.

    With a mesh, idx_batches[S, B] is sharded on its batch axis and GSPMD
    propagates that sharding through extraction and the model; everything
    else replicates (livae_tpu.parallel.mesh.fused_epoch_shardings).
    """
    donate = (0,) if donate_state else ()
    if mesh is None:
        return jax.jit(step_impl, donate_argnums=donate)
    from ..parallel.mesh import fused_epoch_shardings

    ins, outs = fused_epoch_shardings(mesh)
    if not state_out:
        outs = ins[1]  # metrics only: always replicated (ins[0] is None on a TP mesh)
    fn = jax.jit(step_impl, donate_argnums=donate, in_shardings=ins, out_shardings=outs)

    def place_idx_and_run(*args):
        # Explicitly place idx_batches on the mesh's data axis: under a
        # context mesh (jax.set_mesh, the 2-D TP path) freshly created
        # arrays are committed replicated, and jit raises on a committed
        # arg that mismatches in_shardings instead of resharding it.
        # device_put is a no-op when the sharding already matches.
        args = list(args)
        args[4] = jax.device_put(args[4], ins[4])
        return fn(*args)

    return place_idx_and_run


def make_fused_rvae_train_step(
    model,
    tx,
    *,
    patch_size: int,
    padding: int,
    cfg,
    margin: int,
    use_diversity: bool = False,
    canonical_weight: float = 0.2,
    grad_max_norm: float = 20.0,
    normalize: bool = True,
    mesh=None,
    return_impl: bool = False,
):
    """Whole-epoch fused rVAE training: extraction + N optimizer steps, one jit.

    The TPU-native replacement for the DataLoader+step split: patch
    extraction (livae_tpu.data.pipeline.extract_batch_paired) runs INSIDE
    the train step so XLA fuses it with the forward pass, and a fori_loop
    executes all `idx_batches` steps in a single dispatch (the tunneled
    device costs ~25 ms per dispatch; an epoch becomes one).

    With `mesh`, the step is data-parallel: the batch axis of idx_batches
    is sharded across the mesh and gradients all-reduce via GSPMD psum
    (the production multi-chip path; per-step math is identical to
    single-device because every loss reduction is a global batch mean).

    Returns jitted
        step(state, frames_padded, img_idx, coords, idx_batches[S, B],
             key, beta, gamma) -> (state, mean metrics)
    """
    from ..data.pipeline import _extract_batch_paired_impl as extract_batch_paired

    def loss_fn(params, x, x_rot, angle, key, beta, gamma):
        total, aux = _rvae_paired_loss(
            model, params, x, x_rot, angle, key, beta, gamma,
            use_diversity, canonical_weight,
        )
        theta_std = jnp.std(aux["theta"], ddof=1)
        return total, (aux["rl"], aux["kl"], aux["cyc"], aux["canon_l"], theta_std)

    metric_names = (
        "loss", "recon_loss", "kld_loss", "cycle_loss", "canonical_loss",
        "rotation_std", "grad_norm",
    )

    def step_impl(state, frames_padded, img_idx, coords, idx_batches, key, beta, gamma):
        n_sub = idx_batches.shape[0]

        def body(i, carry):
            state, acc = carry
            k = jax.random.fold_in(key, i)
            ke, ks = jax.random.split(k)
            idx = idx_batches[i]
            # the rotated copy feeds only the theta-localization pass, so
            # its rotation runs in the model's compute dtype (AMP analog)
            x, x_rot, angle = extract_batch_paired(
                frames_padded, img_idx[idx], coords[idx], ke,
                patch_size, padding, cfg=cfg, margin=margin, normalize=normalize,
                rot_dtype=getattr(model, "compute_dtype", None),
            )
            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x, x_rot, angle, ks, beta, gamma
            )
            grads, gnorm = _clip_by_global_norm(grads, grad_max_norm)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = state.replace(
                step=state.step + 1, params=params, opt_state=opt_state
            )
            vals = jnp.stack([total, *aux, gnorm])
            return state, acc + vals

        state, acc = jax.lax.fori_loop(
            0, n_sub, body, (state, jnp.zeros(len(metric_names)))
        )
        metrics = dict(zip(metric_names, acc / n_sub))
        return state, metrics

    if return_impl:
        # un-jitted body for composition (e.g. vmapped stacked trials,
        # livae_tpu.sweep.stacked); mesh semantics do not apply
        return step_impl
    return _jit_fused(step_impl, mesh)


def make_fused_vae_train_step(
    model,
    tx,
    *,
    patch_size: int,
    padding: int,
    cfg,
    margin: int,
    use_diversity: bool = False,
    grad_max_norm: float = 5.0,
    normalize: bool = True,
    mesh=None,
    return_impl: bool = False,
):
    """Whole-epoch fused generic training (unpaired batches, VAELoss).

    Same execution model as make_fused_rvae_train_step: extraction +
    optimizer steps in one dispatch, optionally data-parallel over `mesh`.
    Arity-dispatched like make_train_step (reference train.py:80-96): a
    3-output model is a plain VAE; a 5-output model (RVAE) trains with the
    same mean-reduced VAELoss on the rotated reconstruction — the Ray Tune
    trial path (reference train_rvae_raytune.py:140-161) — with an optional
    gamma-weighted rotation-diversity term.

    Returns jitted
    step(state, frames_padded, img_idx, coords, idx_batches, key, beta, gamma).
    """
    from ..data.pipeline import _extract_batch_impl as extract_batch

    def loss_fn(params, x, key, beta, gamma):
        outputs = model.apply(params, x, rngs={"sample": key})
        if len(outputs) == 3:
            recon, mu, logvar = outputs
            theta = None
        else:
            recon, _canonical, theta, mu, logvar = outputs
        total, rl, kl = vae_loss(recon, x, mu, logvar, beta=1.0)
        total = rl + beta * kl
        cyc = jnp.asarray(0.0)
        if use_diversity and theta is not None:
            from ..losses import rotation_diversity_loss

            cyc = rotation_diversity_loss(theta)
            total = total + gamma * cyc
        return total, (rl, kl, cyc)

    metric_names = ("loss", "recon_loss", "kld_loss", "cycle_loss", "grad_norm")

    def step_impl(state, frames_padded, img_idx, coords, idx_batches, key, beta, gamma):
        n_sub = idx_batches.shape[0]

        def body(i, carry):
            state, acc = carry
            k = jax.random.fold_in(key, i)
            ke, ks = jax.random.split(k)
            idx = idx_batches[i]
            x = extract_batch(
                frames_padded, img_idx[idx], coords[idx], ke,
                patch_size, padding, cfg=cfg, normalize=normalize, margin=margin,
            )
            (total, (rl, kl, cyc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x, ks, beta, gamma
            )
            grads, gnorm = _clip_by_global_norm(grads, grad_max_norm)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
            return state, acc + jnp.stack([total, rl, kl, cyc, gnorm])

        state, acc = jax.lax.fori_loop(
            0, n_sub, body, (state, jnp.zeros(len(metric_names)))
        )
        return state, dict(zip(metric_names, acc / n_sub))

    if return_impl:
        # un-jitted body for composition (e.g. vmapped stacked trials,
        # livae_tpu.sweep.stacked); mesh semantics do not apply
        return step_impl
    return _jit_fused(step_impl, mesh)


def make_fused_encode(
    model, *, patch_size: int, padding: int, margin: int, normalize: bool = True
):
    """Fused batched encode: extraction + encoder forward over [S, B] indices.

    One dispatch for an entire encode sweep (the analysis half of the
    train+encode metric; also the collect_stats hot path). No augmentation
    (the reference's transform=None encode path).

    Returns jitted encode(params, frames_padded, img_idx, coords,
    idx_batches[S, B]) -> (mu [S*B, D], logvar [S*B, D], theta [S*B, 1]|None).
    """
    from ..data.pipeline import _extract_batch_impl as extract_batch

    @jax.jit
    def encode(params, frames_padded, img_idx, coords, idx_batches):
        def body(i):
            idx = idx_batches[i]
            x = extract_batch(
                frames_padded, img_idx[idx], coords[idx], None,
                patch_size, padding, cfg=None, normalize=normalize, margin=margin,
            )
            out = model.apply(params, x, method="encode")
            if len(out) == 2:
                mu, logvar = out
                theta = jnp.zeros((mu.shape[0], 1), mu.dtype)
            else:
                mu, logvar, theta = out
            return mu, logvar, theta

        mus, logvars, thetas = jax.lax.map(body, jnp.arange(idx_batches.shape[0]))
        D = mus.shape[-1]
        return (
            mus.reshape(-1, D),
            logvars.reshape(-1, D),
            thetas.reshape(-1, 1),
        )

    return encode


def _generic_eval_metrics(model, params, x, key, beta, gamma, use_diversity,
                          canonical_weight):
    """Eval metric body shared by the per-batch and fused generic eval."""
    outputs = model.apply(params, x, rngs={"sample": key})
    if len(outputs) == 3:
        recon, mu, logvar = outputs
        theta = None
        canonical = None
    else:
        recon, canonical, theta, mu, logvar = outputs
    total, rl, kl = vae_loss(recon, x, mu, logvar, beta=1.0)
    total = rl + beta * kl
    cyc = jnp.asarray(0.0)
    if use_diversity and theta is not None:
        from ..losses import rotation_diversity_loss

        cyc = rotation_diversity_loss(theta)
        total = total + gamma * cyc
    metrics = {"loss": total, "recon_loss": rl, "kld_loss": kl, "cycle_loss": cyc}
    metrics.update(_common_metrics(recon, x, mu, logvar, theta))
    if canonical is not None and canonical_weight > 0:
        canonical_input = rotate_to_canonical(x, theta)
        metrics["canonical_psnr"] = psnr(canonical, canonical_input)
        metrics["canonical_ssim"] = ssim(canonical, canonical_input)
    return metrics


def _rvae_eval_metrics(model, params, x, x_rot, angle, key, beta, gamma,
                       use_diversity, canonical_weight):
    """Paired eval metric body shared by the per-batch and fused rVAE eval."""
    total, aux = _rvae_paired_loss(
        model, params, x, x_rot, angle, key, beta, gamma,
        use_diversity, canonical_weight,
    )
    metrics = {
        "loss": total,
        "recon_loss": aux["rl"],
        "kld_loss": aux["kl"],
        "cycle_loss": aux["cyc"],
        "canonical_loss": aux["canon_l"],
        "canonical_psnr": psnr(aux["canonical"], aux["canonical_input"]),
        "canonical_ssim": ssim(aux["canonical"], aux["canonical_input"]),
    }
    metrics.update(_common_metrics(aux["recon"], x, aux["mu"], aux["logvar"], aux["theta"]))
    return metrics


def make_eval_step(model, *, use_diversity: bool = False, canonical_weight: float = 0.0):
    """Generic eval step; mirrors reference evaluate (train.py:168-278)."""

    @jax.jit
    def step(params, x, key, beta, gamma):
        return _generic_eval_metrics(
            model, params, x, key, beta, gamma, use_diversity, canonical_weight
        )

    return step


def make_rvae_eval_step(model, *, use_diversity: bool = False, canonical_weight: float = 0.2):
    """Paired rVAE eval step; mirrors evaluate_rvae (train.py:448-556) with
    the per-batch averaging bug fixed (all batches count, not just the last).
    """

    @jax.jit
    def step(params, x, x_rot, angle, key, beta, gamma):
        return _rvae_eval_metrics(
            model, params, x, x_rot, angle, key, beta, gamma,
            use_diversity, canonical_weight,
        )

    return step


def make_fused_eval(
    model,
    *,
    patch_size: int,
    padding: int,
    margin: int,
    use_diversity: bool = False,
    canonical_weight: float = 0.0,
    normalize: bool = True,
    mesh=None,
    return_impl: bool = False,
):
    """Fused generic eval: extraction + eval metrics over [S, B] indices.

    One dispatch per val epoch (vs one per batch): the unpaired,
    un-augmented extraction (the reference's transform=None val path)
    runs inside the same jit as the metric computation; per-batch metric
    means come back stacked [S] for the host to average (equal weight per
    batch, the reference's MetricLogger convention).

    Returns jitted eval(params, frames_padded, img_idx, coords,
    idx_batches[S, B], key, beta, gamma) -> {name: [S] array}.
    """
    from ..data.pipeline import _extract_batch_impl as extract_batch

    def eval_impl(params, frames_padded, img_idx, coords, idx_batches, key, beta, gamma):
        def body(i):
            idx = idx_batches[i]
            x = extract_batch(
                frames_padded, img_idx[idx], coords[idx], None,
                patch_size, padding, cfg=None, normalize=normalize, margin=margin,
            )
            return _generic_eval_metrics(
                model, params, x, jax.random.fold_in(key, i), beta, gamma,
                use_diversity, canonical_weight,
            )

        return jax.lax.map(body, jnp.arange(idx_batches.shape[0]))

    if return_impl:
        return eval_impl  # un-jitted body (sweep.stacked)
    return _jit_fused(eval_impl, mesh, donate_state=False, state_out=False)


def make_fused_rvae_eval(
    model,
    *,
    patch_size: int,
    padding: int,
    cfg,
    margin: int,
    use_diversity: bool = False,
    canonical_weight: float = 0.2,
    normalize: bool = True,
    mesh=None,
    return_impl: bool = False,
):
    """Fused paired rVAE eval: paired extraction + eval metrics, one dispatch.

    Mirrors evaluate_rvae over the paired val set (extraction uses the
    dataset's transform, as the reference's val DataLoader does) with all
    batches averaged. Returns jitted eval(params, frames_padded, img_idx,
    coords, idx_batches[S, B], key, beta, gamma) -> {name: [S] array}.
    """
    from ..data.pipeline import _extract_batch_paired_impl as extract_batch_paired

    def eval_impl(params, frames_padded, img_idx, coords, idx_batches, key, beta, gamma):
        def body(i):
            k = jax.random.fold_in(key, i)
            ke, ks = jax.random.split(k)
            idx = idx_batches[i]
            x, x_rot, angle = extract_batch_paired(
                frames_padded, img_idx[idx], coords[idx], ke,
                patch_size, padding, cfg=cfg, margin=margin, normalize=normalize,
                rot_dtype=getattr(model, "compute_dtype", None),
            )
            return _rvae_eval_metrics(
                model, params, x, x_rot, angle, ks, beta, gamma,
                use_diversity, canonical_weight,
            )

        return jax.lax.map(body, jnp.arange(idx_batches.shape[0]))

    if return_impl:
        return eval_impl  # un-jitted body (sweep.stacked)
    return _jit_fused(eval_impl, mesh, donate_state=False, state_out=False)


def evaluate_fused(
    fused_eval: Callable,
    tail_eval: Callable,
    params,
    site_table,
    val_idx,
    batch_size: int,
    key: jax.Array,
    metric_logger: MetricLogger | None = None,
    beta: float = 1.0,
    gamma: float = 0.0,
    prefix: str = "val_",
) -> dict[str, float]:
    """Run a fused eval over ALL val sites (full batches + ragged tail).

    The tail batch (val size not divisible by batch_size) goes through
    `tail_eval` — the un-sharded fused eval — so every val site counts in
    the epoch metrics (the reference evaluates the full val loader; the
    round-1 build dropped the tail). Batches are equal-weighted, matching
    the reference's MetricLogger averaging.
    """
    frames_padded, img_idx, coords, _ = site_table
    val_idx = np.asarray(val_idx)
    n = len(val_idx)
    bs = min(batch_size, n)
    n_full = n // bs
    per_batch: list[dict] = []
    if n_full > 0:
        main = jnp.asarray(val_idx[: n_full * bs], jnp.int32).reshape(n_full, bs)
        per_batch.append(
            fused_eval(params, frames_padded, img_idx, coords, main, key, beta, gamma)
        )
    if n_full * bs < n:
        tail = jnp.asarray(val_idx[n_full * bs :], jnp.int32).reshape(1, -1)
        per_batch.append(
            tail_eval(
                params, frames_padded, img_idx, coords, tail,
                jax.random.fold_in(key, 0x7FFF), beta, gamma,
            )
        )
    sums: dict[str, float] = defaultdict(float)
    count = 0
    for d in per_batch:
        d = metrics_to_host(d)  # one transfer per fused-eval dict
        count += len(next(iter(d.values())))
        for k, v in d.items():
            sums[k] += float(np.sum(v))
    avg = {prefix + k: v / count for k, v in sums.items()}
    if metric_logger is not None:
        metric_logger.update(**avg)
    return avg


def metrics_to_host(metrics: dict) -> dict:
    """Read a whole device-metrics dict back in ONE host transfer.

    The tunneled TPU pays ~20 ms of latency per blocking host readback,
    so reading a 7-12 entry metrics dict one float() at a time costs
    150-250 ms PER EPOCH — comparable to the compute of several training
    batches. Values are ravel-and-concatenated on device (any mix of
    shapes within one float-castable dict works) so the whole dict is one
    round trip; each entry comes back as a host numpy array with its
    original shape (scalars as 0-d arrays; float() them freely).
    """
    names = list(metrics)
    if not names:
        return {}
    vals = [jnp.asarray(metrics[n], jnp.float32) for n in names]
    flat = np.asarray(jnp.concatenate([v.ravel() for v in vals]))
    out, off = {}, 0
    for n, v in zip(names, vals):
        out[n] = flat[off : off + v.size].reshape(v.shape)
        off += v.size
    return out


def _accumulate_epoch(metric_dicts: list[dict]) -> dict[str, float]:
    """Sum per-batch device metric dicts on device; one host readback."""
    if not metric_dicts:
        return {}
    acc = metric_dicts[0]
    for m in metric_dicts[1:]:
        acc = jax.tree_util.tree_map(jnp.add, acc, m)
    n = len(metric_dicts)
    acc = metrics_to_host(acc)
    return {k: float(v) / n for k, v in acc.items()}


def train_one_epoch(
    step_fn,
    state: TrainState,
    batches: Iterable,
    key: jax.Array,
    metric_logger: MetricLogger,
    beta: float = 1.0,
    gamma: float = 0.0,
    prefix: str = "train_",
) -> TrainState:
    """Generic epoch loop over unpaired batches (reference train.py:33-165)."""
    collected = []
    for i, x in enumerate(batches):
        if isinstance(x, (list, tuple)):
            x = x[0]
        state, metrics = step_fn(state, x, jax.random.fold_in(key, i), beta, gamma)
        collected.append(metrics)
    metric_logger.update(**{prefix + k: v for k, v in _accumulate_epoch(collected).items()})
    return state


def evaluate(
    eval_step_fn,
    params,
    batches: Iterable,
    key: jax.Array,
    metric_logger: MetricLogger,
    beta: float = 1.0,
    gamma: float = 0.0,
    prefix: str = "val_",
) -> dict[str, float]:
    """Generic eval loop (reference train.py:168-278); no param mutation."""
    collected = []
    for i, x in enumerate(batches):
        if isinstance(x, (list, tuple)):
            x = x[0]
        collected.append(eval_step_fn(params, x, jax.random.fold_in(key, i), beta, gamma))
    avg = _accumulate_epoch(collected)
    metric_logger.update(**{prefix + k: v for k, v in avg.items()})
    return {prefix + k: v for k, v in avg.items()}


def train_rvae_one_epoch(
    step_fn,
    state: TrainState,
    paired_batches: Iterable,
    key: jax.Array,
    metric_logger: MetricLogger,
    beta: float = 1.0,
    gamma: float = 0.0,
    prefix: str = "train_",
) -> TrainState:
    """Paired epoch loop (reference train.py:286-445)."""
    collected = []
    for i, (x, x_rot, angle) in enumerate(paired_batches):
        state, metrics = step_fn(
            state, x, x_rot, angle, jax.random.fold_in(key, i), beta, gamma
        )
        collected.append(metrics)
    metric_logger.update(**{prefix + k: v for k, v in _accumulate_epoch(collected).items()})
    return state


def evaluate_rvae(
    eval_step_fn,
    params,
    paired_batches: Iterable,
    key: jax.Array,
    metric_logger: MetricLogger,
    beta: float = 1.0,
    gamma: float = 0.0,
    prefix: str = "val_",
) -> dict[str, float]:
    """Paired eval loop; all batches averaged (reference bug fixed)."""
    collected = []
    for i, (x, x_rot, angle) in enumerate(paired_batches):
        collected.append(
            eval_step_fn(params, x, x_rot, angle, jax.random.fold_in(key, i), beta, gamma)
        )
    avg = _accumulate_epoch(collected)
    metric_logger.update(**{prefix + k: v for k, v in avg.items()})
    return {prefix + k: v for k, v in avg.items()}


def evaluate_rotation_invariance(
    model,
    params,
    images: jax.Array,
    angles: Iterable[float] = (0, 45, 90, 135, 180, 225, 270, 315),
    key: jax.Array | None = None,
) -> dict[str, float]:
    """Rotate probes through fixed angles; measure latent/recon invariance.

    Reference: src/livae/train.py:680-788, with the theta indexing bug
    fixed (theta is [B, 1]; the reference indexed it as [B, 2] at
    train.py:753).

    Returns latent_variance (mean variance of mu across angles),
    recon_rmse/psnr/ssim of un-rotated reconstructions vs the original,
    and mean absolute angle prediction error (radians, circular).
    """
    if key is None:
        key = jax.random.key(0)
    images = jnp.asarray(images)
    angles_rad = jnp.asarray([a * jnp.pi / 180.0 for a in angles], dtype=jnp.float32)

    @jax.jit
    def probe(params, images, a, k):
        """One angle: rotate -> forward -> un-rotate; compiled once, the
        angle is traced so all angles share the compilation. `images` is
        an explicit argument (a closed-over device array would be baked
        into the executable, forcing a D2H readback at lowering — which
        the tunneled TPU refuses — and a recompile per probe batch)."""
        angle_vec = jnp.full((images.shape[0],), a)
        rotated = rotate_image_fast(images, angle_vec, "reflection")
        rotated_recon, _recon, theta, mu, _logvar = model.apply(
            params, rotated, rngs={"sample": k}
        )
        unrotated = rotate_image_fast(rotated_recon, -angle_vec, "reflection")
        rmse = jnp.sqrt(jnp.mean((unrotated - images) ** 2))
        return mu, theta, rmse, psnr(unrotated, images), ssim(unrotated, images)

    mus, recon_errs, psnrs, ssims, angle_errs = [], [], [], [], []
    base_theta = None
    for i, a in enumerate(angles_rad):
        mu, theta, rmse, p, s = probe(params, images, a, jax.random.fold_in(key, i))
        mus.append(mu)
        recon_errs.append(rmse)
        psnrs.append(p)
        ssims.append(s)
        if base_theta is None:
            base_theta = theta
        else:
            # theta should decrease by the applied angle: theta_a ~ theta_0 - a
            diff = (theta - base_theta)[:, 0] + a
            angle_errs.append(jnp.mean(jnp.abs(jnp.arctan2(jnp.sin(diff), jnp.cos(diff)))))

    mus = jnp.stack(mus)  # [A, B, D]
    latent_variance = jnp.mean(jnp.var(mus, axis=0))
    return {
        "latent_variance": float(latent_variance),
        "recon_rmse": float(jnp.mean(jnp.stack(recon_errs))),
        "recon_psnr": float(jnp.mean(jnp.stack(psnrs))),
        "recon_ssim": float(jnp.mean(jnp.stack(ssims))),
        "angle_error": float(jnp.mean(jnp.stack(angle_errs))) if angle_errs else 0.0,
    }


# ---------------------------------------------------------------------------
# TensorBoard logging (same tag schema as the reference, train.py:791-936)
# ---------------------------------------------------------------------------

def _make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """torchvision.utils.make_grid equivalent for [N, H, W, 1] arrays -> [H', W']."""
    n, h, w = images.shape[0], images.shape[1], images.shape[2]
    ncol = min(nrow, n)
    nr = -(-n // ncol)
    grid = np.zeros((nr * (h + pad) + pad, ncol * (w + pad) + pad), dtype=np.float32)
    for i in range(n):
        r, c = divmod(i, ncol)
        y0, x0 = pad + r * (h + pad), pad + c * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = images[i, :, :, 0]
    return grid


def log_reconstructions_tensorboard(
    writer,
    x: jax.Array,
    recon: jax.Array,
    epoch: int,
    tag: str = "reconstructions",
    max_images: int = 8,
    canonical: jax.Array | None = None,
    canonical_input: jax.Array | None = None,
) -> None:
    """[original | reconstruction | abs diff] grids (+ canonical triplets).

    Reference: src/livae/train.py:791-853.
    """
    x = np.asarray(x[:max_images])
    recon = np.asarray(recon[:max_images])
    diff = np.abs(x - recon)
    grid = np.concatenate(
        [_make_grid(x, max_images), _make_grid(recon, max_images), _make_grid(diff, max_images)],
        axis=0,
    )
    writer.add_image(tag, grid[None, :, :], epoch)
    if canonical is not None and canonical_input is not None:
        c = np.asarray(canonical[:max_images])
        ci = np.asarray(canonical_input[:max_images])
        cgrid = np.concatenate(
            [_make_grid(ci, max_images), _make_grid(c, max_images),
             _make_grid(np.abs(ci - c), max_images)],
            axis=0,
        )
        writer.add_image(f"{tag}_canonical", cgrid[None, :, :], epoch)


def log_scalar_metrics_tensorboard(writer, metrics: dict[str, float], epoch: int) -> None:
    """train_x -> train/x, val_x -> val/x tags (reference train.py:928-936)."""
    for key, value in metrics.items():
        if key.startswith("train_"):
            writer.add_scalar(f"train/{key[6:]}", value, epoch)
        elif key.startswith("val_"):
            writer.add_scalar(f"val/{key[4:]}", value, epoch)
        else:
            writer.add_scalar(key, value, epoch)
