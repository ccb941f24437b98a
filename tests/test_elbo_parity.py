"""End-to-end ELBO parity: jax vs the PyTorch reference, same weights/batch.

The BASELINE target is "ELBO within 1% of the PyTorch reference". These
tests go further than output parity: with identical weights, identical
input batch, and identical reparameterization noise, the full rVAE
training objective (RVAELoss + canonical term) and its parameter gradients
must match across frameworks through the exact resampler path.
"""

import importlib.util

import pytest

# full torch differential suite: heavyweight, excluded from the fast gate
pytestmark = pytest.mark.slow

import numpy as np
import torch

import jax
import jax.numpy as jnp

from livae_tpu.losses import rvae_loss, vae_loss
from livae_tpu.models.rvae import RVAE
from livae_tpu.models.vae import VAE
from livae_tpu.utils.checkpoint import rvae_spec, torch_state_to_params, vae_spec

P, L, B = 32, 8, 8


@pytest.fixture(scope="module")
def ref():
    mods = {}
    for name in ("model", "loss"):
        spec = importlib.util.spec_from_file_location(
            f"ref_{name}", f"/root/reference/src/livae/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def make_batch(rng):
    x = rng.random((B, P, P, 1)).astype(np.float32)
    eps = rng.standard_normal((B, L)).astype(np.float32)
    return x, eps


def torch_in(x_nhwc):
    arr = np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2))
    return torch.empty(arr.shape, dtype=torch.float32).copy_(torch.from_numpy(arr))


class TestVAEElboParity:
    def test_loss_within_tolerance(self, ref, rng):
        torch.manual_seed(0)
        tmodel = ref["model"].VAE(latent_dim=L, patch_size=P).eval()
        params = torch_state_to_params(tmodel.state_dict(), vae_spec(P, L))
        jmodel = VAE(latent_dim=L, patch_size=P)
        x, eps = make_batch(rng)

        # jax ELBO with fixed noise
        mu, logvar = jmodel.apply(params, jnp.asarray(x), method="encode")
        z = mu + jnp.asarray(eps) * jnp.exp(0.5 * logvar)
        recon = jmodel.apply(params, z, method="decode")
        j_total, j_rl, j_kl = vae_loss(recon, jnp.asarray(x), mu, logvar, beta=1.0)

        # torch ELBO with the same noise
        xt = torch_in(x)
        with torch.no_grad():
            tmu, tlogvar = tmodel.encoder(xt)
            tz = tmu + torch.from_numpy(eps) * torch.exp(0.5 * tlogvar)
            trecon = tmodel.decoder(tz)
        crit = ref["loss"].VAELoss(beta=1.0)
        t_total, t_rl, t_kl = crit(trecon, xt, tmu, tlogvar)

        assert abs(float(j_total) - float(t_total)) / abs(float(t_total)) < 0.01
        np.testing.assert_allclose(float(j_rl), float(t_rl), rtol=1e-3)
        np.testing.assert_allclose(float(j_kl), float(t_kl), rtol=1e-3, atol=1e-6)


class TestRVAEElboParity:
    def test_full_objective_and_gradients(self, ref, rng):
        torch.manual_seed(1)
        tmodel = ref["model"].RVAE(latent_dim=L, patch_size=P)
        params = torch_state_to_params(tmodel.state_dict(), rvae_spec(P, L))
        jmodel = RVAE(latent_dim=L, patch_size=P, fast_resample=False)
        x, eps = make_batch(rng)
        beta, gamma = 10.0, 10.0

        # --- jax objective with fixed noise (diversity rotation term) ---
        def j_objective(params):
            mu, logvar, theta = jmodel.apply(params, jnp.asarray(x), method="encode")
            z = mu + jnp.asarray(eps) * jnp.exp(0.5 * logvar)
            recon = jmodel.apply(params, z, method="decode")
            from livae_tpu.models.rvae import RotationSTN
            from livae_tpu.ops.resample import affine_grid, grid_sample

            mat = RotationSTN.get_rotation_matrix(-theta)
            grid = affine_grid(mat, (P, P))
            rotated_recon = grid_sample(recon, grid, padding_mode="reflection")
            total, rl, kl, rot = rvae_loss(
                rotated_recon, jnp.asarray(x), mu, logvar, theta,
                beta=beta, gamma=gamma, use_diversity=True,
            )
            return total, (rl, kl, rot)

        (j_total, (j_rl, j_kl, j_rot)), j_grads = jax.value_and_grad(
            j_objective, has_aux=True
        )(params)

        # --- torch objective with the same noise ---
        xt = torch_in(x)
        tmu, tlogvar, ttheta = tmodel.encoder(xt)
        tz = tmu + torch.from_numpy(eps) * torch.exp(0.5 * tlogvar)
        trecon = tmodel.decoder(tz)
        tmat = tmodel.encoder.rotation_stn.get_rotation_matrix(-ttheta)
        tgrid = torch.nn.functional.affine_grid(tmat, trecon.size(), align_corners=False)
        trot = torch.nn.functional.grid_sample(
            trecon, tgrid, padding_mode="reflection", align_corners=False
        )
        crit = ref["loss"].RVAELoss(beta=beta, gamma=gamma, use_diversity=True)
        t_total, t_rl, t_kl, t_rot = crit(trot, xt, tmu, tlogvar, ttheta)
        t_total.backward()

        # ELBO within 1% (actually much tighter)
        assert abs(float(j_total) - float(t_total)) / abs(float(t_total)) < 0.01
        np.testing.assert_allclose(float(j_rl), float(t_rl), rtol=1e-3)
        np.testing.assert_allclose(float(j_kl), float(t_kl), rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(float(j_rot), float(t_rot), rtol=1e-2, atol=1e-5)

        # gradient parity on representative parameters
        from livae_tpu.utils.checkpoint import params_to_torch_state

        g_state = params_to_torch_state(j_grads, rvae_spec(P, L))
        for key in ("encoder.fc_mu.weight", "decoder.fc.weight",
                    "encoder.conv_layers.0.weight",
                    "encoder.rotation_stn.localization.9.weight"):
            t_grad = dict(tmodel.named_parameters())[key].grad.numpy()
            j_grad = g_state[key]
            scale = max(np.abs(t_grad).max(), 1e-8)
            np.testing.assert_allclose(
                j_grad / scale, t_grad / scale, atol=5e-3,
                err_msg=f"gradient mismatch for {key}",
            )
