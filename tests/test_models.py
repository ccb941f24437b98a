"""Model family tests: shapes/arity + differential parity vs the PyTorch reference.

The ELBO-within-1% target (BASELINE.md) requires the Flax models to be
numerically interchangeable with the reference's torch models. These tests
instantiate the actual reference module (loaded straight from
/root/reference/src/livae/model.py — torch-only, no broken deps), convert
its randomly initialized weights through the checkpoint converters, and
assert encoder/decoder/STN outputs match to float32 tolerance.
"""

import importlib.util

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from livae_tpu.models.rvae import RVAE, RotationSTN
from livae_tpu.models.vae import VAE
from livae_tpu.utils.checkpoint import (
    clean_state_dict,
    params_to_torch_state,
    rvae_spec,
    torch_state_to_params,
    vae_spec,
)


@pytest.fixture(scope="module")
def ref_model():
    spec = importlib.util.spec_from_file_location(
        "ref_model", "/root/reference/src/livae/model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def nchw(x_nhwc):
    arr = np.ascontiguousarray(np.asarray(x_nhwc).transpose(0, 3, 1, 2))
    # from_numpy keeps numpy's singleton-dim strides, which torch's memory-
    # format inference misreads as channels_last (C=1), breaking the
    # reference's .view(); copy into a standard-strided tensor instead.
    return torch.empty(arr.shape, dtype=torch.float32).copy_(torch.from_numpy(arr))


def nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


class TestShapes:
    def test_vae_forward_arity_and_shapes(self):
        model = VAE(latent_dim=8, patch_size=32)
        x = jnp.zeros((2, 32, 32, 1))
        params = model.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)
        recon, mu, logvar = model.apply(params, x, rngs={"sample": jax.random.key(2)})
        assert recon.shape == (2, 32, 32, 1)
        assert mu.shape == (2, 8) and logvar.shape == (2, 8)

    def test_rvae_forward_arity_and_shapes(self):
        model = RVAE(latent_dim=8, patch_size=32)
        x = jnp.zeros((2, 32, 32, 1))
        params = model.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)
        out = model.apply(params, x, rngs={"sample": jax.random.key(2)})
        assert len(out) == 5
        rotated_recon, recon, theta, mu, logvar = out
        assert rotated_recon.shape == recon.shape == (2, 32, 32, 1)
        assert theta.shape == (2, 1)
        assert mu.shape == logvar.shape == (2, 8)

    def test_stn_outputs(self):
        stn = RotationSTN(patch_size=32)
        x = jnp.ones((3, 32, 32, 1))
        params = stn.init(jax.random.key(0), x)
        x_rot, theta = stn.apply(params, x)
        assert x_rot.shape == x.shape
        assert theta.shape == (3, 1)
        assert np.all(np.abs(np.asarray(theta)) <= np.pi + 1e-6)


class TestTrainForwardPaths:
    """The fused train step's cheap paths are exactly the public forward.

    predict_theta must equal encode()[2] bit-for-bit (it runs only the
    localization net), and train_forward must return the 5-tuple of
    __call__ plus the STN-canonicalized input, which for the fast
    resampler equals rotate_image_fast(x, theta) — the canonical-loss
    target (reference train.py:357-366, 670-677).
    """

    def _setup(self, fast):
        model = RVAE(latent_dim=8, patch_size=32, fast_resample=fast)
        x = jax.random.uniform(jax.random.key(3), (4, 32, 32, 1))
        params = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)}, x
        )
        return model, params, x

    @pytest.mark.parametrize("fast", [True, False])
    def test_predict_theta_matches_encode(self, fast):
        model, params, x = self._setup(fast)
        _, _, theta = model.apply(params, x, method="encode")
        theta_only = model.apply(params, x, method="predict_theta")
        np.testing.assert_array_equal(np.asarray(theta), np.asarray(theta_only))

    @pytest.mark.parametrize("fast", [True, False])
    def test_train_forward_matches_call(self, fast):
        model, params, x = self._setup(fast)
        out5 = model.apply(params, x, rngs={"sample": jax.random.key(7)})
        out6 = model.apply(
            params, x, rngs={"sample": jax.random.key(7)}, method="train_forward"
        )
        assert len(out6) == 6
        for a, b in zip(out5, out6[:5]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_canonical_input_is_rotate_to_canonical(self):
        from livae_tpu.train.engine import rotate_to_canonical

        model, params, x = self._setup(True)
        out6 = model.apply(
            params, x, rngs={"sample": jax.random.key(7)}, method="train_forward"
        )
        theta, canonical_input = out6[2], out6[5]
        np.testing.assert_array_equal(
            np.asarray(canonical_input), np.asarray(rotate_to_canonical(x, theta))
        )

    @pytest.mark.parametrize("fast", [True, False])
    def test_train_forward_paired_matches_separate(self, fast):
        """Batched pair localization == train_forward + predict_theta.

        The [2B]-batched localization pass must be exactly the two
        separate passes (convs/dense are row-independent); this pins the
        production step's optimization to the reference semantics.
        """
        model, params, x = self._setup(fast)
        x_rot = jax.random.uniform(jax.random.key(11), x.shape)
        out6 = model.apply(
            params, x, rngs={"sample": jax.random.key(7)}, method="train_forward"
        )
        theta_rot = model.apply(params, x_rot, method="predict_theta")
        out7 = model.apply(
            params, x, x_rot, rngs={"sample": jax.random.key(7)},
            method="train_forward_paired",
        )
        assert len(out7) == 7
        for i, (a, b) in enumerate(zip(out6 + (theta_rot,), out7)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6,
                err_msg=f"output {i} differs",
            )

    def test_train_forward_paired_gradients_match_separate(self):
        """d(objective)/dparams identical through the batched pass."""
        model, params, x = self._setup(True)
        x_rot = jax.random.uniform(jax.random.key(11), x.shape)

        def obj_separate(p):
            rr, _, theta, mu, logvar, ci = model.apply(
                p, x, rngs={"sample": jax.random.key(7)}, method="train_forward"
            )
            th_r = model.apply(p, x_rot, method="predict_theta")
            return (
                jnp.mean((rr - x) ** 2) + jnp.mean(mu**2)
                + jnp.sum(jnp.sin(theta - th_r)) + jnp.mean(ci)
            )

        def obj_paired(p):
            rr, _, theta, mu, logvar, ci, th_r = model.apply(
                p, x, x_rot, rngs={"sample": jax.random.key(7)},
                method="train_forward_paired",
            )
            return (
                jnp.mean((rr - x) ** 2) + jnp.mean(mu**2)
                + jnp.sum(jnp.sin(theta - th_r)) + jnp.mean(ci)
            )

        g1 = jax.grad(obj_separate)(params)
        g2 = jax.grad(obj_paired)(params)
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        for k, v in flat1:
            # rtol: the batched pass sums parameter gradients over one 2B
            # reduction instead of two B reductions — same math, f32
            # accumulation order differs (observed ~7e-7 relative)
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat2[jax.tree_util.keystr(k)]),
                rtol=1e-5, atol=1e-5, err_msg=jax.tree_util.keystr(k),
            )

    def test_predict_theta_gradients_match_encode(self):
        """d(cycle-ish scalar)/dparams identical through either pass."""
        model, params, x = self._setup(True)

        def via_encode(p):
            return jnp.sum(jnp.sin(model.apply(p, x, method="encode")[2]))

        def via_theta(p):
            return jnp.sum(jnp.sin(model.apply(p, x, method="predict_theta")))

        g1 = jax.grad(via_encode)(params)
        g2 = jax.grad(via_theta)(params)
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        for k, v in flat1:
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat2[jax.tree_util.keystr(k)]),
                atol=1e-6, err_msg=jax.tree_util.keystr(k),
            )


class TestTorchParity:
    """Reference torch weights -> converted flax params -> identical outputs."""

    @pytest.mark.parametrize("patch_size,latent_dim", [(32, 8), (64, 16)])
    def test_vae_parity(self, ref_model, rng, patch_size, latent_dim):
        torch.manual_seed(0)
        tmodel = ref_model.VAE(latent_dim=latent_dim, patch_size=patch_size).eval()
        spec = vae_spec(patch_size, latent_dim)
        params = torch_state_to_params(tmodel.state_dict(), spec)

        jmodel = VAE(latent_dim=latent_dim, patch_size=patch_size)
        x = rng.random((4, patch_size, patch_size, 1)).astype(np.float32)

        # encoder parity
        jmu, jlogvar = jmodel.apply(params, jnp.asarray(x), method="encode")
        with torch.no_grad():
            tmu, tlogvar = tmodel.encoder(nchw(x))
        np.testing.assert_allclose(np.asarray(jmu), tmu.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(jlogvar), tlogvar.numpy(), atol=2e-4)

        # decoder parity
        z = rng.standard_normal((4, latent_dim)).astype(np.float32)
        jrec = jmodel.apply(params, jnp.asarray(z), method="decode")
        with torch.no_grad():
            trec = tmodel.decoder(torch.from_numpy(z))
        np.testing.assert_allclose(np.asarray(jrec), nhwc(trec), atol=2e-4)

    @pytest.mark.parametrize("patch_size,latent_dim", [(32, 8), (64, 16)])
    def test_rvae_parity(self, ref_model, rng, patch_size, latent_dim):
        torch.manual_seed(1)
        tmodel = ref_model.RVAE(latent_dim=latent_dim, patch_size=patch_size).eval()
        spec = rvae_spec(patch_size, latent_dim)
        params = torch_state_to_params(tmodel.state_dict(), spec)

        # exact resampler for bitwise torch parity
        jmodel = RVAE(latent_dim=latent_dim, patch_size=patch_size, fast_resample=False)
        x = rng.random((4, patch_size, patch_size, 1)).astype(np.float32)

        # encoder (STN + trunk) parity: mu, logvar, theta
        jmu, jlogvar, jtheta = jmodel.apply(params, jnp.asarray(x), method="encode")
        with torch.no_grad():
            tmu, tlogvar, ttheta = tmodel.encoder(nchw(x))
        np.testing.assert_allclose(np.asarray(jtheta), ttheta.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(jmu), tmu.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(jlogvar), tlogvar.numpy(), atol=2e-4)

        # decoder + inverse rotation parity (the full generative path)
        z = rng.standard_normal((4, latent_dim)).astype(np.float32)
        jrec = jmodel.apply(params, jnp.asarray(z), method="decode")
        theta = jnp.asarray(rng.uniform(-np.pi, np.pi, (4, 1)).astype(np.float32))
        from livae_tpu.ops.resample import affine_grid, grid_sample

        mat = RotationSTN.get_rotation_matrix(-theta)
        grid = affine_grid(mat, (patch_size, patch_size))
        jrot = grid_sample(jrec, grid, padding_mode="reflection")

        with torch.no_grad():
            trec = tmodel.decoder(torch.from_numpy(z))
            tmat = tmodel.encoder.rotation_stn.get_rotation_matrix(
                -torch.from_numpy(np.asarray(theta))
            )
            tgrid = torch.nn.functional.affine_grid(
                tmat, trec.size(), align_corners=False
            )
            trot = torch.nn.functional.grid_sample(
                trec, tgrid, padding_mode="reflection", align_corners=False
            )
        np.testing.assert_allclose(np.asarray(jrec), nhwc(trec), atol=2e-4)
        np.testing.assert_allclose(np.asarray(jrot), nhwc(trot), atol=2e-4)

    def test_roundtrip_flax_to_torch_to_flax(self, rng):
        """Our params -> torch state dict -> back == identity."""
        model = RVAE(latent_dim=8, patch_size=32)
        x = jnp.zeros((1, 32, 32, 1))
        params = model.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)
        spec = rvae_spec(32, 8)
        state = params_to_torch_state(params, spec)
        back = torch_state_to_params(state, spec)

        flat1 = jax.tree_util.tree_leaves_with_path(params)
        flat2 = jax.tree_util.tree_leaves_with_path(back)
        assert len(flat1) == len(flat2)
        d1 = {jax.tree_util.keystr(k): v for k, v in flat1}
        d2 = {jax.tree_util.keystr(k): v for k, v in flat2}
        assert set(d1) == set(d2)
        for k in d1:
            np.testing.assert_allclose(np.asarray(d1[k]), np.asarray(d2[k]), atol=0, err_msg=k)

    def test_torch_state_keys_match_reference_exactly(self, ref_model):
        """Exported key set == the reference model's state_dict key set."""
        tmodel = ref_model.RVAE(latent_dim=8, patch_size=32)
        ref_keys = set(tmodel.state_dict().keys())

        model = RVAE(latent_dim=8, patch_size=32)
        params = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            jnp.zeros((1, 32, 32, 1)),
        )
        ours = set(params_to_torch_state(params, rvae_spec(32, 8)).keys())
        assert ours == ref_keys

    def test_clean_state_dict(self):
        sd = {"_orig_mod.encoder.fc_mu.weight": 1, "decoder.fc.bias": 2}
        out = clean_state_dict(sd)
        assert set(out) == {"encoder.fc_mu.weight", "decoder.fc.bias"}
