"""Loss parity tests vs the reference's torch implementations."""

import importlib.util

import numpy as np
import pytest
import torch

from livae_tpu.losses import (
    circular_distance,
    cycle_consistency_loss,
    rotation_diversity_loss,
    rvae_loss,
    vae_loss,
)


@pytest.fixture(scope="module")
def ref_loss():
    spec = importlib.util.spec_from_file_location(
        "ref_loss", "/root/reference/src/livae/loss.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_vae_loss_matches_reference(ref_loss, rng):
    recon = rng.random((8, 1, 16, 16)).astype(np.float32)
    x = rng.random((8, 1, 16, 16)).astype(np.float32)
    mu = rng.standard_normal((8, 4)).astype(np.float32)
    logvar = rng.standard_normal((8, 4)).astype(np.float32)

    total, rl, kl = vae_loss(recon, x, mu, logvar, beta=2.5)
    tl = ref_loss.VAELoss(beta=2.5)
    tt, trl, tkl = tl(*(torch.from_numpy(a) for a in (recon, x, mu, logvar)))
    np.testing.assert_allclose(float(total), float(tt), rtol=1e-5)
    np.testing.assert_allclose(float(rl), float(trl), rtol=1e-5)
    np.testing.assert_allclose(float(kl), float(tkl), rtol=1e-5)


@pytest.mark.parametrize("use_diversity", [False, True])
def test_rvae_loss_matches_reference(ref_loss, rng, use_diversity):
    recon = rng.random((8, 1, 16, 16)).astype(np.float32)
    x = rng.random((8, 1, 16, 16)).astype(np.float32)
    mu = rng.standard_normal((8, 4)).astype(np.float32)
    logvar = rng.standard_normal((8, 4)).astype(np.float32)
    theta = rng.uniform(-np.pi, np.pi, (8, 1)).astype(np.float32)
    theta_rot = rng.uniform(-np.pi, np.pi, (8, 1)).astype(np.float32)
    angle = rng.uniform(0, 2 * np.pi, (8,)).astype(np.float32)

    total, rl, kl, rot = rvae_loss(
        recon, x, mu, logvar, theta, theta_rot, angle,
        beta=3.0, gamma=1.5, use_diversity=use_diversity,
    )
    tl = ref_loss.RVAELoss(beta=3.0, gamma=1.5, use_diversity=use_diversity)
    tt, trl, tkl, trot = tl(
        *(torch.from_numpy(a) for a in (recon, x, mu, logvar, theta, theta_rot, angle))
    )
    np.testing.assert_allclose(float(total), float(tt), rtol=1e-4)
    np.testing.assert_allclose(float(rl), float(trl), rtol=1e-4)
    np.testing.assert_allclose(float(kl), float(tkl), rtol=1e-4)
    np.testing.assert_allclose(float(rot), float(trot), rtol=1e-4, atol=1e-6)


def test_rvae_loss_gamma_zero_gives_zero_rotation(rng):
    recon = rng.random((4, 1, 8, 8)).astype(np.float32)
    x = rng.random((4, 1, 8, 8)).astype(np.float32)
    mu = rng.standard_normal((4, 2)).astype(np.float32)
    logvar = rng.standard_normal((4, 2)).astype(np.float32)
    theta = rng.standard_normal((4, 1)).astype(np.float32)
    _, _, _, rot = rvae_loss(recon, x, mu, logvar, theta, gamma=0.0)
    assert float(rot) == 0.0


def test_circular_distance_matches_reference(ref_loss, rng):
    t1 = rng.uniform(-np.pi, np.pi, (16,)).astype(np.float32)
    t2 = rng.uniform(-np.pi, np.pi, (16,)).astype(np.float32)
    ours = float(circular_distance(t1, t2))
    theirs = float(ref_loss.circular_distance(torch.from_numpy(t1), torch.from_numpy(t2)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_diversity_loss_matches_reference(ref_loss, rng):
    theta = rng.uniform(-np.pi, np.pi, (16, 1)).astype(np.float32)
    ours = float(rotation_diversity_loss(theta, target_std=1.0))
    theirs = float(ref_loss.rotation_diversity_loss(torch.from_numpy(theta), target_std=1.0))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-7)


def test_cycle_loss_matches_reference(ref_loss, rng):
    t1 = rng.uniform(-np.pi, np.pi, (16, 1)).astype(np.float32)
    t2 = rng.uniform(-np.pi, np.pi, (16, 1)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, (16,)).astype(np.float32)
    ours = float(cycle_consistency_loss(t1, t2, ang))
    theirs = float(
        ref_loss.cycle_consistency_loss(
            torch.from_numpy(t1), torch.from_numpy(t2), torch.from_numpy(ang)
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_cycle_loss_zero_when_consistent():
    t1 = np.array([0.3, -1.0], dtype=np.float32)
    ang = np.array([0.5, 1.2], dtype=np.float32)
    t2 = t1 - ang  # theta_rotated = theta - R
    assert float(cycle_consistency_loss(t1, t2, ang)) == pytest.approx(0.0, abs=1e-6)
