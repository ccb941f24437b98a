"""Multi-chip data parallelism tests on the 8-device virtual CPU mesh.

The TPU-native analog of the reference's fake-backend testing (SURVEY.md
§4): the same pjit/Mesh code paths the driver dry-runs, validated without
TPU hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from livae_tpu.models.rvae import RVAE
from livae_tpu.models.vae import VAE
from livae_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_eval_step,
    shard_train_step,
)
from livae_tpu.train.engine import make_eval_step, make_rvae_train_step, make_train_step
from livae_tpu.train.state import TrainState, make_optimizer


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


P = 32
B = 16  # 2 per device


def test_mesh_creation(mesh):
    assert mesh.shape == {"data": 8}


def test_vae_data_parallel_step_matches_single_device(mesh):
    model = VAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adam")
    x = jnp.asarray(np.random.default_rng(0).random((B, P, P, 1), dtype=np.float32))
    key = jax.random.key(7)

    step = make_train_step(model, tx, grad_max_norm=5.0)

    # single-device result
    state1 = TrainState.create(params, tx)
    s1, m1 = step(state1, x, key, 1.0, 0.0)

    # sharded result
    pstep = shard_train_step(step, mesh, n_batch_args=1, donate_state=False)
    state2 = replicate(TrainState.create(params, tx), mesh)
    xs = shard_batch(x, mesh)
    s2, m2 = pstep(state2, xs, key, 1.0, 0.0)

    # identical math: global-mean loss => same grads => same params
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_rvae_paired_parallel_step(mesh):
    model = RVAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adamw", weight_decay=1e-5)
    step = make_rvae_train_step(model, tx, canonical_weight=0.2)
    pstep = shard_train_step(step, mesh, n_batch_args=3, donate_state=False)

    rng = np.random.default_rng(1)
    x = shard_batch(jnp.asarray(rng.random((B, P, P, 1), dtype=np.float32)), mesh)
    x_rot = shard_batch(jnp.asarray(rng.random((B, P, P, 1), dtype=np.float32)), mesh)
    angle = shard_batch(jnp.asarray(rng.uniform(0, 6.28, B).astype(np.float32)), mesh)
    state = replicate(TrainState.create(params, tx), mesh)

    new_state, metrics = pstep(state, x, x_rot, angle, jax.random.key(2), 10.0, 10.0)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params updated and still replicated
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, new_state.params
    )
    assert max(jax.tree.leaves(d)) > 0


def test_eval_step_sharded(mesh):
    model = VAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    estep = make_eval_step(model)
    pestep = shard_eval_step(estep, mesh, n_batch_args=1)
    x = shard_batch(
        jnp.asarray(np.random.default_rng(0).random((B, P, P, 1), dtype=np.float32)),
        mesh,
    )
    metrics = pestep(replicate(params, mesh), x, jax.random.key(1), 1.0, 0.0)
    assert np.isfinite(float(metrics["loss"]))


def test_mesh_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh(1024)


def test_resolve_num_devices():
    from livae_tpu.parallel.mesh import resolve_num_devices

    assert resolve_num_devices(None) == 1
    assert resolve_num_devices("3") == 3
    assert resolve_num_devices(2) == 2
    assert resolve_num_devices("auto") == jax.local_device_count()
    with pytest.raises(ValueError):
        resolve_num_devices("0")


@pytest.fixture(scope="module")
def site_table():
    """Tiny device site table (frames_padded, img_idx, coords, margin)."""
    from livae_tpu.data.pipeline import pad_frames

    padding = 8
    roi = P + 2 * padding + 16
    margin = roi // 2 + 8
    H = 4 * roi
    rng = np.random.default_rng(3)
    frames_padded = pad_frames(jnp.asarray(rng.random((1, H, H), dtype=np.float32)), margin)
    n_sites = 64
    img_idx = jnp.zeros((n_sites,), jnp.int32)
    coords = jnp.asarray(
        rng.uniform(roi // 2, H - roi // 2, (n_sites, 2)).astype(np.float32)
    )
    return frames_padded, img_idx, coords, margin, padding


@pytest.mark.slow
def test_fused_rvae_step_sharded_matches_single_device(mesh, site_table):
    """The production multi-chip path: fused extract+train over the mesh
    must produce step-for-step identical loss and params to one device."""
    from livae_tpu.data.pipeline import AugmentConfig
    from livae_tpu.train.engine import make_fused_rvae_train_step

    frames_padded, img_idx, coords, margin, padding = site_table
    model = RVAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adamw", weight_decay=1e-5)
    kwargs = dict(
        patch_size=P, padding=padding, cfg=AugmentConfig(), margin=margin,
        canonical_weight=0.2, grad_max_norm=20.0,
    )
    idx_batches = jnp.arange(2 * B, dtype=jnp.int32).reshape(2, B)
    key = jax.random.key(5)

    # the fused step donates its state: give each run its own param copy
    params1 = jax.tree.map(jnp.copy, params)
    paramsN = jax.tree.map(jnp.copy, params)

    step1 = make_fused_rvae_train_step(model, tx, **kwargs)
    s1, m1 = step1(
        TrainState.create(params1, tx), frames_padded, img_idx, coords,
        idx_batches, key, 10.0, 10.0,
    )

    stepN = make_fused_rvae_train_step(model, tx, mesh=mesh, **kwargs)
    sN, mN = stepN(
        TrainState.create(paramsN, tx), frames_padded, img_idx, coords,
        idx_batches, key, 10.0, 10.0,
    )

    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]), rtol=1e-5)
    assert int(sN.step) == 2
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sN.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dense_param_specs_shards_only_large_dense():
    """Megatron-style spec derivation: the post-flatten dense kernels (the
    only params that scale with patch_size^2) shard on the model axis —
    input-axis for the encoder heads, output-axis (with bias) for the
    decoder fc — while conv kernels and small dense layers replicate."""
    from jax.sharding import PartitionSpec as PS
    from livae_tpu.parallel.mesh import dense_param_specs

    model = RVAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    specs = dense_param_specs(params, n_model=2)
    enc = specs["params"]["encoder"]
    dec = specs["params"]["decoder"]
    assert enc["fc_mu"]["dense"]["kernel"] == PS("model", None)  # [1024, 4]
    assert enc["fc_mu"]["dense"]["bias"] == PS()  # output axis unsharded
    assert dec["fc"]["dense"]["kernel"] == PS(None, "model")  # [4, 1024]
    assert dec["fc"]["dense"]["bias"] == PS("model")
    assert enc["conv0"]["conv"]["kernel"] == PS()  # convs replicate
    # tiny dense (loc_fc1 [32, 2]) replicates
    assert specs["params"]["encoder"]["rotation_stn"]["loc_fc1"]["kernel"] == PS()


@pytest.mark.slow
def test_fused_rvae_step_mesh2d_dense_tp_matches_single_device(site_table):
    """2-D data x model mesh: the fused step with Megatron-sharded dense
    layers (no bespoke jit wiring — shardings inferred from the placed
    state) is step-for-step equivalent to single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as PS
    from livae_tpu.data.pipeline import AugmentConfig
    from livae_tpu.parallel.mesh import (
        dense_param_specs,
        make_mesh2d,
        place_with_specs,
        replicate,
    )
    from livae_tpu.train.engine import make_fused_rvae_train_step

    frames_padded, img_idx, coords, margin, padding = site_table
    mesh2 = make_mesh2d(4, 2)
    assert mesh2.shape == {"data": 4, "model": 2}

    model = RVAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    tx = make_optimizer(1e-3, optimizer="adamw", weight_decay=1e-5)
    kwargs = dict(
        patch_size=P, padding=padding, cfg=AugmentConfig(), margin=margin,
        canonical_weight=0.2, grad_max_norm=20.0,
    )
    idx_batches = jnp.arange(2 * B, dtype=jnp.int32).reshape(2, B)
    key = jax.random.key(5)

    params1 = jax.tree.map(jnp.copy, params)
    step1 = make_fused_rvae_train_step(model, tx, **kwargs)
    s1, m1 = step1(
        TrainState.create(params1, tx), frames_padded, img_idx, coords,
        idx_batches, key, 10.0, 10.0,
    )

    specs = dense_param_specs(params, n_model=2)
    params2 = place_with_specs(jax.tree.map(jnp.copy, params), mesh2, specs)
    # optimizer moments mirror the placed params' shardings (zeros_like)
    state2 = TrainState.create(params2, tx)
    step2 = make_fused_rvae_train_step(model, tx, **kwargs)  # plain jit
    # set_mesh installs the context mesh the decoder's tp_boundary
    # all-gather resolves against (no-op without it).
    with jax.set_mesh(mesh2):
        s2, m2 = step2(
            state2,
            replicate(frames_padded, mesh2),
            replicate(img_idx, mesh2),
            replicate(coords, mesh2),
            jax.device_put(idx_batches, NamedSharding(mesh2, PS(None, "data"))),
            replicate(key, mesh2),
            10.0,
            10.0,
        )

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    assert int(s2.step) == 2
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # the updated params actually stayed model-sharded through the step
    k2 = s2.params["params"]["encoder"]["fc_mu"]["dense"]["kernel"]
    assert "model" in str(k2.sharding.spec)


@pytest.mark.slow
def test_fused_eval_sharded_matches_single_device(mesh, site_table):
    from livae_tpu.train.engine import make_fused_eval

    frames_padded, img_idx, coords, margin, padding = site_table
    model = VAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    kwargs = dict(patch_size=P, padding=padding, margin=margin)
    idx_batches = jnp.arange(2 * B, dtype=jnp.int32).reshape(2, B)
    key = jax.random.key(6)

    e1 = make_fused_eval(model, **kwargs)(
        params, frames_padded, img_idx, coords, idx_batches, key, 1.0, 0.0
    )
    eN = make_fused_eval(model, mesh=mesh, **kwargs)(
        params, frames_padded, img_idx, coords, idx_batches, key, 1.0, 0.0
    )
    for k in e1:
        np.testing.assert_allclose(
            np.asarray(e1[k]), np.asarray(eN[k]), rtol=1e-4, atol=1e-5
        )


def test_evaluate_fused_covers_all_val_sites(site_table):
    """Regression for the round-1 val truncation: a ragged tail batch must
    contribute to the epoch metrics (VERDICT.md weak #3)."""
    from livae_tpu.train.engine import MetricLogger, evaluate_fused, make_fused_eval

    frames_padded, img_idx, coords, margin, padding = site_table
    model = VAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    fe = make_fused_eval(model, patch_size=P, padding=padding, margin=margin)

    table = (frames_padded, img_idx, coords, margin)
    logger = MetricLogger()
    # 19 val sites, batch 8 -> 2 full batches + tail of 3
    val_idx = np.arange(19)
    avg = evaluate_fused(
        fe, fe, params, table, val_idx, 8, jax.random.key(7), logger, beta=1.0
    )
    assert np.isfinite(avg["val_loss"])

    # the tail must change the average: evaluate only the 16 full-batch
    # sites and check the two disagree (distinct site content)
    avg_trunc = evaluate_fused(
        fe, fe, params, table, val_idx[:16], 8, jax.random.key(7), None, beta=1.0
    )
    assert avg["val_loss"] != avg_trunc["val_loss"]


def test_orbax_restore_preserves_model_sharding(tmp_path):
    """Orbax auto-resume must round-trip a Megatron-placed TrainState: the
    restored dense kernels keep their NamedSharding on the 2-D mesh (a
    shardingless restore would silently demote --model-parallel --resume
    runs to single-device arrays)."""
    from livae_tpu.parallel.mesh import (
        dense_param_specs,
        make_mesh2d,
        place_with_specs,
    )
    from livae_tpu.utils.orbax_io import restore_train_state, save_train_state

    model = RVAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )
    mesh2 = make_mesh2d(4, 2)
    specs = dense_param_specs(params, n_model=2, min_dim=256)
    params = place_with_specs(params, mesh2, specs)
    tx = make_optimizer(1e-3, optimizer="adamw", weight_decay=1e-5)
    state = TrainState.create(params, tx)

    save_train_state(tmp_path / "ck", 3, state, {"epoch": 3})
    template = jax.tree.map(jnp.zeros_like, state)
    restored, meta = restore_train_state(tmp_path / "ck", template)
    assert meta["epoch"] == 3

    k_src = state.params["params"]["encoder"]["fc_mu"]["dense"]["kernel"]
    k_new = restored.params["params"]["encoder"]["fc_mu"]["dense"]["kernel"]
    assert k_new.sharding == k_src.sharding, (
        f"restore dropped the model sharding: {k_new.sharding}"
    )
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_setup_mesh_from_flags(tmp_path):
    """Shared trainer mesh setup: flag validation, 1-device passthrough,
    1-D data mesh, and 2-D Megatron placement with a scoped context mesh
    that is restored when the stack unwinds."""
    from contextlib import ExitStack

    from livae_tpu.parallel.mesh import setup_mesh_from_flags

    model = RVAE(latent_dim=4, patch_size=P)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, P, P, 1)),
    )

    with ExitStack() as stack:
        mesh, n_data, p2 = setup_mesh_from_flags("1", 1, 64, params, stack)
        assert mesh is None and n_data == 1 and p2 is params

        mesh, n_data, _ = setup_mesh_from_flags("8", 1, 64, params, stack)
        assert mesh.shape == {"data": 8} and n_data == 8

    with pytest.raises(SystemExit):  # mp must divide num_devices
        setup_mesh_from_flags("8", 3, 64, params, ExitStack())
    with pytest.raises(SystemExit):  # batch must divide data ways
        setup_mesh_from_flags("8", 2, 63, params, ExitStack())

    with ExitStack() as stack:
        mesh, n_data, p2 = setup_mesh_from_flags("8", 2, 64, params, stack)
        assert mesh.shape == {"data": 4, "model": 2} and n_data == 4
        # context mesh installed for tp_boundary
        assert jax.sharding.get_mesh().axis_names == ("data", "model")
        k = p2["params"]["encoder"]["fc_mu"]["dense"]["kernel"]
        assert "model" in str(k.sharding.spec)
    # restored on exit — no process-global leak
    assert jax.sharding.get_mesh().axis_names == ()


def test_spmd_partitioner_edgepad_divergence_sentinel():
    """Sentinel for the XLA SPMD miscompile tp_boundary firewalls.

    Resharding (value-preserving by definition) a size-2 spatial dim of
    the edge-padded, scatter-corrected fused upconv onto the model axis
    produces wrong VALUES on the CPU backend (observed max-abs ~368 on
    jax 0.9.0) — the reason the models gather the model axis at every
    flatten/fc seam instead of letting GSPMD propagate it into the conv
    stack. If this test starts hitting the skip below, the installed
    XLA has fixed the partitioner and tp_boundary is no longer
    load-bearing for correctness (it remains the right Megatron
    collective placement for performance).
    """
    from jax.sharding import NamedSharding, PartitionSpec as PS
    from livae_tpu.ops.upconv import fused_upsample_reflect_conv
    from livae_tpu.parallel.mesh import make_mesh2d

    mesh = make_mesh2d(4, 2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 2, 2, 256), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 256, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))

    f = jax.jit(fused_upsample_reflect_conv)
    ref = f(jax.device_put(x, NamedSharding(mesh, PS())), w, b)
    sharded = f(
        jax.device_put(x, NamedSharding(mesh, PS(None, "model", None, None))),
        w, b,
    )
    div = float(jnp.max(jnp.abs(ref - sharded)))
    if div < 1e-5:
        pytest.skip(
            "XLA SPMD partitioner fixed: sharded == replicated; "
            "tp_boundary is no longer load-bearing for correctness"
        )
    assert div > 1.0, f"divergence changed character: {div}"
