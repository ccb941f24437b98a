#!/usr/bin/env python
"""HLO-op-level time attribution for the fused rVAE train step.

Runs the production paired loss forward+backward under jax.profiler and
reports the top HLO ops by self time, grouped by op category — the
evidence layer below profile_components.py's stage ablations: stages say
WHERE the microseconds go (extract / forward / backward), this says WHICH
ops they land on (conv VJPs, shear lerps, gathers, ...).

The reference has no analog (its profiling story is Ray Tune trial wall
clocks); this is the TPU-native replacement alongside --profile traces.

Usage:
    python scripts/trace_ops.py                 # TPU, production shapes
    python scripts/trace_ops.py --stage grad    # default
    python scripts/trace_ops.py --stage fwd --cpu --batch 32 --patch 32
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import tempfile

import numpy as np

from _common import maybe_force_cpu


def _collect_op_stats(logdir: str) -> list[dict]:
    """Parse the xplane trace into per-HLO-op stat dicts via xprof.

    hlo_stats returns a Google DataTable ({"cols": [...], "rows":
    [{"c": [{"v": ...}]}]}); flatten to one dict per row keyed by col id.
    Populated only for device (TPU) traces — empty on the CPU backend.
    """
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    ids = [c["id"] for c in table["cols"]]
    return [
        {
            i: (cell or {}).get("v")
            for i, cell in zip(ids, (row.get("c") or []))
        }
        for row in table.get("rows", [])
    ]


def main(args):
    import jax
    import jax.numpy as jnp

    from livae_tpu.data.pipeline import (
        AugmentConfig,
        _extract_batch_paired_impl as extract_batch_paired,
        pad_frames,
    )
    from livae_tpu.data.synthetic import synthetic_mos2_frame
    from livae_tpu.losses import rvae_loss
    from livae_tpu.models.rvae import RVAE
    from livae_tpu.models import init_params

    P, B = args.patch, args.batch
    padding = args.padding
    roi = P + 2 * padding + 16
    margin = roi // 2 + 8

    frame, _ = synthetic_mos2_frame(size=args.frame_size, spacing=40.0, seed=0)
    frames_padded = pad_frames(jnp.asarray(frame, jnp.float32)[None], margin)
    rng = np.random.default_rng(0)
    n_sites = 4096
    img_idx = jnp.zeros((n_sites,), jnp.int32)
    coords = jnp.asarray(
        rng.uniform(roi // 2, frame.shape[0] - roi // 2, (n_sites, 2)).astype(
            np.float32
        )
    )
    cfg = AugmentConfig()

    model = RVAE(latent_dim=args.latent_dim, patch_size=P, compute_dtype="bfloat16")
    params = init_params(model, 
        {"params": jax.random.key(1), "sample": jax.random.key(2)},
        jnp.zeros((1, P, P, 1)),
    )

    def loss_fn(params, x, x_rot, angle, k):
        rr, canonical, theta, mu, logvar, ci, theta_rot = model.apply(
            params, x, x_rot, rngs={"sample": k}, method="train_forward_paired"
        )
        total, *_ = rvae_loss(
            rr, x, mu, logvar, theta, theta_rot, angle, beta=1.0, gamma=1.0
        )
        return total + 0.2 * jnp.mean((canonical - ci) ** 2)

    @jax.jit
    def step(params, env, k):
        idx = jax.random.randint(k, (B,), 0, n_sites)
        x, x_rot, angle = extract_batch_paired(
            env["frames"], env["img_idx"][idx], env["coords"][idx], k,
            P, padding, cfg=cfg, margin=margin,
            rot_dtype=model.compute_dtype,  # production engine setting
        )
        if args.stage == "fwd":
            return loss_fn(params, x, x_rot, angle, k)
        total, grads = jax.value_and_grad(loss_fn)(params, x, x_rot, angle, k)
        return total + sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))

    env = {"frames": frames_padded, "img_idx": img_idx, "coords": coords}
    # warm up (compile) OUTSIDE the trace so only steady-state steps appear
    float(step(params, env, jax.random.key(0)))

    logdir = args.logdir or tempfile.mkdtemp(prefix="livae_trace_")
    with jax.profiler.trace(logdir):
        for i in range(args.reps):
            v = step(params, env, jax.random.key(i + 1))
        float(v)  # host readback: the only sync the axon tunnel honors

    rows = _collect_op_stats(logdir)
    if args.debug_cols and rows:
        print("columns:", sorted(rows[0]))
    agg: dict[str, float] = {}
    cat_agg: dict[str, float] = {}
    bound: dict[str, str] = {}
    expr: dict[str, str] = {}
    total_us = 0.0
    for r in rows:
        name = str(r.get("hlo_op_name") or "?")
        cat = str(r.get("category") or "?")
        t = float(r.get("total_self_time") or 0.0)
        agg[name] = agg.get(name, 0.0) + t
        cat_agg[cat] = cat_agg.get(cat, 0.0) + t
        bound[name] = str(r.get("bound_by") or "")
        e = r.get("hlo_op_expression") or r.get("expression") or ""
        if e:
            expr[name] = str(e)
        total_us += t

    n_pat = B * args.reps
    print(f"\n== categories (total {total_us:.0f} us over {args.reps} steps, "
          f"{total_us / n_pat:.2f} us/patch) ==")
    for cat, t in sorted(cat_agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {t / n_pat:8.3f} us/p  {100 * t / max(total_us, 1e-9):5.1f}%  {cat}")
    print(f"\n== top {args.top} ops by self time ==")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(
            f"  {t / n_pat:8.3f} us/p  {100 * t / max(total_us, 1e-9):5.1f}%  "
            f"[{bound.get(name, ''):>9}]  {name[:100]}"
        )
        if args.expr and name in expr:
            print(f"      {expr[name][: args.expr]}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="HLO op time attribution")
    p.add_argument("--patch", type=int, default=128)
    p.add_argument("--padding", type=int, default=32)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--frame-size", type=int, default=1024)
    p.add_argument(
        "--reps", type=lambda s: max(1, int(s)), default=10,
        help="Traced steps (min 1 — the trace needs at least one step)",
    )
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--stage", choices=["fwd", "grad"], default="grad")
    p.add_argument("--logdir", default=None)
    p.add_argument(
        "--expr", type=int, default=0,
        help="Print up to N chars of each top op's HLO expression",
    )
    p.add_argument("--debug-cols", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    maybe_force_cpu(args)
    main(args)
