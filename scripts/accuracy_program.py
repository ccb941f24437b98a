#!/usr/bin/env python
"""Vacancy-regime accuracy program (BASELINE.md round-2 work item).

Round 1 documented two accuracy gaps (BASELINE.md): vacancy latent
clustering collapses at beta in {1, 10} on the vacancy regime, and strict
mu-cosine rotation invariance sits near 0.5. This program executes the
queued experiment: a small explicit config grid over beta (down to 0.1),
gamma, and the per-patch-normalization ablation, each trained with the
production fused rVAE path on synthetic MoS2 frames with S vacancies,
then gated on a HELD-OUT frame:

* KMeans(k=3) ARI against the true Mo/S/vacancy classes,
* logistic-regression accuracy + vacancy-vs-rest ROC-AUC (linear
  decodability of the latent),
* mean KLD (latent-collapse detector),
* strict rotation invariance: cosine similarity of mu(x) vs mu(rot90 x)
  (the reference's verify_rotational_invariance verdict metric,
  reference scripts/verify_rotational_invariance.py:36-53).

Writes results JSON (one row per config) for BASELINE.md.

Usage:
    python scripts/accuracy_program.py --epochs 30 --out accuracy_results.json
    python scripts/accuracy_program.py --quick --cpu   # smoke
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

from _common import maybe_force_cpu


def sweep_row_rank(row: dict):
    """Sort key for --configs-json top-k selection.

    Completed trials genuinely rank first: an ASHA-pruned trial's
    early-epoch val_loss is not comparable to a completed trial's, so
    status outranks the loss value; rows without val_loss sort last.
    """
    return (
        row.get("status", "done") != "done",
        row.get("val_loss") if row.get("val_loss") is not None else float("inf"),
    )


def site_truth_labels(sites, truth, tol_frac: float = 0.35):
    """Match dataset sites to ground-truth Mo(0)/S(1)/vacancy(2) classes.

    Returns (labels [N], mask [N] of matched sites).
    """
    from scipy.spatial import cKDTree

    spacing = truth["spacing"]
    tol = spacing * tol_frac
    mo = np.asarray(truth["mo_sites"])
    s_all = np.asarray(truth["s_sites"])
    s_vac = np.asarray(truth["s_vacancies"])

    def dist_to(points):
        if len(points) == 0:
            return np.full(len(sites), np.inf)
        d, _ = cKDTree(points).query(sites)
        return d

    d_mo, d_s, d_vac = dist_to(mo), dist_to(s_all), dist_to(s_vac)
    labels = np.full(len(sites), -1, dtype=np.int64)
    # vacancies are a subset of s_sites: check them first
    labels[d_vac < tol] = 2
    is_mo = (labels == -1) & (d_mo < tol) & (d_mo <= d_s)
    labels[is_mo] = 0
    is_s = (labels == -1) & (d_s < tol)
    labels[is_s] = 1
    return labels, labels >= 0


def latent_metrics(mu, logvar, labels):
    """Clustering/decodability metrics on the latent means."""
    from sklearn.cluster import KMeans
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import adjusted_rand_score, roc_auc_score
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler

    mu = np.asarray(mu, dtype=np.float64)
    out = {}
    km = KMeans(n_clusters=3, n_init=10, random_state=0).fit(mu)
    out["kmeans_ari"] = float(adjusted_rand_score(labels, km.labels_))

    Xtr, Xte, ytr, yte = train_test_split(
        mu, labels, test_size=0.3, random_state=0, stratify=labels
    )
    scaler = StandardScaler().fit(Xtr)
    clf = LogisticRegression(max_iter=2000, class_weight="balanced").fit(
        scaler.transform(Xtr), ytr
    )
    out["linear_accuracy"] = float(clf.score(scaler.transform(Xte), yte))
    # vacancy-vs-rest AUC
    vac_tr, vac_te = (ytr == 2).astype(int), (yte == 2).astype(int)
    if vac_tr.sum() > 1 and vac_te.sum() > 1:
        clf2 = LogisticRegression(max_iter=2000, class_weight="balanced").fit(
            scaler.transform(Xtr), vac_tr
        )
        out["vacancy_auc"] = float(
            roc_auc_score(vac_te, clf2.predict_proba(scaler.transform(Xte))[:, 1])
        )
    else:
        out["vacancy_auc"] = float("nan")

    out["kld_mean"] = float(
        np.mean(0.5 * np.sum(mu**2 + np.exp(logvar) - 1.0 - logvar, axis=1))
    )
    out["latent_std_mean"] = float(np.mean(np.std(mu, axis=0)))
    return out


@functools.lru_cache(maxsize=4)
def _rot90_mus(model):
    """Jitted paired encode, cached per (hash-equal) model so every config
    shares one compilation."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def both_mus(params, x):
        xr = jnp.rot90(x, k=1, axes=(1, 2))
        mu0 = model.apply(params, x, method="encode")[0]
        mu1 = model.apply(params, xr, method="encode")[0]
        return mu0, mu1

    return both_mus


def rot90_cosine(model, params, x):
    """Mean cosine similarity of mu(x) vs mu(rot90 x) — the strict verdict
    metric (reference verify_rotational_invariance thresholds 0.99/0.95)."""
    mu0, mu1 = _rot90_mus(model)(params, x)
    mu0 = np.asarray(mu0, dtype=np.float64)
    mu1 = np.asarray(mu1, dtype=np.float64)
    num = np.sum(mu0 * mu1, axis=1)
    den = np.linalg.norm(mu0, axis=1) * np.linalg.norm(mu1, axis=1) + 1e-12
    return float(np.mean(num / den))


def run_config(cfg, train_ds, eval_ds, eval_labels, eval_mask, args, step_cache,
               seed=None):
    import jax
    import jax.numpy as jnp

    from livae_tpu.models.rvae import RVAE
    from livae_tpu.models import init_params
    from livae_tpu.train.engine import make_fused_encode, make_fused_rvae_train_step
    from livae_tpu.train.state import (
        TrainState,
        beta_at_epoch,
        cosine_annealing,
        make_optimizer,
    )

    t0 = time.time()
    latent_dim = int(cfg.get("latent_dim") or args.latent_dim)
    model = RVAE(
        latent_dim=latent_dim, patch_size=args.patch_size,
        compute_dtype="bfloat16",
    )
    key = jax.random.key(args.seed if seed is None else seed)
    key, ik, sk = jax.random.split(key, 3)
    params = init_params(model, 
        {"params": ik, "sample": sk},
        jnp.zeros((1, args.patch_size, args.patch_size, 1)),
    )
    n = len(train_ds)
    batch = min(args.batch_size, n)
    steps = max(1, n // batch)
    # Configs sharing (latent_dim, normalize, lr) share one compiled
    # step/encode (the lr schedule is baked into tx; beta/gamma are traced).
    cache_key = (latent_dim, cfg["normalize"], float(cfg["lr"]))
    if cache_key not in step_cache:
        tx = make_optimizer(
            cosine_annealing(cfg["lr"], args.epochs * steps),
            optimizer="adamw", weight_decay=1e-5,
        )
        step_cache[cache_key] = (
            tx,
            make_fused_rvae_train_step(
                model, tx, patch_size=args.patch_size, padding=args.padding,
                cfg=train_ds.transform, margin=train_ds._margin,
                canonical_weight=0.2, grad_max_norm=20.0,
                normalize=cfg["normalize"],
            ),
            make_fused_encode(
                model, patch_size=args.patch_size, padding=args.padding,
                margin=eval_ds._margin, normalize=cfg["normalize"],
            ),
        )
    tx, step, encode = step_cache[cache_key]
    state = TrainState.create(params, tx)
    frames_padded, img_idx_dev, coords_dev, _ = train_ds.device_site_table

    tm = {}
    for epoch in range(args.epochs):
        beta_e = beta_at_epoch(
            epoch, cfg["beta"], anneal=args.beta_annealing,
            warmup_epochs=5, ramp_epochs=15,
        )
        key, ek = jax.random.split(key)
        kperm, kstep = jax.random.split(ek)
        perm = jax.random.permutation(kperm, n)
        idx_batches = perm[: steps * batch].reshape(steps, batch)
        state, tm = step(
            state, frames_padded, img_idx_dev, coords_dev, idx_batches,
            kstep, beta_e, cfg["gamma"],
        )
    train_loss = float(tm.get("loss", np.nan))
    train_time = time.time() - t0

    # held-out evaluation
    ef, ei, ec, _ = eval_ds.device_site_table
    n_eval = len(eval_ds)
    eb = min(512, n_eval)
    n_full = n_eval // eb
    idx = jnp.arange(n_full * eb, dtype=jnp.int32).reshape(n_full, eb)
    mu, logvar, theta = encode(state.params, ef, ei, ec, idx)
    mu, logvar = np.asarray(mu), np.asarray(logvar)
    lbl = eval_labels[: n_full * eb]
    msk = eval_mask[: n_full * eb]

    metrics = latent_metrics(mu[msk], logvar[msk], lbl[msk])
    probe = eval_ds.batch_at(np.arange(min(256, n_eval)))
    if not cfg["normalize"]:
        # batch_at normalizes by default on AdaptiveLatticeDataset; re-extract raw
        from livae_tpu.data.pipeline import extract_batch

        pidx = jnp.arange(min(256, n_eval), dtype=jnp.int32)
        probe = extract_batch(
            ef, ei[pidx], ec[pidx], None, args.patch_size, args.padding,
            cfg=None, normalize=False, margin=eval_ds._margin,
        )
    metrics["rot90_mu_cosine"] = rot90_cosine(model, state.params, probe)
    metrics.update(
        config=dict(cfg, beta_annealing=args.beta_annealing, epochs=args.epochs),
        seed=int(args.seed if seed is None else seed),
        train_loss=train_loss,
        train_seconds=round(train_time, 1),
        eval_sites=int(msk.sum()),
        train_rotation_std=float(tm.get("rotation_std", np.nan)),
        train_kld=float(tm.get("kld_loss", np.nan)),
    )
    return metrics


_SUMMARY_KEYS = (
    "kmeans_ari", "linear_accuracy", "vacancy_auc", "kld_mean", "rot90_mu_cosine"
)


def summarize_seeds(results) -> list[dict]:
    """mean ± std per (beta, normalize) config across seeds (error bars for
    the BASELINE.md headline claims; VERDICT r2 weak 6)."""
    groups: dict[tuple, list[dict]] = {}
    for r in results:
        c = r["config"]
        k = (c["beta"], c["normalize"], c.get("lr"), c.get("latent_dim"),
             c.get("gamma"))
        groups.setdefault(k, []).append(r)
    rows = []
    for (beta, normalize, lr, latent_dim, gamma), rs in groups.items():
        row = {"beta": beta, "normalize": normalize, "lr": lr,
               "latent_dim": latent_dim, "gamma": gamma, "n_seeds": len(rs),
               "seeds": [r["seed"] for r in rs]}
        for key in _SUMMARY_KEYS:
            vals = np.asarray([r[key] for r in rs], dtype=float)
            row[f"{key}_mean"] = float(np.nanmean(vals))
            row[f"{key}_std"] = float(np.nanstd(vals))
        rows.append(row)
    return rows


def main(args):
    from livae_tpu.data.datasets import (
        AdaptiveLatticeDataset,
        PairedAdaptiveLatticeDataset,
        default_transform,
    )
    from livae_tpu.data.synthetic import synthetic_mos2_frame

    print(
        f"Vacancy regime: {args.train_frames}x {args.size}^2 frames, spacing "
        f"{args.spacing}, vacancy rate {args.vacancy_rate}, s_amplitude {args.s_amplitude}"
    )
    train_frames = [
        synthetic_mos2_frame(
            size=args.size, spacing=args.spacing, vacancy_rate=args.vacancy_rate,
            s_amplitude=args.s_amplitude, seed=s,
        )[0]
        for s in range(args.train_frames)
    ]
    held_frame, held_truth = synthetic_mos2_frame(
        size=args.size, spacing=args.spacing, vacancy_rate=args.vacancy_rate,
        s_amplitude=args.s_amplitude, seed=args.train_frames + 17,
    )

    train_ds = PairedAdaptiveLatticeDataset(
        train_frames, patch_size=args.patch_size, padding=args.padding,
        transform=default_transform,
    )
    eval_ds = AdaptiveLatticeDataset(
        [held_frame], patch_size=args.patch_size, padding=args.padding,
        transform=None,
    )
    eval_sites = eval_ds.sample_coords[0]
    eval_labels, eval_mask = site_truth_labels(eval_sites, held_truth)
    n_by_class = [int((eval_labels == c).sum()) for c in (0, 1, 2)]
    print(
        f"Train: {len(train_ds)} sites | held-out: {len(eval_ds)} sites, "
        f"matched Mo/S/vac = {n_by_class}"
    )

    if args.configs_json:
        # Score externally-chosen configs (e.g. the sweep's top-k from
        # ray_results/*/results.json or best_config.json) on the vacancy
        # metrics — the bridge between the sweep engine and this program
        # (VERDICT r2 item 5).
        raw = json.loads(open(args.configs_json).read())
        if isinstance(raw, dict):
            raw = [raw]
        # sweep results.json rows carry val_loss: score the top-k by it
        # (completed trials first); a bare best_config.json has neither
        raw = sorted(raw, key=sweep_row_rank)
        configs = []
        for row in raw[: args.top_k]:
            c = row.get("config", row)
            configs.append({
                "beta": float(c.get("beta", 1.0)),
                "gamma": float(c.get("gamma") or args.gamma),
                "lr": float(c.get("lr", args.lr)),
                "normalize": bool(c.get("normalize", True)),
                "latent_dim": int(c.get("latent_dim") or args.latent_dim),
            })
        print(f"Scoring {len(configs)} configs from {args.configs_json}")
    else:
        configs = []
        for beta in args.betas:
            for normalize in ([True, False] if args.norm_ablation else [True]):
                configs.append(
                    {"beta": beta, "gamma": args.gamma, "lr": args.lr,
                     "normalize": normalize}
                )

    results = []
    step_cache: dict = {}
    total = len(configs) * args.seeds
    for i, cfg in enumerate(configs):
        for s in range(args.seeds):
            seed = args.seed + 1000 * s
            print(
                f"[{i * args.seeds + s + 1}/{total}] {cfg} seed={seed} ...",
                flush=True,
            )
            m = run_config(
                cfg, train_ds, eval_ds, eval_labels, eval_mask, args,
                step_cache, seed=seed,
            )
            print(
                f"  ARI {m['kmeans_ari']:.3f} | lin-acc {m['linear_accuracy']:.3f} | "
                f"vac-AUC {m['vacancy_auc']:.3f} | kld {m['kld_mean']:.3f} | "
                f"rot90-cos {m['rot90_mu_cosine']:.3f} | {m['train_seconds']}s",
                flush=True,
            )
            results.append(m)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
    if args.seeds > 1:
        summary = summarize_seeds(results)
        spath = args.out + ".summary.json"
        with open(spath, "w") as f:
            json.dump(summary, f, indent=2)
        print("\nmean ± std across seeds:")
        for row in summary:
            print(
                f"  beta {row['beta']:<5} norm {str(row['normalize']):<5} "
                f"({row['n_seeds']} seeds): "
                + " | ".join(
                    f"{k} {row[f'{k}_mean']:.3f}±{row[f'{k}_std']:.3f}"
                    for k in _SUMMARY_KEYS
                )
            )
        print(f"Summary written to {spath}")
    print(f"Results written to {args.out}")
    return results


def build_argparser():
    p = argparse.ArgumentParser(description="Vacancy-regime accuracy program")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--spacing", type=float, default=40.0)
    p.add_argument("--vacancy-rate", type=float, default=0.12)
    p.add_argument("--s-amplitude", type=float, default=0.45)
    p.add_argument("--train-frames", type=int, default=3)
    p.add_argument("--patch-size", type=int, default=128)
    p.add_argument("--padding", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=10.0)
    p.add_argument("--betas", type=float, nargs="+", default=[0.1, 0.5, 1.0, 10.0])
    p.add_argument(
        "--beta-annealing", action="store_true", default=True,
        help="0 during 5 warmup epochs, 15-epoch linear ramp to beta "
        "(the production train_rvae recipe)",
    )
    p.add_argument("--no-beta-annealing", dest="beta_annealing", action="store_false")
    p.add_argument("--norm-ablation", action="store_true", default=True)
    p.add_argument("--no-norm-ablation", dest="norm_ablation", action="store_false")
    p.add_argument("--out", type=str, default="accuracy_results.json")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--seeds", type=int, default=1,
        help="Seeds per config; >1 also writes <out>.summary.json with "
        "mean±std across seeds",
    )
    p.add_argument(
        "--configs-json", type=str, default=None,
        help="Score configs from a JSON file (sweep results.json rows or "
        "best_config.json) instead of the beta x norm grid",
    )
    p.add_argument(
        "--top-k", type=int, default=5,
        help="With --configs-json: score at most this many configs",
    )
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true", help="tiny smoke run")
    return p


if __name__ == "__main__":
    _args = build_argparser().parse_args()
    maybe_force_cpu(_args)
    if _args.quick:
        _args.size = 512
        _args.spacing = 40.0
        _args.train_frames = 1
        _args.patch_size = 32
        _args.padding = 8
        _args.batch_size = 64
        _args.epochs = 2
        _args.betas = [1.0]
    main(_args)
