#!/usr/bin/env python
"""Multi-task demo: ICM GP with per-task noise (Coregion x Switched).

The gpflow multi-task idiom rebuilt TPU-native (SURVEY.md §2.3;
gpflow:gpflow/kernels.py Coregion + gpflow/likelihoods.py
SwitchedLikelihood): three tasks share one latent function through an
intrinsic-coregionalization-model kernel k(x,t; x',t') =
k_rbf(x,x') * B[t,t'], B = W W^T + diag(kappa), while the
switched_gaussian likelihood learns one observation-noise variance PER
TASK (Y's last column is the task index).

Trains a single-layer sparse GP on three noisy copies of related
functions, then plots per-task predictive fits (mean +/- 2 sigma in the
task's own noise), the learned task-correlation matrix B, and the
learned vs true per-task noise standard deviations.

Writes demos/multitask_icm.png. Run: python demos/multitask_icm.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dgps_with_iwvi_tpu.models import BuildArgs, build_model
from dgps_with_iwvi_tpu.ops.transforms import positive
from dgps_with_iwvi_tpu.training import TrainConfig, fit

TRUE_STDS = (0.05, 0.25, 0.6)
# per-task affine links to one shared latent f(x) = sin(2x): the ICM's
# rank-1 B can represent exactly this family
TASK_SCALE = (1.0, 0.7, -0.9)


def make_data(n_per=120, seed=0):
    rng = np.random.RandomState(seed)
    xs, ys = [], []
    for t, (s, a) in enumerate(zip(TRUE_STDS, TASK_SCALE)):
        x = np.sort(rng.uniform(-3, 3, (n_per, 1)), axis=0)
        y = a * np.sin(2 * x) + s * rng.randn(n_per, 1)
        xs.append(np.concatenate([x, np.full((n_per, 1), float(t))], 1))
        ys.append(np.concatenate([y, np.full((n_per, 1), float(t))], 1))
    return (np.concatenate(xs).astype(np.float32),
            np.concatenate(ys).astype(np.float32))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=4000)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "multitask_icm.png"))
    args = p.parse_args(argv)

    X, Y = make_data()
    key = jax.random.PRNGKey(0)
    build = BuildArgs(configuration="G", mode="VI", num_inducing=32,
                      kernel_kind="rbf[0]*coregion3x1[1]",
                      likelihood="switched_gaussian")
    cfg, params = build_model(key, build, jnp.asarray(X), jnp.asarray(Y))
    tc = TrainConfig(lr=0.01, natgrad="none", minibatch_size=X.shape[0],
                     iterations=args.iterations,
                     steps_per_call=min(500, args.iterations))
    trained, _ = fit(key, cfg, params, jnp.asarray(X), jnp.asarray(Y), tc)

    # per-task predictive on a grid: f-moments + that task's own noise
    from dgps_with_iwvi_tpu.models.dgp import predict_f
    xg = np.linspace(-3.2, 3.2, 200)[:, None].astype(np.float32)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 5, figsize=(22, 4),
                             gridspec_kw={"width_ratios": [3, 3, 3, 2, 2]})
    noise_t = np.asarray(positive(
        trained["likelihood"]["raw_noise_variance"]))
    for t in range(3):
        Xt = np.concatenate([xg, np.full_like(xg, float(t))], 1)
        fm_s, fv_s = predict_f(trained, cfg, jnp.asarray(Xt),
                               jax.random.PRNGKey(1), 64)  # [S, N, 1]
        fm = np.asarray(jnp.mean(fm_s, 0))[:, 0]
        fv = np.asarray(jnp.mean(fv_s + jnp.square(fm_s), 0)
                        - jnp.square(jnp.mean(fm_s, 0)))[:, 0]
        sd = np.sqrt(fv + noise_t[t])
        ax = axes[t]
        mask = np.isclose(X[:, 1], t)
        ax.plot(X[mask, 0], Y[mask, 0], "k.", ms=3, alpha=0.5)
        ax.plot(xg[:, 0], fm, "C0")
        ax.fill_between(xg[:, 0], fm - 2 * sd, fm + 2 * sd,
                        color="C0", alpha=0.2)
        ax.set_title(f"task {t}: learned sd={np.sqrt(noise_t[t]):.3f} "
                     f"(true {TRUE_STDS[t]})")
    # learned task covariance B = W W^T + diag(kappa) — the coregion leaf
    # is the second factor of the single product term
    from dgps_with_iwvi_tpu.ops.kernels import coregion_B
    B = np.asarray(coregion_B(
        trained["layers"][-1]["kernel"]["terms"][0][1]))
    d = np.sqrt(np.diag(B))
    corr = B / np.outer(d, d)
    im = axes[3].imshow(corr, vmin=-1, vmax=1, cmap="RdBu_r")
    axes[3].set_title("learned task correlation")
    for i in range(3):
        for j in range(3):
            axes[3].text(j, i, f"{corr[i, j]:+.2f}", ha="center",
                         va="center", fontsize=9)
    fig.colorbar(im, ax=axes[3], shrink=0.8)
    axes[4].bar(np.arange(3) - 0.17, TRUE_STDS, 0.34, label="true sd")
    axes[4].bar(np.arange(3) + 0.17, np.sqrt(noise_t), 0.34,
                label="learned sd")
    axes[4].set_xticks(range(3))
    axes[4].set_title("per-task noise (SwitchedLikelihood analog)")
    axes[4].legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"[demo] learned per-task sd: {np.sqrt(noise_t).round(3)} "
          f"(true {TRUE_STDS}); task correlation row 0: "
          f"{corr[0].round(2)} -> {args.out}")
    return {"noise_sd": np.sqrt(noise_t), "corr": corr}


if __name__ == "__main__":
    main()
