#!/usr/bin/env python
"""1-D toy demo: latent-variable DGP on bimodal/heteroscedastic data.

TPU-native rebuild of the reference's demo notebook (ref:demos/ —
SURVEY.md §3.5): a small LG model trained full-batch with Adam on a 1-D
regression problem whose conditional density is bimodal, then

  1. posterior predictive draws (w ~ prior) showing the learned
     non-Gaussian conditional density, and
  2. a latent traversal using LatentVarMode.GIVEN — sweeping w over a grid
     to show how the latent input indexes the two modes.

Writes demos/toy_1d.png. Run: python demos/toy_1d.py [--iterations 3000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dgps_with_iwvi_tpu.models import (
    BuildArgs,
    build_model,
    predict_f,
)
from dgps_with_iwvi_tpu.models.layers import LatentVarMode
from dgps_with_iwvi_tpu.ops.likelihoods import noise_variance
from dgps_with_iwvi_tpu.training import TrainConfig, fit


def make_data(n=200, seed=0):
    """Bimodal: y = sin(3x) +/- 0.7 with random branch + hetero noise."""
    rng = np.random.RandomState(seed)
    X = rng.uniform(-2, 2, n)[:, None]
    branch = rng.rand(n) > 0.5
    y = np.sin(3 * X[:, 0]) + np.where(branch, 0.7, -0.7)
    y += (0.05 + 0.1 * (X[:, 0] > 0)) * rng.randn(n)
    return (X.astype(np.float32),
            y[:, None].astype(np.float32))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=3000)
    p.add_argument("--K", type=int, default=20)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "toy_1d.png"))
    args = p.parse_args(argv)

    X, Y = make_data()
    key = jax.random.PRNGKey(0)
    build = BuildArgs(configuration="LG", mode="IW", num_inducing=32,
                      num_iw_samples=args.K, encoder_init_logvar=-2.0)
    config, params = build_model(key, build, jnp.asarray(X), jnp.asarray(Y))
    tc = TrainConfig(lr=5e-3, natgrad="final", gamma=5e-2,
                     minibatch_size=200, iterations=args.iterations,
                     steps_per_call=100)
    trained, _ = fit(key, config, params, jnp.asarray(X), jnp.asarray(Y), tc,
                     callback=lambda s, l, _: (s % 1000 == 0) and print(
                         f"  step {s}: elbo {-l:.1f}"))

    xg = jnp.linspace(-2.5, 2.5, 200)[:, None].astype(jnp.float32)
    # (1) predictive draws: one w ~ N(0,1) per DRAW (shared across x) so each
    # draw is a smooth function, like the paper's figure
    s2 = float(noise_variance(trained["likelihood"]))
    ws = jax.random.normal(jax.random.PRNGKey(1), (60,))

    @jax.jit
    def draw(w):
        wfix = jnp.full((200, 1), w, jnp.float32)
        fm, _ = predict_f(trained, config, xg, jax.random.PRNGKey(2), 1,
                          lv_mode=LatentVarMode.GIVEN, ws_given=[wfix])
        return fm[0, :, 0]

    draws = np.asarray(jax.vmap(draw)(ws))
    # (2) latent traversal: LatentVarMode.GIVEN over a w grid
    wgrid = np.linspace(-2.0, 2.0, 7)
    traversal = []
    for w in wgrid:
        wfix = jnp.full((200, 1), float(w), jnp.float32)
        fm, _ = predict_f(trained, config, xg, jax.random.PRNGKey(2), 1,
                          lv_mode=LatentVarMode.GIVEN, ws_given=[wfix])
        traversal.append(np.asarray(fm)[0, :, 0])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4.5), sharey=True)
    ax = axes[0]
    for d in draws:
        ax.plot(np.asarray(xg)[:, 0], d, color="C0", alpha=0.12, lw=1)
    ax.scatter(X[:, 0], Y[:, 0], s=8, color="k", zorder=3, label="data")
    ax.set_title(f"posterior draws (w ~ prior), noise std {np.sqrt(s2):.3f}")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.legend()
    ax = axes[1]
    cmap = plt.get_cmap("coolwarm")
    for i, (w, t) in enumerate(zip(wgrid, traversal)):
        ax.plot(np.asarray(xg)[:, 0], t, color=cmap(i / (len(wgrid) - 1)),
                lw=2, label=f"w={w:+.1f}")
    ax.scatter(X[:, 0], Y[:, 0], s=8, color="k", zorder=3)
    ax.set_title("latent traversal (LatentVarMode.GIVEN)")
    ax.set_xlabel("x")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")
    return args.out


if __name__ == "__main__":
    main()
