"""Config fuzz: random layer stacks / dims / objectives must build, give a
finite objective, finite gradients, and a working prediction path.

Catches plumbing edge cases the targeted tests don't reach (deep stacks,
multiple LV layers, odd widths, mixed white/q_diag, both likelihoods).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from dgps_with_iwvi_tpu.models import (
    DGPConfig,
    GPLayerConfig,
    LVLayerConfig,
    elbo,
    init_dgp,
    predict_log_density,
    predict_y,
)

SEEDS = list(range(10))


def _random_config(rng: random.Random):
    d_x = rng.choice([1, 3, 7])
    d_y = rng.choice([1, 2])
    n = rng.choice([17, 33])
    n_layers = rng.randint(1, 4)
    white = rng.random() < 0.7
    q_diag = rng.random() < 0.3
    layers = []
    width = d_x
    n_lv = 0
    for li in range(n_layers - 1):
        if rng.random() < 0.4:
            d_w = rng.choice([1, 2])
            layers.append(LVLayerConfig(d_w=d_w, d_in=width, d_y=d_y,
                                        d_x=d_x))
            width += d_w
            n_lv += 1
        else:
            d_out = rng.choice([2, 5])
            kind = rng.choice(["rbf", "matern32", "matern52"])
            layers.append(GPLayerConfig(
                d_in=width, d_out=d_out, num_inducing=rng.choice([3, 6]),
                kernel_kind=kind, white=white, q_diag=q_diag,
                feature=("multiscale" if kind == "rbf"
                         and rng.random() < 0.3 else "points")))
            width = d_out
    fkind = rng.choice(["rbf", "matern32", "matern52"])
    layers.append(GPLayerConfig(
        d_in=width, d_out=d_y, num_inducing=rng.choice([3, 6]),
        final=True, white=white, q_diag=q_diag, kernel_kind=fkind,
        feature=("multiscale" if fkind == "rbf" and rng.random() < 0.3
                 else "points"),
        mean_function=rng.choice(["skip", "zero", "auto"])))
    likelihood = rng.choice(["gaussian", "gaussian", "bernoulli"])
    cfg = DGPConfig(
        layers=tuple(layers), num_data=n,
        objective=rng.choice(["vi", "iw"]),
        num_samples=rng.choice([1, 3]),
        num_iw_samples=rng.choice([1, 4]),
        likelihood=likelihood)
    return cfg, n, d_x, d_y


@pytest.mark.parametrize("seed", SEEDS)
def test_random_config_trains_and_predicts(seed):
    rng = random.Random(seed)
    cfg, n, d_x, d_y = _random_config(rng)
    key = jax.random.PRNGKey(seed)
    kx, ky, kp = jax.random.split(key, 3)
    X = jax.random.normal(kx, (n, d_x), jnp.float64)
    if cfg.likelihood == "bernoulli":
        Y = (jax.random.normal(ky, (n, d_y), jnp.float64) > 0).astype(
            jnp.float64)
    else:
        Y = jnp.sin(X.sum(-1, keepdims=True)) * jnp.ones((1, d_y))
    params = init_dgp(kp, cfg, dtype=jnp.float64)

    val, grads = jax.value_and_grad(
        lambda p: -elbo(p, cfg, X, Y, key))(params)
    assert bool(jnp.isfinite(val)), (seed, cfg)
    for leaf in jax.tree.leaves(grads):
        assert bool(jnp.all(jnp.isfinite(leaf))), (seed, cfg)

    mean, var = predict_y(params, cfg, X, key, 4)
    assert mean.shape == (n, d_y) and bool(jnp.all(jnp.isfinite(mean)))
    assert bool(jnp.all(var >= -1e-9))
    ld = predict_log_density(params, cfg, X, Y, key, 4)
    assert ld.shape == (n,) and bool(jnp.all(jnp.isfinite(ld)))
