"""Non-amortized latent-variable layer (per-datapoint q(w) — SURVEY.md §2.1
small-N variant) and data-index plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgps_with_iwvi_tpu.models import (
    BuildArgs,
    DGPConfig,
    GPLayerConfig,
    LVLayerConfig,
    build_model,
    elbo,
    init_dgp,
    propagate,
)
from dgps_with_iwvi_tpu.training import TrainConfig, fit

KEY = jax.random.PRNGKey(0)


def _cfg(n, d, amortized):
    return DGPConfig(
        layers=(
            LVLayerConfig(d_w=2, d_in=d, d_y=1, amortized=amortized,
                          num_data=0 if amortized else n),
            GPLayerConfig(d_in=d + 2, d_out=1, num_inducing=6, final=True),
        ),
        num_data=n, objective="iw", num_iw_samples=4)


class TestNonAmortized:
    def test_init_shapes(self):
        cfg = _cfg(20, 3, amortized=False)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        assert params["layers"][0]["q_mu_w"].shape == (20, 2)
        assert params["layers"][0]["q_logvar_w"].shape == (20, 2)
        assert "encoder" not in params["layers"][0]

    def test_indices_select_rows(self):
        """Row n's variational params — and only row n's — get gradient."""
        n, d = 20, 3
        cfg = _cfg(n, d, amortized=False)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        X = jax.random.normal(KEY, (n, d), jnp.float64)
        Y = jnp.sin(X[:, :1])
        idx = jnp.array([3, 7, 11])
        g = jax.grad(lambda p: elbo(p, cfg, X[idx], Y[idx], KEY,
                                    data_idx=idx))(params)
        gmu = np.asarray(g["layers"][0]["q_mu_w"])
        nonzero_rows = np.where(np.abs(gmu).sum(-1) > 0)[0]
        np.testing.assert_array_equal(nonzero_rows, [3, 7, 11])

    def test_missing_idx_raises(self):
        cfg = _cfg(10, 2, amortized=False)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        X = jax.random.normal(KEY, (10, 2), jnp.float64)
        with pytest.raises(AssertionError):
            elbo(params, cfg, X, X[:, :1], KEY)  # no data_idx

    def test_training_improves(self):
        n, d = 40, 2
        kx, ky = jax.random.split(KEY)
        X = jax.random.normal(kx, (n, d), jnp.float64)
        Y = jnp.sin(2 * X[:, :1]) + 0.05 * jax.random.normal(ky, (n, 1), jnp.float64)
        args = BuildArgs(configuration="LG", mode="IW", num_inducing=8,
                         num_iw_samples=4, amortized=False)
        cfg, params = build_model(KEY, args, X, Y)
        assert not cfg.layers[0].amortized
        keys = jax.random.split(jax.random.PRNGKey(9), 16)
        idx_all = jnp.arange(n)
        before = float(jnp.mean(jax.vmap(
            lambda k: elbo(params, cfg, X, Y, k, data_idx=idx_all))(keys)))
        tc = TrainConfig(lr=1e-2, natgrad="none", minibatch_size=16,
                         iterations=150, steps_per_call=50)
        trained, _ = fit(jax.random.PRNGKey(1), cfg, params, X, Y, tc)
        after = float(jnp.mean(jax.vmap(
            lambda k: elbo(trained, cfg, X, Y, k, data_idx=idx_all))(keys)))
        assert after > before + 0.5, (before, after)
        # the per-point params actually moved
        assert float(jnp.abs(trained["layers"][0]["q_mu_w"]).max()) > 1e-4

    def test_amortized_prediction_unaffected(self):
        """PRIOR-mode prediction needs no indices for either variant."""
        cfg = _cfg(10, 2, amortized=False)
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        X = jax.random.normal(KEY, (10, 2), jnp.float64)
        fmean, fvar, _, _ = propagate(params, cfg, X, KEY, (3,),
                                      lv_mode="prior")
        assert fmean.shape == (3, 10, 1)
        assert bool(jnp.all(jnp.isfinite(fmean)))
