"""Multi-output regression (d_y > 1): objectives, prediction, metrics.

The UCI suite is single-output, but the layer/likelihood math is written
for arbitrary d_y (the reference's gpflow core is too); pin that down.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dgps_with_iwvi_tpu.evaluation import evaluate
from dgps_with_iwvi_tpu.models import BuildArgs, build_model, elbo, predict_y
from dgps_with_iwvi_tpu.training import TrainConfig, fit

KEY = jax.random.PRNGKey(0)


class TestMultiOutput:
    def _data(self, n=60, d=3, dtype=jnp.float64):
        kx, ky = jax.random.split(KEY)
        X = jax.random.normal(kx, (n, d), dtype)
        Y = jnp.concatenate([jnp.sin(X[:, :1]), jnp.cos(X[:, 1:2])], axis=1)
        Y = Y + 0.05 * jax.random.normal(ky, (n, 2), dtype)
        return X, Y

    def test_lg_iw_multioutput_trains(self):
        X, Y = self._data()
        args = BuildArgs(configuration="LG", mode="IW", num_inducing=10,
                         num_iw_samples=4)
        cfg, params = build_model(KEY, args, X, Y)
        assert cfg.layers[-1].d_out == 2
        keys = jax.random.split(jax.random.PRNGKey(2), 16)
        before = float(jnp.mean(jax.vmap(
            lambda k: elbo(params, cfg, X, Y, k))(keys)))
        tc = TrainConfig(lr=1e-2, natgrad="final", gamma=0.05,
                         minibatch_size=60, iterations=150, steps_per_call=50)
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(jnp.mean(jax.vmap(
            lambda k: elbo(trained, cfg, X, Y, k))(keys)))
        assert after > before + 1.0, (before, after)
        mean, var = predict_y(trained, cfg, X, KEY, 32)
        assert mean.shape == (60, 2) and var.shape == (60, 2)
        assert bool(jnp.all(var > 0))

    def test_metrics_per_dim_unnormalization(self):
        X, Y = self._data(n=40)
        args = BuildArgs(configuration="G", num_inducing=8)
        cfg, params = build_model(KEY, args, X, Y)
        y_std = np.array([2.0, 0.5])
        m = evaluate(params, cfg, X, Y, KEY, y_std=y_std, num_samples=8,
                     batch_size=32)
        # loglik shift = -sum log sigma_d
        np.testing.assert_allclose(
            m["test_loglik"],
            m["test_loglik_normalized"] - np.log(2.0) - np.log(0.5),
            rtol=1e-12)
        assert np.isfinite(m["test_rmse"]) and m["test_rmse"] > 0
