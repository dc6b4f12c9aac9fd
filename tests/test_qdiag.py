"""Diagonal variational family (gpflow SVGP q_diag=True analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgps_with_iwvi_tpu.models import (
    BuildArgs,
    DGPConfig,
    GPLayerConfig,
    build_model,
    elbo,
    init_dgp,
)
from dgps_with_iwvi_tpu.ops import conditionals, kernels, kl
from dgps_with_iwvi_tpu.training import TrainConfig, fit, natgrad_layer_ids

KEY = jax.random.PRNGKey(0)


class TestQDiag:
    def test_conditional_matches_full_with_diagonal_L(self):
        """q_sqrt [M, D] diag == full [D, M, M] diag-matrix q_sqrt."""
        k1, k2, k3 = jax.random.split(KEY, 3)
        m, n, d_in, d_out = 8, 11, 3, 2
        X = jax.random.normal(k1, (n, d_in), jnp.float64)
        Z = jax.random.normal(k2, (m, d_in), jnp.float64)
        kp = kernels.rbf_params(d_in, dtype=jnp.float64)
        q_mu = jax.random.normal(k3, (m, d_out), jnp.float64)
        scales = 0.3 + jax.random.uniform(k3, (m, d_out), jnp.float64)
        full = jnp.stack([jnp.diag(scales[:, d]) for d in range(d_out)])
        out_diag = conditionals.conditional(X, Z, kp, q_mu, scales,
                                            jitter=1e-12)
        out_full = conditionals.conditional(X, Z, kp, q_mu, full,
                                            jitter=1e-12)
        np.testing.assert_allclose(out_diag.mean, out_full.mean, rtol=1e-10)
        np.testing.assert_allclose(out_diag.var, out_full.var, rtol=1e-9)
        kl_diag = float(kl.gauss_kl_white_diag(q_mu, scales))
        kl_full = float(kl.gauss_kl_white(q_mu, full))
        np.testing.assert_allclose(kl_diag, kl_full, rtol=1e-10)

    def test_qdiag_training_improves(self):
        kx, ky = jax.random.split(KEY)
        X = jax.random.normal(kx, (64, 3), jnp.float64)
        Y = jnp.sin(2 * X[:, :1]) + 0.05 * jax.random.normal(ky, (64, 1), jnp.float64)
        args = BuildArgs(configuration="G", num_inducing=10, q_diag=True)
        cfg, params = build_model(KEY, args, X, Y)
        assert params["layers"][0]["q_sqrt"].shape == (10, 1)
        before = float(elbo(params, cfg, X, Y, KEY))
        tc = TrainConfig(lr=1e-2, natgrad="none", minibatch_size=64,
                         iterations=200, steps_per_call=100)
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before + 1.0, (before, after)

    def test_natgrad_supported_for_qdiag(self):
        """q_diag natural gradients are supported (diagonal elementwise
        family — see training/natgrad.py; was guarded out in round 1)."""
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=2, d_out=1, num_inducing=4,
                                  final=True, q_diag=True),),
            num_data=10)
        assert natgrad_layer_ids(cfg, "final") == (0,)
