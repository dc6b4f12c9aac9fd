"""Bernoulli (probit) likelihood + quadrature machinery.

Parity strategy mirrors gpflow's test_likelihoods: quadrature results vs
analytic identities, then an end-to-end binary-classification DGP run.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm

from dgps_with_iwvi_tpu.models import DGPConfig, GPLayerConfig, elbo, init_dgp, predict_y
from dgps_with_iwvi_tpu.ops import likelihoods
from dgps_with_iwvi_tpu.training import TrainConfig, fit

KEY = jax.random.PRNGKey(0)


class TestQuadrature:
    def test_gauss_hermite_gaussian_identity(self):
        """E_{N(f|m,v)}[log N(y|f,s2)] via quadrature == analytic formula."""
        gp = likelihoods.gaussian_params(0.3, jnp.float64)
        s2 = float(likelihoods.noise_variance(gp))
        m = jnp.array([0.4, -1.0]); v = jnp.array([0.2, 1.5])
        y = jnp.array([0.1, 0.5])
        quad = likelihoods.gauss_hermite_expectation(
            lambda f: -0.5 * (np.log(2 * np.pi * s2) + (y[..., None] - f) ** 2 / s2),
            m, v, n_points=40)
        analytic = likelihoods.variational_expectations(
            gp, m[:, None], v[:, None], y[:, None])
        np.testing.assert_allclose(np.asarray(quad), np.asarray(analytic),
                                   rtol=1e-9)

    def test_quadrature_gradient_finite_at_zero_variance(self):
        """d/dvar of the Gauss-Hermite expectation at var == 0 must be
        finite: a clamped final-layer variance can hit exactly 0 and
        sqrt(max(v,0)) has an inf*0=NaN backward there — the identical AD
        hazard fixed on the Gaussian sampling path (safe_sqrt). Regression
        for the Bernoulli training path."""
        bp = likelihoods.bernoulli_params(jnp.float64)
        y = jnp.ones((3, 1), jnp.float64)

        def ve_sum(v):
            m = jnp.full((3, 1), 0.3, jnp.float64)
            return jnp.sum(likelihoods.bernoulli_variational_expectations(
                bp, m, v, y))

        g = jax.grad(ve_sum)(jnp.zeros((3, 1), jnp.float64))
        assert np.all(np.isfinite(np.asarray(g)))
        # and the value itself is the deterministic-f limit
        val = ve_sum(jnp.zeros((3, 1), jnp.float64))
        exact = 3 * float(jax.scipy.stats.norm.logcdf(0.3))
        np.testing.assert_allclose(float(val), exact, rtol=1e-6)

    def test_bernoulli_ve_vs_bruteforce_mc(self):
        bp = likelihoods.bernoulli_params(jnp.float64)
        m = jnp.array([[0.5], [-0.3]], jnp.float64)
        v = jnp.array([[0.8], [0.2]], jnp.float64)
        y = jnp.array([[1.0], [0.0]], jnp.float64)
        got = likelihoods.bernoulli_variational_expectations(bp, m, v, y)
        rng = np.random.RandomState(0)
        for i in range(2):
            f = np.asarray(m[i, 0]) + np.sqrt(np.asarray(v[i, 0])) * rng.randn(400000)
            sign = 1.0 if float(y[i, 0]) > 0.5 else -1.0
            mc = norm.logcdf(sign * f).mean()
            np.testing.assert_allclose(float(got[i]), mc, atol=5e-3)

    def test_probit_predictive_analytic(self):
        bp = likelihoods.bernoulli_params(jnp.float64)
        m, v = jnp.array([[0.7]]), jnp.array([[1.3]])
        p, pv = likelihoods.bernoulli_predict_mean_and_var(bp, m, v)
        expected = norm.cdf(0.7 / np.sqrt(2.3))
        np.testing.assert_allclose(float(p[0, 0]), expected, rtol=1e-7)
        np.testing.assert_allclose(float(pv[0, 0]),
                                   expected * (1 - expected), rtol=1e-6)
        ld1 = likelihoods.bernoulli_predict_density(bp, m, v, jnp.ones((1, 1)))
        ld0 = likelihoods.bernoulli_predict_density(bp, m, v, jnp.zeros((1, 1)))
        np.testing.assert_allclose(float(jnp.exp(ld1[0]) + jnp.exp(ld0[0])),
                                   1.0, rtol=1e-6)


class TestClassificationE2E:
    def test_svgp_classification_learns(self):
        """Binary labels from a linear rule: training raises accuracy well
        above chance and improves the bound."""
        n, d = 120, 2
        kx = jax.random.PRNGKey(5)
        X = jax.random.normal(kx, (n, d), jnp.float64)
        Y = (X[:, :1] + 0.5 * X[:, 1:2] > 0).astype(jnp.float64)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=1, num_inducing=16,
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi", likelihood="bernoulli")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        before = float(elbo(params, cfg, X, Y, KEY))
        tc = TrainConfig(lr=5e-2, natgrad="none", minibatch_size=120,
                         iterations=300, steps_per_call=100)
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before + 5.0, (before, after)
        p, _ = predict_y(trained, cfg, X, jax.random.PRNGKey(1), 32)
        acc = float(jnp.mean((p > 0.5) == (Y > 0.5)))
        assert acc > 0.9, acc
