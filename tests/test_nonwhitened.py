"""Non-whitened (white=False) parameterization: conditionals, KL, natgrad.

The reference uses white=True throughout; its gpflow dependency supports
both, so the rebuilt core does too. Checks: dense-math parity, exact
equivalence with the whitened parameterization under u = Lm v, the Titsias
collapse, and gamma=1 natgrad exactness in u-space.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dgps_with_iwvi_tpu.models import DGPConfig, GPLayerConfig, elbo, init_dgp
from dgps_with_iwvi_tpu.ops import conditionals, kernels, kl, linalg
from dgps_with_iwvi_tpu.training import (
    extract_natvars,
    insert_natvars,
    natgrad_layer_ids,
    natgrad_update,
)

KEY = jax.random.PRNGKey(7)


def _setup(m=8, n=12, d_in=3, d_out=2):
    k1, k2, k3, k4 = jax.random.split(KEY, 4)
    Z = jax.random.normal(k1, (m, d_in), jnp.float64)
    X = jax.random.normal(k2, (n, d_in), jnp.float64)
    params = kernels.rbf_params(d_in, variance=1.4, lengthscales=0.8,
                                dtype=jnp.float64)
    q_mu = jax.random.normal(k3, (m, d_out), jnp.float64)
    q_sqrt = jnp.tril(0.3 * jax.random.normal(k4, (d_out, m, m), jnp.float64)
                      + jnp.eye(m))
    return X, Z, params, q_mu, q_sqrt


class TestNonWhitened:
    def test_conditional_vs_dense(self):
        X, Z, kp, q_mu, q_sqrt = _setup()
        out = conditionals.conditional(X, Z, kp, q_mu, q_sqrt,
                                       jitter=1e-12, white=False)
        Kuu = np.asarray(kernels.K(kp, Z, Z)) + 1e-12 * np.eye(Z.shape[0])
        Kuf = np.asarray(kernels.K(kp, Z, X))
        Kff = np.asarray(kernels.K(kp, X, X))
        Kinv = np.linalg.inv(Kuu)
        for d in range(q_mu.shape[1]):
            m_d = np.asarray(q_mu[:, d])
            Ld = np.tril(np.asarray(q_sqrt[d]))
            S = Ld @ Ld.T
            mean_ref = Kuf.T @ Kinv @ m_d
            cov_ref = Kff - Kuf.T @ Kinv @ Kuf \
                + Kuf.T @ Kinv @ S @ Kinv @ Kuf
            np.testing.assert_allclose(out.mean[:, d], mean_ref,
                                       rtol=1e-7, atol=1e-9)
            np.testing.assert_allclose(out.var[:, d], np.diag(cov_ref),
                                       rtol=1e-6, atol=1e-9)

    def test_gauss_kl_vs_dense(self):
        _, Z, kp, q_mu, q_sqrt = _setup()
        Kuu = kernels.K(kp, Z, Z) + 1e-12 * jnp.eye(Z.shape[0])
        Lm = jnp.linalg.cholesky(Kuu)
        got = float(kl.gauss_kl(q_mu, q_sqrt, Lm))
        Kn = np.asarray(Kuu)
        expected = 0.0
        M = Z.shape[0]
        for d in range(q_mu.shape[1]):
            m_d = np.asarray(q_mu[:, d])
            Ld = np.tril(np.asarray(q_sqrt[d]))
            S = Ld @ Ld.T
            Kinv = np.linalg.inv(Kn)
            expected += 0.5 * (
                m_d @ Kinv @ m_d + np.trace(Kinv @ S) - M
                + np.linalg.slogdet(Kn)[1] - np.linalg.slogdet(S)[1])
        np.testing.assert_allclose(got, expected, rtol=1e-8)

    def test_equivalence_with_whitened(self):
        """u = Lm v: (m_u, L_u) = (Lm m_v, Lm L_v) gives identical
        conditionals AND identical KL in both parameterizations."""
        X, Z, kp, q_mu_v, q_sqrt_v = _setup()
        Kuu = kernels.K(kp, Z, Z) + 1e-12 * jnp.eye(Z.shape[0])
        Lm = jnp.linalg.cholesky(Kuu)
        q_mu_u = Lm @ q_mu_v
        q_sqrt_u = jnp.einsum("ij,djk->dik", Lm, jnp.tril(q_sqrt_v))
        # q_sqrt_u is NOT triangular; re-factor S_u for the lower-tri store
        S_u = q_sqrt_u @ jnp.swapaxes(q_sqrt_u, -1, -2)
        L_u = jnp.linalg.cholesky(S_u)

        out_w = conditionals.conditional(X, Z, kp, q_mu_v, q_sqrt_v,
                                         jitter=1e-12, white=True)
        out_u = conditionals.conditional(X, Z, kp, q_mu_u, L_u,
                                         jitter=1e-12, white=False)
        np.testing.assert_allclose(out_u.mean, out_w.mean, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(out_u.var, out_w.var, rtol=1e-6, atol=1e-9)
        kl_w = float(kl.gauss_kl_white(q_mu_v, jnp.tril(q_sqrt_v)))
        kl_u = float(kl.gauss_kl(q_mu_u, L_u, Lm))
        np.testing.assert_allclose(kl_u, kl_w, rtol=1e-8)

    def _nonwhite_svgp(self, n=15, m=7, d=2, s2=0.15):
        kx, ky, kz = jax.random.split(KEY, 3)
        X = jax.random.normal(kx, (n, d), jnp.float64)
        Y = (jnp.sin(X.sum(-1, keepdims=True))
             + 0.1 * jax.random.normal(ky, (n, 1), jnp.float64))
        Z = jax.random.normal(kz, (m, d), jnp.float64)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=1, num_inducing=m,
                                  mean_function="zero", final=True,
                                  white=False),),
            num_data=n, objective="vi", jitter=1e-12)
        params = init_dgp(KEY, cfg, Z_inits=[Z], noise_variance=s2,
                          dtype=jnp.float64)
        return cfg, params, X, Y, Z

    def test_collapse_and_natgrad_exactness_nonwhite(self):
        """ELBO at optimal u-space q == exact log marginal (Z=X) and one
        gamma=1 natgrad step reaches that optimum from any start."""
        cfg, params, X, Y, Z = self._nonwhite_svgp()
        from dgps_with_iwvi_tpu.ops.likelihoods import noise_variance

        s2 = float(noise_variance(params["likelihood"]))
        kp = params["layers"][0]["kernel"]
        Kuu = np.asarray(kernels.K(kp, Z, Z)) + 1e-12 * np.eye(Z.shape[0])
        Kuf = np.asarray(kernels.K(kp, Z, X))
        # optimal u-space posterior (Titsias): Sig = (Kuu + s2^-1 Kuf Kuf^T)^-1
        Sig = np.linalg.inv(Kuu + Kuf @ Kuf.T / s2)
        m_u = Kuu @ Sig @ Kuf @ np.asarray(Y[:, 0]) / s2
        S_u = Kuu @ Sig @ Kuu

        # natgrad from arbitrary start
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        M = Z.shape[0]
        params["layers"][0]["q_mu"] = 0.5 * jax.random.normal(k1, (M, 1), jnp.float64)
        params["layers"][0]["q_sqrt"] = jnp.tril(
            0.2 * jax.random.normal(k2, (M, M), jnp.float64) + 1.5 * jnp.eye(M))[None]
        layer_ids = natgrad_layer_ids(cfg, "final")
        natvars = extract_natvars(params, layer_ids)

        def loss(nv):
            return -elbo(insert_natvars(params, nv, layer_ids), cfg, X, Y, KEY)

        g = jax.grad(loss)(natvars)
        new = natgrad_update(natvars, g, gamma=1.0)
        np.testing.assert_allclose(np.asarray(new[0]["q_mu"][:, 0]), m_u,
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(new[0]["q_S"][0]), S_u,
                                   rtol=1e-5, atol=1e-8)


class TestSharedFactors:
    def test_gp_kls_with_prefactored_lm_matches(self):
        """gp_kls(factors=...) must equal the recompute-Kuu path exactly:
        the elbo now shares ONE batched Kuu factorization between the
        conditionals and the non-whitened KLs (the KL used to re-gram and
        re-factorize every non-white layer every step)."""
        from dgps_with_iwvi_tpu.models.dgp import gp_kls, prefactor_gp_layers

        cfg = DGPConfig(
            layers=(
                GPLayerConfig(d_in=3, d_out=2, num_inducing=6, white=False),
                GPLayerConfig(d_in=2, d_out=1, num_inducing=6, final=True,
                              white=False),
            ),
            num_data=16)
        params = init_dgp(KEY, cfg, inner_q_sqrt_scale=0.4, dtype=jnp.float64)
        factors = prefactor_gp_layers(params, cfg)
        a = float(gp_kls(params, cfg))
        b = float(gp_kls(params, cfg, factors))
        np.testing.assert_allclose(b, a, rtol=1e-12)
