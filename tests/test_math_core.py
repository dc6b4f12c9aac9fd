"""Parity tests for the GP math core against brute-force closed forms.

Mirrors the test burden the reference inherits from its dependency suite
(gpflow tests: test_kerns / test_conditionals / test_kldiv / test_likelihoods
— SURVEY.md §4): every op is checked against a dense naive implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgps_with_iwvi_tpu.ops import (
    conditionals,
    kernels,
    kl,
    likelihoods,
    linalg,
    transforms,
)

KEY = jax.random.PRNGKey(0)


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float64)


class TestTransforms:
    def test_positive_roundtrip(self):
        vals = jnp.array([1e-5, 0.1, 1.0, 10.0, 1e3], jnp.float64)
        raw = transforms.positive_inverse(vals)
        np.testing.assert_allclose(transforms.positive(raw), vals, rtol=1e-10)

    def test_positive_lower_bound(self):
        raw = jnp.array([-1e4], jnp.float64)
        assert transforms.positive(raw) >= transforms.DEFAULT_POSITIVE_LOWER

    def test_positive_inverse_clamps_zero_but_rejects_negative(self):
        # [0, lower] is unreachable -> clamp to the lower floor (documented);
        # negative is an invalid init -> NaN so the caller bug surfaces.
        raw = transforms.positive_inverse(jnp.array([0.0, 1e-9], jnp.float64))
        out = transforms.positive(raw)
        assert bool(jnp.all(jnp.isfinite(raw)))
        np.testing.assert_allclose(
            out, transforms.DEFAULT_POSITIVE_LOWER, rtol=1e-3)
        bad = transforms.positive_inverse(jnp.array([-1.0], jnp.float64))
        assert bool(jnp.all(jnp.isnan(bad)))

    def test_tril_pack_roundtrip(self):
        n = 5
        L = jnp.tril(_rand(KEY, n, n))
        vec = transforms.tril_to_vec(L)
        assert vec.shape == (n * (n + 1) // 2,)
        np.testing.assert_allclose(transforms.vec_to_tril(vec, n), L)


class TestKernels:
    @pytest.mark.parametrize("kind", ["rbf", "matern12", "matern32", "matern52"])
    def test_against_naive(self, kind):
        k1, k2 = jax.random.split(KEY)
        X, X2 = _rand(k1, 7, 3), _rand(k2, 5, 3)
        var, ls = 1.7, np.array([0.5, 1.2, 2.0])
        params = kernels.rbf_params(3, variance=var, lengthscales=ls, dtype=jnp.float64)
        got = np.asarray(kernels.K(params, X, X2, kind=kind))

        Xn, X2n = np.asarray(X), np.asarray(X2)
        expected = np.zeros((7, 5))
        for i in range(7):
            for j in range(5):
                d2 = np.sum(((Xn[i] - X2n[j]) / ls) ** 2)
                r = np.sqrt(d2)
                if kind == "rbf":
                    expected[i, j] = var * np.exp(-0.5 * d2)
                elif kind == "matern12":
                    expected[i, j] = var * np.exp(-r)
                elif kind == "matern32":
                    expected[i, j] = var * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
                else:
                    expected[i, j] = (
                        var * (1 + np.sqrt(5) * r + 5 / 3 * r**2) * np.exp(-np.sqrt(5) * r)
                    )
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-9)

    def test_kdiag_matches_k(self):
        X = _rand(KEY, 6, 4)
        params = kernels.rbf_params(4, variance=2.3)
        Kfull = kernels.K(params, X, X)
        np.testing.assert_allclose(
            kernels.Kdiag(params, X), jnp.diagonal(Kfull), rtol=1e-10
        )

    def test_batched_leading_axes(self):
        X = _rand(KEY, 3, 4, 6, 2)  # [K, S, N, D]
        Z = _rand(KEY, 5, 2)
        params = kernels.rbf_params(2)
        KZX = kernels.K(params, Z, X)
        assert KZX.shape == (3, 4, 5, 6)
        np.testing.assert_allclose(
            KZX[1, 2], kernels.K(params, Z, X[1, 2]), rtol=1e-12
        )


class TestLinalg:
    def test_cholesky_with_jitter_basic(self):
        A = _rand(KEY, 6, 6)
        Kmat = A @ A.T + 5.0 * jnp.eye(6)
        L = linalg.cholesky_with_jitter(Kmat, 1e-6)
        np.testing.assert_allclose(L @ L.T, Kmat, rtol=1e-5, atol=1e-5)

    def test_jitter_escalation_rescues_singular(self):
        # Rank-deficient matrix: plain cholesky at 1e-12 effective jitter
        # fails in f32; escalation must produce a finite usable factor.
        v = jnp.ones((4, 1), jnp.float32)
        Kmat = (v @ v.T).astype(jnp.float32)  # rank 1
        L = linalg.cholesky_with_jitter(Kmat, 1e-6, max_tries=6)
        assert bool(jnp.all(jnp.isfinite(L)))
        d = jnp.diagonal(L)
        assert bool(jnp.all(d > 0))

    def test_fast_path_gradient_matches_plain_cholesky(self):
        """Well-conditioned input: the rescue-on-failure design must be
        gradient-identical to a plain fixed-jitter Cholesky (the common
        path is ONE factorization, no selection ladder)."""
        A = _rand(KEY, 6, 6)
        Kmat = A @ A.T + 5.0 * jnp.eye(6)

        f1 = lambda K: jnp.sum(jnp.sin(
            linalg.cholesky_with_jitter(K, 1e-6, max_tries=4)))
        f2 = lambda K: jnp.sum(jnp.sin(
            jnp.linalg.cholesky(K + 1e-6 * jnp.eye(6))))
        np.testing.assert_allclose(np.asarray(jax.grad(f1)(Kmat)),
                                   np.asarray(jax.grad(f2)(Kmat)), rtol=1e-12)

    def test_rescue_gradients_finite(self):
        """Rank-deficient f32 input under grad: the escalation branch must
        produce finite gradients (no 0*Inf poisoning through the failed
        base-jitter factor)."""
        v = jnp.linspace(0.5, 1.5, 4, dtype=jnp.float32)[:, None]
        Kmat = (v @ v.T).astype(jnp.float32)  # rank 1

        def f(K):
            L = linalg.cholesky_with_jitter(K, 1e-7, max_tries=6)
            return jnp.sum(jnp.square(L))

        # confirm the fast path actually fails here (rescue is exercised)
        L0 = jnp.linalg.cholesky(Kmat + 1e-7 * jnp.eye(4, dtype=jnp.float32))
        assert not bool(jnp.all(jnp.isfinite(L0))), "fixture must need rescue"
        g = jax.grad(f)(Kmat)
        assert bool(jnp.all(jnp.isfinite(g))), g
        assert bool(jnp.all(jnp.isfinite(f(Kmat))))

    def test_chol_reuse_pullback_matches_jax_vjp(self):
        """_chol_reuse's manual Cholesky pullback must match
        jax.vjp(jnp.linalg.cholesky) bit-for-bit in convention (symmetrized
        cotangent), single and batched."""
        from dgps_with_iwvi_tpu.ops.linalg import _chol_reuse_bwd

        rng = np.random.RandomState(0)
        A0 = rng.randn(5, 5)
        A = jnp.asarray(A0 @ A0.T + 5 * np.eye(5))
        Ab = jnp.stack([A, 1.3 * A])
        for a in (A, Ab):
            L = jnp.linalg.cholesky(a)
            Lbar = jnp.asarray(rng.randn(*a.shape))
            _, pull = jax.vjp(jnp.linalg.cholesky, a)
            np.testing.assert_allclose(
                np.asarray(_chol_reuse_bwd(L, Lbar)[0]),
                np.asarray(pull(Lbar)[0]), atol=1e-14)

    def test_rescue_under_vmap_gradients_finite(self):
        """vmap lowers a batched-predicate lax.cond to a select that runs
        BOTH branches: for an element whose probe factorization failed, the
        fast branch must not leak NaNs into the backward pass (its probe
        factor is sanitized before the reuse pullback), and the good
        element's gradient must equal the unbatched fast-path gradient."""
        A = _rand(KEY, 4, 4)
        good = (A @ A.T + 3.0 * jnp.eye(4)).astype(jnp.float32)
        v = jnp.linspace(0.5, 1.5, 4, dtype=jnp.float32)[:, None]
        bad = (v @ v.T).astype(jnp.float32)  # rank 1: probe fails at 1e-7
        Ks = jnp.stack([good, bad])

        def f(K):
            L = linalg.cholesky_with_jitter(K, 1e-7, max_tries=6)
            return jnp.sum(jnp.square(L))

        g = jax.vmap(jax.grad(f))(Ks)
        assert bool(jnp.all(jnp.isfinite(g))), g
        np.testing.assert_allclose(np.asarray(g[0]),
                                   np.asarray(jax.grad(f)(good)),
                                   rtol=1e-6)

    def test_rescue_under_scan_and_jit(self):
        """cholesky_with_jitter inside a scanned jitted step (the training
        hot path): both branches trace, the good input stays on the fast
        path, a bad input still rescues."""
        A = _rand(KEY, 5, 5)
        good = (A @ A.T + 3.0 * jnp.eye(5)).astype(jnp.float32)
        v = jnp.ones((5, 1), jnp.float32)
        bad = (v @ v.T).astype(jnp.float32)

        @jax.jit
        def run(K):
            def body(c, _):
                L = linalg.cholesky_with_jitter(K, 1e-7, max_tries=6)
                return c + jnp.sum(jnp.log(jnp.diagonal(L))), None
            out, _ = jax.lax.scan(body, 0.0, None, length=3)
            return out

        assert np.isfinite(float(run(good)))
        assert np.isfinite(float(run(bad)))

    def test_chol_and_inverse_values_and_grads(self):
        """chol_and_inverse must match (cholesky_with_jitter, solve) in
        values AND gradients — its backward replaces the three
        triangular-solve custom calls with Linv matmuls (hot-path op
        schedule change only). Checked single and batched, through both
        outputs."""
        rng = np.random.RandomState(3)
        A0 = rng.randn(6, 6)
        K1 = jnp.asarray(A0 @ A0.T + 4 * np.eye(6))
        Kb = jnp.stack([K1, 2.0 * K1 + jnp.eye(6)])

        def ref(K):
            L = linalg.cholesky_with_jitter(K, 1e-6, max_tries=4)
            eye = jnp.eye(K.shape[-1], dtype=K.dtype)
            Linv = linalg.solve_triangular(
                L, jnp.broadcast_to(eye, K.shape), lower=True)
            return L, Linv

        for Kmat in (K1, Kb):
            L, Linv = linalg.chol_and_inverse(Kmat, 1e-6, 4)
            Lr, Linvr = ref(Kmat)
            np.testing.assert_allclose(np.asarray(L), np.asarray(Lr),
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(Linv), np.asarray(Linvr),
                                       atol=1e-12)
            # gradient through BOTH outputs with distinct weights
            w1, w2 = 0.7, -1.3

            def f_new(K):
                L, Li = linalg.chol_and_inverse(K, 1e-6, 4)
                return w1 * jnp.sum(jnp.sin(L)) + w2 * jnp.sum(jnp.cos(Li))

            def f_ref(K):
                L, Li = ref(K)
                return w1 * jnp.sum(jnp.sin(L)) + w2 * jnp.sum(jnp.cos(Li))

            np.testing.assert_allclose(np.asarray(jax.grad(f_new)(Kmat)),
                                       np.asarray(jax.grad(f_ref)(Kmat)),
                                       rtol=1e-6, atol=1e-10)

    def test_solve_and_cho_solve(self):
        A = _rand(KEY, 5, 5)
        Kmat = A @ A.T + 3.0 * jnp.eye(5)
        L = jnp.linalg.cholesky(Kmat)
        B = _rand(jax.random.PRNGKey(1), 5, 3)
        np.testing.assert_allclose(L @ linalg.solve_triangular(L, B), B, atol=1e-9)
        np.testing.assert_allclose(Kmat @ linalg.cho_solve(L, B), B, atol=1e-8)

    def test_logdet(self):
        A = _rand(KEY, 5, 5)
        Kmat = A @ A.T + 3.0 * jnp.eye(5)
        L = jnp.linalg.cholesky(Kmat)
        np.testing.assert_allclose(
            linalg.log_det_from_chol(L), jnp.linalg.slogdet(Kmat)[1], rtol=1e-10
        )


class TestConditionals:
    """Whitened conditional vs dense GP math (SURVEY.md §4 item 1)."""

    def _setup(self, D_out=2):
        k1, k2, k3, k4 = jax.random.split(KEY, 4)
        M, N, D_in = 8, 11, 3
        Z = _rand(k1, M, D_in)
        X = _rand(k2, N, D_in)
        params = kernels.rbf_params(D_in, variance=1.4, lengthscales=0.9)
        q_mu = _rand(k3, M, D_out)
        q_sqrt = jnp.tril(_rand(k4, D_out, M, M)) * 0.3 + jnp.eye(M) * 0.5
        q_sqrt = jnp.tril(q_sqrt)
        return X, Z, params, q_mu, q_sqrt

    def _naive(self, X, Z, params, q_mu, q_sqrt, jitter=1e-12):
        """Dense whitened SVGP predictive: u = Lm v, v ~ N(q_mu_d, L_d L_d^T)."""
        Kuu = np.asarray(kernels.K(params, Z, Z)) + jitter * np.eye(Z.shape[0])
        Kuf = np.asarray(kernels.K(params, Z, X))
        Kff = np.asarray(kernels.K(params, X, X))
        Lm = np.linalg.cholesky(Kuu)
        A = np.linalg.solve(Lm, Kuf)  # [M, N]
        means, covs = [], []
        for d in range(q_mu.shape[1]):
            Ld = np.tril(np.asarray(q_sqrt[d]))
            means.append(A.T @ np.asarray(q_mu[:, d]))
            covs.append(Kff - A.T @ A + A.T @ Ld @ Ld.T @ A)
        return np.stack(means, -1), np.stack(covs, 0)

    def test_marginal_matches_naive(self):
        X, Z, params, q_mu, q_sqrt = self._setup()
        out = conditionals.conditional(X, Z, params, q_mu, q_sqrt, jitter=1e-12)
        mean_n, cov_n = self._naive(X, Z, params, q_mu, q_sqrt)
        np.testing.assert_allclose(out.mean, mean_n, rtol=1e-7, atol=1e-9)
        var_n = np.stack([np.diag(cov_n[d]) for d in range(2)], -1)
        np.testing.assert_allclose(out.var, var_n, rtol=1e-7, atol=1e-9)

    def test_fullcov_matches_naive(self):
        X, Z, params, q_mu, q_sqrt = self._setup()
        Kuu = kernels.K(params, Z, Z)
        Lm = linalg.cholesky_with_jitter(Kuu, 1e-12)
        Kuf = kernels.K(params, Z, X)
        Kff = kernels.K(params, X, X)
        out = conditionals.base_conditional_whitened_fullcov(Kuf, Lm, Kff, q_mu, q_sqrt)
        mean_n, cov_n = self._naive(X, Z, params, q_mu, q_sqrt)
        np.testing.assert_allclose(out.mean, mean_n, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(out.var, cov_n, rtol=1e-6, atol=1e-8)

    def test_multisample_broadcast(self):
        """K x S leading axes flow through as batch dims (the reference's
        temp_workaround.py multisample path — SURVEY.md §2.6)."""
        X, Z, params, q_mu, q_sqrt = self._setup()
        Xb = jnp.broadcast_to(X, (4, 3) + X.shape) + 0.01 * _rand(KEY, 4, 3, *X.shape)
        out = conditionals.conditional(Xb, Z, params, q_mu, q_sqrt, jitter=1e-12)
        assert out.mean.shape == (4, 3, 11, 2)
        single = conditionals.conditional(Xb[2, 1], Z, params, q_mu, q_sqrt, jitter=1e-12)
        np.testing.assert_allclose(out.mean[2, 1], single.mean, rtol=1e-8)
        np.testing.assert_allclose(out.var[2, 1], single.var, rtol=1e-8)

    def test_sample_conditional_moments(self):
        """Reparameterized samples have the conditional's mean/var."""
        X, Z, params, q_mu, q_sqrt = self._setup()
        out = conditionals.conditional(X, Z, params, q_mu, q_sqrt, jitter=1e-12)
        keys = jax.random.split(jax.random.PRNGKey(7), 4000)
        samp = jax.vmap(
            lambda k: conditionals.sample_conditional(
                k, X, Z, params, q_mu, q_sqrt, jitter=1e-12
            )[0]
        )(keys)
        np.testing.assert_allclose(samp.mean(0), out.mean, atol=0.08)
        np.testing.assert_allclose(samp.var(0), out.var, rtol=0.15, atol=0.02)


class TestKL:
    def test_gauss_kl_white_vs_dense(self):
        M, D = 6, 3
        k1, k2 = jax.random.split(KEY)
        q_mu = _rand(k1, M, D)
        q_sqrt = jnp.tril(_rand(k2, D, M, M) * 0.2 + jnp.eye(M))
        got = kl.gauss_kl_white(q_mu, q_sqrt)
        expected = 0.0
        for d in range(D):
            Ld = np.asarray(q_sqrt[d])
            S = Ld @ Ld.T
            m = np.asarray(q_mu[:, d])
            expected += 0.5 * (
                m @ m + np.trace(S) - M - np.linalg.slogdet(S)[1]
            )
        np.testing.assert_allclose(got, expected, rtol=1e-9)

    def test_gauss_kl_diag_white_vs_dense(self):
        k1, k2 = jax.random.split(KEY)
        mu = _rand(k1, 4, 3)
        log_var = _rand(k2, 4, 3) * 0.5
        got = kl.gauss_kl_diag_white(mu, log_var)
        assert got.shape == (4,)
        for n in range(4):
            S = np.diag(np.exp(np.asarray(log_var[n])))
            m = np.asarray(mu[n])
            exp_n = 0.5 * (m @ m + np.trace(S) - 3 - np.linalg.slogdet(S)[1])
            np.testing.assert_allclose(got[n], exp_n, rtol=1e-9)

    def test_logpdfs(self):
        from scipy.stats import norm

        x = np.array([0.3, -1.2, 2.0])
        mu = np.array([0.1, 0.0, -0.5])
        log_var = np.array([0.2, -0.3, 0.0])
        got = kl.diag_gaussian_logpdf(jnp.array(x), jnp.array(mu), jnp.array(log_var))
        expected = norm.logpdf(x, mu, np.exp(log_var / 2)).sum()
        np.testing.assert_allclose(got, expected, rtol=1e-9)
        np.testing.assert_allclose(
            kl.std_gaussian_logpdf(jnp.array(x)), norm.logpdf(x).sum(), rtol=1e-9
        )


class TestLikelihood:
    def test_variational_expectations_vs_quadrature(self):
        """Analytic E_{N(f|m,v)}[log N(y|f,s2)] vs Gauss-Hermite
        (gpflow test_likelihoods strategy — SURVEY.md §4)."""
        params = likelihoods.gaussian_params(0.13)
        m = jnp.array([[0.5, -0.2]])
        v = jnp.array([[0.3, 0.8]])
        y = jnp.array([[0.7, 0.1]])
        got = likelihoods.variational_expectations(params, m, v, y)

        xs, ws = np.polynomial.hermite_e.hermegauss(60)
        s2 = float(likelihoods.noise_variance(params))
        expected = 0.0
        for d in range(2):
            f = float(m[0, d]) + np.sqrt(float(v[0, d])) * xs
            logp = -0.5 * (np.log(2 * np.pi * s2) + (float(y[0, d]) - f) ** 2 / s2)
            expected += (ws * logp).sum() / np.sqrt(2 * np.pi)
        np.testing.assert_allclose(got[0], expected, rtol=1e-7)

    def test_predict_density_is_gaussian_mixture_component(self):
        from scipy.stats import norm

        params = likelihoods.gaussian_params(0.2)
        s2 = float(likelihoods.noise_variance(params))
        m, v, y = 0.4, 0.9, -0.3
        got = likelihoods.predict_density(
            params, jnp.array([[m]]), jnp.array([[v]]), jnp.array([[y]])
        )
        np.testing.assert_allclose(
            got[0], norm.logpdf(y, m, np.sqrt(v + s2)), rtol=1e-9
        )


class TestQvarBf16Residual:
    """QVAR_BF16_RESIDUAL stores the q-variance inner product in bf16.

    The switch only changes the PRECISION of the stored [D, M, N] residual
    (and the dot inputs feeding the final contraction) — values must agree
    with the f32/f64 path to bf16 rounding, and gradients must stay finite
    and close. Gated for trained-quality by benchmarks/quality_gate.py
    --qvar_bf16_residual; this pins trace-level correctness.
    """

    def _mats(self, d=3, m=16, n=11):
        kA, kL = jax.random.split(jax.random.PRNGKey(3))
        A = jax.random.normal(kA, (m, n), jnp.float32)
        G = jax.random.normal(kL, (d, m, m), jnp.float32)
        q_sqrt = jnp.tril(G) + 2.0 * jnp.eye(m, dtype=jnp.float32)
        q_S = q_sqrt @ jnp.swapaxes(q_sqrt, -1, -2)
        return A, q_sqrt, q_S

    @pytest.mark.parametrize("family", ["root", "cov"])
    def test_values_match_f32_path(self, family, monkeypatch):
        A, q_sqrt, q_S = self._mats()
        args = (q_sqrt, None) if family == "root" else (None, q_S)
        monkeypatch.setattr(conditionals, "QVAR_BF16_RESIDUAL", False)
        ref = conditionals._q_variance(A, *args, jax.lax.Precision.HIGHEST)
        monkeypatch.setattr(conditionals, "QVAR_BF16_RESIDUAL", True)
        got = conditionals._q_variance(A, *args, jax.lax.Precision.HIGHEST)
        assert got.dtype == ref.dtype
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=1e-4)

    def test_auto_policy(self):
        # auto: on for f32 at small M, off for f64 (exact CPU validation)
        # and off beyond the measured M crossover (MXU-bound regime)
        assert conditionals.QVAR_BF16_RESIDUAL == "auto"
        assert conditionals._use_bf16_residual(128, jnp.dtype(jnp.float32))
        assert not conditionals._use_bf16_residual(128, jnp.dtype(jnp.float64))
        assert not conditionals._use_bf16_residual(512, jnp.dtype(jnp.float32))

    @pytest.mark.parametrize("family", ["root", "cov"])
    def test_gradients_finite_and_close(self, family, monkeypatch):
        A, q_sqrt, q_S = self._mats()

        def loss(A, q, flag):
            args = (q, None) if family == "root" else (None, q)
            with monkeypatch.context() as mp:
                mp.setattr(conditionals, "QVAR_BF16_RESIDUAL", flag)
                return jnp.sum(
                    conditionals._q_variance(A, *args,
                                             jax.lax.Precision.HIGHEST))

        q = q_sqrt if family == "root" else q_S
        gA_ref, gq_ref = jax.grad(loss, argnums=(0, 1))(A, q, False)
        gA, gq = jax.grad(loss, argnums=(0, 1))(A, q, True)
        for got, ref in ((gA, gA_ref), (gq, gq_ref)):
            assert bool(jnp.all(jnp.isfinite(got)))
            # bf16 rounding of the residual: element errors scale with the
            # gradient's overall magnitude, not each entry's
            atol = 2e-2 * float(jnp.max(jnp.abs(ref)))
            np.testing.assert_allclose(got, ref, rtol=5e-2, atol=atol)

    def test_composes_with_remat(self, monkeypatch):
        A, q_sqrt, _ = self._mats()
        monkeypatch.setattr(conditionals, "QVAR_BF16_RESIDUAL", False)
        ref = conditionals._q_variance(A, q_sqrt, None,
                                       jax.lax.Precision.HIGHEST)
        monkeypatch.setattr(conditionals, "QVAR_BF16_RESIDUAL", True)
        monkeypatch.setattr(conditionals, "REMAT_QVAR", True)

        def loss(A, L):
            return jnp.sum(conditionals._q_variance(
                A, L, None, jax.lax.Precision.HIGHEST))

        got = conditionals._q_variance(A, q_sqrt, None,
                                       jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=1e-4)
        gA, gL = jax.jit(jax.grad(loss, argnums=(0, 1)))(A, q_sqrt)
        assert bool(jnp.all(jnp.isfinite(gA)))
        assert bool(jnp.all(jnp.isfinite(gL)))

    @pytest.mark.parametrize("family", ["root", "cov"])
    def test_bf16_grad_custom_vjp(self, family, monkeypatch):
        """QVAR_BF16_GRAD custom vjp (default OFF — measured negative, see
        ops/conditionals.py): forward must be BITWISE equal to the plain
        bf16-residual path, gradients within the bf16 rounding class.
        Covers a leading (sample) batch dim, whose cotangent reduction the
        custom backward must perform itself."""
        kA, kL = jax.random.split(jax.random.PRNGKey(7))
        A = jax.random.normal(kA, (5, 16, 24), jnp.float32)  # [K, M, N]
        G = jax.random.normal(kL, (3, 16, 16), jnp.float32)
        L = jnp.tril(G) + 2.0 * jnp.eye(16, dtype=jnp.float32)
        q = L if family == "root" else L @ jnp.swapaxes(L, -1, -2)
        vp = jax.lax.Precision.HIGHEST

        def loss(A, q, flag):
            with monkeypatch.context() as mp:
                mp.setattr(conditionals, "QVAR_BF16_RESIDUAL", True)
                mp.setattr(conditionals, "QVAR_BF16_GRAD", flag)
                args = (q, None) if family == "root" else (None, q)
                return jnp.sum(jnp.sin(
                    conditionals._q_variance(A, *args, vp)))

        v_new, g_new = jax.value_and_grad(loss, argnums=(0, 1))(A, q, True)
        v_old, g_old = jax.value_and_grad(loss, argnums=(0, 1))(A, q, False)
        assert float(v_new) == float(v_old)  # forward bitwise
        for gn, go in zip(g_new, g_old):
            assert gn.shape == go.shape
            assert bool(jnp.all(jnp.isfinite(gn)))
            atol = 2e-2 * float(jnp.max(jnp.abs(go)))
            np.testing.assert_allclose(gn, go, rtol=5e-2, atol=atol)


class TestMatmulSplitPrecision:
    """matmul_split_precision: identical primal, identical grads (on CPU,
    where precision is a no-op, both must be EXACT), correct broadcast
    reduction in the custom backward, and vmap/jit compatibility."""

    def _check(self, x_shape, y_shape, key=0):
        kx, ky = jax.random.split(jax.random.PRNGKey(key))
        x = jax.random.normal(kx, x_shape, jnp.float32)
        y = jax.random.normal(ky, y_shape, jnp.float32)
        hp, dp = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT

        def loss_ref(x, y):
            return jnp.sum(jnp.sin(jnp.matmul(x, y, precision=hp)))

        def loss_split(x, y):
            return jnp.sum(jnp.sin(
                conditionals.matmul_split_precision(x, y, hp, dp)))

        np.testing.assert_allclose(loss_split(x, y), loss_ref(x, y),
                                   rtol=1e-6)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, y)
        g_split = jax.jit(jax.grad(loss_split, argnums=(0, 1)))(x, y)
        for a, b in zip(g_split, g_ref):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_plain_2d(self):
        self._check((7, 5), (5, 4))

    def test_broadcast_left_operand(self):
        # the solve-path shape: Linv [M, M] against batched Kuf [..., M, N]
        self._check((6, 6), (3, 2, 6, 9))

    def test_broadcast_right_operand(self):
        # the mean shape: batched A^T [..., N, M] against q_mu [M, D]
        self._check((3, 2, 9, 6), (6, 4))

    def test_broadcast_middle_axes(self):
        self._check((5, 1, 6, 6), (2, 6, 9))

    def test_same_precision_shortcut_is_plain_matmul(self):
        x = jnp.ones((3, 3))
        hp = jax.lax.Precision.HIGHEST
        out = conditionals.matmul_split_precision(x, x, hp, hp)
        np.testing.assert_allclose(out, jnp.matmul(x, x), rtol=1e-7)

    def test_vmap(self):
        hp, dp = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 6), jnp.float32)
        y = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 3), jnp.float32)
        f = jax.vmap(lambda a, b:
                     conditionals.matmul_split_precision(a, b, hp, dp))
        np.testing.assert_allclose(f(x, y), jnp.matmul(x, y), rtol=1e-5)

    def test_solve_bwd_precision_switch_changes_nothing_on_cpu(self, monkeypatch):
        """End-to-end: flipping SOLVE_BWD_PRECISION must leave CPU grads
        exact (precision is a TPU-only concept) — guards the wiring."""
        from dgps_with_iwvi_tpu.ops import kernels as _k

        X = jax.random.normal(jax.random.PRNGKey(3), (12, 4), jnp.float32)
        Z = jax.random.normal(jax.random.PRNGKey(4), (6, 4), jnp.float32)
        params = _k.rbf_params(4)
        q_mu = jax.random.normal(jax.random.PRNGKey(5), (6, 2), jnp.float32)
        q_sqrt = jnp.tril(jnp.eye(6) + 0.1)[None] * jnp.ones((2, 1, 1))

        def loss(q_mu):
            out = conditionals.conditional(X, Z, params, q_mu, q_sqrt)
            return jnp.sum(out.mean) + jnp.sum(out.var)

        monkeypatch.setattr(conditionals, "SOLVE_BWD_PRECISION", "same")
        g_same = jax.grad(loss)(q_mu)
        monkeypatch.setattr(conditionals, "SOLVE_BWD_PRECISION", "default")
        g_def = jax.grad(loss)(q_mu)
        np.testing.assert_allclose(g_def, g_same, rtol=1e-6)

    def test_gram_bwd_relax_switch_cpu_exact(self, monkeypatch):
        """kernels.GRAM_BWD_RELAX flips the gram's backward-dot precision;
        on CPU (precision no-op) values and grads must be identical."""
        from dgps_with_iwvi_tpu.ops import kernels as _k

        X = jax.random.normal(jax.random.PRNGKey(7), (9, 5), jnp.float32)
        Z = jax.random.normal(jax.random.PRNGKey(8), (4, 5), jnp.float32)
        ls = jnp.ones((5,))

        def loss(X, Z):
            return jnp.sum(_k.scaled_squared_distance(X, Z, ls))

        g_ref = jax.grad(loss, argnums=(0, 1))(X, Z)
        monkeypatch.setattr(_k, "GRAM_BWD_RELAX", True)
        g_on = jax.jit(jax.grad(loss, argnums=(0, 1)))(X, Z)
        for a, b in zip(g_on, g_ref):
            np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_gram_fwd_precision_switch_cpu_exact(self, monkeypatch):
        """kernels.GRAM_FWD_PRECISION drops the gram cross-term dot from
        bf16x6 to bf16x3; on CPU (precision no-op) values and grads must be
        identical, and unknown settings must refuse loudly."""
        from dgps_with_iwvi_tpu.ops import kernels as _k

        X = jax.random.normal(jax.random.PRNGKey(7), (9, 5), jnp.float32)
        Z = jax.random.normal(jax.random.PRNGKey(8), (4, 5), jnp.float32)
        ls = jnp.ones((5,))

        def loss(X, Z):
            return jnp.sum(_k.scaled_squared_distance(X, Z, ls))

        assert _k.GRAM_FWD_PRECISION == "highest"  # production default
        v_ref = loss(X, Z)
        g_ref = jax.grad(loss, argnums=(0, 1))(X, Z)
        monkeypatch.setattr(_k, "GRAM_FWD_PRECISION", "high")
        v_hi = jax.jit(loss)(X, Z)
        g_hi = jax.jit(jax.grad(loss, argnums=(0, 1)))(X, Z)
        np.testing.assert_allclose(v_hi, v_ref, rtol=1e-6)
        for a, b in zip(g_hi, g_ref):
            np.testing.assert_allclose(a, b, rtol=1e-6)
        monkeypatch.setattr(_k, "GRAM_FWD_PRECISION", "bogus")
        with pytest.raises(ValueError, match="GRAM_FWD_PRECISION"):
            loss(X, Z)
        # 'default' is deliberately NOT accepted for the gram forward
        monkeypatch.setattr(_k, "GRAM_FWD_PRECISION", "default")
        with pytest.raises(ValueError, match="corrupts"):
            loss(X, Z)
