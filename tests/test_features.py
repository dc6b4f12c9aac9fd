"""Multiscale inducing features (ops/features.py — gpflow:gpflow/features.py
Multiscale semantics).

Pins: (1) the closed forms against brute-force Monte-Carlo integration of
the Gaussian-window inducing integrals, (2) exact reduction to plain
inducing points as scales -> 0, (3) PSD of Kuu at random scales, (4) the
end-to-end model path (init/elbo/grads/training/prediction, full-cov
predictive marginal consistency, checkpoint-compatible pytree).
"""

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
    predict_f,
    predict_f_full_cov,
)
from dgps_with_iwvi_tpu.ops import conditionals, features, kernels, linalg
from dgps_with_iwvi_tpu.ops.transforms import positive_inverse


def _rbf_np(X, Z, var, ls):
    d2 = ((X[:, None, :] - Z[None, :, :]) / ls) ** 2
    return var * np.exp(-0.5 * d2.sum(-1))


class TestMultiscaleMath:
    def test_kuf_matches_monte_carlo_window_integral(self):
        """Kuf[m, n] = E_{x' ~ N(Z_m, diag(w_m^2))}[k(x_n, x')] with
        w_m^2 = (l + s_m)^2 - l^2 (the gpflow a = l + s convention)."""
        rng = np.random.default_rng(0)
        D, M, N = 2, 3, 4
        X = rng.normal(size=(N, D))
        Z = rng.normal(size=(M, D))
        ls = np.array([0.9, 1.3])
        var = 1.7
        s = rng.uniform(0.2, 0.8, size=(M, D))
        kp = {"raw_variance": positive_inverse(jnp.asarray(var)),
              "raw_lengthscales": positive_inverse(jnp.asarray(ls))}
        Kuf = np.asarray(features.multiscale_Kuf(
            kp, jnp.asarray(Z), positive_inverse(jnp.asarray(s)),
            jnp.asarray(X)))
        w2 = (ls + s) ** 2 - ls**2                        # [M, D] window var
        S = 400_000
        for m in range(M):
            xp = Z[m] + np.sqrt(w2[m]) * rng.normal(size=(S, D))
            mc = _rbf_np(X, xp, var, ls).mean(axis=1)     # [N]
            np.testing.assert_allclose(Kuf[m], mc, rtol=2e-2, atol=2e-3)

    def test_kuu_matches_monte_carlo_double_integral(self):
        """Kuu[i, j] = E[k(x', x'')] over both windows."""
        rng = np.random.default_rng(1)
        D, M = 2, 3
        Z = rng.normal(size=(M, D))
        ls = np.array([1.1, 0.7])
        var = 0.8
        s = rng.uniform(0.2, 0.6, size=(M, D))
        kp = {"raw_variance": positive_inverse(jnp.asarray(var)),
              "raw_lengthscales": positive_inverse(jnp.asarray(ls))}
        Kuu = np.asarray(features.multiscale_Kuu(
            kp, jnp.asarray(Z), positive_inverse(jnp.asarray(s))))
        w2 = (ls + s) ** 2 - ls**2
        S = 400_000
        for i in range(M):
            for j in range(M):
                xi = Z[i] + np.sqrt(w2[i]) * rng.normal(size=(S, D))
                xj = Z[j] + np.sqrt(w2[j]) * rng.normal(size=(S, D))
                d2 = (((xi - xj) / ls) ** 2).sum(-1)
                mc = (var * np.exp(-0.5 * d2)).mean()
                np.testing.assert_allclose(Kuu[i, j], mc, rtol=2e-2,
                                           atol=2e-3)

    def test_zero_scales_reduce_to_inducing_points(self):
        rng = np.random.default_rng(2)
        D, M, N = 3, 5, 7
        Z = jnp.asarray(rng.normal(size=(M, D)))
        X = jnp.asarray(rng.normal(size=(N, D)))
        kp = kernels.rbf_params(D, variance=1.4, lengthscales=0.8,
                                dtype=Z.dtype)
        # The shifted softplus floors scales at ~1e-6, so the reduction is
        # to within that floor, not exact (positive_inverse clamps rather
        # than NaN-ing below the bound).
        raw = positive_inverse(jnp.full((M, D), 1e-9, Z.dtype))
        np.testing.assert_allclose(
            np.asarray(features.multiscale_Kuu(kp, Z, raw)),
            np.asarray(kernels.K(kp, Z, Z)), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(features.multiscale_Kuf(kp, Z, raw, X)),
            np.asarray(kernels.K(kp, Z, X)), rtol=1e-4, atol=1e-6)

    def test_kuu_psd_and_batched_kuf(self):
        rng = np.random.default_rng(3)
        D, M = 4, 16
        Z = jnp.asarray(rng.normal(size=(M, D)))
        kp = kernels.rbf_params(D, dtype=Z.dtype)
        raw = positive_inverse(
            jnp.asarray(rng.uniform(0.05, 2.0, size=(M, D))))
        Kuu = features.multiscale_Kuu(kp, Z, raw)
        evals = np.linalg.eigvalsh(np.asarray(Kuu))
        assert evals.min() > -1e-10, evals.min()
        # leading batch axes broadcast like the plain gram
        X = jnp.asarray(rng.normal(size=(2, 3, 5, D)))
        Kuf = features.multiscale_Kuf(kp, Z, raw, X)
        assert Kuf.shape == (2, 3, M, 5)
        one = features.multiscale_Kuf(kp, Z, raw, X[1, 2])
        np.testing.assert_allclose(np.asarray(Kuf[1, 2]), np.asarray(one),
                                   rtol=1e-12, atol=1e-12)

    def test_conditional_with_tiny_scales_matches_points(self):
        rng = np.random.default_rng(4)
        D, M, N, d_out = 2, 8, 6, 2
        Z = jnp.asarray(rng.normal(size=(M, D)))
        X = jnp.asarray(rng.normal(size=(N, D)))
        kp = kernels.rbf_params(D, dtype=Z.dtype)
        q_mu = jnp.asarray(rng.normal(size=(M, d_out)))
        q_sqrt = jnp.asarray(
            np.tril(rng.normal(size=(d_out, M, M))) * 0.3)
        raw = positive_inverse(jnp.full((M, D), 1e-9, Z.dtype))
        a = conditionals.conditional(X, Z, kp, q_mu, q_sqrt)
        b = conditionals.conditional(X, Z, kp, q_mu, q_sqrt,
                                     feature_raw_scales=raw)
        np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(a.var), np.asarray(b.var),
                                   rtol=1e-5, atol=1e-7)


def _small_model(feature="multiscale", white=True, M=8, N=32):
    key = jax.random.PRNGKey(0)
    kx, ky, kb = jax.random.split(key, 3)
    X = jax.random.normal(kx, (N, 2), jnp.float64)
    Y = jnp.sin(X.sum(-1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (N, 1), jnp.float64)
    args = BuildArgs(configuration="GG", mode="IW", num_inducing=M,
                     num_iw_samples=3, feature=feature, white=white)
    config, params = build_model(kb, args, X, Y)
    return config, params, X, Y


class TestMultiscaleModel:
    def test_elbo_finite_and_scales_receive_gradient(self):
        config, params, X, Y = _small_model()
        for lp, cfg in zip(params["layers"], config.layers):
            if isinstance(cfg, GPLayerConfig):
                assert "raw_Z_scales" in lp

        # At the whitened prior init (q_mu=0, q_sqrt=I) the conditional IS
        # the prior — var = Kdiag - sum(A^2) + sum((I A)^2) = Kdiag exactly
        # — so the data term is independent of Z/kernel/scales and their
        # gradients are genuinely zero. Randomize q(u) off the degenerate
        # point before asserting the scales are live.
        for i, lp in enumerate(params["layers"]):
            if "q_mu" in lp:
                lp["q_mu"] = 0.3 * jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(7), i),
                    lp["q_mu"].shape, lp["q_mu"].dtype)

        key = jax.random.PRNGKey(1)
        val, g = jax.value_and_grad(
            lambda p: elbo(p, config, X, Y, key))(params)
        assert np.isfinite(float(val))
        for i in (0, 1):
            gi = g["layers"][i]["raw_Z_scales"]
            assert np.all(np.isfinite(np.asarray(gi)))
            assert float(jnp.max(jnp.abs(gi))) > 0.0, i

    def test_nonwhitened_multiscale_elbo_finite(self):
        config, params, X, Y = _small_model(white=False)
        val = elbo(params, config, X, Y, jax.random.PRNGKey(2))
        assert np.isfinite(float(val))

    def test_training_improves_elbo_and_moves_scales(self):
        from dgps_with_iwvi_tpu.training import TrainConfig, fit

        config, params, X, Y = _small_model()
        tc = TrainConfig(lr=1e-2, gamma=0.1, natgrad="final",
                         minibatch_size=32, iterations=60, steps_per_call=30)
        key = jax.random.PRNGKey(3)
        before = float(elbo(params, config, X, Y, key))
        trained, _ = fit(key, config, params, X, Y, tc)
        after = float(elbo(trained, config, X, Y, key))
        assert after > before, (before, after)
        moved = jnp.max(jnp.abs(trained["layers"][0]["raw_Z_scales"]
                                - params["layers"][0]["raw_Z_scales"]))
        assert float(moved) > 0.0

    def test_fullcov_marginals_match_predict_f(self):
        config, params, X, Y = _small_model()
        key = jax.random.PRNGKey(4)
        Xs = X[:5]
        fm, fv = predict_f(params, config, Xs, key, num_samples=3)
        m2, c2 = predict_f_full_cov(params, config, Xs, key, num_samples=3)
        np.testing.assert_allclose(np.asarray(fm), np.asarray(m2),
                                   rtol=1e-6, atol=1e-8)
        diag = jnp.diagonal(c2, axis1=-2, axis2=-1)  # [S, d_y, N]
        np.testing.assert_allclose(
            np.asarray(fv), np.asarray(jnp.swapaxes(diag, -1, -2)),
            rtol=1e-6, atol=1e-8)

    def test_points_feature_has_no_scales_param(self):
        config, params, X, Y = _small_model(feature="points")
        for lp in params["layers"]:
            assert "raw_Z_scales" not in lp

    def test_non_rbf_kernel_rejected(self):
        cfg = GPLayerConfig(d_in=2, d_out=1, num_inducing=4,
                            kernel_kind="matern32", final=True,
                            feature="multiscale")
        with pytest.raises(AssertionError):
            init_dgp(jax.random.PRNGKey(0),
                     DGPConfig(layers=(cfg,), num_data=8))
