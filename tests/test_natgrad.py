"""Natural-gradient tests (SURVEY.md §4 item 3).

The load-bearing check: on a conjugate block (single SVGP layer, Gaussian
likelihood, full batch) ONE natgrad step with gamma=1 from an arbitrary
start lands exactly on the closed-form optimal whitened posterior
    S* = (I + A A^T / s2)^-1,  m* = S* A y / s2,   A = Lm^-1 Kuf.
This pins down every convention in the chain rule (symmetrization of dL/dS,
eta/theta transforms, sign of the loss).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dgps_with_iwvi_tpu.models import DGPConfig, GPLayerConfig, LVLayerConfig, elbo, init_dgp
from dgps_with_iwvi_tpu.ops import kernels, likelihoods
from dgps_with_iwvi_tpu.training import (
    TrainConfig,
    extract_natvars,
    fit,
    insert_natvars,
    make_trainer,
    natgrad_layer_ids,
    natgrad_update,
)

KEY = jax.random.PRNGKey(0)


def _svgp_setup(n=18, m=7, d=2, s2=0.12):
    kx, ky, kz = jax.random.split(KEY, 3)
    X = jax.random.normal(kx, (n, d), jnp.float64)
    Y = (jnp.sin(X.sum(-1, keepdims=True))
         + 0.1 * jax.random.normal(ky, (n, 1), jnp.float64))
    cfg = DGPConfig(
        layers=(GPLayerConfig(d_in=d, d_out=1, num_inducing=m,
                              mean_function="zero", final=True),),
        num_data=n, objective="vi", jitter=1e-12)
    Z = jax.random.normal(kz, (m, d), jnp.float64)
    params = init_dgp(KEY, cfg, Z_inits=[Z], noise_variance=s2,
                      dtype=jnp.float64)
    return cfg, params, X, Y, Z


def _optimal_whitened(params, X, Y, Z):
    s2 = float(likelihoods.noise_variance(params["likelihood"]))
    kp = params["layers"][0]["kernel"]
    Kuu = np.asarray(kernels.K(kp, Z, Z)) + 1e-12 * np.eye(Z.shape[0])
    Kuf = np.asarray(kernels.K(kp, Z, X))
    Lm = np.linalg.cholesky(Kuu)
    A = np.linalg.solve(Lm, Kuf)
    S_opt = np.linalg.inv(np.eye(Z.shape[0]) + A @ A.T / s2)
    m_opt = S_opt @ A @ np.asarray(Y[:, 0]) / s2
    return m_opt, S_opt


class TestConjugateExactness:
    def test_one_step_gamma1_reaches_optimum(self):
        cfg, params, X, Y, Z = _svgp_setup()
        # random non-trivial start
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        M = Z.shape[0]
        params["layers"][0]["q_mu"] = 0.7 * jax.random.normal(k1, (M, 1), jnp.float64)
        R = 0.2 * jax.random.normal(k2, (M, M), jnp.float64)
        params["layers"][0]["q_sqrt"] = jnp.tril(R + 2.0 * jnp.eye(M))[None]

        layer_ids = natgrad_layer_ids(cfg, "final")
        natvars = extract_natvars(params, layer_ids)

        def loss(nv):
            p = insert_natvars(params, nv, layer_ids)
            return -elbo(p, cfg, X, Y, KEY)

        g = jax.grad(loss)(natvars)
        new = natgrad_update(natvars, g, gamma=1.0)

        m_opt, S_opt = _optimal_whitened(params, X, Y, Z)
        np.testing.assert_allclose(np.asarray(new[0]["q_mu"][:, 0]), m_opt,
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(new[0]["q_S"][0]), S_opt,
                                   rtol=1e-6, atol=1e-9)

    def test_second_step_is_fixed_point(self):
        cfg, params, X, Y, Z = _svgp_setup()
        layer_ids = natgrad_layer_ids(cfg, "final")
        natvars = extract_natvars(params, layer_ids)

        def loss(nv):
            return -elbo(insert_natvars(params, nv, layer_ids), cfg, X, Y, KEY)

        for _ in range(2):
            g = jax.grad(loss)(natvars)
            prev = natvars
            natvars = natgrad_update(natvars, g, gamma=1.0)
        np.testing.assert_allclose(np.asarray(prev[0]["q_mu"]),
                                   np.asarray(natvars[0]["q_mu"]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(prev[0]["q_S"]),
                                   np.asarray(natvars[0]["q_S"]), atol=1e-7)

    def test_small_gamma_monotone_ascent(self):
        cfg, params, X, Y, Z = _svgp_setup()
        layer_ids = natgrad_layer_ids(cfg, "final")
        natvars = extract_natvars(params, layer_ids)

        def loss(nv):
            return -elbo(insert_natvars(params, nv, layer_ids), cfg, X, Y, KEY)

        vals = [float(loss(natvars))]
        for _ in range(5):
            g = jax.grad(loss)(natvars)
            natvars = natgrad_update(natvars, g, gamma=0.3)
            vals.append(float(loss(natvars)))
        assert all(b <= a + 1e-10 for a, b in zip(vals[:-1], vals[1:])), vals


class TestCovarianceForm:
    """The natgrad covariance-form loss (q_cov = S consumed directly, no
    chol(S) anywhere in the step) must match the root form exactly in value
    AND gradient."""

    def test_conditional_and_kl_match_root_form(self):
        from dgps_with_iwvi_tpu.ops import conditionals, kernels, kl

        k1, k2, k3, k4 = jax.random.split(KEY, 4)
        M, N, D_in, D = 7, 9, 3, 2
        Z = jax.random.normal(k1, (M, D_in), jnp.float64)
        X = jax.random.normal(k2, (N, D_in), jnp.float64)
        kp = kernels.rbf_params(D_in, dtype=jnp.float64)
        q_mu = jax.random.normal(k3, (M, D), jnp.float64)
        L = jnp.tril(jax.random.normal(k4, (D, M, M), jnp.float64) * 0.3
                     + 2.0 * jnp.eye(M))
        S = L @ jnp.swapaxes(L, -1, -2)
        Sinv = jnp.linalg.inv(S)
        logdet = jnp.linalg.slogdet(S)[1]

        root = conditionals.conditional(X, Z, kp, q_mu, L, jitter=1e-12)
        cov = conditionals.conditional(X, Z, kp, q_mu, None, jitter=1e-12,
                                       q_S=S)
        np.testing.assert_allclose(np.asarray(cov.mean),
                                   np.asarray(root.mean), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(cov.var),
                                   np.asarray(root.var), rtol=1e-9)

        kl_root = kl.gauss_kl_white(q_mu, L)
        kl_cov = kl.gauss_kl_white_cov(q_mu, S, logdet, Sinv)
        np.testing.assert_allclose(float(kl_cov), float(kl_root), rtol=1e-12)
        # gradient w.r.t. S: root form via chol pullback == cov form direct
        g_cov = jax.grad(lambda s: kl.gauss_kl_white_cov(
            q_mu, s, logdet, Sinv))(S)
        g_root = jax.grad(lambda s: kl.gauss_kl_white(
            q_mu, jnp.linalg.cholesky(s)))(S)
        np.testing.assert_allclose(np.asarray(g_cov), np.asarray(g_root),
                                   atol=1e-10)

    def test_trainer_losses_match_legacy_root_merge(self):
        """make_trainer's cov-form loss == the legacy chol(S)-merge loss on
        identical (natvars, rest, batch, key)."""
        cfg, params, X, Y, Z = _svgp_setup()
        layer_ids = natgrad_layer_ids(cfg, "final")
        natvars = extract_natvars(params, layer_ids)

        def loss_cov(nv):
            return -elbo(insert_natvars(params, nv, layer_ids,
                                        cov_form=True), cfg, X, Y, KEY)

        def loss_root(nv):
            return -elbo(insert_natvars(params, nv, layer_ids,
                                        cov_form=False), cfg, X, Y, KEY)

        np.testing.assert_allclose(float(loss_cov(natvars)),
                                   float(loss_root(natvars)), rtol=1e-12)
        g1 = jax.grad(loss_cov)(natvars)
        g2 = jax.grad(loss_root)(natvars)
        np.testing.assert_allclose(np.asarray(g1[0]["q_mu"]),
                                   np.asarray(g2[0]["q_mu"]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(g1[0]["q_S"]),
                                   np.asarray(g2[0]["q_S"]), atol=1e-9)


class TestDiagonalFamily:
    """q_diag natural gradients: elementwise (m, v) updates in variance
    form (completeness beyond the reference, VERDICT r1 missing #5)."""

    def _setup(self, m_ind=1):
        kx, ky, kz = jax.random.split(KEY, 3)
        X = jax.random.normal(kx, (16, 2), jnp.float64)
        Y = jnp.sin(X.sum(-1, keepdims=True)) \
            + 0.1 * jax.random.normal(ky, (16, 1), jnp.float64)
        Z = jax.random.normal(kz, (m_ind, 2), jnp.float64)
        return X, Y, Z

    def _cfg(self, m_ind, q_diag):
        return DGPConfig(
            layers=(GPLayerConfig(d_in=2, d_out=1, num_inducing=m_ind,
                                  mean_function="zero", final=True,
                                  q_diag=q_diag),),
            num_data=16, objective="vi", jitter=1e-12)

    def test_m1_matches_full_family(self):
        """At M=1 the diagonal and full families coincide: one natgrad step
        must produce identical (m, v)."""
        X, Y, Z = self._setup(m_ind=1)
        outs = {}
        for q_diag in (False, True):
            cfg = self._cfg(1, q_diag)
            params = init_dgp(KEY, cfg, Z_inits=[Z], noise_variance=0.1,
                              dtype=jnp.float64)
            nv = extract_natvars(params, (0,))

            def loss(nv):
                return -elbo(insert_natvars(params, nv, (0,)), cfg, X, Y, KEY)

            g = jax.grad(loss)(nv)
            new = natgrad_update(nv, g, gamma=0.7)
            v = (new[0]["q_v"][0, 0] if q_diag else new[0]["q_S"][0, 0, 0])
            outs[q_diag] = (float(new[0]["q_mu"][0, 0]), float(v))
        np.testing.assert_allclose(outs[True], outs[False], rtol=1e-9)

    def test_gamma1_exact_on_diagonal_conjugate(self):
        """With M=N=1-ish conjugate structure gamma=1 lands on the optimum;
        generally, iterating converges to the diag-family fixed point and
        ascent is monotone."""
        X, Y, Z = self._setup(m_ind=5)
        cfg = self._cfg(5, True)
        params = init_dgp(KEY, cfg, Z_inits=[Z], noise_variance=0.1,
                          dtype=jnp.float64)
        nv = extract_natvars(params, (0,))

        def loss(nv):
            return -elbo(insert_natvars(params, nv, (0,)), cfg, X, Y, KEY)

        vals = [float(loss(nv))]
        for _ in range(30):
            g = jax.grad(loss)(nv)
            nv = natgrad_update(nv, g, gamma=0.5)
            vals.append(float(loss(nv)))
        assert all(b <= a + 1e-9 for a, b in zip(vals, vals[1:])), vals[:5]
        # fixed point reached (to optimizer-iteration noise)
        assert abs(vals[-1] - vals[-2]) < 1e-6
        assert bool(jnp.all(nv[0]["q_v"] > 0))

    def test_trainer_fit_qdiag_natgrad(self):
        kx, ky = jax.random.split(KEY)
        X = jax.random.normal(kx, (64, 3), jnp.float64)
        Y = jnp.sin(2 * X[:, :1]) + 0.05 * jax.random.normal(
            ky, (64, 1), jnp.float64)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=3, d_out=1, num_inducing=8,
                                  mean_function="zero", final=True,
                                  q_diag=True),),
            num_data=64, objective="vi")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        before = float(elbo(params, cfg, X, Y, KEY))
        tc = TrainConfig(lr=1e-2, gamma=0.1, natgrad="final",
                         minibatch_size=64, iterations=200, steps_per_call=50)
        trained, state = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before + 1.0, (before, after)
        assert trained["layers"][0]["q_sqrt"].ndim == 2


class TestCarriedPrecision:
    """The state carries S^-1; it must stay the exact inverse of q_S, even
    when the precision Cholesky's jitter rescue escalates (ADVICE r1)."""

    def test_invariant_over_steps(self):
        cfg, params, X, Y, Z = _svgp_setup()
        layer_ids = natgrad_layer_ids(cfg, "final")
        natvars = extract_natvars(params, layer_ids)

        def loss(nv):
            return -elbo(insert_natvars(params, nv, layer_ids), cfg, X, Y, KEY)

        for _ in range(4):
            g = jax.grad(loss)(natvars)
            natvars = natgrad_update(natvars, g, gamma=0.4)
            S = np.asarray(natvars[0]["q_S"][0])
            Sinv = np.asarray(natvars[0]["q_Sinv"][0])
            np.testing.assert_allclose(Sinv @ S, np.eye(S.shape[0]),
                                       atol=1e-8)

    def test_rescue_keeps_inverse_consistent(self):
        """Craft a natgrad step whose new precision P is indefinite at the
        base jitter but PD one escalation up: the carried q_Sinv must equal
        the inverse of q_S (i.e. the FACTORIZED precision, not raw P)."""
        m = 6
        rng = np.random.RandomState(0)
        Q, _ = np.linalg.qr(rng.randn(m, m))
        evals = np.array([1.0, 0.5, 0.2, 0.1, 0.05, -5e-12])
        P = Q @ np.diag(evals) @ Q.T        # fails chol at +1e-12, ok at +1e-11
        P = 0.5 * (P + P.T)
        # with S = Sinv = I and gamma = 0.5: P_new = I + 2*0.5*H = I + H
        H = jnp.asarray(P - np.eye(m), jnp.float64)[None]
        eye = jnp.eye(m, dtype=jnp.float64)[None]
        nv = [{"q_mu": jnp.zeros((m, 1), jnp.float64), "q_S": eye,
               "q_Sinv": eye, "q_logdet": jnp.zeros((1,), jnp.float64)}]
        g = [{"q_mu": jnp.zeros((m, 1), jnp.float64), "q_S": H}]
        new = natgrad_update(nv, g, gamma=0.5)
        S = np.asarray(new[0]["q_S"][0])
        Sinv = np.asarray(new[0]["q_Sinv"][0])
        assert np.all(np.isfinite(S)) and np.all(np.isfinite(Sinv))
        # cond(P_eff) ~ 2e11 here, so f64 roundoff alone leaves ~5e-6;
        # the pre-fix drift (carrying raw P) would be O(1)
        np.testing.assert_allclose(Sinv @ S, np.eye(m), atol=1e-4)
        # and the escalation really happened: carried precision != raw P_new
        assert np.abs(Sinv - np.asarray(jnp.eye(m) + H[0])).max() > 1e-12

    def test_too_large_gamma_skips_block_instead_of_nan(self):
        """A GENUINELY indefinite new precision (negative eigenvalue of
        order gamma*|H| — no roundoff jitter fixes that) must leave the
        block's (m, S, Sinv, logdet) at their previous values instead of
        poisoning the carried state with NaN forever. Per-output-dim: an ok
        block in the same update still steps."""
        m = 4
        eye = jnp.eye(m, dtype=jnp.float64)
        # dim 0: H = -I -> P = I - 2*gamma*I = -I (indefinite, unrescuable)
        # dim 1: H = +I -> P = 3I (fine, steps normally)
        H = jnp.stack([-eye, eye])
        nv = [{"q_mu": jnp.ones((m, 2), jnp.float64),
               "q_S": jnp.stack([eye, eye]),
               "q_Sinv": jnp.stack([eye, eye]),
               "q_logdet": jnp.zeros((2,), jnp.float64)}]
        g = [{"q_mu": jnp.zeros((m, 2), jnp.float64), "q_S": H}]
        new = natgrad_update(nv, g, gamma=1.0)
        S = np.asarray(new[0]["q_S"])
        Sinv = np.asarray(new[0]["q_Sinv"])
        mu = np.asarray(new[0]["q_mu"])
        ld = np.asarray(new[0]["q_logdet"])
        assert np.all(np.isfinite(S)) and np.all(np.isfinite(mu))
        # dim 0 kept the old state exactly
        np.testing.assert_array_equal(S[0], np.eye(m))
        np.testing.assert_array_equal(Sinv[0], np.eye(m))
        np.testing.assert_array_equal(mu[:, 0], np.ones(m))
        assert ld[0] == 0.0
        # dim 1 actually stepped: S = P^-1 = I/3
        np.testing.assert_allclose(S[1], np.eye(m) / 3.0, atol=1e-12)
        np.testing.assert_allclose(ld[1], m * np.log(1.0 / 3.0), atol=1e-10)


class TestTrainer:
    def _data(self, n=64, d=3):
        kx, ky = jax.random.split(KEY)
        X = jax.random.normal(kx, (n, d), jnp.float64)
        Y = (jnp.sin(2 * X[:, :1]) + 0.3 * X[:, 1:2] ** 2
             + 0.05 * jax.random.normal(ky, (n, 1), jnp.float64))
        return X, Y

    def test_split_merge_roundtrip(self):
        cfg, params, X, Y, Z = _svgp_setup()
        tc = TrainConfig(natgrad="final", minibatch_size=100, iterations=1)
        init_fn, step_fn, chunk_fn, params_fn = make_trainer(cfg, tc)
        state = init_fn(params)
        p2 = params_fn(state)
        np.testing.assert_allclose(np.asarray(p2["layers"][0]["q_mu"]),
                                   np.asarray(params["layers"][0]["q_mu"]))
        np.testing.assert_allclose(np.asarray(jnp.tril(p2["layers"][0]["q_sqrt"])),
                                   np.asarray(jnp.tril(params["layers"][0]["q_sqrt"])),
                                   atol=1e-8)

    def test_fit_improves_elbo_adam_only(self):
        X, Y = self._data()
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=3, d_out=1, num_inducing=10,
                                  mean_function="zero", final=True),),
            num_data=64, objective="vi")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        before = float(elbo(params, cfg, X, Y, KEY))
        tc = TrainConfig(lr=1e-2, natgrad="none", minibatch_size=64,
                         iterations=200, steps_per_call=50)
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before + 1.0, (before, after)

    def test_fit_natgrad_joint_and_alternating(self):
        X, Y = self._data()
        for schedule in ("joint", "alternating"):
            cfg = DGPConfig(
                layers=(
                    LVLayerConfig(d_w=1, d_in=3, d_y=1),
                    GPLayerConfig(d_in=4, d_out=1, num_inducing=8, final=True),
                ),
                num_data=64, objective="iw", num_iw_samples=5)
            params = init_dgp(KEY, cfg, dtype=jnp.float64)
            keys = jax.random.split(jax.random.PRNGKey(1), 64)
            before = float(jnp.mean(jax.vmap(
                lambda k: elbo(params, cfg, X, Y, k))(keys[:16])))
            tc = TrainConfig(lr=1e-2, gamma=0.05, natgrad="final",
                             schedule=schedule, minibatch_size=64,
                             iterations=150, steps_per_call=50)
            trained, state = fit(jax.random.PRNGKey(2), cfg, params, X, Y, tc)
            after = float(jnp.mean(jax.vmap(
                lambda k: elbo(trained, cfg, X, Y, k))(keys[16:32])))
            assert after > before + 1.0, (schedule, before, after)
            assert int(state.step) == 150


class TestGammaWarmup:
    def test_warmup_schedule_trains_stably(self):
        """Linear gamma warm-up: runs, improves, and the early steps use a
        small effective step (no big first-step jump in q_S)."""
        kx, ky = jax.random.split(KEY)
        X = jax.random.normal(kx, (64, 3), jnp.float64)
        Y = jnp.sin(2 * X[:, :1]) + 0.05 * jax.random.normal(ky, (64, 1), jnp.float64)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=3, d_out=1, num_inducing=8,
                                  mean_function="zero", final=True),),
            num_data=64, objective="vi")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        import numpy as np
        from dgps_with_iwvi_tpu.training import make_trainer

        S0 = np.asarray(extract_natvars(params, (0,))[0]["q_S"])
        deltas = {}
        for warmup in (0, 200):
            tc = TrainConfig(lr=1e-2, gamma=0.5, gamma_start=1e-4,
                             gamma_warmup=warmup, natgrad="final",
                             minibatch_size=64, iterations=1, steps_per_call=1)
            init_fn, step_fn, _, _ = make_trainer(cfg, tc)
            st, _ = jax.jit(step_fn)(init_fn(params), X, Y, jax.random.PRNGKey(2))
            deltas[warmup] = float(
                np.abs(np.asarray(st.natvars[0]["q_S"]) - S0).max())
        # warm-up's first step uses gamma_start=1e-4 instead of gamma=0.5:
        # the q_S move must be far smaller than the full-gamma step's
        assert deltas[200] < deltas[0] / 20, deltas
        # and a full warm-up run still improves the bound
        tc = TrainConfig(lr=1e-2, gamma=0.1, gamma_warmup=100,
                         natgrad="final", minibatch_size=64,
                         iterations=200, steps_per_call=50)
        before = float(elbo(params, cfg, X, Y, KEY))
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before + 1.0, (before, after)


class TestSolveBwdResolution:
    """TrainConfig.solve_bwd_precision 'auto' policy: 'same' — the
    single-pass relaxation is RETIRED from auto (r5). Three gate strikes:
    all-Adam degradation (QUALITY_GATE_solvebwd.md), the B=2048
    LGG-kin8nm collapse (QUALITY_GATE_B2048.md, the r4 batch cap), and
    the r5 full-defaults interaction with gram-kres rounding that flips
    seed-0 LGG-kin8nm at B=512 (dELBO 2.84e-1; either knob alone
    passes). Explicit 'default'/'high' remain honored for A/B."""

    def test_auto_resolves_to_same(self):
        from dgps_with_iwvi_tpu.training.train import (TrainConfig,
                                                       resolve_solve_bwd)

        assert resolve_solve_bwd(TrainConfig(minibatch_size=512),
                                 [1]) == "same"
        assert resolve_solve_bwd(TrainConfig(minibatch_size=512),
                                 []) == "same"
        assert resolve_solve_bwd(TrainConfig(minibatch_size=2048),
                                 [1]) == "same"
        assert resolve_solve_bwd(
            TrainConfig(solve_bwd_precision="same",
                        minibatch_size=512), [1]) == "same"
        assert resolve_solve_bwd(
            TrainConfig(solve_bwd_precision="default",
                        minibatch_size=8192), []) == "default"

    def test_trainer_restores_module_switch_after_trace(self):
        """The trace-time scoping must not leak the policy globally."""
        import jax
        import jax.numpy as jnp

        from dgps_with_iwvi_tpu.models import BuildArgs, build_model
        from dgps_with_iwvi_tpu.ops import conditionals
        from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

        X = jax.random.normal(jax.random.PRNGKey(0), (64, 3), jnp.float32)
        Y = jnp.sin(X[:, :1])
        cfg, params = build_model(
            jax.random.PRNGKey(0),
            BuildArgs(configuration="G", mode="VI", num_inducing=8), X, Y)
        tc = TrainConfig(natgrad="final", minibatch_size=32,
                         steps_per_call=2, iterations=2)
        init_fn, _, chunk_fn, _ = make_trainer(cfg, tc)
        before = conditionals.SOLVE_BWD_PRECISION
        s, l = jax.jit(chunk_fn)(init_fn(params), X, Y, jax.random.PRNGKey(1))
        jax.block_until_ready(l)
        assert conditionals.SOLVE_BWD_PRECISION == before
        assert bool(jnp.all(jnp.isfinite(l)))
