"""Wider likelihood family (Student-t / Poisson / Exponential / Gamma /
Beta / Ordinal / multiclass robust-max).

Parity strategy mirrors gpflow's test_likelihoods for the non-Gaussian
families the dependency layer ships (gpflow:gpflow/likelihoods.py): every
variational expectation, predictive density, and predictive moment is
checked against dense numeric integration over f with scipy's exact log
densities; the robust-max multiclass quantities are checked against brute
Monte Carlo; then end-to-end DGP runs prove the objective/eval wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from dgps_with_iwvi_tpu.models import (BuildArgs, DGPConfig, GPLayerConfig,
                                       build_config, elbo, init_dgp,
                                       predict_y, predict_y_samples)
from dgps_with_iwvi_tpu.models.layers import LVLayerConfig
from dgps_with_iwvi_tpu.ops import likelihoods
from dgps_with_iwvi_tpu.training import TrainConfig, fit

KEY = jax.random.PRNGKey(0)

# f-grid wide enough that the lognormal-link tails are fully covered at the
# test (m, v); trapezoid integration is then good to ~1e-8
GRID = np.linspace(-12.0, 12.0, 40001)


def numeric_expectation(fn, m, v):
    """E_{N(f|m,v)}[fn(f)] by trapezoid over a dense f grid (scalars)."""
    w = st.norm.pdf(GRID, loc=m, scale=np.sqrt(v))
    return np.trapezoid(fn(GRID) * w, GRID)


# Each case: params, scipy per-point logp(f, y), conditional mean/var of
# y|f, and valid (m, v, y) test points.
def _cases():
    f64 = jnp.float64
    scale, df, shape_k, beta_s = 0.7, 4.0, 2.5, 3.0
    return {
        "student_t": dict(
            params=likelihoods.student_t_params(scale, df, f64),
            logp=lambda f, y: st.t.logpdf(y, df, loc=f, scale=scale),
            cond_mean=lambda f: f,
            cond_var=lambda f: scale ** 2 * df / (df - 2.0) + 0.0 * f,
            ys=[-0.4, 1.2], ms=[0.3, -0.8], vs=[0.5, 1.1]),
        "poisson": dict(
            params=likelihoods.poisson_params(f64),
            logp=lambda f, y: st.poisson.logpmf(y, np.exp(f)),
            cond_mean=np.exp,
            cond_var=np.exp,
            ys=[0.0, 3.0], ms=[0.2, 1.0], vs=[0.3, 0.8]),
        "exponential": dict(
            params=likelihoods.exponential_params(f64),
            logp=lambda f, y: st.expon.logpdf(y, scale=np.exp(f)),
            cond_mean=np.exp,
            cond_var=lambda f: np.exp(2.0 * f),
            ys=[0.5, 2.5], ms=[0.1, -0.5], vs=[0.4, 0.9]),
        "gamma": dict(
            params=likelihoods.gamma_params(shape_k, f64),
            logp=lambda f, y: st.gamma.logpdf(y, shape_k, scale=np.exp(f)),
            cond_mean=lambda f: shape_k * np.exp(f),
            cond_var=lambda f: shape_k * np.exp(2.0 * f),
            ys=[0.8, 4.0], ms=[0.3, -0.2], vs=[0.5, 0.7]),
        "beta": dict(
            params=likelihoods.beta_params(beta_s, f64),
            logp=lambda f, y: st.beta.logpdf(
                y, _sig(f) * beta_s, (1.0 - _sig(f)) * beta_s),
            cond_mean=_sig,
            cond_var=lambda f: _sig(f) * (1.0 - _sig(f)) / (beta_s + 1.0),
            ys=[0.3, 0.75], ms=[0.4, -1.0], vs=[0.6, 0.2]),
        "ordinal": dict(
            # C=4 default edges [-1, 0, 1]; unit-noise probit bins
            params=likelihoods.ordinal_params(4, dtype=f64),
            logp=lambda f, y: _ordinal_logp(f, y, np.array([-1., 0., 1.])),
            cond_mean=lambda f: _ordinal_moment(
                f, np.array([-1., 0., 1.]), 1),
            cond_var=lambda f: (
                _ordinal_moment(f, np.array([-1., 0., 1.]), 2)
                - _ordinal_moment(f, np.array([-1., 0., 1.]), 1) ** 2),
            ys=[1.0, 3.0], ms=[0.3, -0.8], vs=[0.5, 1.1]),
    }


def _ordinal_class_probs(f, edges):
    """p(y=c | f) for all c: [..., C] via unit-noise probit interval probs.

    Tail-stable like the implementation: the naive cdf difference cancels
    to EXACTLY 0 in f64 once the interval sits ~9 sigma right of f (both
    cdfs round to 1), which poisoned the trapezoid reference with log(0);
    use the survival-function difference on that side instead."""
    f = np.asarray(f, np.float64)[..., None]
    lo = np.concatenate([[-np.inf], edges]) - f          # [..., C]
    hi = np.concatenate([edges, [np.inf]]) - f
    with np.errstate(invalid="ignore"):
        d_cdf = st.norm.cdf(hi) - st.norm.cdf(lo)
        d_sf = st.norm.sf(lo) - st.norm.sf(hi)
    return np.where(lo + hi > 0, d_sf, d_cdf)


def _ordinal_logp(f, y, edges):
    p = _ordinal_class_probs(f, edges)
    return np.log(p[..., int(y)])


def _ordinal_moment(f, edges, power):
    p = _ordinal_class_probs(f, edges)
    ks = np.arange(p.shape[-1], dtype=np.float64) ** power
    return (p * ks).sum(-1)


def _sig(f):
    return 1.0 / (1.0 + np.exp(-f))


@pytest.mark.parametrize("kind", list(_cases()))
class TestNumericParity:
    def test_variational_expectations(self, kind):
        c = _cases()[kind]
        for m, v, y in zip(c["ms"], c["vs"], c["ys"]):
            got = likelihoods.dispatch_variational_expectations(
                c["params"], jnp.array([[m]]), jnp.array([[v]]),
                jnp.array([[y]]), kind=kind)
            want = numeric_expectation(lambda f: c["logp"](f, y), m, v)
            np.testing.assert_allclose(float(got[0]), want, rtol=2e-6,
                                       atol=1e-8)

    def test_predict_density(self, kind):
        c = _cases()[kind]
        for m, v, y in zip(c["ms"], c["vs"], c["ys"]):
            got = likelihoods.dispatch_predict_density(
                c["params"], jnp.array([[m]]), jnp.array([[v]]),
                jnp.array([[y]]), kind=kind)
            want = np.log(numeric_expectation(
                lambda f: np.exp(c["logp"](f, y)), m, v))
            # the default 20-point GH rule carries up to ~2e-4 relative
            # error on the heavy-tailed t density at |y-m| ~ 2 sigma (the
            # reference stack's quadrature default has the same accuracy);
            # the 100-point check below pins that the IMPLEMENTATION
            # converges to the numeric truth
            np.testing.assert_allclose(float(got[0]), want, rtol=5e-4,
                                       atol=1e-7)
            got100 = likelihoods._FAMILIES[kind][2](
                c["params"], jnp.array([[m]]), jnp.array([[v]]),
                jnp.array([[y]]), n_points=100)
            np.testing.assert_allclose(float(got100[0]), want, rtol=1e-6,
                                       atol=1e-7)

    def test_predict_mean_and_var(self, kind):
        c = _cases()[kind]
        for m, v in zip(c["ms"], c["vs"]):
            gm, gv = likelihoods.dispatch_predict_mean_and_var(
                c["params"], jnp.array([[m]]), jnp.array([[v]]), kind=kind)
            e_y = numeric_expectation(c["cond_mean"], m, v)
            e_y2 = numeric_expectation(
                lambda f: c["cond_var"](f) + c["cond_mean"](f) ** 2, m, v)
            np.testing.assert_allclose(float(gm[0, 0]), e_y, rtol=1e-5)
            np.testing.assert_allclose(float(gv[0, 0]), e_y2 - e_y ** 2,
                                       rtol=1e-4, atol=1e-8)

    def test_ve_gradients_finite(self, kind):
        """Trainable likelihood hyperparameters get finite gradients."""
        c = _cases()[kind]

        def obj(p):
            return jnp.sum(likelihoods.dispatch_variational_expectations(
                p, jnp.array([[c["ms"][0]]]), jnp.array([[c["vs"][0]]]),
                jnp.array([[c["ys"][0]]]), kind=kind))

        g = jax.grad(obj)(c["params"])
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))


class TestMulticlass:
    M = jnp.array([[0.5, -0.2, 0.8], [-1.0, 0.3, 0.1]], jnp.float64)
    V = jnp.array([[0.4, 0.9, 0.2], [0.7, 0.3, 1.1]], jnp.float64)

    def _mc_p_win(self, n=400000, seed=1):
        rng = np.random.RandomState(seed)
        m, v = np.asarray(self.M), np.asarray(self.V)
        f = m[None] + np.sqrt(v)[None] * rng.randn(n, *m.shape)
        win = np.argmax(f, axis=-1)                        # [n, N]
        return np.stack([(win == c).mean(0) for c in range(3)], -1)  # [N, C]

    def test_predict_probs_vs_mc(self):
        p = np.asarray(likelihoods.multiclass_predict_probs(
            likelihoods.multiclass_params(jnp.float64), self.M, self.V,
            n_points=40))
        eps = likelihoods.ROBUSTMAX_EPS
        want = (1 - eps) * self._mc_p_win() + eps / 2 * (1 - self._mc_p_win())
        np.testing.assert_allclose(p, want, atol=3e-3)
        np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)

    def test_ve_two_value_identity(self):
        """E[log p] is exactly P log(1-eps) + (1-P) log(eps/(C-1))."""
        lp = likelihoods.multiclass_params(jnp.float64)
        y = jnp.array([[2.0], [0.0]], jnp.float64)
        ve = np.asarray(likelihoods.multiclass_variational_expectations(
            lp, self.M, self.V, y, n_points=40))
        eps = likelihoods.ROBUSTMAX_EPS
        p_win = self._mc_p_win()[np.arange(2), [2, 0]]
        want = p_win * np.log(1 - eps) + (1 - p_win) * np.log(eps / 2)
        np.testing.assert_allclose(ve, want, atol=2e-2)

    def test_predict_density_consistent_with_probs(self):
        lp = likelihoods.multiclass_params(jnp.float64)
        probs = likelihoods.multiclass_predict_probs(lp, self.M, self.V)
        for c in range(3):
            y = jnp.full((2, 1), float(c), jnp.float64)
            ld = likelihoods.multiclass_predict_density(lp, self.M, self.V, y)
            np.testing.assert_allclose(np.exp(np.asarray(ld)),
                                       np.asarray(probs[:, c]), rtol=1e-6)

    def test_builder_multiclass_widths(self):
        """Final GP layer widens to C outputs; the LV encoder keeps the raw
        one-column label input."""
        args = BuildArgs(configuration="LG", likelihood="multiclass",
                         num_classes=4)
        cfg = build_config(args, d_x=5, d_y=1, num_data=100)
        lv, gp = cfg.layers
        assert isinstance(lv, LVLayerConfig) and lv.d_y == 1
        assert isinstance(gp, GPLayerConfig) and gp.d_out == 4


class TestSoftmax:
    """gpflow Softmax (MC in the dependency; deterministic Halton-QMC
    here — ops/likelihoods.py). Parity against brute-force numpy MC."""

    M = jnp.array([[0.5, -0.2, 0.8], [-1.0, 0.3, 0.1]], jnp.float64)
    V = jnp.array([[0.4, 0.9, 0.2], [0.7, 0.3, 1.1]], jnp.float64)

    def _mc(self, fn, n=400000, seed=2):
        rng = np.random.RandomState(seed)
        m, v = np.asarray(self.M), np.asarray(self.V)
        f = m[None] + np.sqrt(v)[None] * rng.randn(n, *m.shape)
        return fn(f).mean(0)

    def test_ve_vs_mc(self):
        lp = likelihoods.softmax_params(dtype=jnp.float64)
        y = jnp.array([[2.0], [0.0]], jnp.float64)
        ve = np.asarray(likelihoods.softmax_variational_expectations(
            lp, self.M, self.V, y))

        def ref(f):
            ls = f - np.log(np.exp(f).sum(-1, keepdims=True))
            return ls[..., [2, 0]][..., np.arange(2), np.arange(2)]

        # default P=256 carries ~0.008 nats of QMC bias (documented in
        # ops/likelihoods.py); the rule must CONVERGE: 16x more points
        # lands within MC noise of the brute-force estimate
        want = self._mc(ref)
        np.testing.assert_allclose(ve, want, atol=2e-2)
        ve4k = np.asarray(likelihoods.softmax_variational_expectations(
            lp, self.M, self.V, y, n_points=4096))
        np.testing.assert_allclose(ve4k, want, atol=4e-3)

    def test_zero_variance_is_exact(self):
        """var -> 0: every QMC point collapses, VE == log_softmax(m)[y]."""
        lp = likelihoods.softmax_params(dtype=jnp.float64)
        y = jnp.array([[1.0], [2.0]], jnp.float64)
        ve = np.asarray(likelihoods.softmax_variational_expectations(
            lp, self.M, jnp.zeros_like(self.V), y))
        want = np.asarray(jax.nn.log_softmax(self.M, -1))[[0, 1], [1, 2]]
        np.testing.assert_allclose(ve, want, rtol=1e-8)

    def test_probs_vs_mc_and_density(self):
        lp = likelihoods.softmax_params(dtype=jnp.float64)
        p = np.asarray(likelihoods.softmax_predict_probs(lp, self.M, self.V))
        want = self._mc(
            lambda f: np.exp(f) / np.exp(f).sum(-1, keepdims=True))
        np.testing.assert_allclose(p, want, atol=3e-3)
        np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-10)
        # density is log E[softmax_y]: consistent with the probs
        for c in range(3):
            y = jnp.full((2, 1), float(c), jnp.float64)
            ld = likelihoods.softmax_predict_density(lp, self.M, self.V, y)
            np.testing.assert_allclose(np.exp(np.asarray(ld)), p[:, c],
                                       rtol=1e-10)

    def test_moments_and_determinism(self):
        lp = likelihoods.softmax_params(dtype=jnp.float64)
        p1, v1 = likelihoods.softmax_predict_mean_and_var(lp, self.M, self.V)
        p2, v2 = likelihoods.softmax_predict_mean_and_var(lp, self.M, self.V)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_allclose(np.asarray(v1),
                                   np.asarray(p1) * (1 - np.asarray(p1)),
                                   rtol=1e-10)

    def test_sampler_matches_softmax(self):
        lp = likelihoods.softmax_params(dtype=jnp.float64)
        f = jnp.tile(jnp.array([[0.0, 2.0, -1.0]], jnp.float64), (100000, 1))
        ys = likelihoods.dispatch_sample_observations(
            lp, jax.random.PRNGKey(4), f, kind="softmax")
        assert ys.shape == (100000, 1)
        want = np.asarray(jax.nn.softmax(jnp.array([0.0, 2.0, -1.0])))
        for c in range(3):
            np.testing.assert_allclose(float(jnp.mean(ys == float(c))),
                                       want[c], atol=5e-3)

    def test_builder_softmax_widths(self):
        args = BuildArgs(configuration="G", likelihood="softmax",
                         num_classes=5)
        cfg = build_config(args, d_x=3, d_y=1, num_data=50)
        assert cfg.layers[0].d_out == 5

    def test_softmax_svgp_learns(self):
        """Same 3-blob task as robust-max: accuracy well above chance."""
        n_per, d, C = 60, 2, 3
        rng = np.random.RandomState(0)
        centers = np.array([[2.0, 0.0], [-1.0, 1.8], [-1.0, -1.8]])
        X = np.concatenate([c + 0.6 * rng.randn(n_per, d) for c in centers])
        Y = np.repeat(np.arange(C), n_per).astype(np.float64)[:, None]
        X = jnp.asarray(X); Y = jnp.asarray(Y)
        n = C * n_per
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=C, num_inducing=16,
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi", likelihood="softmax")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        before = float(elbo(params, cfg, X, Y, KEY))
        tc = TrainConfig(lr=5e-2, natgrad="none", minibatch_size=n,
                         iterations=300, steps_per_call=100)
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before, (before, after)
        p, _ = predict_y(trained, cfg, X, jax.random.PRNGKey(1), 32)
        acc = float(jnp.mean(jnp.argmax(p, -1) == Y[:, 0]))
        assert acc > 0.85, acc


class TestOrdinal:
    EDGES = np.array([-1.0, 0.0, 1.0])  # C=4 default

    def test_probs_sum_to_one_and_match_density(self):
        p = likelihoods.ordinal_params(4, dtype=jnp.float64)
        m = jnp.array([[0.3], [-1.2], [2.0]], jnp.float64)
        v = jnp.array([[0.5], [1.1], [0.2]], jnp.float64)
        probs = likelihoods.ordinal_predict_probs(p, m, v)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-12)
        for c in range(4):
            y = jnp.full((3, 1), float(c), jnp.float64)
            ld = likelihoods.ordinal_predict_density(p, m, v, y)
            np.testing.assert_allclose(np.exp(np.asarray(ld)),
                                       np.asarray(probs[:, c]), rtol=1e-9)

    def test_density_tail_stable(self):
        """log p stays finite ~20 sigma out, where the naive cdf difference
        underflows to log(0) (the reflected interval form)."""
        p = likelihoods.ordinal_params(4, dtype=jnp.float64)
        m = jnp.array([[-20.0], [20.0]], jnp.float64)
        v = jnp.array([[0.5], [0.5]], jnp.float64)
        y = jnp.array([[3.0], [0.0]], jnp.float64)  # far-tail classes
        ld = np.asarray(likelihoods.ordinal_predict_density(p, m, v, y))
        assert np.all(np.isfinite(ld)) and np.all(ld < -50), ld

    def test_sampler_matches_probs(self):
        p = likelihoods.ordinal_params(4, dtype=jnp.float64)
        f = jnp.full((200000, 1), 0.4, jnp.float64)
        ys = likelihoods.dispatch_sample_observations(
            p, jax.random.PRNGKey(5), f, kind="ordinal")
        assert ys.shape == f.shape
        hist = np.bincount(np.asarray(ys[:, 0]).astype(int),
                           minlength=4) / 200000
        want = _ordinal_class_probs(0.4, self.EDGES)
        np.testing.assert_allclose(hist, want, atol=4e-3)

    def test_builder_keeps_one_output(self):
        """Unlike multiclass, ordinal keeps the final GP layer at d_out=1
        and encodes C in the bin edges."""
        from dgps_with_iwvi_tpu.models import build_model

        rng = np.random.RandomState(3)
        X = jnp.asarray(rng.randn(50, 2))
        Y = jnp.asarray(rng.randint(0, 5, (50, 1)).astype(np.float64))
        cfg, params = build_model(
            KEY, BuildArgs(configuration="G", likelihood="ordinal",
                           num_classes=5, num_inducing=8), X, Y)
        assert cfg.layers[-1].d_out == 1
        assert params["likelihood"]["bin_edges"].shape == (4,)
        assert np.isfinite(float(elbo(params, cfg, X, Y, KEY)))

    def test_ordinal_dgp_learns_ordering(self):
        """Ordered labels from a monotone latent rule: training lifts the
        bound and the predictive mean tracks the label order."""
        n, d = 120, 2
        rng = np.random.RandomState(0)
        X = rng.randn(n, d)
        latent = 1.5 * X[:, 0]
        Y = np.digitize(latent, [-1.0, 0.0, 1.0]).astype(np.float64)[:, None]
        X = jnp.asarray(X); Y = jnp.asarray(Y)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=1, num_inducing=16,
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi", likelihood="ordinal")
        params = init_dgp(KEY, cfg, dtype=jnp.float64,
                          likelihood_kwargs={"num_classes": 4})
        before = float(elbo(params, cfg, X, Y, KEY))
        tc = TrainConfig(lr=5e-2, natgrad="none", minibatch_size=n,
                         iterations=300, steps_per_call=100)
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before, (before, after)
        m, _ = predict_y(trained, cfg, X, jax.random.PRNGKey(1), 32)
        # rounded predictive mean = the natural ordinal decision rule
        acc = float(jnp.mean(jnp.round(jnp.clip(m[:, 0], 0, 3)) == Y[:, 0]))
        assert acc > 0.7, acc


class TestSampling:
    @pytest.mark.parametrize("kind", ["gaussian", "bernoulli", "student_t",
                                      "poisson", "exponential", "gamma",
                                      "beta"])
    def test_observation_sampling_moments(self, kind):
        """Sampled observations at a FIXED f match the conditional mean."""
        params = (likelihoods.init_params(kind, dtype=jnp.float64)
                  if kind != "student_t"
                  else likelihoods.student_t_params(0.5, 5.0, jnp.float64))
        f = jnp.full((200000, 1), 0.4, jnp.float64)
        ys = likelihoods.dispatch_sample_observations(
            params, jax.random.PRNGKey(3), f, kind=kind)
        assert ys.shape == f.shape
        cond_mean = {
            "gaussian": 0.4,
            "bernoulli": float(st.norm.cdf(0.4)),
            "student_t": 0.4,
            "poisson": float(np.exp(0.4)),
            "exponential": float(np.exp(0.4)),
            "gamma": float(likelihoods.positive(params["raw_shape"])
                           * np.exp(0.4)) if kind == "gamma" else None,
            "beta": float(_sig(0.4)),
        }[kind]
        np.testing.assert_allclose(float(jnp.mean(ys)), cond_mean, rtol=2e-2)

    def test_multiclass_sampling(self):
        params = likelihoods.multiclass_params(jnp.float64)
        f = jnp.tile(jnp.array([[0.0, 3.0, -1.0]], jnp.float64), (100000, 1))
        ys = likelihoods.dispatch_sample_observations(
            params, jax.random.PRNGKey(4), f, kind="multiclass")
        assert ys.shape == (100000, 1)
        frac_win = float(jnp.mean(ys == 1.0))
        np.testing.assert_allclose(frac_win, 1 - likelihoods.ROBUSTMAX_EPS,
                                   atol=3e-3)


class TestSwitchedGaussian:
    """Per-task noise (gpflow SwitchedLikelihood + Coregion idiom): Y's last
    column is the task index, each task gets its own trainable noise
    variance (gpflow:gpflow/likelihoods.py SwitchedLikelihood)."""

    def _mt_data(self, n_per=80, stds=(0.05, 0.3, 0.8), seed=0):
        rng = np.random.RandomState(seed)
        xs, ys = [], []
        for t, s in enumerate(stds):
            x = rng.uniform(-3, 3, (n_per, 1))
            y = np.sin(x) + s * rng.randn(n_per, 1)
            xs.append(np.concatenate([x, np.full((n_per, 1), float(t))], 1))
            ys.append(np.concatenate([y, np.full((n_per, 1), float(t))], 1))
        return (jnp.asarray(np.concatenate(xs), jnp.float64),
                jnp.asarray(np.concatenate(ys), jnp.float64))

    def test_equal_noises_match_plain_gaussian(self):
        p_sw = likelihoods.switched_gaussian_params(3, 0.1, jnp.float64)
        p_g = likelihoods.gaussian_params(0.1, jnp.float64)
        rng = np.random.RandomState(2)
        m = jnp.asarray(rng.randn(4, 7, 1))
        v = jnp.asarray(np.abs(rng.randn(4, 7, 1)) + 0.1)
        yt = jnp.asarray(rng.randn(7, 1))
        task = jnp.asarray(rng.randint(0, 3, (7, 1)).astype(np.float64))
        y = jnp.concatenate([yt, task], axis=-1)
        np.testing.assert_allclose(
            likelihoods.switched_variational_expectations(p_sw, m, v, y),
            likelihoods.variational_expectations(p_g, m, v, yt), rtol=1e-12)
        np.testing.assert_allclose(
            likelihoods.switched_predict_density(p_sw, m, v, y),
            likelihoods.predict_density(p_g, m, v, yt), rtol=1e-12)

    def test_predict_mean_and_var_needs_y(self):
        p = likelihoods.switched_gaussian_params(2, 0.1, jnp.float64)
        with pytest.raises(ValueError, match="task-tagged"):
            likelihoods.switched_predict_mean_and_var(
                p, jnp.zeros((3, 1)), jnp.ones((3, 1)))
        y = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [0.0, 1.0]], jnp.float64)
        _, v = likelihoods.switched_predict_mean_and_var(
            p, jnp.zeros((3, 1)), jnp.ones((3, 1)), y)
        np.testing.assert_allclose(np.asarray(v)[:, 0], 1.1, rtol=1e-5)

    def test_builder_infers_tasks_and_target_width(self):
        from dgps_with_iwvi_tpu.models import build_model

        X, Y = self._mt_data(n_per=20)
        cfg, params = build_model(
            KEY, BuildArgs(configuration="G", num_inducing=8,
                           kernel_kind="rbf[0]*coregion3x1[1]",
                           likelihood="switched_gaussian"), X, Y)
        assert cfg.layers[-1].d_out == 1  # targets only, not the task col
        assert params["likelihood"]["raw_noise_variance"].shape == (3,)
        assert np.isfinite(float(elbo(params, cfg, X, Y, KEY)))

    def test_icm_learns_distinct_per_task_noises(self):
        """The VERDICT r3 'done' criterion: per-task noises converge to
        DISTINCT truths (stds 0.05 / 0.3 / 0.8) on a synthetic 3-task set
        with a shared latent function."""
        from dgps_with_iwvi_tpu.evaluation import evaluate

        stds = (0.05, 0.3, 0.8)
        X, Y = self._mt_data(n_per=80, stds=stds)
        n = X.shape[0]
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=2, d_out=1, num_inducing=24,
                                  kernel_kind="rbf[0]*coregion3x1[1]",
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi", likelihood="switched_gaussian")
        params = init_dgp(KEY, cfg, dtype=jnp.float64,
                          likelihood_kwargs={"num_tasks": 3})
        before = float(elbo(params, cfg, X, Y, KEY))
        tc = TrainConfig(lr=3e-2, natgrad="none", minibatch_size=n,
                         iterations=800, steps_per_call=200)
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before, (before, after)
        s2 = np.asarray(likelihoods.positive(
            trained["likelihood"]["raw_noise_variance"]))
        # distinct, correctly ordered, and near the truths
        assert s2[0] < s2[1] < s2[2], s2
        for got, s in zip(s2, stds):
            assert s ** 2 / 3.0 < got < s ** 2 * 3.0, (s2, stds)
        # evaluate reports pooled + per-task NLL
        m = evaluate(trained, cfg, X, Y, jax.random.PRNGKey(3),
                     y_std=np.ones(1), num_samples=32, batch_size=128,
                     likelihood="switched_gaussian")
        for t in range(3):
            assert np.isfinite(m[f"test_loglik_task_{t}"]), m
        # the noisy task is (much) harder: lower per-point loglik
        assert m["test_loglik_task_2"] < m["test_loglik_task_0"], m


class TestEndToEnd:
    def test_multiclass_svgp_learns(self):
        """3 Gaussian blobs: accuracy well above chance after training."""
        n_per, d, C = 60, 2, 3
        rng = np.random.RandomState(0)
        centers = np.array([[2.0, 0.0], [-1.0, 1.8], [-1.0, -1.8]])
        X = np.concatenate([c + 0.6 * rng.randn(n_per, d) for c in centers])
        Y = np.repeat(np.arange(C), n_per).astype(np.float64)[:, None]
        X = jnp.asarray(X); Y = jnp.asarray(Y)
        n = C * n_per
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=C, num_inducing=16,
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi", likelihood="multiclass")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        before = float(elbo(params, cfg, X, Y, KEY))
        tc = TrainConfig(lr=5e-2, natgrad="none", minibatch_size=n,
                         iterations=300, steps_per_call=100)
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before, (before, after)
        p, _ = predict_y(trained, cfg, X, jax.random.PRNGKey(1), 32)
        acc = float(jnp.mean(jnp.argmax(p, -1) == Y[:, 0]))
        assert acc > 0.85, acc

    def test_multiclass_evaluate_reports_accuracy(self):
        from dgps_with_iwvi_tpu.evaluation import evaluate

        n, d, C = 50, 2, 3
        X = jax.random.normal(jax.random.PRNGKey(7), (n, d), jnp.float64)
        Y = jnp.asarray((np.random.RandomState(1).randint(0, C, (n, 1)))
                        .astype(np.float64))
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=C, num_inducing=8,
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi", likelihood="multiclass")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        m = evaluate(params, cfg, X, Y, KEY, y_std=np.ones(1),
                     num_samples=8, batch_size=32, likelihood="multiclass")
        assert 0.0 <= m["test_accuracy"] <= 1.0
        assert np.isfinite(m["test_loglik"])

    def test_student_t_evaluate_unnormalizes_like_gaussian(self):
        """student_t trains on STANDARDIZED labels (get_regression_data),
        so evaluate must apply the same y_std un-normalization as gaussian —
        regression for a review finding where it took the raw-units branch
        and reported rmse ~y_std-times too small."""
        from dgps_with_iwvi_tpu.evaluation import evaluate

        n, d = 40, 2
        X = jax.random.normal(jax.random.PRNGKey(11), (n, d), jnp.float64)
        Y = jax.random.normal(jax.random.PRNGKey(12), (n, 1), jnp.float64)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=1, num_inducing=8,
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi", likelihood="student_t")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        params["likelihood"] = likelihoods.student_t_params(
            1.0, 4.0, jnp.float64)
        y_std = np.array([2.0])
        m = evaluate(params, cfg, X, Y, KEY, y_std=y_std, num_samples=8,
                     batch_size=32, likelihood="student_t")
        np.testing.assert_allclose(
            m["test_loglik"], m["test_loglik_normalized"] - np.log(2.0),
            rtol=1e-10)
        np.testing.assert_allclose(
            m["test_rmse"], m["test_rmse_normalized"] * 2.0, rtol=1e-10)

    def test_student_t_iw_equals_vi_at_k1(self):
        """The K=1 IW bound == VI bound holds for quadrature likelihoods
        too (same key, no LV layers: exact identity)."""
        n, d = 40, 3
        X = jax.random.normal(jax.random.PRNGKey(2), (n, d), jnp.float64)
        Y = jax.random.normal(jax.random.PRNGKey(3), (n, 1), jnp.float64)
        base = dict(num_data=n, likelihood="student_t")
        layers = (GPLayerConfig(d_in=d, d_out=1, num_inducing=8,
                                mean_function="zero", final=True),)
        cfg_vi = DGPConfig(layers=layers, objective="vi", num_samples=1,
                           **base)
        cfg_iw = DGPConfig(layers=layers, objective="iw", num_iw_samples=1,
                           **base)
        params = init_dgp(KEY, cfg_vi, dtype=jnp.float64)
        params["likelihood"] = likelihoods.student_t_params(
            1.0, 3.0, jnp.float64)
        np.testing.assert_allclose(float(elbo(params, cfg_vi, X, Y, KEY)),
                                   float(elbo(params, cfg_iw, X, Y, KEY)),
                                   rtol=1e-12)

    def test_poisson_dgp_trains(self):
        """Counts from a log-link rule: the bound improves and predictions
        track the conditional mean."""
        n, d = 100, 2
        rng = np.random.RandomState(0)
        X = rng.randn(n, d)
        lam = np.exp(0.8 * X[:, :1])
        Y = rng.poisson(lam).astype(np.float64)
        X = jnp.asarray(X); Y = jnp.asarray(Y)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=1, num_inducing=16,
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi", likelihood="poisson")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        before = float(elbo(params, cfg, X, Y, KEY))
        tc = TrainConfig(lr=5e-2, natgrad="none", minibatch_size=n,
                         iterations=200, steps_per_call=100)
        trained, _ = fit(KEY, cfg, params, X, Y, tc)
        after = float(elbo(trained, cfg, X, Y, KEY))
        assert after > before, (before, after)
        ys = predict_y_samples(trained, cfg, X[:5], jax.random.PRNGKey(9), 64)
        assert ys.shape == (64, 5, 1) and np.all(np.asarray(ys) >= 0)
