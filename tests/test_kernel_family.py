"""Wider kernel family (RationalQuadratic / Cosine / ArcCosine 0|1|2 /
Linear / Polynomial / Periodic / White / Constant + sum/product
combinators).

Parity strategy mirrors gpflow's test_kerns for the kernel set the
dependency layer ships (gpflow:gpflow/kernels.py): every leaf gram is
checked against a dense numpy closed form, composites against the
sum/product of their leaves, Kdiag against diag(K) (the non-stationary
kinds make this a real test), PSD via jittered Cholesky, then an
end-to-end DGP run on a composite kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgps_with_iwvi_tpu.models import (BuildArgs, DGPConfig, GPLayerConfig,
                                       build_model, elbo, init_dgp,
                                       predict_y)
from dgps_with_iwvi_tpu.ops import kernels
from dgps_with_iwvi_tpu.ops.linalg import cholesky_with_jitter
from dgps_with_iwvi_tpu.training import TrainConfig, fit

KEY = jax.random.PRNGKey(0)
RNG = np.random.RandomState(0)
N, M, D = 13, 9, 4
X = jnp.asarray(RNG.randn(N, D))
X2 = jnp.asarray(RNG.randn(M, D))

ALL_LEAVES = list(kernels.LEAF_KINDS)
COMPOSITES = ["rbf+linear", "rbf*periodic", "rbf*linear+constant",
              "matern32+white", "linear+polynomial+constant",
              "rq*linear+cosine", "arccosine+rbf",
              # active-dims suffixes: different leaves on different columns
              "rbf[0:2]", "rbf[0:2]*periodic[2]", "linear[0,3]+rq[1:3]",
              "arccosine2[0:2]+white",
              # coregion reads a task-index column (floats round + clip)
              "coregion3x2[3]", "rbf[0:3]*coregion4x1[3]",
              "coregion3x1[0]+linear[1:4]"]


def _has_arccos(kind):
    return any(kernels.split_token(f)[0] in kernels.ARCCOSINE_ORDERS
               for t in kernels.parse_kind(kind) for f in t)


def leaf_reference(params, x, x2, token, same):
    """Dense numpy closed form per leaf (float64); token may carry an
    active-dims suffix, applied here as a plain column slice."""
    kind, dims = kernels.split_token(token)
    x, x2 = np.asarray(x), np.asarray(x2)
    if dims is not None:
        x, x2 = x[:, list(dims)], x2[:, list(dims)]
    pos = lambda r: 1e-6 + np.log1p(np.exp(np.asarray(r)))
    cr = kernels.coregion_shape(kind)
    if cr is not None:
        W = np.asarray(params["W"])
        B = W @ W.T + np.diag(pos(params["raw_kappa"]))
        ix = np.clip(np.round(x[:, 0]), 0, cr[0] - 1).astype(int)
        jx = np.clip(np.round(x2[:, 0]), 0, cr[0] - 1).astype(int)
        return B[np.ix_(ix, jx)]
    if kind in kernels.STATIONARY_KINDS:
        ls = pos(params["raw_lengthscales"])
        v = pos(params["raw_variance"])
        d2 = ((x[:, None, :] / ls - x2[None, :, :] / ls) ** 2).sum(-1)
        r = np.sqrt(np.maximum(d2, 0))
        if kind == "rbf":
            return v * np.exp(-0.5 * d2)
        if kind == "rq":
            alpha = pos(params["raw_alpha"])
            return v * (1 + d2 / (2 * alpha)) ** (-alpha)
        if kind == "cosine":
            # the PD projected form (gpflow-2 convention; the 1.5
            # euclid-distance cosine is not PSD in D > 1 — ops/kernels.py)
            u = (x / ls).sum(-1)
            u2 = (x2 / ls).sum(-1)
            return v * np.cos(u[:, None] - u2[None, :])
        if kind == "matern12":
            return v * np.exp(-r)
        if kind == "matern32":
            s = np.sqrt(3.0) * r
            return v * (1 + s) * np.exp(-s)
        s = np.sqrt(5.0) * r
        return v * (1 + s + 5.0 / 3.0 * d2) * np.exp(-s)
    if kind in kernels.ARCCOSINE_ORDERS:
        order = kernels.ARCCOSINE_ORDERS[kind]
        v = pos(params["raw_variance"])
        w = pos(params["raw_weight_variances"])
        b = pos(params["raw_bias_variance"])
        cross = (x * w) @ x2.T + b
        sxx = (w * x ** 2).sum(-1) + b
        syy = (w * x2 ** 2).sum(-1) + b
        den = np.sqrt(sxx)[:, None] * np.sqrt(syy)[None, :]
        eps = 1e-6  # the gpflow acos-jitter squeeze, ops/kernels.py
        th = np.arccos(np.clip(eps + (1 - 2 * eps) * cross / den, -1, 1))
        if order == 0:
            J = np.pi - th
        elif order == 1:
            J = np.sin(th) + (np.pi - th) * np.cos(th)
        else:
            J = 3 * np.sin(th) * np.cos(th) \
                + (np.pi - th) * (1 + 2 * np.cos(th) ** 2)
        return v / np.pi * den ** order * J
    if kind == "linear":
        v = pos(params["raw_variance"])
        return (x * v) @ x2.T
    if kind == "polynomial":
        v = pos(params["raw_variance"])
        off = pos(params["raw_offset"])
        deg = float(params["degree"])
        return ((x * v) @ x2.T + off) ** deg
    if kind == "periodic":
        v = pos(params["raw_variance"])
        ls = pos(params["raw_lengthscales"])
        per = pos(params["raw_period"])
        diff = x[:, None, :] - x2[None, :, :]
        s = np.sin(np.pi * diff / per) / ls
        return v * np.exp(-0.5 * (s ** 2).sum(-1))
    if kind == "white":
        v = pos(params["raw_variance"])
        return v * np.eye(x.shape[0]) if same else \
            np.zeros((x.shape[0], x2.shape[0]))
    v = pos(params["raw_variance"])
    return v * np.ones((x.shape[0], x2.shape[0]))


def composite_reference(params, x, x2, kind, same):
    terms = kernels.parse_kind(kind)
    if len(terms) == 1 and len(terms[0]) == 1:
        return leaf_reference(params, x, x2, terms[0][0], same)
    out = 0.0
    for tp, factors in zip(params["terms"], terms):
        prod = leaf_reference(tp[0], x, x2, factors[0], same)
        for fp, fk in zip(tp[1:], factors[1:]):
            prod = prod * leaf_reference(fp, x, x2, fk, same)
        out = out + prod
    return out


def _params(kind):
    # non-unit values so parity is not trivially satisfied
    return kernels.kernel_params(kind, D, variance=1.7, lengthscales=0.8,
                                 dtype=jnp.float64)


@pytest.mark.parametrize("kind", ALL_LEAVES + COMPOSITES)
class TestGramParity:
    def test_cross_gram(self, kind):
        p = _params(kind)
        got = np.asarray(kernels.K(p, X, X2, kind=kind))
        want = composite_reference(p, X, X2, kind, same=False)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_same_set_gram_and_kdiag(self, kind):
        p = _params(kind)
        got = np.asarray(kernels.K(p, X, X, kind=kind))   # X is X -> same
        want = composite_reference(p, X, X, kind, same=True)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        # Kdiag must equal diag(K(X, X)) INCLUDING the white kernel's
        # same-set variance and the non-stationary kinds' x-dependence.
        # ArcCosine Kdiag is EXACT (J(0) closed form) while diag(K) passes
        # the acos eps-squeeze (theta ~ sqrt(2e-6) instead of 0) — a real
        # ~4.5e-4 relative offset at order 0, so that family compares at
        # the clip's magnitude instead of machine precision.
        kd = np.asarray(kernels.Kdiag(p, X, kind=kind))
        rtol = 1e-3 if _has_arccos(kind) else 1e-10
        np.testing.assert_allclose(kd, np.diag(want), rtol=rtol, atol=1e-12)

    def test_psd_and_chol(self, kind):
        """Kuu + jitter factorizes: every kind is usable as a layer
        kernel."""
        p = _params(kind)
        Kuu = kernels.K(p, X, X, kind=kind)
        L = cholesky_with_jitter(Kuu, 1e-6)
        assert np.all(np.isfinite(np.asarray(L)))
        assert np.all(np.diag(np.asarray(L)) > 0)

    def test_param_gradients_finite(self, kind):
        p = _params(kind)
        g = jax.grad(lambda q: jnp.sum(kernels.K(q, X, X2, kind=kind)))(p)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_broadcasts_leading_axes(self, kind):
        """Sample axes flow through as batch dims (the S/K convention)."""
        p = _params(kind)
        Xb = jnp.broadcast_to(X, (3, N, D))
        got = np.asarray(kernels.K(p, Xb, X2, kind=kind))
        assert got.shape == (3, N, M)
        np.testing.assert_allclose(
            got[1], composite_reference(p, X, X2, kind, same=False),
            rtol=1e-10, atol=1e-12)


class TestEndToEnd:
    def test_composite_kernel_dgp_trains(self):
        n, d = 120, 2
        Xr = jnp.asarray(RNG.randn(n, d))
        Yr = (0.8 * Xr[:, :1] + jnp.sin(3.0 * Xr[:, 1:2])
              + 0.1 * jnp.asarray(RNG.randn(n, 1)))
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=1, num_inducing=16,
                                  kernel_kind="rbf+linear",
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        before = float(elbo(params, cfg, Xr, Yr, KEY))
        tc = TrainConfig(lr=5e-2, natgrad="none", minibatch_size=n,
                         iterations=200, steps_per_call=100)
        trained, _ = fit(KEY, cfg, params, Xr, Yr, tc)
        after = float(elbo(trained, cfg, Xr, Yr, KEY))
        assert after > before + 10.0, (before, after)
        m, _ = predict_y(trained, cfg, Xr, jax.random.PRNGKey(1), 16)
        rmse = float(jnp.sqrt(jnp.mean((m - Yr) ** 2)))
        assert rmse < 0.5, rmse

    def test_builder_accepts_composite_kind(self):
        Xr = jnp.asarray(RNG.randn(80, 3))
        Yr = jnp.asarray(RNG.randn(80, 1))
        cfg, params = build_model(
            KEY, BuildArgs(configuration="G", kernel_kind="rbf*periodic",
                           num_inducing=8), Xr, Yr)
        v = float(elbo(params, cfg, Xr, Yr, KEY))
        assert np.isfinite(v)
        assert "terms" in params["layers"][0]["kernel"]

    def test_periodic_fits_sinusoid_better_than_linear(self):
        """Sanity that the periodic structure is real, not just PSD: a pure
        sinusoid is captured by periodic where linear cannot.

        gamma=5e-3, not the 1e-2 default: a periodic kernel makes inducing
        points one period apart PERFECTLY correlated, so Kuu is near
        singular and the whitened natgrad step is gamma-sensitive (the
        known too-large-gamma failure class — the skip-on-failure guard
        keeps training alive but stuck). Measured here: gamma 1e-2 stalls
        at RMSE ~0.7, 5e-3 converges to 1e-3."""
        n = 100
        Xr = jnp.linspace(-2.0, 2.0, n, dtype=jnp.float64)[:, None]
        Yr = jnp.sin(2.0 * jnp.pi * Xr)
        res = {}
        for kind in ("periodic", "linear"):
            cfg = DGPConfig(
                layers=(GPLayerConfig(d_in=1, d_out=1, num_inducing=16,
                                      kernel_kind=kind,
                                      mean_function="zero", final=True),),
                num_data=n, objective="vi")
            params = init_dgp(KEY, cfg, dtype=jnp.float64)
            tc = TrainConfig(lr=5e-2, gamma=5e-3, natgrad="final",
                             minibatch_size=n, iterations=1000,
                             steps_per_call=100)
            trained, _ = fit(KEY, cfg, params, Xr, Yr, tc)
            m, _ = predict_y(trained, cfg, Xr, jax.random.PRNGKey(1), 16)
            res[kind] = float(jnp.sqrt(jnp.mean((m - Yr) ** 2)))
        assert res["periodic"] < 0.1 < res["linear"], res


class TestActiveDims:
    """gpflow active_dims as per-leaf '[...]' suffixes in the kind string
    (static column selection; ops/kernels.py split_token)."""

    def test_sliced_leaf_equals_plain_on_sliced_input(self):
        """'rbf[0:2]' on X:[N,4] == 'rbf' on X[:, :2], same params."""
        p = kernels.kernel_params("rbf[0:2]", D, variance=1.3,
                                  lengthscales=0.7, dtype=jnp.float64)
        assert p["raw_lengthscales"].shape == (2,)  # per-ACTIVE-dim ARD
        got = kernels.K(p, X, X2, kind="rbf[0:2]")
        want = kernels.K(p, X[:, :2], X2[:, :2], kind="rbf")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12)
        kd = kernels.Kdiag(p, X, kind="rbf[0:2]")
        kd2 = kernels.Kdiag(p, X[:, :2], kind="rbf")
        np.testing.assert_allclose(np.asarray(kd), np.asarray(kd2),
                                   rtol=1e-12)

    def test_explicit_column_list(self):
        """'[i,j]' picks non-contiguous columns, order preserved."""
        p = kernels.kernel_params("linear[3,0]", D, dtype=jnp.float64)
        assert p["raw_variance"].shape == (2,)
        got = kernels.K(p, X, X2, kind="linear[3,0]")
        want = kernels.K(p, X[:, [3, 0]], X2[:, [3, 0]], kind="linear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12)

    def test_bad_suffixes_rejected(self):
        for bad in ("rbf[0:0]", "rbf[1,1]", "rbf[", "rbf[x]", "rbf[-1]",
                    "nope[0]"):
            with pytest.raises(ValueError):
                kernels.parse_kind(bad)
        with pytest.raises(AssertionError):  # out of range for input_dim
            kernels.kernel_params("rbf[0:9]", D)

    def test_builder_e2e_sliced_composite(self):
        """A builder model with per-column structure trains: column 0 is
        linear, column 1 sinusoidal; the sliced composite separates them."""
        n = 120
        Xr = jnp.asarray(RNG.randn(n, 2))
        Yr = (0.8 * Xr[:, :1] + jnp.sin(3.0 * Xr[:, 1:2])
              + 0.05 * jnp.asarray(RNG.randn(n, 1)))
        cfg, params = build_model(
            KEY, BuildArgs(configuration="G",
                           kernel_kind="linear[0]+rbf[1]",
                           num_inducing=16),
            Xr, Yr)
        before = float(elbo(params, cfg, Xr, Yr, KEY))
        tc = TrainConfig(lr=5e-2, natgrad="final", gamma=5e-3,
                         minibatch_size=n, iterations=600,
                         steps_per_call=100)
        trained, _ = fit(KEY, cfg, params, Xr, Yr, tc)
        after = float(elbo(trained, cfg, Xr, Yr, KEY))
        assert after > before + 10.0, (before, after)
        m, _ = predict_y(trained, cfg, Xr, jax.random.PRNGKey(1), 16)
        rmse = float(jnp.sqrt(jnp.mean((m - Yr) ** 2)))
        assert rmse < 0.4, rmse


class TestCoregion:
    """gpflow Coregion (B = W W^T + diag(kappa) over a task-index column;
    gpflow:gpflow/kernels.py Coregion). 'rbf[...]*coregion<C>x<R>[col]'
    is the intrinsic coregionalization model; the generic gram/Kdiag/PSD/
    gradient parity runs in TestGramParity via the COMPOSITES entries."""

    def test_token_parsing(self):
        assert kernels.coregion_shape("coregion3x2") == (3, 2)
        assert kernels.coregion_shape("coregion12x4") == (12, 4)
        assert kernels.coregion_shape("rbf") is None
        assert kernels.coregion_shape("coregion") is None
        for bad in ("coregion[0]", "coregionx1[0]", "coregion3x[0]"):
            with pytest.raises(ValueError):
                kernels.parse_kind(bad)
        # the leaf must see exactly one column
        with pytest.raises(AssertionError):
            kernels.kernel_params("coregion3x1", D)

    def test_B_and_init(self):
        p = kernels.coregion_params(4, 2, dtype=jnp.float64)
        B = np.asarray(kernels.coregion_B(p))
        W = np.asarray(p["W"])
        np.testing.assert_allclose(B, W @ W.T + np.diag(
            1e-6 + np.log1p(np.exp(np.asarray(p["raw_kappa"])))), rtol=1e-12)
        # deterministic symmetry-breaking init: W trainable out of the box
        # (gpflow's W = 0 is a stationary point), kappa = 1 as in gpflow
        assert np.linalg.matrix_rank(W) == 2
        g = jax.grad(lambda q: jnp.sum(kernels.coregion_B(q) ** 2))(p)
        assert float(jnp.max(jnp.abs(g["W"]))) > 0.0

    def test_index_rounding_and_clipping(self):
        """k-means Z gives fractional task values; they round and clip."""
        p = kernels.coregion_params(3, 1, dtype=jnp.float64)
        B = np.asarray(kernels.coregion_B(p))
        x = jnp.asarray([[0.2], [0.9], [2.4], [7.0], [-1.0]], jnp.float64)
        got = np.asarray(kernels.K(p, x, x, kind="coregion3x1"))
        idx = np.array([0, 1, 2, 2, 0])
        np.testing.assert_allclose(got, B[np.ix_(idx, idx)], rtol=1e-12)

    def test_icm_learns_anticorrelated_tasks(self):
        """Two tasks with y2 = -y1: the ICM kernel must learn a NEGATIVE
        cross-task covariance and beat the independent-tasks model where
        task correlation carries the signal."""
        n_per = 80
        xs = jnp.linspace(-2.0, 2.0, n_per, dtype=jnp.float64)[:, None]
        f = jnp.sin(2.0 * xs)
        rng = np.random.RandomState(3)
        y0 = f + 0.05 * jnp.asarray(rng.randn(n_per, 1))
        y1 = -f + 0.05 * jnp.asarray(rng.randn(n_per, 1))
        X_mt = jnp.concatenate([
            jnp.concatenate([xs, jnp.zeros_like(xs)], axis=1),
            jnp.concatenate([xs, jnp.ones_like(xs)], axis=1)])
        Y_mt = jnp.concatenate([y0, y1])
        n = 2 * n_per
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=2, d_out=1, num_inducing=24,
                                  kernel_kind="rbf[0]*coregion2x1[1]",
                                  mean_function="zero", final=True),),
            num_data=n, objective="vi")
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        # place inducing points on the real task grid (both tasks)
        zx = jnp.linspace(-2.0, 2.0, 12, dtype=jnp.float64)[:, None]
        Z = jnp.concatenate([
            jnp.concatenate([zx, jnp.zeros_like(zx)], axis=1),
            jnp.concatenate([zx, jnp.ones_like(zx)], axis=1)])
        params["layers"][0]["Z"] = Z
        before = float(elbo(params, cfg, X_mt, Y_mt, KEY))
        tc = TrainConfig(lr=3e-2, natgrad="final", gamma=5e-3,
                         minibatch_size=n, iterations=800,
                         steps_per_call=200)
        trained, _ = fit(KEY, cfg, params, X_mt, Y_mt, tc)
        after = float(elbo(trained, cfg, X_mt, Y_mt, KEY))
        assert after > before, (before, after)
        B = np.asarray(kernels.coregion_B(
            trained["layers"][0]["kernel"]["terms"][0][1]))
        assert B[0, 1] < 0.0, B  # anticorrelation learned
        m, _ = predict_y(trained, cfg, X_mt, jax.random.PRNGKey(1), 16)
        rmse = float(jnp.sqrt(jnp.mean((m - Y_mt) ** 2)))
        assert rmse < 0.25, rmse

    def test_builder_e2e(self):
        """BuildArgs carries the ICM kind string through unchanged."""
        Xr = jnp.concatenate([
            jnp.asarray(RNG.randn(40, 1)),
            jnp.asarray(RNG.randint(0, 3, (40, 1)).astype(np.float64))],
            axis=1)
        Yr = jnp.asarray(RNG.randn(40, 1))
        cfg, params = build_model(
            KEY, BuildArgs(configuration="G",
                           kernel_kind="rbf[0]*coregion3x1[1]",
                           num_inducing=8), Xr, Yr)
        v = float(elbo(params, cfg, Xr, Yr, KEY))
        assert np.isfinite(v)
        kp = params["layers"][0]["kernel"]["terms"][0][1]
        assert kp["W"].shape == (3, 1) and kp["raw_kappa"].shape == (3,)


def test_exponential_alias_is_matern12():
    """gpflow kernel-name parity: 'exponential' == Matern-1/2
    (gpflow:gpflow/kernels.py Exponential)."""
    X = jnp.asarray(RNG.randn(12, 3))
    X2 = jnp.asarray(RNG.randn(7, 3))
    p = kernels.kernel_params("exponential", 3)
    p2 = kernels.kernel_params("matern12", 3)
    np.testing.assert_allclose(
        np.asarray(kernels.K(p, X, X2, kind="exponential")),
        np.asarray(kernels.K(p2, X, X2, kind="matern12")), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(kernels.Kdiag(p, X, kind="exponential")),
        np.asarray(kernels.Kdiag(p2, X, kind="matern12")), rtol=1e-6)


class TestGramKufResidual:
    """GRAM_KUF_RESIDUAL: the RBF gram whose vjp residual is the gram
    OUTPUT (shared with the solve operand) instead of the squared
    distance — byte-for-byte forward parity and gradient agreement with
    the plain AD path (ops/kernels.py _rbf_gram_kres)."""

    def _loss(self, p, Z, Xb):
        K = kernels.K(p, Z, Xb, kind="rbf")
        return jnp.sum(jnp.sin(0.1 * K) * K)

    def test_forward_bitexact_and_grads_match(self):
        Xb = jnp.asarray(RNG.randn(3, 20, D))
        Z = jnp.asarray(RNG.randn(M, D))
        p = kernels.rbf_params(D, variance=1.7, lengthscales=0.8)
        saved = kernels.GRAM_KUF_RESIDUAL
        try:
            kernels.GRAM_KUF_RESIDUAL = False
            K0 = kernels.K(p, Z, Xb, kind="rbf")
            v0, g0 = jax.value_and_grad(self._loss, argnums=(0, 1, 2))(
                p, Z, Xb)
            kernels.GRAM_KUF_RESIDUAL = True
            K1 = kernels.K(p, Z, Xb, kind="rbf")
            v1, g1 = jax.value_and_grad(self._loss, argnums=(0, 1, 2))(
                p, Z, Xb)
        finally:
            kernels.GRAM_KUF_RESIDUAL = saved
        np.testing.assert_array_equal(np.asarray(K0), np.asarray(K1))
        assert float(v0) == float(v1)
        for a, b in [(g0[0]["raw_variance"], g1[0]["raw_variance"]),
                     (g0[0]["raw_lengthscales"], g1[0]["raw_lengthscales"]),
                     (g0[1], g1[1]), (g0[2], g1[2])]:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)

    def test_clamp_edge_point_on_inducing_location(self):
        """A data row EXACTLY on an inducing point exercises the
        max(d2, 0) clamp; the K >= var proxy mask must reproduce the AD
        path's zero-gradient behavior there (no NaN, tiny diff)."""
        Z = jnp.asarray(RNG.randn(M, D))
        Xb = jnp.asarray(RNG.randn(10, D)).at[0].set(Z[3])
        p = kernels.rbf_params(D)
        saved = kernels.GRAM_KUF_RESIDUAL
        try:
            kernels.GRAM_KUF_RESIDUAL = False
            ga = jax.grad(self._loss, argnums=2)(p, Z, Xb)
            kernels.GRAM_KUF_RESIDUAL = True
            gb = jax.grad(self._loss, argnums=2)(p, Z, Xb)
        finally:
            kernels.GRAM_KUF_RESIDUAL = saved
        assert np.all(np.isfinite(np.asarray(gb)))
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-6)

    def test_auto_threshold_counts_lead_dims(self):
        """auto fires on total gram bytes including broadcast lead dims."""
        Z = jnp.zeros((128, 4), jnp.float32)
        big = jnp.zeros((20, 8192, 4), jnp.float32)  # 84 MB gram
        small = jnp.zeros((20, 64, 4), jnp.float32)
        assert kernels._use_kuf_residual(Z, big)
        assert not kernels._use_kuf_residual(Z, small)
