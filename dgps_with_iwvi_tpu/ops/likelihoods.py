"""Gaussian likelihood: the three ops the DGP objectives need.

TPU-native rebuild of the Gaussian part of gpflow:gpflow/likelihoods.py
(+ gpflow:gpflow/logdensities.py) as used by ref:dgps_with_iwvi/models.py:

- variational_expectations(m, v, y): analytic E_{N(f|m,v)}[log N(y|f, s2)]
  — the collapsed data term of both the VI ELBO and the IW log-weights.
- log_prob(f, y): log N(y | f, s2).
- predict_mean_and_var(m, v): (m, v + s2) — adds observation noise.

Noise variance is stored unconstrained (shifted softplus, ops/transforms.py).
All functions reduce over the trailing output-dim axis and broadcast over
any leading sample/batch axes.
"""

from __future__ import annotations

from typing import Dict

import jax
import math as _math

import jax.numpy as jnp

from .transforms import positive, positive_inverse

LikelihoodParams = Dict[str, jax.Array]

# math, not jnp: a module-level jnp call would initialize the jax
# backend at IMPORT time, breaking the multi-process contract that
# jax.distributed.initialize runs before any backend use
_LOG2PI = float(_math.log(2.0 * _math.pi))


def gaussian_params(noise_variance: float = 0.05, dtype=jnp.float32) -> LikelihoodParams:
    """Init pytree. Reference default noise init ~0.05 (SURVEY.md §2.5)."""
    return {"raw_noise_variance": positive_inverse(jnp.asarray(noise_variance, dtype))}


def noise_variance(params: LikelihoodParams) -> jax.Array:
    return positive(params["raw_noise_variance"])


def variational_expectations(params: LikelihoodParams, mean: jax.Array,
                             var: jax.Array, y: jax.Array) -> jax.Array:
    """E_{N(f|mean,var)}[log N(y | f, s2)], summed over the last axis.

    mean/var: [..., N, D]; y: [N, D] (broadcast) -> [..., N].
    """
    s2 = noise_variance(params)
    per_dim = -0.5 * (_LOG2PI + jnp.log(s2) + (jnp.square(y - mean) + var) / s2)
    return jnp.sum(per_dim, axis=-1)


def log_prob(params: LikelihoodParams, f: jax.Array, y: jax.Array) -> jax.Array:
    """log N(y | f, s2) summed over the last axis."""
    s2 = noise_variance(params)
    per_dim = -0.5 * (_LOG2PI + jnp.log(s2) + jnp.square(y - f) / s2)
    return jnp.sum(per_dim, axis=-1)


def predict_mean_and_var(params: LikelihoodParams, fmean: jax.Array,
                         fvar: jax.Array) -> tuple[jax.Array, jax.Array]:
    return fmean, fvar + noise_variance(params)


def predict_density(params: LikelihoodParams, fmean: jax.Array, fvar: jax.Array,
                    y: jax.Array) -> jax.Array:
    """log ∫ N(y|f,s2) N(f|fmean,fvar) df = log N(y | fmean, fvar + s2),
    summed over the last axis. Used by the S-sample mixture test NLL."""
    s2 = noise_variance(params)
    v = fvar + s2
    per_dim = -0.5 * (_LOG2PI + jnp.log(v) + jnp.square(y - fmean) / v)
    return jnp.sum(per_dim, axis=-1)


# --------------------------------------------------------------------------
# Gauss-Hermite quadrature + Bernoulli (probit) likelihood.
#
# The reference's dependency layer dispatches non-conjugate likelihoods to
# Gauss-Hermite quadrature (gpflow:gpflow/likelihoods.py / quadrature.py);
# we provide the same machinery so the DGP stack also covers binary
# classification. Probit link: several expectations stay analytic.
# --------------------------------------------------------------------------

DEFAULT_NUM_GAUSS_HERMITE = 20


def gauss_hermite_expectation(log_fn, mean: jax.Array, var: jax.Array,
                              n_points: int = DEFAULT_NUM_GAUSS_HERMITE):
    """E_{N(f | mean, var)}[log_fn(f)], elementwise over mean/var.

    Probabilists' Gauss-Hermite rule; weights are compile-time constants.
    """
    import numpy as _np

    from .conditionals import safe_sqrt

    xs, ws = _np.polynomial.hermite_e.hermegauss(n_points)
    ws = ws / _np.sqrt(2.0 * _np.pi)
    xs = jnp.asarray(xs, mean.dtype)
    ws = jnp.asarray(ws, mean.dtype)
    # safe_sqrt, NOT sqrt(max(var, 0)): a final-layer variance can hit
    # exactly 0 (clamped fvar_prior + underflowed fvar_q) and sqrt's
    # infinite derivative there makes the whole Bernoulli ELBO gradient
    # NaN — the identical inf*0 AD hazard fixed on the Gaussian sampling
    # path (ops/conditionals.py safe_sqrt docstring).
    f = mean[..., None] + safe_sqrt(var)[..., None] * xs
    return jnp.sum(log_fn(f) * ws, axis=-1)


def bernoulli_params(dtype=jnp.float32) -> LikelihoodParams:
    """Probit Bernoulli has no free parameters; keep the pytree non-empty so
    the optimizer plumbing is uniform."""
    return {"_unused": jnp.zeros((), dtype)}


def _log_probit(f: jax.Array, y: jax.Array) -> jax.Array:
    """log P(y | f) with P(y=1|f) = Phi(f); y in {0, 1} (or {-1, 1})."""
    sign = jnp.where(y > 0.5, 1.0, -1.0)
    return jax.scipy.stats.norm.logcdf(sign * f)


def bernoulli_variational_expectations(
        params: LikelihoodParams, mean: jax.Array, var: jax.Array,
        y: jax.Array, n_points: int = DEFAULT_NUM_GAUSS_HERMITE) -> jax.Array:
    """E_{N(f|mean,var)}[log Bern(y | Phi(f))] via quadrature, summed over
    the last axis."""
    del params
    per_dim = gauss_hermite_expectation(
        lambda f: _log_probit(f, y[..., None]), mean, var, n_points)
    return jnp.sum(per_dim, axis=-1)


def bernoulli_predict_mean_and_var(params: LikelihoodParams, fmean: jax.Array,
                                   fvar: jax.Array):
    """p = E[Phi(f)] = Phi(m / sqrt(1 + v)) — analytic for the probit link."""
    del params
    p = jax.scipy.stats.norm.cdf(fmean / jnp.sqrt(1.0 + fvar))
    return p, p - jnp.square(p)


def bernoulli_predict_density(params: LikelihoodParams, fmean: jax.Array,
                              fvar: jax.Array, y: jax.Array) -> jax.Array:
    """log ∫ Bern(y|Phi(f)) N(f|m,v) df = log Phi(±m/sqrt(1+v)), summed
    over the last axis (analytic for probit)."""
    del params
    sign = jnp.where(y > 0.5, 1.0, -1.0)
    per_dim = jax.scipy.stats.norm.logcdf(
        sign * fmean / jnp.sqrt(1.0 + fvar))
    return jnp.sum(per_dim, axis=-1)


def gauss_hermite_log_expectation(logp_fn, mean: jax.Array, var: jax.Array,
                                  n_points: int = DEFAULT_NUM_GAUSS_HERMITE):
    """log E_{N(f|mean,var)}[exp(logp_fn(f))], elementwise over mean/var.

    The log-space companion of :func:`gauss_hermite_expectation` — used for
    predictive densities log ∫ p(y|f) N(f|m,v) df of non-conjugate
    likelihoods, where the quadrature must run under a logsumexp to avoid
    underflow of p(y|f) at the tail abscissae.
    """
    import numpy as _np

    from .conditionals import safe_sqrt

    xs, ws = _np.polynomial.hermite_e.hermegauss(n_points)
    logws = _np.log(ws / _np.sqrt(2.0 * _np.pi))
    xs = jnp.asarray(xs, mean.dtype)
    logws = jnp.asarray(logws, mean.dtype)
    f = mean[..., None] + safe_sqrt(var)[..., None] * xs
    return jax.nn.logsumexp(logp_fn(f) + logws, axis=-1)


# --------------------------------------------------------------------------
# Wider likelihood family (TPU-native rebuild of the non-Gaussian part of
# gpflow:gpflow/likelihoods.py, same semantics and default links). The
# reference experiments only exercise Gaussian, but the dependency layer the
# rebuild replaces ships the full family; each entry provides the same trio
# (variational_expectations / predict_mean_and_var / predict_density) and
# plugs into both objectives and the mixture evaluation path unchanged.
# Analytic forms are used wherever the exp-link integrals are closed
# (Poisson/Exponential/Gamma data terms; all log-Normal moments); everything
# else runs compile-time-constant Gauss-Hermite rules.
# --------------------------------------------------------------------------


def _expn(mean, var, a: float):
    """E[exp(a f)] under N(f | mean, var) = exp(a m + a^2 v / 2)."""
    return jnp.exp(a * mean + (a * a / 2.0) * var)


# ---- Student-t (identity link; scale trainable, df fixed per gpflow) -----

def student_t_params(scale: float = 1.0, df: float = 3.0,
                     dtype=jnp.float32) -> LikelihoodParams:
    """df is stored in the pytree but consumed through stop_gradient —
    gpflow's StudentT likewise ships df as a non-trainable parameter."""
    return {"raw_scale": positive_inverse(jnp.asarray(scale, dtype)),
            "df": jnp.asarray(df, dtype)}


def _student_t_logp(scale, df, f, y):
    z = jnp.square(y - f) / (df * jnp.square(scale))
    return (jax.scipy.special.gammaln((df + 1.0) / 2.0)
            - jax.scipy.special.gammaln(df / 2.0)
            - 0.5 * jnp.log(df * jnp.pi * jnp.square(scale))
            - ((df + 1.0) / 2.0) * jnp.log1p(z))


def student_t_variational_expectations(params, mean, var, y,
                                       n_points=DEFAULT_NUM_GAUSS_HERMITE):
    scale = positive(params["raw_scale"])
    df = jax.lax.stop_gradient(params["df"])
    per_dim = gauss_hermite_expectation(
        lambda f: _student_t_logp(scale, df, f, y[..., None]),
        mean, var, n_points)
    return jnp.sum(per_dim, axis=-1)


def student_t_predict_mean_and_var(params, fmean, fvar):
    """Var(y|f) = scale^2 df/(df-2) for df > 2; the true second moment does
    not exist at df <= 2 (Cauchy-like tails), so the variance is reported
    as +inf there rather than letting the formula go negative."""
    scale = positive(params["raw_scale"])
    df = jax.lax.stop_gradient(params["df"])
    cond_var = jnp.where(df > 2.0,
                         jnp.square(scale) * df / jnp.maximum(df - 2.0, 1e-12),
                         jnp.inf)
    return fmean, fvar + cond_var


def student_t_predict_density(params, fmean, fvar, y,
                              n_points=DEFAULT_NUM_GAUSS_HERMITE):
    scale = positive(params["raw_scale"])
    df = jax.lax.stop_gradient(params["df"])
    per_dim = gauss_hermite_log_expectation(
        lambda f: _student_t_logp(scale, df, f, y[..., None]),
        fmean, fvar, n_points)
    return jnp.sum(per_dim, axis=-1)


# ---- Poisson (exp link; analytic data term) ------------------------------

def poisson_params(dtype=jnp.float32) -> LikelihoodParams:
    return {"_unused": jnp.zeros((), dtype)}


def poisson_variational_expectations(params, mean, var, y, n_points=None):
    """E[y f - exp(f) - log y!] = y m - exp(m + v/2) - lgamma(y+1): the
    exp-link Poisson data term is fully analytic (gpflow special-cases this
    identically)."""
    del params, n_points
    per_dim = (y * mean - _expn(mean, var, 1.0)
               - jax.scipy.special.gammaln(y + 1.0))
    return jnp.sum(per_dim, axis=-1)


def poisson_predict_mean_and_var(params, fmean, fvar):
    """Law of total variance with lognormal rate lam = exp(f):
    E[y] = E[lam]; Var[y] = E[lam] + Var[lam]."""
    del params
    m = _expn(fmean, fvar, 1.0)
    # Var[lam] = E[exp(2f)] - E[exp(f)]^2 = exp(2m+v)(exp(v)-1) = m^2 expm1(v)
    v = m + jnp.square(m) * jnp.expm1(fvar)
    return m, v


def poisson_predict_density(params, fmean, fvar, y,
                            n_points=DEFAULT_NUM_GAUSS_HERMITE):
    del params
    per_dim = gauss_hermite_log_expectation(
        lambda f: (y[..., None] * f - jnp.exp(f)
                   - jax.scipy.special.gammaln(y[..., None] + 1.0)),
        fmean, fvar, n_points)
    return jnp.sum(per_dim, axis=-1)


# ---- Exponential (exp link = conditional mean; analytic data term) -------

def exponential_params(dtype=jnp.float32) -> LikelihoodParams:
    return {"_unused": jnp.zeros((), dtype)}


def exponential_variational_expectations(params, mean, var, y, n_points=None):
    """p(y|f) = exp(-y/lam)/lam, lam = exp(f):
    E[-f - y exp(-f)] = -m - y exp(-m + v/2)."""
    del params, n_points
    per_dim = -mean - y * _expn(mean, var, -1.0)
    return jnp.sum(per_dim, axis=-1)


def exponential_predict_mean_and_var(params, fmean, fvar):
    del params
    m = _expn(fmean, fvar, 1.0)
    # E[y^2|f] = 2 lam^2  =>  Var[y] = 2 E[lam^2] - E[lam]^2,
    # E[lam^2] = E[exp(2f)] = _expn(a=2)
    v = 2.0 * _expn(fmean, fvar, 2.0) - jnp.square(m)
    return m, v


def exponential_predict_density(params, fmean, fvar, y,
                                n_points=DEFAULT_NUM_GAUSS_HERMITE):
    del params
    per_dim = gauss_hermite_log_expectation(
        lambda f: -f - y[..., None] * jnp.exp(-f), fmean, fvar, n_points)
    return jnp.sum(per_dim, axis=-1)


# ---- Gamma (trainable shape; exp link = scale; analytic data term) -------

def gamma_params(shape: float = 1.0, dtype=jnp.float32) -> LikelihoodParams:
    return {"raw_shape": positive_inverse(jnp.asarray(shape, dtype))}


def gamma_variational_expectations(params, mean, var, y, n_points=None):
    """p(y|f) = Gamma(y; k, theta=exp(f)):
    E[(k-1)log y - y exp(-f) - k f - lgamma(k)]."""
    del n_points
    k = positive(params["raw_shape"])
    per_dim = ((k - 1.0) * jnp.log(y) - y * _expn(mean, var, -1.0)
               - k * mean - jax.scipy.special.gammaln(k))
    return jnp.sum(per_dim, axis=-1)


def gamma_predict_mean_and_var(params, fmean, fvar):
    k = positive(params["raw_shape"])
    e_th = _expn(fmean, fvar, 1.0)
    m = k * e_th
    # E[Var(y|f)] + Var(E(y|f)) = k E[th^2] + k^2 Var[th], th lognormal:
    # E[th^2] = E[exp(2f)] = _expn(a=2), Var[th] = E[th^2] - E[th]^2
    e_th2 = _expn(fmean, fvar, 2.0)
    v = k * e_th2 + jnp.square(k) * (e_th2 - jnp.square(e_th))
    return m, v


def gamma_predict_density(params, fmean, fvar, y,
                          n_points=DEFAULT_NUM_GAUSS_HERMITE):
    k = positive(params["raw_shape"])
    per_dim = gauss_hermite_log_expectation(
        lambda f: ((k - 1.0) * jnp.log(y[..., None]) - y[..., None] * jnp.exp(-f)
                   - k * f - jax.scipy.special.gammaln(k)),
        fmean, fvar, n_points)
    return jnp.sum(per_dim, axis=-1)


# ---- Beta (logit link; trainable scale) ----------------------------------

def beta_params(scale: float = 1.0, dtype=jnp.float32) -> LikelihoodParams:
    return {"raw_scale": positive_inverse(jnp.asarray(scale, dtype))}


def _beta_logp(scale, f, y):
    mu = jax.nn.sigmoid(f)
    alpha = mu * scale
    beta = (1.0 - mu) * scale
    gammaln = jax.scipy.special.gammaln
    return ((alpha - 1.0) * jnp.log(y) + (beta - 1.0) * jnp.log1p(-y)
            + gammaln(scale) - gammaln(alpha) - gammaln(beta))


def beta_variational_expectations(params, mean, var, y,
                                  n_points=DEFAULT_NUM_GAUSS_HERMITE):
    scale = positive(params["raw_scale"])
    per_dim = gauss_hermite_expectation(
        lambda f: _beta_logp(scale, f, y[..., None]), mean, var, n_points)
    return jnp.sum(per_dim, axis=-1)


def beta_predict_mean_and_var(params, fmean, fvar,
                              n_points=DEFAULT_NUM_GAUSS_HERMITE):
    """E[y] = E[mu(f)], Var[y] = E[mu(1-mu)/(scale+1)] + Var[mu(f)],
    mu = sigmoid(f) — three quadratures sharing the rule."""
    scale = positive(params["raw_scale"])
    e_mu = gauss_hermite_expectation(jax.nn.sigmoid, fmean, fvar, n_points)
    e_mu2 = gauss_hermite_expectation(
        lambda f: jnp.square(jax.nn.sigmoid(f)), fmean, fvar, n_points)
    cond_v = (e_mu - e_mu2) / (scale + 1.0)
    v = cond_v + jnp.maximum(e_mu2 - jnp.square(e_mu), 0.0)
    return e_mu, v


def beta_predict_density(params, fmean, fvar, y,
                         n_points=DEFAULT_NUM_GAUSS_HERMITE):
    scale = positive(params["raw_scale"])
    per_dim = gauss_hermite_log_expectation(
        lambda f: _beta_logp(scale, f, y[..., None]), fmean, fvar, n_points)
    return jnp.sum(per_dim, axis=-1)


# ---- Ordinal (probit bins; gpflow Ordinal) --------------------------------
#
# C ordered categories y in {0..C-1} via a unit-noise probit of f against
# C-1 increasing bin edges: p(y=c|f) = Phi(b_c - f) - Phi(b_{c-1} - f) with
# b_{-1} = -inf, b_{C-1} = +inf. Edges are fixed (consumed through
# stop_gradient), matching gpflow's constructor-argument convention; the
# final GP layer keeps d_out = 1 (unlike multiclass). Every predictive
# reduces analytically because the noise is Gaussian: p(y<=c | m, v) =
# Phi((b_c - m) / sqrt(1 + v)) — only the data term needs quadrature.

# finite stand-in for the +-inf boundary edges: Phi(+-1e4) rounds to 1/0
# and its pdf to 0 EXACTLY in both f32 and f64, so values and gradients
# match the inf limit without inf-inf NaN hazards under AD.
_ORDINAL_SENTINEL = 1e4


def ordinal_params(num_classes: int = 3, bin_edges=None,
                   dtype=jnp.float32) -> LikelihoodParams:
    """bin_edges: [C-1] increasing; default unit-spaced centered on 0
    (C=3 -> [-0.5, 0.5]). The class count is static via the edges' length."""
    if bin_edges is None:
        bin_edges = [i - (num_classes - 2) / 2.0
                     for i in range(num_classes - 1)]
    return {"bin_edges": jnp.asarray(bin_edges, dtype)}


def _log_gauss_interval(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """log(Phi(hi) - Phi(lo)) for lo < hi, stable in BOTH tails: reflected
    into the left tail (where logcdf is accurate) when the interval sits in
    the right one. The naive cdf difference underflows to log(0) as soon as
    a bin is ~8 sigma out."""
    flip = (lo + hi) > 0.0
    l2 = jnp.where(flip, -hi, lo)
    h2 = jnp.where(flip, -lo, hi)
    la = jax.scipy.stats.norm.logcdf(h2)
    lb = jax.scipy.stats.norm.logcdf(l2)
    # exp(lb - la) < 1 strictly (edges are strictly increasing); the clamp
    # only guards the representable-equality corner against log1p(-1)
    return la + jnp.log1p(-jnp.exp(jnp.minimum(lb - la, -1e-12)))


def _ordinal_bounds(edges: jax.Array, y: jax.Array):
    """Per-label (lo_edge, hi_edge) with finite sentinel boundaries."""
    sent = jnp.asarray([_ORDINAL_SENTINEL], edges.dtype)
    lo_edges = jnp.concatenate([-sent, edges])
    hi_edges = jnp.concatenate([edges, sent])
    C = edges.shape[0] + 1
    yi = jnp.clip(y.astype(jnp.int32), 0, C - 1)
    return lo_edges[yi], hi_edges[yi]


def ordinal_variational_expectations(params, mean, var, y,
                                     n_points=DEFAULT_NUM_GAUSS_HERMITE):
    edges = jax.lax.stop_gradient(params["bin_edges"])

    def logp(f):  # f: [..., D, Q]; bounds broadcast [..., D, 1]
        lo, hi = _ordinal_bounds(edges, y[..., None])
        return _log_gauss_interval(lo - f, hi - f)

    per_dim = gauss_hermite_expectation(logp, mean, var, n_points)
    return jnp.sum(per_dim, axis=-1)


def ordinal_predict_probs(params, fmean, fvar) -> jax.Array:
    """Class probabilities [..., C] from fmean/fvar [..., 1] — analytic:
    p(y<=c) = Phi((b_c - m)/sqrt(1+v))."""
    edges = jax.lax.stop_gradient(params["bin_edges"])
    m = fmean[..., 0]
    s = jnp.sqrt(1.0 + fvar[..., 0])
    cdf = jax.scipy.stats.norm.cdf((edges - m[..., None]) / s[..., None])
    zeros = jnp.zeros_like(m)[..., None]
    ones = jnp.ones_like(m)[..., None]
    cdf = jnp.concatenate([zeros, cdf, ones], axis=-1)
    return jnp.clip(jnp.diff(cdf, axis=-1), 0.0, 1.0)


def ordinal_predict_mean_and_var(params, fmean, fvar):
    """Moments of the predictive label distribution (shape-preserving
    [..., 1] like the other identity-dim families)."""
    p = ordinal_predict_probs(params, fmean, fvar)
    ks = jnp.arange(p.shape[-1], dtype=p.dtype)
    m = jnp.sum(p * ks, axis=-1, keepdims=True)
    v = jnp.sum(p * jnp.square(ks), axis=-1, keepdims=True) - jnp.square(m)
    return m, jnp.maximum(v, 0.0)


def ordinal_predict_density(params, fmean, fvar, y,
                            n_points=None) -> jax.Array:
    """log p(y | m, v) = log[Phi((b_y - m)/s) - Phi((b_{y-1} - m)/s)],
    s = sqrt(1 + v) — analytic, in the tail-stable interval form
    (n_points accepted for dispatch symmetry, unused)."""
    del n_points
    edges = jax.lax.stop_gradient(params["bin_edges"])
    lo, hi = _ordinal_bounds(edges, y)
    s = jnp.sqrt(1.0 + fvar)
    per_dim = _log_gauss_interval((lo - fmean) / s, (hi - fmean) / s)
    return jnp.sum(per_dim, axis=-1)


# ---- Multiclass (robust-max link; gpflow MultiClass/RobustMax) -----------
#
# C-class classification: the final GP layer has d_out = C independent
# outputs; p(y=c | f) = 1-eps if f_c = max_j f_j else eps/(C-1). All the
# required integrals reduce to ONE-dimensional quadrature over the winning
# component f_c against the product of the other components' normal CDFs —
# this is why the reference stack uses robust-max instead of softmax (which
# has no deterministic quadrature). y holds the integer class in a [N, 1]
# float column, matching the loader's label convention.

ROBUSTMAX_EPS = 1e-3


def multiclass_params(dtype=jnp.float32) -> LikelihoodParams:
    return {"_unused": jnp.zeros((), dtype)}


def _robustmax_p_win(mean, var, onehot, n_points):
    """P(f_c >= f_j for all j) for the class marked by onehot[..., C].

    mean/var: [..., C]; onehot broadcastable to mean. One GH rule over the
    winning component; the j == c factor is masked to 1.
    """
    import numpy as _np

    from .conditionals import safe_sqrt

    xs, ws = _np.polynomial.hermite_e.hermegauss(n_points)
    ws = ws / _np.sqrt(2.0 * _np.pi)
    xs = jnp.asarray(xs, mean.dtype)
    ws = jnp.asarray(ws, mean.dtype)
    sd = safe_sqrt(var)
    m_c = jnp.sum(mean * onehot, axis=-1, keepdims=True)      # [..., 1]
    sd_c = jnp.sum(sd * onehot, axis=-1, keepdims=True)
    fc = m_c[..., None] + sd_c[..., None] * xs                # [..., 1, Q]
    z = (fc - mean[..., None]) / sd[..., None]                # [..., C, Q]
    logcdf = jax.scipy.stats.norm.logcdf(z)
    logcdf = jnp.where(onehot[..., None] > 0.5, 0.0, logcdf)  # mask j == c
    prod = jnp.exp(jnp.sum(logcdf, axis=-2))                  # [..., Q]
    return jnp.clip(jnp.sum(prod * ws, axis=-1), 0.0, 1.0)    # [...]


def _class_onehot(y, num_classes, dtype):
    """[..., 1] float class column -> [..., C] one-hot.

    Labels are clipped into [0, C-1]: an out-of-range label would one-hot
    to ALL-ZEROS, which silently corrupts _robustmax_p_win (m_c = sd_c = 0
    with no j==c mask) while keeping the loss finite. Clipping keeps the
    math well-formed; label-range validation belongs at ingest
    (data/datasets.py get_multiclass_data asserts it) — inside jit a data-
    dependent raise is not expressible.
    """
    idx = jnp.clip(y[..., 0].astype(jnp.int32), 0, num_classes - 1)
    return jax.nn.one_hot(idx, num_classes, dtype=dtype)


def multiclass_variational_expectations(params, mean, var, y,
                                        n_points=DEFAULT_NUM_GAUSS_HERMITE):
    """E[log p(y|f)] = P_win log(1-eps) + (1-P_win) log(eps/(C-1)) — exact
    given P_win, since log p takes only two values."""
    del params
    C = mean.shape[-1]
    onehot = _class_onehot(y, C, mean.dtype)
    p = _robustmax_p_win(mean, var, onehot, n_points)
    return (p * _math.log(1.0 - ROBUSTMAX_EPS)
            + (1.0 - p) * _math.log(ROBUSTMAX_EPS / (C - 1)))


def multiclass_predict_probs(params, fmean, fvar,
                             n_points=DEFAULT_NUM_GAUSS_HERMITE):
    """Predictive class probabilities [..., C]:
    p_c = (1-eps) P(win_c) + eps/(C-1) (1 - P(win_c))."""
    del params
    C = fmean.shape[-1]
    eye = jnp.eye(C, dtype=fmean.dtype)
    p_win = jax.vmap(
        lambda oh: _robustmax_p_win(fmean, fvar, oh, n_points),
        out_axes=-1)(eye)                                     # [..., C]
    return (1.0 - ROBUSTMAX_EPS) * p_win \
        + (ROBUSTMAX_EPS / (C - 1)) * (1.0 - p_win)


def multiclass_predict_mean_and_var(params, fmean, fvar,
                                    n_points=DEFAULT_NUM_GAUSS_HERMITE):
    p = multiclass_predict_probs(params, fmean, fvar, n_points)
    return p, p - jnp.square(p)


def multiclass_predict_density(params, fmean, fvar, y,
                               n_points=DEFAULT_NUM_GAUSS_HERMITE):
    C = fmean.shape[-1]
    onehot = _class_onehot(y, C, fmean.dtype)
    p_win = _robustmax_p_win(fmean, fvar, onehot, n_points)
    p = (1.0 - ROBUSTMAX_EPS) * p_win \
        + (ROBUSTMAX_EPS / (C - 1)) * (1.0 - p_win)
    return jnp.log(p)


# ---- Softmax (QMC multiclass; gpflow Softmax) -----------------------------
#
# p(y=c | f) = softmax_c(f) with d_out = C GP outputs. Unlike robust-max
# there is NO deterministic 1-D quadrature (the log-partition couples all
# C components), which is exactly why gpflow's Softmax falls back to Monte
# Carlo. Here the integrals use a FIXED quasi-Monte-Carlo rule instead:
# Halton points mapped through the inverse normal CDF, reparameterized as
# f = m + sd * z. That keeps every dispatch signature key-free and the
# objective DETERMINISTIC given params (same property as the quadrature
# families — natgrad/optimizer state sees a stable loss surface); the QMC
# bias is O((log P)^C / P) — measured ~0.008 nats at P=256 / ~0.002 at
# P=4096 on unit-variance C=3 moments (tests/test_likelihood_families.py
# TestSoftmax), far below training noise; raise n_points for tighter
# evaluation. Fully differentiable via reparameterization. (A fixed
# Cranley-Patterson rotation was tried and measured NO better at P=256.)

SOFTMAX_QMC_POINTS = 256


def softmax_params(num_classes: int | None = None,
                   dtype=jnp.float32) -> LikelihoodParams:
    del num_classes  # C is carried by the final layer's width, as multiclass
    return {"_unused": jnp.zeros((), dtype)}


def _halton_qmc_normal(n_points: int, dim: int):
    """[P, C] numpy standard-normal QMC points (trace-time constants)."""
    import numpy as _np
    from scipy.special import ndtri as _ndtri

    def primes(k):
        ps, cand = [], 2
        while len(ps) < k:
            if all(cand % p for p in ps):
                ps.append(cand)
            cand += 1
        return ps

    idx = _np.arange(1, n_points + 1)
    cols = []
    for b in primes(dim):
        i, f, r = idx.copy(), 1.0, _np.zeros(n_points)
        while i.max() > 0:
            f = f / b
            r = r + f * (i % b)
            i = i // b
        cols.append(r)
    u = _np.stack(cols, axis=-1)                    # [P, C] in (0, 1)
    return _ndtri(_np.clip(u, 1e-7, 1.0 - 1e-7))


def _softmax_label_logps(params, mean, var, y, n_points):
    """[..., P] log softmax_y(f_p) at the QMC reparameterized draws."""
    del params
    from .conditionals import safe_sqrt

    P = n_points or SOFTMAX_QMC_POINTS
    C = mean.shape[-1]
    z = jnp.asarray(_halton_qmc_normal(P, C), mean.dtype)    # [P, C]
    f = mean[..., None, :] + safe_sqrt(var)[..., None, :] * z  # [..., P, C]
    logp = jax.nn.log_softmax(f, axis=-1)
    onehot = _class_onehot(y, C, mean.dtype)
    return jnp.sum(logp * onehot[..., None, :], axis=-1)


def softmax_variational_expectations(params, mean, var, y, n_points=None):
    """E[log softmax_y(f)] — QMC average of the reparameterized draws."""
    return jnp.mean(_softmax_label_logps(params, mean, var, y, n_points),
                    axis=-1)


def softmax_predict_probs(params, fmean, fvar, n_points=None) -> jax.Array:
    """p_c = E[softmax_c(f)]: [..., C]."""
    del params
    from .conditionals import safe_sqrt

    P = n_points or SOFTMAX_QMC_POINTS
    C = fmean.shape[-1]
    z = jnp.asarray(_halton_qmc_normal(P, C), fmean.dtype)
    f = fmean[..., None, :] + safe_sqrt(fvar)[..., None, :] * z
    return jnp.mean(jax.nn.softmax(f, axis=-1), axis=-2)


def softmax_predict_mean_and_var(params, fmean, fvar, n_points=None):
    p = softmax_predict_probs(params, fmean, fvar, n_points)
    return p, p - jnp.square(p)


def softmax_predict_density(params, fmean, fvar, y, n_points=None):
    """log E[softmax_y(f)] — logsumexp over the QMC draws (tail-stable:
    never exponentiates a lone tiny probability)."""
    lps = _softmax_label_logps(params, fmean, fvar, y, n_points)
    return jax.nn.logsumexp(lps, axis=-1) - jnp.log(
        jnp.asarray(float(lps.shape[-1]), lps.dtype))


# ------------------------------------------------------------ dispatch ----

# --------------------------------------------------------------------------
# Switched Gaussian: per-task noise variance (SwitchedLikelihood analog).
#
# The reference stack pairs the Coregion kernel with gpflow's
# SwitchedLikelihood (gpflow:gpflow/likelihoods.py, end of file) so each
# task of a multi-task (ICM) model gets its own likelihood parameters. Same
# convention here: Y's LAST column holds the integer task index t in
# [0, T), the remaining columns are the targets, and every density uses
# noise variance s2[t]. The kernel side reads its task column from X
# ('coregion<C>x<R>[col]', ops/kernels.py) — together they are the full
# gpflow coregionalization idiom.
# --------------------------------------------------------------------------


def switched_gaussian_params(num_tasks: int, noise_variance: float = 0.05,
                             dtype=jnp.float32) -> LikelihoodParams:
    """One trainable noise variance per task, all initialized equal."""
    assert num_tasks >= 1
    return {"raw_noise_variance": positive_inverse(
        jnp.full((num_tasks,), noise_variance, dtype))}


def _switched_split(params, y):
    """(targets [..., N, D-1], per-point s2 [..., N, 1]) from task-tagged y."""
    s2_all = positive(params["raw_noise_variance"])        # [T]
    T = s2_all.shape[0]
    ix = jnp.clip(jnp.round(y[..., -1]).astype(jnp.int32), 0, T - 1)
    return y[..., :-1], jnp.take(s2_all, ix)[..., None]


def switched_variational_expectations(params, mean, var, y):
    """Analytic Gaussian VE with task-indexed noise; y carries the task
    index in its last column, mean/var are target-width ([..., N, D-1])."""
    yt, s2 = _switched_split(params, y)
    per_dim = -0.5 * (_LOG2PI + jnp.log(s2)
                      + (jnp.square(yt - mean) + var) / s2)
    return jnp.sum(per_dim, axis=-1)


def switched_predict_mean_and_var(params, fmean, fvar, y=None):
    """Observation moments need the task index: pass y (task-tagged, as in
    training) — without it the per-point noise is undefined (gpflow's
    SwitchedLikelihood raises here too)."""
    if y is None:
        raise ValueError(
            "switched_gaussian predict_mean_and_var needs the task-tagged y "
            "(task index in the last column) to pick each point's noise — "
            "use predict_y_and_log_density / evaluate, which pass it")
    _, s2 = _switched_split(params, y)
    return fmean, fvar + s2


def switched_predict_density(params, fmean, fvar, y):
    yt, s2 = _switched_split(params, y)
    v = fvar + s2
    per_dim = -0.5 * (_LOG2PI + jnp.log(v) + jnp.square(yt - fmean) / v)
    return jnp.sum(per_dim, axis=-1)


_FAMILIES = {
    "gaussian": (variational_expectations, predict_mean_and_var,
                 predict_density),
    "switched_gaussian": (switched_variational_expectations,
                          switched_predict_mean_and_var,
                          switched_predict_density),
    "bernoulli": (bernoulli_variational_expectations,
                  bernoulli_predict_mean_and_var, bernoulli_predict_density),
    "student_t": (student_t_variational_expectations,
                  student_t_predict_mean_and_var, student_t_predict_density),
    "poisson": (poisson_variational_expectations,
                poisson_predict_mean_and_var, poisson_predict_density),
    "exponential": (exponential_variational_expectations,
                    exponential_predict_mean_and_var,
                    exponential_predict_density),
    "gamma": (gamma_variational_expectations, gamma_predict_mean_and_var,
              gamma_predict_density),
    "beta": (beta_variational_expectations, beta_predict_mean_and_var,
             beta_predict_density),
    "multiclass": (multiclass_variational_expectations,
                   multiclass_predict_mean_and_var,
                   multiclass_predict_density),
    "ordinal": (ordinal_variational_expectations,
                ordinal_predict_mean_and_var, ordinal_predict_density),
    "softmax": (softmax_variational_expectations,
                softmax_predict_mean_and_var, softmax_predict_density),
}

LIKELIHOOD_KINDS = tuple(_FAMILIES)


def init_params(kind: str = "gaussian", noise_variance: float = 0.05,
                dtype=jnp.float32, **family_kwargs) -> LikelihoodParams:
    """family_kwargs: per-family inits — student_t(scale, df), gamma(shape),
    beta(scale), ordinal(num_classes, bin_edges). noise_variance only
    applies to the Gaussian."""
    if kind == "gaussian":
        return gaussian_params(noise_variance, dtype)
    if kind == "switched_gaussian":
        return switched_gaussian_params(noise_variance=noise_variance,
                                        dtype=dtype, **family_kwargs)
    if kind == "bernoulli":
        return bernoulli_params(dtype)
    if kind == "student_t":
        return student_t_params(dtype=dtype, **family_kwargs)
    if kind == "poisson":
        return poisson_params(dtype)
    if kind == "exponential":
        return exponential_params(dtype)
    if kind == "gamma":
        return gamma_params(dtype=dtype, **family_kwargs)
    if kind == "beta":
        return beta_params(dtype=dtype, **family_kwargs)
    if kind == "multiclass":
        return multiclass_params(dtype)
    if kind == "softmax":
        return softmax_params(dtype=dtype, **family_kwargs)
    if kind == "ordinal":
        return ordinal_params(dtype=dtype, **family_kwargs)
    raise ValueError(f"unknown likelihood {kind!r}; "
                     f"one of {LIKELIHOOD_KINDS}")


def dispatch_variational_expectations(params, mean, var, y, *,
                                      kind: str = "gaussian") -> jax.Array:
    return _FAMILIES[kind][0](params, mean, var, y)


def dispatch_predict_mean_and_var(params, fmean, fvar, *,
                                  kind: str = "gaussian", y=None):
    """y (task-tagged labels) is consumed ONLY by 'switched_gaussian',
    whose per-point noise is task-indexed; other families ignore it."""
    if kind == "switched_gaussian":
        return _FAMILIES[kind][1](params, fmean, fvar, y)
    return _FAMILIES[kind][1](params, fmean, fvar)


def dispatch_predict_density(params, fmean, fvar, y, *,
                             kind: str = "gaussian") -> jax.Array:
    return _FAMILIES[kind][2](params, fmean, fvar, y)


def dispatch_sample_observations(params, key: jax.Array, fs: jax.Array, *,
                                 kind: str = "gaussian") -> jax.Array:
    """One observation draw per function draw f (same shape): the sampling
    side of the observation model (predict_y_samples)."""
    if kind == "gaussian":
        s2 = noise_variance(params)
        return fs + jnp.sqrt(s2) * jax.random.normal(key, fs.shape, fs.dtype)
    if kind == "switched_gaussian":
        raise ValueError(
            "switched_gaussian observation sampling needs per-point task "
            "indices; draw f with predict_f_samples and add "
            "N(0, s2[task]) noise for your task assignment")
    if kind == "bernoulli":
        p = jax.scipy.stats.norm.cdf(fs)
        return jax.random.bernoulli(key, p).astype(fs.dtype)
    if kind == "student_t":
        scale = positive(params["raw_scale"])
        df = jax.lax.stop_gradient(params["df"])
        return fs + scale * jax.random.t(key, df, fs.shape, fs.dtype)
    if kind == "poisson":
        return jax.random.poisson(key, jnp.exp(fs), fs.shape).astype(fs.dtype)
    if kind == "exponential":
        return jnp.exp(fs) * jax.random.exponential(key, fs.shape, fs.dtype)
    if kind == "gamma":
        k = positive(params["raw_shape"])
        g = jax.random.gamma(key, jnp.broadcast_to(k, fs.shape), dtype=fs.dtype)
        return jnp.exp(fs) * g
    if kind == "beta":
        scale = positive(params["raw_scale"])
        mu = jax.nn.sigmoid(fs)
        return jax.random.beta(key, mu * scale, (1.0 - mu) * scale,
                               fs.shape, fs.dtype)
    if kind == "ordinal":
        # y = #edges below z, z ~ N(f, 1) — exact one-draw sampler
        edges = jax.lax.stop_gradient(params["bin_edges"])
        z = fs + jax.random.normal(key, fs.shape, fs.dtype)
        return jnp.sum(z[..., None] > edges, axis=-1).astype(fs.dtype)
    if kind == "softmax":
        y = jax.random.categorical(key, fs, axis=-1)
        return y.astype(fs.dtype)[..., None]
    if kind == "multiclass":
        # argmax winner, replaced by a uniform other class w.p. eps
        C = fs.shape[-1]
        kr, ku, kc = jax.random.split(key, 3)
        win = jnp.argmax(fs, axis=-1)
        corrupt = jax.random.bernoulli(kr, ROBUSTMAX_EPS, win.shape)
        offset = jax.random.randint(ku, win.shape, 1, C)
        other = (win + offset) % C
        y = jnp.where(corrupt, other, win).astype(fs.dtype)
        del kc
        return y[..., None]
    raise ValueError(f"unknown likelihood {kind!r}")
