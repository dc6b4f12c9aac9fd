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


# ------------------------------------------------------------ dispatch ----

def init_params(kind: str = "gaussian", noise_variance: float = 0.05,
                dtype=jnp.float32) -> LikelihoodParams:
    if kind == "gaussian":
        return gaussian_params(noise_variance, dtype)
    if kind == "bernoulli":
        return bernoulli_params(dtype)
    raise ValueError(f"unknown likelihood {kind!r}")


def dispatch_variational_expectations(params, mean, var, y, *,
                                      kind: str = "gaussian") -> jax.Array:
    if kind == "gaussian":
        return variational_expectations(params, mean, var, y)
    return bernoulli_variational_expectations(params, mean, var, y)


def dispatch_predict_mean_and_var(params, fmean, fvar, *,
                                  kind: str = "gaussian"):
    if kind == "gaussian":
        return predict_mean_and_var(params, fmean, fvar)
    return bernoulli_predict_mean_and_var(params, fmean, fvar)


def dispatch_predict_density(params, fmean, fvar, y, *,
                             kind: str = "gaussian") -> jax.Array:
    if kind == "gaussian":
        return predict_density(params, fmean, fvar, y)
    return bernoulli_predict_density(params, fmean, fvar, y)
