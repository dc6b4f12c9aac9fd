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
import jax.numpy as jnp

from .transforms import positive, positive_inverse

LikelihoodParams = Dict[str, jax.Array]

_LOG2PI = float(jnp.log(2.0 * jnp.pi))


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
