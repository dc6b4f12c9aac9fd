"""Whitened sparse-variational GP conditionals.

TPU-native rebuild of gpflow:gpflow/conditionals.py base_conditional /
sample_conditional as used by ref:dgps_with_iwvi/layers.py (GPLayer.propagate).

Semantics (whitened, white=True — the reference's parameterization):
    q(v) = N(q_mu, q_sqrt q_sqrt^T) over whitened inducing outputs, u = Lm v,
    Lm = chol(Kuu). Then per test point x:
        A    = Lm^-1 Kuf                        # [M, N]
        mean = A^T q_mu                          # [N, D]
        var  = Kff_diag - sum(A^2, 0)
               + sum((q_sqrt^T A)^2, over M)     # [N, D] marginal (full_cov=False)

Doubly-stochastic DGPs only ever need the MARGINAL (diagonal) predictive
variance between layers (Salimbeni & Deisenroth 2017 factorization), so
full_cov=False is the hot path; a full_cov variant is provided for tests.

TPU-first layout: the inducing-point axis M is small (<= a few hundred) and
shared across all K importance samples and S MC samples, so chol(Kuu) is
computed ONCE per layer per step, while Kuf/A/mean/var batch over a single
flattened [K*S*B] leading axis as MXU matmuls. Leading batch axes on X
broadcast transparently.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import kernels
from .linalg import cholesky_with_jitter, solve_triangular, DEFAULT_JITTER


class ConditionalOut(NamedTuple):
    mean: jax.Array  # [..., N, D]
    var: jax.Array   # [..., N, D] (marginal) or [..., D, N, N] (full_cov)


def base_conditional_whitened(
    Kuf: jax.Array,      # [..., M, N]
    Lm: jax.Array,       # [M, M] lower Cholesky of Kuu (+jitter)
    Kff_diag: jax.Array,  # [..., N]
    q_mu: jax.Array,     # [M, D]
    q_sqrt: jax.Array,   # [D, M, M] lower-triangular
) -> ConditionalOut:
    """Whitened marginal conditional; broadcasts over leading axes of Kuf."""
    A = solve_triangular(Lm, Kuf, lower=True)              # [..., M, N]
    mean = jnp.swapaxes(A, -1, -2) @ q_mu                  # [..., N, D]
    fvar_prior = Kff_diag - jnp.sum(jnp.square(A), axis=-2)  # [..., N]
    # (q_sqrt^T A): [D, M, M] x [..., M, N] -> [..., D, M, N]
    LTA = jnp.swapaxes(q_sqrt, -1, -2) @ A[..., None, :, :]
    fvar_q = jnp.sum(jnp.square(LTA), axis=-2)             # [..., D, N]
    var = fvar_prior[..., None] + jnp.swapaxes(fvar_q, -1, -2)  # [..., N, D]
    return ConditionalOut(mean, var)


def base_conditional_whitened_fullcov(
    Kuf: jax.Array,      # [M, N]
    Lm: jax.Array,       # [M, M]
    Kff: jax.Array,      # [N, N]
    q_mu: jax.Array,     # [M, D]
    q_sqrt: jax.Array,   # [D, M, M]
) -> ConditionalOut:
    """Full-covariance variant (tests / small-N prediction only)."""
    A = solve_triangular(Lm, Kuf, lower=True)              # [M, N]
    mean = A.T @ q_mu                                      # [N, D]
    LTA = jnp.swapaxes(q_sqrt, -1, -2) @ A                 # [D, M, N]
    cov = (Kff - A.T @ A)[None] + jnp.swapaxes(LTA, -1, -2) @ LTA  # [D, N, N]
    return ConditionalOut(mean, cov)


def conditional(
    X: jax.Array,          # [..., N, D_in]
    Z: jax.Array,          # [M, D_in]
    kernel_params,
    q_mu: jax.Array,       # [M, D_out]
    q_sqrt: jax.Array,     # [D_out, M, M]
    *,
    kernel_kind: str = "rbf",
    jitter: float = DEFAULT_JITTER,
    Lm: jax.Array | None = None,
) -> ConditionalOut:
    """End-to-end whitened conditional: grams -> chol -> solve -> (mean, var).

    Pass a precomputed ``Lm`` to share the Kuu Cholesky across calls within
    one step (e.g. training + KL both need it).
    """
    if Lm is None:
        Kuu = kernels.K(kernel_params, Z, Z, kind=kernel_kind)
        Lm = cholesky_with_jitter(Kuu, jitter)
    # Z:[M,D] broadcasts against X:[..., N, D] -> Kuf:[..., M, N]
    Kuf = kernels.K(kernel_params, Z, X, kind=kernel_kind)
    Kff_diag = kernels.Kdiag(kernel_params, X, kind=kernel_kind)
    return base_conditional_whitened(Kuf, Lm, Kff_diag, q_mu, q_sqrt)


def sample_conditional(
    key: jax.Array,
    X: jax.Array,
    Z: jax.Array,
    kernel_params,
    q_mu: jax.Array,
    q_sqrt: jax.Array,
    **kw,
) -> tuple[jax.Array, ConditionalOut]:
    """Reparameterized marginal sample F = mean + sqrt(var) * eps.

    The multisample path of the reference (its temp_workaround.py fought
    GPflow's dispatch for this); here leading sample axes are just batch dims.
    """
    out = conditional(X, Z, kernel_params, q_mu, q_sqrt, **kw)
    eps = jax.random.normal(key, out.mean.shape, out.mean.dtype)
    sample = out.mean + jnp.sqrt(jnp.maximum(out.var, 0.0)) * eps
    return sample, out
