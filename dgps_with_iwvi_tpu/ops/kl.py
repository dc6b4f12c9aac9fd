"""KL divergences for Gaussian variational posteriors.

TPU-native rebuild of gpflow:gpflow/kullback_leiblers.py gauss_kl as used by
GPLayer.KL() in ref:dgps_with_iwvi/layers.py (whitened) and by the
latent-variable layer's local KL (diagonal case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _logdet_sq_diag(L: jax.Array) -> jax.Array:
    """sum log diag(L)^2 over ALL axes, differentiably TPU-friendly.

    jnp.diagonal's transpose rule is a scatter-add — measured ~36 us/step of
    scatter + layout-copy traffic on [D, M, M] operands in the flagship
    profile. Extracting the diagonal as an eye-masked reduction instead
    keeps the backward a broadcast multiply that fuses away.
    """
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    diag = jnp.sum(L * eye, axis=-1)                        # [..., M]
    return jnp.sum(jnp.log(jnp.square(diag)))


def gauss_kl_white(q_mu: jax.Array, q_sqrt: jax.Array) -> jax.Array:
    """KL( N(q_mu, L L^T) || N(0, I) ), summed over output dims.

    q_mu: [M, D]; q_sqrt: [D, M, M] lower-triangular (only the lower triangle
    is read). Whitened-prior case of the reference's gauss_kl:
        0.5 * sum_d [ m_d^T m_d + tr(L_d L_d^T) - M - 2 sum log diag(L_d) ]
    """
    M = q_mu.shape[0]
    D = q_mu.shape[1]
    L = jnp.tril(q_sqrt)
    mahal = jnp.sum(jnp.square(q_mu))
    trace = jnp.sum(jnp.square(L))
    logdet = _logdet_sq_diag(L)
    return 0.5 * (mahal + trace - M * D - logdet)


@jax.custom_vjp
def carried_logdet(S: jax.Array, logdet_val: jax.Array,
                   Sinv: jax.Array) -> jax.Array:
    """log det S_d, [D], with the VALUE carried from the natgrad state and
    the GRADIENT routed to S via the carried inverse (d logdet S / dS =
    S^-1) — so the covariance-form natgrad path never factorizes S inside
    the loss. logdet_val and Sinv are state, not differentiated."""
    del S, Sinv
    return logdet_val


def _cl_fwd(S, logdet_val, Sinv):
    return logdet_val, Sinv


def _cl_bwd(Sinv, g):
    return (g[:, None, None] * Sinv, jnp.zeros(g.shape, Sinv.dtype),
            jnp.zeros_like(Sinv))


carried_logdet.defvjp(_cl_fwd, _cl_bwd)


def gauss_kl_white_cov(q_mu: jax.Array, q_S: jax.Array,
                       logdet_val: jax.Array, Sinv: jax.Array) -> jax.Array:
    """Whitened gauss_kl in COVARIANCE form: q(v) = N(q_mu, S) with S
    [D, M, M] given directly (the natgrad state), logdet/inverse carried:
        0.5 * sum_d [ m_d^T m_d + tr(S_d) - M - logdet S_d ]
    Matches gauss_kl_white(q_mu, chol(S)) exactly (tested)."""
    M, D = q_mu.shape
    mahal = jnp.sum(jnp.square(q_mu))
    # eye-masked trace: diagonal()'s transpose is a scatter-add (see
    # _logdet_sq_diag); the mask keeps the backward an elementwise broadcast
    trace = jnp.sum(q_S * jnp.eye(M, dtype=q_S.dtype))
    logdet = jnp.sum(carried_logdet(q_S, logdet_val, Sinv))
    return 0.5 * (mahal + trace - M * D - logdet)


def gauss_kl_cov(q_mu: jax.Array, q_S: jax.Array, logdet_val: jax.Array,
                 Sinv: jax.Array, Lm: jax.Array) -> jax.Array:
    """Non-whitened gauss_kl in covariance form (see gauss_kl):
        0.5 * sum_d [ m_d^T Kuu^-1 m_d + tr(Kuu^-1 S_d) - M
                      + log|Kuu| - log|S_d| ]
    """
    from .linalg import cho_solve, solve_triangular

    M, D = q_mu.shape
    alpha = solve_triangular(Lm, q_mu, lower=True)
    mahal = jnp.sum(jnp.square(alpha))
    KiS = cho_solve(Lm, q_S)                                # [D, M, M]
    trace = jnp.sum(KiS * jnp.eye(M, dtype=KiS.dtype))
    logdet_q = jnp.sum(carried_logdet(q_S, logdet_val, Sinv))
    logdet_p = D * _logdet_sq_diag(Lm)
    return 0.5 * (mahal + trace - M * D + logdet_p - logdet_q)


def gauss_kl_white_diag(q_mu: jax.Array, q_sqrt_diag: jax.Array) -> jax.Array:
    """Whitened KL for the q_diag family: q_sqrt_diag [M, D] of scales.
    0.5 * sum [ m^2 + s^2 - 1 - log s^2 ]."""
    s2 = jnp.square(q_sqrt_diag)
    return 0.5 * jnp.sum(jnp.square(q_mu) + s2 - 1.0 - jnp.log(s2))


def gauss_kl_white_diagvar(q_mu: jax.Array, v: jax.Array) -> jax.Array:
    """gauss_kl_white_diag in VARIANCE form (v [M, D] = s^2 directly) — the
    diagonal natgrad state; no square root anywhere."""
    return 0.5 * jnp.sum(jnp.square(q_mu) + v - 1.0 - jnp.log(v))


def gauss_kl(q_mu: jax.Array, q_sqrt: jax.Array, Lm: jax.Array) -> jax.Array:
    """KL( N(q_mu, L L^T) || N(0, Kuu) ) with Lm = chol(Kuu), summed over
    output dims — the non-whitened case of the reference's gauss_kl:
        0.5 * sum_d [ m_d^T Kuu^-1 m_d + tr(Kuu^-1 S_d) - M
                      + log|Kuu| - log|S_d| ]
    """
    from .linalg import solve_triangular

    M, D = q_mu.shape
    L = jnp.tril(q_sqrt)                                    # [D, M, M]
    alpha = solve_triangular(Lm, q_mu, lower=True)          # [M, D]
    mahal = jnp.sum(jnp.square(alpha))
    # tr(Kuu^-1 S) = || Lm^-1 L ||_F^2 per dim
    LiL = solve_triangular(Lm, L, lower=True)               # [D, M, M]
    trace = jnp.sum(jnp.square(LiL))
    logdet_q = _logdet_sq_diag(L)
    logdet_p = D * _logdet_sq_diag(Lm)
    return 0.5 * (mahal + trace - M * D + logdet_p - logdet_q)


def gauss_kl_diag_white(mu: jax.Array, log_var: jax.Array) -> jax.Array:
    """Per-row KL( N(mu, diag exp(log_var)) || N(0, I) ), reduced over the
    last axis only: [..., d] -> [...].

    Used for the latent-variable layer's local KL in the VI objective
    (ref:dgps_with_iwvi/models.py DGP_VI with LV layers).
    """
    var = jnp.exp(log_var)
    return 0.5 * jnp.sum(jnp.square(mu) + var - 1.0 - log_var, axis=-1)


def diag_gaussian_logpdf(x: jax.Array, mu: jax.Array, log_var: jax.Array) -> jax.Array:
    """log N(x | mu, diag exp(log_var)) reduced over the last axis."""
    log2pi = jnp.log(2.0 * jnp.pi)
    return -0.5 * jnp.sum(
        log2pi + log_var + jnp.square(x - mu) / jnp.exp(log_var), axis=-1
    )


def std_gaussian_logpdf(x: jax.Array) -> jax.Array:
    """log N(x | 0, I) reduced over the last axis."""
    log2pi = jnp.log(2.0 * jnp.pi)
    return -0.5 * jnp.sum(log2pi + jnp.square(x), axis=-1)
