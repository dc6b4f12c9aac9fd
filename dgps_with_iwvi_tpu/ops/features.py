"""Inducing features beyond plain inducing points: Multiscale.

TPU-native rebuild of the rest of gpflow:gpflow/features.py (the part of
the ~200-LoC dependency-layer inventory row SURVEY.md §2.0 lists that
`InducingPoints` alone does not cover). A Multiscale feature is the
inter-domain inducing variable

    u_m = ∫ f(x) N(x | Z_m, diag(w_m^2)) dx,

i.e. each inducing "point" is a Gaussian window of per-dimension width
instead of a Dirac. For an RBF kernel every required covariance stays
closed-form; following the gpflow parameterization the trainable scales s
enter through the combined lengthscale a_m = l + s_m (so s -> 0 recovers
InducingPoints exactly, and the implied window variance is
w_m^2 = a_m^2 - l^2 >= 0 for any s_m >= 0 — Kuu is PSD by construction):

    Kuf[m, n] = v * prod_d(l_d / a_md) * exp(-0.5 sum_d (x_nd - z_md)^2 / a_md^2)
    Kuu[i, j] = v * prod_d(l_d / c_ijd) * exp(-0.5 sum_d (z_id - z_jd)^2 / c_ijd^2)
                with c_ij^2 = a_i^2 + a_j^2 - l^2  (= l^2 + w_i^2 + w_j^2)

Both are verified against brute-force Monte-Carlo integration of the
window integrals in tests/test_features.py. Kff is untouched (features
only change the u-side covariances), so the conditional's variance path,
precision policy, natgrad family, and KLs all apply unchanged — the
feature is just a different (Kuu, Kuf) pair fed to the same whitened
conditional.

TPU notes: Kuf's exponent expands to TWO batched MXU matmuls
(x^2 @ (1/a^2)^T and x @ (z/a^2)^T — the per-m lengthscale makes the
plain gram expansion inapplicable, but the quadratic still factorizes
because a depends only on m); they run under the same forward-precision
policy as the RBF gram (kernels.GRAM_FWD_PRECISION) since the expansion
has the same cancellation. Kuu materializes [M, M, D] once per step —
M is a hundred-ish, negligible next to the conditional.

FEATURE_KINDS names the registry: 'points' (plain inducing points — the
reference's only feature) and 'multiscale'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import kernels
from .transforms import positive, positive_inverse

FEATURE_KINDS = ("points", "multiscale")


def multiscale_scales_init(num_inducing: int, input_dim: int,
                           init_scale: float = 0.1,
                           dtype=jnp.float32) -> jax.Array:
    """Unconstrained raw scales [M, D] (softplus-positive, like every other
    positive parameter). init_scale=0.1 starts the windows narrow — close
    to plain inducing points but with a live gradient."""
    return positive_inverse(
        jnp.full((num_inducing, input_dim), init_scale, dtype))


def _combined_lengthscales(kernel_params, raw_scales):
    """a = l + s: [M, D] (l broadcasts from [D] or [1])."""
    ls = kernels.kernel_lengthscales(kernel_params)
    return ls, ls + positive(raw_scales)


def multiscale_Kuu(kernel_params, Z: jax.Array,
                   raw_scales: jax.Array) -> jax.Array:
    """[M, M] covariance of the window integrals (gpflow Multiscale Kuu).

    c_ij^2 = a_i^2 + a_j^2 - l^2 > 0 (a >= l strictly: softplus scales are
    positive), so the sqrt and the division are always well-posed.
    """
    ls, a = _combined_lengthscales(kernel_params, raw_scales)
    var = kernels.kernel_variance(kernel_params)
    a2 = jnp.square(a)                                      # [M, D]
    c2 = a2[:, None, :] + a2[None, :, :] - jnp.square(ls)   # [M, M, D]
    diff2 = jnp.square(Z[:, None, :] - Z[None, :, :])       # [M, M, D]
    d = jnp.sum(diff2 / c2, axis=-1)                        # [M, M]
    prefac = jnp.prod(ls / jnp.sqrt(c2), axis=-1)           # [M, M]
    return var * prefac * jnp.exp(-0.5 * d)


def multiscale_Kuf(kernel_params, Z: jax.Array, raw_scales: jax.Array,
                   X: jax.Array) -> jax.Array:
    """[..., M, N] cross-covariance window-vs-point (gpflow Multiscale Kuf).

    The exponent sum_d (x_nd - z_md)^2 / a_md^2 factorizes into two MXU
    matmuls because a depends only on m: x^2 @ (1/a^2)^T - 2 x @ (z/a^2)^T
    + const_m. Runs at the gram forward-precision policy (same
    cancellation class as the RBF gram expansion); clipped at 0.
    """
    from . import conditionals as _cond  # deferred: import cycle

    ls, a = _combined_lengthscales(kernel_params, raw_scales)
    var = kernels.kernel_variance(kernel_params)
    inv_a2 = 1.0 / jnp.square(a)                            # [M, D]
    hp = {"highest": jax.lax.Precision.HIGHEST,
          "high": jax.lax.Precision.HIGH}[kernels.GRAM_FWD_PRECISION]
    bwd = (jax.lax.Precision.DEFAULT if kernels.GRAM_BWD_RELAX else hp)
    xx = _cond.matmul_split_precision(
        jnp.square(X), inv_a2.T, hp, bwd)                   # [..., N, M]
    xz = _cond.matmul_split_precision(
        X, (Z * inv_a2).T, hp, bwd)                         # [..., N, M]
    zz = jnp.sum(jnp.square(Z) * inv_a2, axis=-1)           # [M]
    d2 = jnp.maximum(xx - 2.0 * xz + zz, 0.0)               # [..., N, M]
    prefac = jnp.prod(ls / a, axis=-1)                      # [M]
    Kfu = var * prefac * jnp.exp(-0.5 * d2)
    return jnp.swapaxes(Kfu, -1, -2)                        # [..., M, N]
