"""Parameter-constraint bijectors.

TPU-native equivalent of the reference's parameter transform layer
(gpflow:gpflow/transforms.py, used throughout ref:dgps_with_iwvi/layers.py).
The reference constrains positive parameters (kernel variance/lengthscales,
likelihood noise) with a shifted softplus ``Log1pe(lower=1e-6)``:

    constrained = lower + log(1 + exp(raw))

We reproduce those semantics exactly (forward/inverse pair below) so that
initial values and optimization trajectories are comparable, but as pure
functions over pytrees instead of a Parameterized object graph — parameters
are stored *unconstrained* and mapped at use sites inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference stack's default positive-transform shift
# (gpflow settings.numerics lower bound for Log1pe).
DEFAULT_POSITIVE_LOWER = 1e-6


def positive(raw: jax.Array, lower: float = DEFAULT_POSITIVE_LOWER) -> jax.Array:
    """Shifted softplus: raw (unconstrained) -> (lower, inf)."""
    return lower + jax.nn.softplus(raw)


def positive_inverse(value, lower: float = DEFAULT_POSITIVE_LOWER) -> jax.Array:
    """Inverse of :func:`positive`; use to initialize raw params from
    constrained values. softplus^-1(y) = y + log(1 - exp(-y)), stable form.

    Values in ``[0, lower]`` are unreachable through the shifted softplus;
    they clamp to a tiny positive excess (raw ~ -46) instead of producing
    NaN, so ``positive(positive_inverse(v)) == max(v, ~lower)`` — the
    round-trip recovers a requested value only to within the ``lower``
    floor. NEGATIVE inputs are invalid initializations (not merely
    unreachable) and map to NaN so caller bugs surface instead of being
    silently coerced to a near-zero parameter.
    """
    v = jnp.asarray(value)
    y = v - lower
    y = jnp.maximum(y, jnp.asarray(1e-20, jnp.result_type(y)))
    # softplus inverse, numerically stable for small and large y.
    raw = y + jnp.log(-jnp.expm1(-y))
    return jnp.where(v < 0, jnp.nan, raw)


def vec_to_tril(vec: jax.Array, n: int) -> jax.Array:
    """Unpack a packed lower-triangular vector [..., n(n+1)/2] -> [..., n, n].

    Row-major lower-triangular packing (matches ``tril_to_vec``).
    """
    rows, cols = jnp.tril_indices(n)
    out = jnp.zeros(vec.shape[:-1] + (n, n), vec.dtype)
    return out.at[..., rows, cols].set(vec)


def tril_to_vec(mat: jax.Array) -> jax.Array:
    """Pack the lower triangle of [..., n, n] into [..., n(n+1)/2]."""
    n = mat.shape[-1]
    rows, cols = jnp.tril_indices(n)
    return mat[..., rows, cols]
