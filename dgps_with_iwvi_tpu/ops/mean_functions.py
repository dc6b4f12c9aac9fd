"""Mean functions: Zero / Identity / (fixed) Linear skip connections.

TPU-native rebuild of gpflow:gpflow/mean_functions.py as used between DGP
layers (the Salimbeni-2017 doubly-stochastic skip connection,
ref:dgps_with_iwvi/layers.py): identity when layer widths match, otherwise a
fixed (non-trainable) linear projection. We follow the standard convention of
initializing the projection from (padded/truncated) identity — documented as
[MED]-confidence in SURVEY.md §2.3 and exposed via the builder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zero_mean(X: jax.Array, d_out: int) -> jax.Array:
    return jnp.zeros(X.shape[:-1] + (d_out,), X.dtype)


def identity_mean(X: jax.Array) -> jax.Array:
    return X


def linear_mean(X: jax.Array, W: jax.Array) -> jax.Array:
    """X:[..., N, D_in] @ W:[D_in, D_out]; bias-free fixed skip projection."""
    return jnp.matmul(X, W, preferred_element_type=X.dtype)


def skip_projection(d_in: int, d_out: int, dtype=jnp.float32) -> jax.Array | None:
    """Fixed inter-layer projection matrix.

    Returns None when d_in == d_out (identity skip, free). Otherwise a
    truncated/padded-identity [d_in, d_out] matrix, the dimension-bridging
    convention of the doubly-stochastic DGP reference stack.
    """
    if d_in == d_out:
        return None
    W = jnp.eye(d_in, d_out, dtype=dtype)
    return W


def apply_mean_function(X: jax.Array, W: jax.Array | None, *,
                        kind: str = "skip", d_out: int | None = None) -> jax.Array:
    """Dispatch: 'skip' (identity or fixed linear), 'zero', 'linear'."""
    if kind == "zero":
        assert d_out is not None
        return zero_mean(X, d_out)
    if W is None:
        return identity_mean(X)
    return linear_mean(X, W)
