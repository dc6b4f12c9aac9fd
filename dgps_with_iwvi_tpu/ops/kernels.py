"""Stationary GP kernels (RBF / Matern family) with ARD lengthscales.

TPU-native equivalent of gpflow:gpflow/kernels.py (RBF, Matern12/32/52 with
ARD) as referenced by ref:dgps_with_iwvi/layers.py. Pure functions over a
small params pytree; positive parameters are stored unconstrained (see
ops/transforms.py).

Design notes (TPU-first):
- The squared distance uses the ||x||^2 - 2 x.y + ||y||^2 expansion so the
  cross term is ONE [N, D] x [D, M] matmul that lands on the MXU; distances
  are clipped at 0 to absorb cancellation error (same guard as the
  reference's square_dist).
- Everything broadcasts over arbitrary leading batch axes, so the K x S
  sample axes of the IWVI objective flow through as plain batched matmuls —
  no per-sample Python loops.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .transforms import positive, positive_inverse

KernelParams = Dict[str, Any]


def rbf_params(input_dim: int, variance: float = 1.0, lengthscales=1.0,
               ard: bool = True, dtype=jnp.float32) -> KernelParams:
    """Unconstrained parameter pytree for an RBF/Matern kernel.

    Mirrors gpflow RBF(input_dim, ARD=True) defaults: unit variance, unit
    lengthscales per input dim.
    """
    ls = jnp.broadcast_to(
        jnp.asarray(lengthscales, dtype), (input_dim,) if ard else (1,)
    )
    return {
        "raw_variance": positive_inverse(jnp.asarray(variance, dtype)),
        "raw_lengthscales": positive_inverse(ls),
    }


def kernel_variance(params: KernelParams) -> jax.Array:
    return positive(params["raw_variance"])


def kernel_lengthscales(params: KernelParams) -> jax.Array:
    return positive(params["raw_lengthscales"])


# Opt-in: run the gram dot's TRANSPOSED (gradient) dots single-pass bf16.
# Worth ~+5% at D~90 (year config), quality-gate-MARGINAL (failed LGG by
# 0.001 nats), so off by default — see scaled_squared_distance.
GRAM_BWD_RELAX: bool = False

# Forward precision of the gram cross-term dot (trace-time module switch).
# 'highest' (bf16x6) is the production default. 'high' (bf16x3) measures
# ~1.5e-5 max relative gram error (vs 4.8e-7 at highest, 2.6e-3 at the
# catastrophic single-pass default) — A/B with benchmarks/gram_fwd_ab.py
# and gate with benchmarks/quality_gate.py before changing the default.
GRAM_FWD_PRECISION: str = "highest"


def scaled_squared_distance(X: jax.Array, X2: jax.Array,
                            lengthscales: jax.Array) -> jax.Array:
    """||(x - x')/l||^2 for X:[..., N, D], X2:[..., M, D] -> [..., N, M].

    MXU-friendly: one batched matmul for the cross term; clipped at zero.
    """
    # deferred import: conditionals imports this module at load time, but
    # the split-precision matmul lives there; resolved at trace time,
    # after both modules exist
    from . import conditionals as _cond

    Xs = X / lengthscales
    X2s = X2 / lengthscales
    xx = jnp.sum(jnp.square(Xs), axis=-1)  # [..., N]
    yy = jnp.sum(jnp.square(X2s), axis=-1)  # [..., M]
    # Forward HIGHEST: the expansion cancels catastrophically in bf16 MXU
    # passes. The TRANSPOSED dots (dXs = g X2s, dX2s = g^T Xs) have no
    # cancellation, and relaxing them measures ~+5% on the year config
    # (D=90 makes the gram dots real work; noise-level at D=8) — but the
    # 15k-step quality gate FAILED it by a hair on LGG-kin8nm (dNLL 0.0066
    # vs tol 0.0056 nats; benchmarks/QUALITY_GATE_grambwd.md), so unlike
    # the solve path's backward it stays EXACT by default. GRAM_BWD_RELAX
    # (module switch, read at trace time) opts year-scale runs in.
    try:
        hp = {"highest": jax.lax.Precision.HIGHEST,
              "high": jax.lax.Precision.HIGH}[GRAM_FWD_PRECISION]
    except KeyError:
        raise ValueError(
            f"GRAM_FWD_PRECISION={GRAM_FWD_PRECISION!r}: only 'highest' and "
            "'high' are allowed — 'default' (single-pass bf16) corrupts the "
            "sq-dist cancellation (~6% gram error, docs/PERF.md)") from None
    bwd = (jax.lax.Precision.DEFAULT if GRAM_BWD_RELAX else hp)
    cross = _cond.matmul_split_precision(
        Xs, jnp.swapaxes(X2s, -1, -2), hp, bwd)  # [..., N, M]
    d2 = xx[..., :, None] - 2.0 * cross + yy[..., None, :]
    return jnp.maximum(d2, 0.0)


def _matern_from_r(r: jax.Array, order: int) -> jax.Array:
    if order == 1:  # Matern 1/2 (exponential)
        return jnp.exp(-r)
    if order == 3:  # Matern 3/2
        s = jnp.sqrt(3.0) * r
        return (1.0 + s) * jnp.exp(-s)
    if order == 5:  # Matern 5/2
        s = jnp.sqrt(5.0) * r
        return (1.0 + s + (5.0 / 3.0) * jnp.square(r)) * jnp.exp(-s)
    raise ValueError(f"unsupported Matern order {order}")


def K(params: KernelParams, X: jax.Array, X2: jax.Array | None = None,
      *, kind: str = "rbf") -> jax.Array:
    """Gram matrix k(X, X2): [..., N, D] x [..., M, D] -> [..., N, M]."""
    if X2 is None:
        X2 = X
    ls = kernel_lengthscales(params)
    var = kernel_variance(params)
    d2 = scaled_squared_distance(X, X2, ls)
    if kind == "rbf":
        return var * jnp.exp(-0.5 * d2)
    if kind in ("matern12", "matern32", "matern52"):
        order = {"matern12": 1, "matern32": 3, "matern52": 5}[kind]
        r = jnp.sqrt(jnp.maximum(d2, 1e-36))
        return var * _matern_from_r(r, order)
    raise ValueError(f"unknown kernel kind {kind!r}")


def Kdiag(params: KernelParams, X: jax.Array, *, kind: str = "rbf") -> jax.Array:
    """diag k(X, X): [..., N, D] -> [..., N]. Stationary => variance * 1."""
    del kind  # all supported kernels are stationary
    return jnp.broadcast_to(kernel_variance(params), X.shape[:-1])
