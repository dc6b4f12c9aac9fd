"""Jitter-stabilized dense linear algebra for the GP math core.

TPU-native replacement for the reference stack's float64 LAPACK path
(tf.cholesky / tf.matrix_triangular_solve inside gpflow conditionals,
gpflow:gpflow/conditionals.py). On TPU, float64 is emulated and slow, so the
default policy is float32 compute with a *jitter escalation* scheme: try the
Cholesky at the base jitter (reference default 1e-6), and if any diagonal
element of the factor is non-finite or non-positive, retry at 10x, up to
``max_tries`` levels — implemented branchlessly with lax.cond-free selection
so the whole thing stays inside one jitted graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_JITTER = 1e-6


def add_jitter(K: jax.Array, jitter: float | jax.Array) -> jax.Array:
    """K + jitter * I on the trailing [..., M, M] axes."""
    m = K.shape[-1]
    return K + jitter * jnp.eye(m, dtype=K.dtype)


def _chol_ok(L: jax.Array) -> jax.Array:
    """True where a Cholesky factor is usable: finite with positive diagonal."""
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(diag) & (diag > 0), axis=(-1,))


@partial(jax.jit, static_argnames=("max_tries",))
def cholesky_with_jitter(
    K: jax.Array,
    jitter: float = DEFAULT_JITTER,
    max_tries: int = 4,
) -> jax.Array:
    """Cholesky of K + jitter*I with automatic 10x jitter escalation.

    Two passes, both XLA-static: (1) a gradient-free SELECTION pass
    factorizes at every escalation level and picks, per batch element, the
    first usable level; (2) ONE differentiable Cholesky at the selected
    jitter. Autodiff therefore never touches a failed factorization — a
    garbage branch inside a jnp.where select would otherwise poison
    gradients with 0 * Inf = NaN (observed on TPU with ill-conditioned
    1-D RBF grams).

    Semantics mirror the reference's Kuu construction
    (gpflow:gpflow/features.py Kuu = K(Z,Z) + jitter*I at jitter 1e-6), with
    escalation added because we run float32 on the MXU instead of float64 on
    LAPACK.
    """
    batch_shape = K.shape[:-2]
    K_sel = jax.lax.stop_gradient(K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)

    if max_tries == 1:
        # fast path: fixed jitter, no selection factorizations (the TPU
        # Cholesky custom-call serializes batch elements, so the selection
        # pass costs ~max_tries extra factorizations per call). Profile-
        # guided knob: set DGPConfig.jitter_tries=1 when inputs are known
        # well-conditioned; a failed factorization then surfaces as NaNs
        # instead of being rescued.
        return jnp.linalg.cholesky(add_jitter(K, jnp.asarray(jitter, K.dtype)))

    # selection pass (no AD): factorize ALL escalation levels as ONE batched
    # Cholesky — batch elements run in parallel on TPU, so selection costs
    # about one factorization instead of max_tries sequential ones — and
    # pick the smallest usable level per batch element.
    jitters = jnp.asarray(
        [jitter * (10.0 ** i) for i in range(max_tries)], K.dtype)
    K_all = K_sel[None] + jitters.reshape(
        (max_tries,) + (1,) * len(batch_shape) + (1, 1)) * eye
    ok_all = _chol_ok(jnp.linalg.cholesky(K_all))  # [T, *batch]
    # first ok level (argmax of bool picks the first True); if none ok,
    # fall through to the largest jitter
    any_ok = jnp.any(ok_all, axis=0)
    level = jnp.where(any_ok, jnp.argmax(ok_all, axis=0), max_tries - 1)
    jit_sel = jitter * (10.0 ** level.astype(K.dtype))   # [*batch]

    # single differentiable factorization at the selected jitter
    return jnp.linalg.cholesky(K + jit_sel[..., None, None] * eye)


def solve_triangular(L: jax.Array, B: jax.Array, *, lower: bool = True,
                     trans: bool = False) -> jax.Array:
    """Batched triangular solve, op(L) X = B, broadcasting over batch dims.

    Same (left, lower) convention as the reference conditional
    (tf.matrix_triangular_solve). TPU-first fast path: when L is a single
    [M, M] factor and B carries leading sample/batch axes [..., M, N] (the
    K x S x batch axes of the IWVI objective), the batch axes are folded
    into the column dimension so XLA sees ONE wide solve [M, M] x [M, K*S*N]
    instead of a loop of skinny ones — this is what keeps the MXU busy.
    """
    if L.ndim == 2 and B.ndim > 2:
        batch = B.shape[:-2]
        m, n = B.shape[-2:]
        # [..., M, N] -> [M, ...*N]
        Bw = jnp.moveaxis(B, -2, 0).reshape(m, -1)
        Xw = lax.linalg.triangular_solve(
            L, Bw, left_side=True, lower=lower, transpose_a=trans,
        )
        return jnp.moveaxis(Xw.reshape((m,) + batch + (n,)), 0, -2)
    if L.ndim > 2 or B.ndim > 2:
        bshape = jnp.broadcast_shapes(L.shape[:-2], B.shape[:-2])
        L = jnp.broadcast_to(L, bshape + L.shape[-2:])
        B = jnp.broadcast_to(B, bshape + B.shape[-2:])
    return lax.linalg.triangular_solve(
        L, B, left_side=True, lower=lower, transpose_a=trans,
    )


def cho_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve (L L^T) X = B given the lower Cholesky factor L."""
    y = solve_triangular(L, B, lower=True, trans=False)
    return solve_triangular(L, y, lower=True, trans=True)


def log_det_from_chol(L: jax.Array) -> jax.Array:
    """log det(L L^T) = 2 sum(log diag L), batched."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
