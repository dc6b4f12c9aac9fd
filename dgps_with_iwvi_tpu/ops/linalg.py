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

# Backend for chol_and_inverse's forward factorization+inverse pair:
#   "auto"   — currently resolves to XLA at EVERY shape. The fused Pallas
#              kernel (ops/pallas/chol.py) was measured SLOWER than the
#              XLA cholesky + triangular_solve custom calls on the real
#              v5e (139 us vs ~26 us/step for the flagship [2,128,128]
#              prefactor): Cholesky's 128 sequential pivot steps hit
#              Mosaic's ~0.3-0.5 us/op small-op overhead, which no amount
#              of MXU blocking around them can hide. Measured negative
#              result, kept for the record — see docs/PALLAS_SWEEP.md.
#   "xla"    — always jnp.linalg.cholesky + triangular_solve.
#   "pallas" — force the Pallas kernel (parity tests / re-measurement;
#              CPU runs use the interpreter).
CHOL_INV_BACKEND = "auto"


def _pallas_chol_applicable(K: jax.Array) -> bool:
    if CHOL_INV_BACKEND != "pallas":
        return False  # auto == xla at every measured shape (see above)
    return K.dtype == jnp.float32


def add_jitter(K: jax.Array, jitter: float | jax.Array) -> jax.Array:
    """K + jitter * I on the trailing [..., M, M] axes."""
    m = K.shape[-1]
    return K + jitter * jnp.eye(m, dtype=K.dtype)


def _chol_ok(L: jax.Array) -> jax.Array:
    """True where a Cholesky factor is usable: finite with positive diagonal."""
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(diag) & (diag > 0), axis=(-1,))


@jax.custom_vjp
def _chol_reuse(A: jax.Array, L: jax.Array) -> jax.Array:
    """Cholesky of A whose factor L is ALREADY KNOWN (a probe factorization
    of the same values): forward returns L as-is; backward applies the
    standard Cholesky pullback at L. Lets the jitter-rescue fast path pay
    for exactly one factorization (the probe) while keeping gradients
    identical to jnp.linalg.cholesky(A)."""
    del A
    return L


def _chol_reuse_fwd(A, L):
    del A
    return L, L


def _chol_reuse_bwd(L, L_bar):
    # standard Cholesky reverse-mode (Murray 2016): with M = L^T L_bar,
    # Phi(M) = tril(M) - 1/2 diag(M),  A_bar = L^-T Phi(M) L^-1, then
    # symmetrized (A enters as a full unconstrained matrix here, matching
    # jnp.linalg.cholesky's convention) — verified against jax.vjp in tests.
    M = jnp.matmul(jnp.swapaxes(L, -1, -2), jnp.tril(L_bar),
                   precision=jax.lax.Precision.HIGHEST)
    # tril(M) - 0.5 diag(M) as pure elementwise masking (no gather/scatter)
    phi = jnp.tril(M) - 0.5 * M * jnp.eye(M.shape[-1], dtype=M.dtype)
    # A_bar = L^-T phi L^-1: two triangular solves
    tmp = lax.linalg.triangular_solve(L, phi, left_side=True, lower=True,
                                      transpose_a=True)
    A_bar = lax.linalg.triangular_solve(L, jnp.swapaxes(tmp, -1, -2),
                                        left_side=True, lower=True,
                                        transpose_a=True)
    A_bar = jnp.swapaxes(A_bar, -1, -2)
    A_bar = 0.5 * (A_bar + jnp.swapaxes(A_bar, -1, -2))
    return A_bar, jnp.zeros_like(L)


_chol_reuse.defvjp(_chol_reuse_fwd, _chol_reuse_bwd)


@partial(jax.jit, static_argnames=("max_tries",))
def cholesky_with_jitter(
    K: jax.Array,
    jitter: float = DEFAULT_JITTER,
    max_tries: int = 4,
) -> jax.Array:
    """Cholesky of K + jitter*I with automatic 10x jitter escalation.

    Rescue-on-failure design: the COMMON path is exactly ONE differentiable
    Cholesky at the base jitter; only if any batch element's factor comes
    back unusable does a lax.cond branch run the full escalation ladder —
    a gradient-free SELECTION pass that factorizes every level as one
    batched Cholesky and picks, per batch element, the first usable level,
    followed by ONE differentiable Cholesky at the selected jitter. (The
    TPU Cholesky custom-call serializes batch elements, so the ladder costs
    ~max_tries factorizations — paying it every step taxed ~19% of the
    flagship train step before this redesign; now it costs nothing unless a
    factorization actually fails.)

    Autodiff never touches a failed factorization: the rescue branch is
    taken exactly when the fast factor is unusable, and inside it the
    selection pass is stop-gradient'd — a garbage branch inside a jnp.where
    select would otherwise poison gradients with 0 * Inf = NaN (observed on
    TPU with ill-conditioned 1-D RBF grams).

    Semantics mirror the reference's Kuu construction
    (gpflow:gpflow/features.py Kuu = K(Z,Z) + jitter*I at jitter 1e-6), with
    escalation added because we run float32 on the MXU instead of float64 on
    LAPACK. The per-element selected jitter is identical to the previous
    always-on selection pass (level 0 included in the ladder).
    """
    batch_shape = K.shape[:-2]
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)

    if max_tries == 1:
        # fixed jitter, no rescue: a failed factorization surfaces as NaNs.
        return jnp.linalg.cholesky(add_jitter(K, jnp.asarray(jitter, K.dtype)))

    # fast path: ONE probe factorization at the base jitter (no AD); its
    # values are reused as the differentiable result via _chol_reuse, whose
    # backward is the standard Cholesky pullback — so the common path costs
    # exactly one factorization and its grads equal jnp.linalg.cholesky's.
    # (The probe must be on stop_gradient(K): a failed factor that
    # participated in AD would poison the backward pass with 0 * NaN even
    # under a zero cotangent.)
    Kj = add_jitter(K, jnp.asarray(jitter, K.dtype))
    L_probe = jnp.linalg.cholesky(jax.lax.stop_gradient(Kj))
    probe_ok = _chol_ok(L_probe)
    all_ok = jnp.all(probe_ok)

    def _fast(_):
        # Sanitize failed probe factors with I before the reuse pullback.
        # When the cond is actually TAKEN on this branch every element is
        # ok and this is the identity; but under vmap a batched-predicate
        # cond lowers to a select that EXECUTES both branches, and a NaN
        # L_probe here would poison the backward pass (NaN * 0 = NaN
        # through _chol_reuse_bwd's matmuls) even though the select masks
        # this branch's value out for that element.
        L_safe = jnp.where(probe_ok[..., None, None], L_probe, eye)
        return _chol_reuse(Kj, L_safe)

    def _rescue(_):
        # single differentiable factorization at the selected jitter
        jit_sel = _select_jitter(K, jitter, max_tries)
        return jnp.linalg.cholesky(K + jit_sel[..., None, None] * eye)

    return jax.lax.cond(all_ok, _fast, _rescue, None)


def _select_jitter(K: jax.Array, jitter: float, max_tries: int) -> jax.Array:
    """Rescue-ladder selection pass (no AD): factorize ALL escalation
    levels as ONE batched Cholesky and pick, per batch element, the
    smallest usable jitter level (falling through to the largest when none
    works). Returns the selected jitter, shape = K's batch shape."""
    batch_shape = K.shape[:-2]
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    K_sel = jax.lax.stop_gradient(K)
    jitters = jnp.asarray(
        [jitter * (10.0 ** i) for i in range(max_tries)], K.dtype)
    K_all = K_sel[None] + jitters.reshape(
        (max_tries,) + (1,) * len(batch_shape) + (1, 1)) * eye
    ok_all = _chol_ok(jnp.linalg.cholesky(K_all))  # [T, *batch]
    # first ok level (argmax of bool picks the first True)
    any_ok = jnp.any(ok_all, axis=0)
    level = jnp.where(any_ok, jnp.argmax(ok_all, axis=0), max_tries - 1)
    return jitter * (10.0 ** level.astype(K.dtype))   # [*batch]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def chol_and_inverse(K: jax.Array, jitter: float = DEFAULT_JITTER,
                     max_tries: int = 4) -> tuple[jax.Array, jax.Array]:
    """(L, L^-1) of K + jitter*I with rescue escalation, backward in matmuls.

    The hot-path pairing: every GP layer needs BOTH the Cholesky factor of
    Kuu and its triangular inverse (the wide-solve trick turns conditionals
    into Linv matmuls). Differentiating the pair naively costs three extra
    TPU triangular-solve custom calls in the backward pass (the solve's
    transpose rule + the two solves inside the Cholesky pullback), each
    latency-bound and batch-serialized (~10-20 us). Since the forward
    already produced Linv, the ENTIRE backward collapses to batched MXU
    matmuls:

        L_bar += -Linv^T @ Linv_bar @ Linv^T        (inverse pullback)
        phi    = tril(L^T L_bar) - 1/2 diag(...)    (Cholesky pullback)
        K_bar  = sym(Linv^T @ phi @ Linv)

    Values and gradients match cholesky_with_jitter + solve_triangular
    exactly (tested); only the backward op schedule differs.

    Forward backend: on TPU at f32 / M <= 256 the (L, L^-1) pair comes
    from ONE fused Pallas kernel (ops/pallas/chol.py) instead of two
    latency-bound XLA linalg custom calls; CHOL_INV_BACKEND selects.
    The jitter-rescue semantics are preserved: probe at the base jitter,
    and only on failure run the escalation ladder + one refactorization.
    """
    if _pallas_chol_applicable(K):
        from .pallas.chol import chol_inv_pallas
        interp = jax.default_backend() == "cpu"  # forced-pallas CPU parity
        Ksg = jax.lax.stop_gradient(K)  # custom_vjp supplies the gradients
        L, Linv = chol_inv_pallas(
            add_jitter(Ksg, jnp.asarray(jitter, K.dtype)), interpret=interp)
        if max_tries == 1:
            return L, Linv
        ok = jnp.all(_chol_ok(L))

        def _rescue(_):
            jit_sel = _select_jitter(Ksg, jitter, max_tries)
            eye = jnp.eye(K.shape[-1], dtype=K.dtype)
            return chol_inv_pallas(Ksg + jit_sel[..., None, None] * eye,
                                   interpret=interp)

        return jax.lax.cond(ok, lambda _: (L, Linv), _rescue, None)
    L = cholesky_with_jitter(K, jitter, max_tries=max_tries)
    Linv = solve_triangular(
        L, jnp.broadcast_to(jnp.eye(K.shape[-1], dtype=K.dtype), K.shape),
        lower=True)
    return L, Linv


def _chol_inv_fwd(K, jitter, max_tries):
    L, Linv = chol_and_inverse(K, jitter, max_tries)
    return (L, Linv), (L, Linv)


def _chol_inv_bwd(jitter, max_tries, res, bars):
    L, Linv = res
    L_bar, Linv_bar = bars
    hp = jax.lax.Precision.HIGHEST
    LinvT = jnp.swapaxes(Linv, -1, -2)
    # pullback of Linv = L^-1: <Linv_bar, -Linv dL Linv>
    L_bar = jnp.tril(L_bar) - jnp.tril(
        jnp.matmul(LinvT, jnp.matmul(Linv_bar, LinvT, precision=hp),
                   precision=hp))
    # standard Cholesky pullback at L, with the solves replaced by Linv
    M = jnp.matmul(jnp.swapaxes(L, -1, -2), L_bar, precision=hp)
    phi = jnp.tril(M) - 0.5 * M * jnp.eye(M.shape[-1], dtype=M.dtype)
    K_bar = jnp.matmul(LinvT, jnp.matmul(phi, Linv, precision=hp),
                       precision=hp)
    K_bar = 0.5 * (K_bar + jnp.swapaxes(K_bar, -1, -2))
    return (K_bar,)


chol_and_inverse.defvjp(_chol_inv_fwd, _chol_inv_bwd)


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
