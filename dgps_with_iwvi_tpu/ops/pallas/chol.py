"""Fused Pallas TPU kernel: batched Cholesky + triangular inverse.

Why this exists: the two XLA linalg custom calls on the train step's
critical path — `cholesky` and `triangular_solve` — are latency-bound and
batch-serialized at the M<=128 sizes this model family uses (reference
analog: tf.cholesky / tf.matrix_triangular_solve inside
gpflow:gpflow/conditionals.py, which run on LAPACK/cuSOLVER). The xprof
step anatomy (docs/PERF.md) shows ~76 us/step spent in these calls for a
~326 us step. This kernel computes BOTH the factor L and its inverse
L^-1 for a whole batch of [G, M, M] matrices in ONE kernel launch, so the
prefactorization (models/dgp.py prefactor_gp_layers) and the natural-
gradient precision update (training/natgrad.py) each pay one launch
instead of two serialized custom calls.

Algorithm (per batch element, entirely in VMEM):

  Phase 1 — blocked right-looking Cholesky in U = L^T form with NB=8
  (the f32 sublane granularity), so every extract/store is a ROW block
  [8, Mp] on the sublane dim; Mosaic never sees a lane-offset slice:

      for b in 0..nb-1:
          R    = A[b*8:(b+1)*8, :]            # row panel of symmetric A
          D    = R @ E_b^T                    # 8x8 diag block (selector dot)
          Lb, V = chol8 / inv8 (D)            # 8 unrolled VPU steps each
          Urow = mask_{cols>=b*8}(V @ R)      # row block of U = L^T
          A   -= Urow^T @ Urow                # full-matrix Schur update
          U[b*8:(b+1)*8, :] = Urow

  Phase 2 — backward block substitution for W = U^-1 (row blocks again):

      for i in nb-1..0:
          W[i*8:(i+1)*8, :] = V_i^T @ (E_i - U[i*8:(i+1)*8, :] @ W)

  then L = U^T and L^-1 = W^T (two in-VMEM transposes).

Matrices whose M is not a lane multiple are padded to Mp = ceil(M/128)*128
with an IDENTITY block: chol(blockdiag(K, I)) = blockdiag(L, I) and its
inverse is blockdiag(L^-1, I), so the padding is exact, not approximate.

Failure semantics match jnp.linalg.cholesky closely enough for the jitter
rescue in ops/linalg.py: a non-positive pivot produces NaN via 1/sqrt,
which propagates through that element's factor so `_chol_ok` (finite,
positive diagonal) rejects it.

All dots run at Precision.HIGHEST with f32 accumulation — this path feeds
the quality-gated natgrad update, where bf16 shortcuts are known to be
catastrophic (docs/PERF.md precision policy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NB = 8  # block size = f32 sublane granularity

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _chol8_inv8(D):
    """Unblocked Cholesky + inverse of an 8x8 block, fully unrolled.

    Returns (Lb, V) with D = Lb Lb^T (lower) and V = Lb^-1. Pure VPU
    elementwise work on an 8x8 value; a non-positive pivot yields NaN that
    propagates (the rescue-ladder failure signal).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 1)
    Lb = jnp.zeros((NB, NB), jnp.float32)
    A = D
    for j in range(NB):
        r = 1.0 / jnp.sqrt(A[j, j])
        colj = A[:, j:j + 1] * r                       # [8, 1]
        colj = jnp.where(rows[:, j:j + 1] >= j, colj, 0.0)
        Lb = jnp.where(cols == j, colj, Lb)
        A = A - colj * jnp.swapaxes(colj, 0, 1)        # rank-1 update
    V = jnp.zeros((NB, NB), jnp.float32)
    for j in range(NB):
        # row j of V: (e_j - Lb[j, :] @ V) / Lb[j, j]
        s = jnp.sum(jnp.swapaxes(Lb[j:j + 1, :], 0, 1) * V,
                    axis=0, keepdims=True)             # [1, 8]
        ej = jnp.where(cols[j:j + 1, :] == j, 1.0, 0.0)
        vj = (ej - s) / Lb[j, j]
        V = jnp.where(rows == j, vj, V)
    return Lb, V


def _chol_inv_kernel(k_ref, l_ref, linv_ref, a_ref, u_ref, w_ref, *,
                     mp: int):
    """One [Mp, Mp] matrix: L and L^-1 (see module docstring)."""
    nb = mp // NB
    a_ref[...] = k_ref[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, mp), 1)
    row_in_blk = jax.lax.broadcasted_iota(jnp.int32, (NB, mp), 0)

    # ---- phase 1: U = L^T by row blocks --------------------------------
    vs = []
    for b in range(nb):
        bs = b * NB
        R = a_ref[bs:bs + NB, :]                       # [8, Mp]
        eb = jnp.where(col_iota == row_in_blk + bs, 1.0, 0.0)
        D = _dot(R, jnp.swapaxes(eb, 0, 1))            # [8, 8] diag block
        Lb, V = _chol8_inv8(D)
        vs.append(V)
        Urow = _dot(V, R)                              # [8, Mp]
        # hard-zero the already-eliminated columns AND the within-block
        # strict lower part (so L = U^T has exact zeros above the diagonal,
        # matching jnp.linalg.cholesky). jnp.where, NOT a multiply: NaN * 0
        # = NaN would leak a failed element's NaNs into the zero structure
        # the later blocks rely on.
        Urow = jnp.where(col_iota >= bs + row_in_blk, Urow, 0.0)
        u_ref[bs:bs + NB, :] = Urow
        if b < nb - 1:
            a_ref[...] = a_ref[...] - _dot(jnp.swapaxes(Urow, 0, 1), Urow)

    # ---- phase 2: W = U^-1 by backward row blocks ----------------------
    w_ref[...] = jnp.zeros((mp, mp), jnp.float32)
    for i in range(nb - 1, -1, -1):
        is_ = i * NB
        ei = jnp.where(col_iota == row_in_blk + is_, 1.0, 0.0)
        if i == nb - 1:
            S = jnp.zeros((NB, mp), jnp.float32)
        else:
            S = _dot(u_ref[is_:is_ + NB, :], w_ref[...])
        Wi = _dot(jnp.swapaxes(vs[i], 0, 1), ei - S)   # [8, Mp]
        # exact upper-triangular structure (see the phase-1 mask note)
        Wi = jnp.where(col_iota >= is_ + row_in_blk, Wi, 0.0)
        w_ref[is_:is_ + NB, :] = Wi

    l_ref[0] = jnp.swapaxes(u_ref[...], 0, 1)
    linv_ref[0] = jnp.swapaxes(w_ref[...], 0, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_inv_pallas(K: jax.Array, *, interpret: bool = False):
    """(L, L^-1) of a batch of symmetric PD matrices, one kernel launch.

    K: [..., M, M] float32. Returns (L, Linv), both [..., M, M] with exact
    zeros above the diagonal. Gradients: none — callers wrap this in a
    custom_vjp (ops/linalg.py chol_and_inverse) whose backward is pure
    matmuls on (L, Linv).
    """
    if K.dtype != jnp.float32:
        raise TypeError(f"chol_inv_pallas is float32-only, got {K.dtype}")
    batch = K.shape[:-2]
    m = K.shape[-1]
    mp = _round_up(m, LANE)
    g = 1
    for d in batch:
        g *= d
    Kb = K.reshape((g, m, m))
    if mp != m:
        # identity padding: chol/inverse of blockdiag(K, I) are exact
        pad = jnp.zeros((g, mp, mp), K.dtype)
        pad = pad.at[:, :m, :m].set(Kb)
        idx = jnp.arange(m, mp)
        Kb = pad.at[:, idx, idx].set(1.0)

    kernel = functools.partial(_chol_inv_kernel, mp=mp)
    L, Linv = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((1, mp, mp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, mp, mp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, mp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, mp, mp), jnp.float32),
            jax.ShapeDtypeStruct((g, mp, mp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((mp, mp), jnp.float32),   # A (Schur complement)
            pltpu.VMEM((mp, mp), jnp.float32),   # U = L^T
            pltpu.VMEM((mp, mp), jnp.float32),   # W = U^-1
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(g * (2 * mp ** 3)),  # ~2 passes of M^3-ish dot work
            bytes_accessed=int(g * 3 * mp * mp * 4),
            transcendentals=int(g * mp),
        ),
        interpret=interpret,
    )(Kb)
    if mp != m:
        L, Linv = L[:, :m, :m], Linv[:, :m, :m]
    return L.reshape(K.shape), Linv.reshape(K.shape)
