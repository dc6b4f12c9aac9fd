"""Fused Pallas kernel for the q-variance quadratic form.

The marginal variance contribution of q(u) in the whitened conditional is

    fvar_q[d, n] = sum_m (W_d^T A)[m, n]^2          (root form, W = q_sqrt)
    fvar_q[d, n] = sum_m A[m, n] * (S_d A)[m, n]    (covariance form)

(reference analog: the q_sqrt^T A term of gpflow:gpflow/conditionals.py
base_conditional). The XLA path (ops/conditionals.py _q_variance)
materializes the [D, M, cols] inner product to HBM — in TRAINING that
tensor doubles as the AD residual (stored bf16, quality-gated), but on
the INFERENCE path it is pure traffic: at the serving shape
(S=100, B=8192, M=128, D=8) the dot writes 1.7 GB and the reduce reads it
straight back, 5.3 ms of a 12.3 ms device call (43%) — measured via
hlo_stats, 2026-08-18.

This kernel tiles the sample axis and keeps each [D, M, TN] inner-product
tile in VMEM: traffic drops from 2x D*M*cols to just A + the [D, N]
output. Precision matches var_precision='default' exactly-or-better:
bf16 operand rounding with f32 MXU accumulation (preferred_element_type),
and the square-sum runs on the f32 accumulator (the XLA path squares a
bf16-rounded copy).

Differentiable via a recompute custom-vjp (no residual is stored —
that is the point), so prediction paths can be grad'ed through; the
TRAINING objective keeps the XLA residual path, whose bf16-store backward
measured faster than recompute at M <= 256 (docs/PERF.md ledger).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# VMEM budget for the resident W stack + one inner-product tile
_MAX_W_BYTES = 8 * 1024 * 1024


def applicable(A_shape, W: jax.Array, dtype) -> bool:
    """Kernel preconditions; callers fall back to the XLA path otherwise.

    The n >= 1024 floor is measured: per-grid-step overhead makes the
    kernel lose below it (serving A/B, benchmarks/qvar_pallas_ab.py:
    B=128 0.82x, B=512 0.98x, B=1024 1.07x, B=2048 1.17x, B=8192 1.46x).
    """
    m, n = A_shape[-2], A_shape[-1]
    d = W.shape[0]
    return (dtype == jnp.float32 and W.dtype == jnp.float32
            and W.ndim == 3 and m == W.shape[-1]
            and m % 8 == 0 and n % LANE == 0 and n >= 1024
            and d * m * m * 4 <= _MAX_W_BYTES
            and jax.default_backend() not in ("cpu",))


def applicable_train(A_shape, W: jax.Array, dtype) -> bool:
    """Preconditions for the fused-backward TRAINING kernel.

    Same alignment/dtype/VMEM rules as `applicable`, but the profitability
    floor is d*n (work per grid step amortizing the per-step overhead),
    not n alone: measured v5e step times (qvar_pallas_train_ab.py, LGG
    IW natgrad train step, per-layer kernels forced on) —
        B=512  d=8  (d*n=4096):   0.89x  LOSES
        B=1024 d=8  (d*n=8192):   0.91x  LOSES
        year   d=30 (d*n=15360):  1.09x  (B=512, D_in=90 inner width 30)
        B=2048 d=8  (d*n=16384):  1.16x
        B=8192 d=8  (d*n=65536):  1.07x
    Floor d*n >= 12288 splits the measured loss at 8192 from the win at
    15360. (The d=1 final layer is always excluded: measured neutral at
    B=8192 — auto 5.025 vs all-on 5.034 ms.)
    """
    m, n = A_shape[-2], A_shape[-1]
    d = W.shape[0]
    return (dtype == jnp.float32 and W.dtype == jnp.float32
            and W.ndim == 3 and m == W.shape[-1]
            and m % 8 == 0 and n % LANE == 0 and d * n >= 12288
            and d * m * m * 4 <= _MAX_W_BYTES
            and jax.default_backend() not in ("cpu",))


def _qvar_kernel(a_ref, w_ref, out_ref, *, d_out: int, cov: bool):
    a32 = a_ref[0]                                  # [M, TN] f32
    a = a32.astype(jnp.bfloat16)
    for d in range(d_out):
        w = w_ref[d].astype(jnp.bfloat16)           # [M, M]
        if cov:
            # T = S_d a ; out_d = sum_m a * T   (f32 accumulation)
            t = jnp.dot(w, a, preferred_element_type=jnp.float32)
            out_ref[0, d, :] = jnp.sum(a32 * t, axis=0)
        else:
            # T = W_d^T a ; out_d = sum_m T^2
            t = jnp.dot(w.T, a, preferred_element_type=jnp.float32)
            out_ref[0, d, :] = jnp.sum(t * t, axis=0)


def _pick_tile(n: int) -> int:
    # prefer big tiles: per-grid-step overhead dominates at small tiles
    # (measured 0.74x vs XLA at 100 programs x [128, 128] tiles); A-tile +
    # inner-product tile stay comfortably in VMEM up to tn=2048 at M=128
    for tn in (2048, 1024, 512, 256, 128):
        if n % tn == 0:
            return tn
    raise ValueError(f"n={n} not a lane multiple")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def qvar_fused(A: jax.Array, W: jax.Array, cov: bool = False,
               interpret: bool = False) -> jax.Array:
    """fvar_q [..., D, N] from A [..., M, N] and W [D, M, M].

    cov=False: W is the root (q_sqrt), out = sum_m (W_d^T A)^2.
    cov=True:  W is the covariance (q_S), out = sum_m A * (W_d A).
    """
    lead = A.shape[:-2]
    m, n = A.shape[-2:]
    d = W.shape[0]
    L = 1
    for s in lead:
        L *= s
    Ab = A.reshape((L, m, n))
    tn = _pick_tile(n)
    kernel = functools.partial(_qvar_kernel, d_out=d, cov=cov)
    out = pl.pallas_call(
        kernel,
        grid=(L, n // tn),
        in_specs=[
            pl.BlockSpec((1, m, tn), lambda l, t: (l, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m, m), lambda l, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, tn), lambda l, t: (l, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, d, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * L * d * m * m * n),
            bytes_accessed=int(L * m * n * 4 + d * m * m * 4
                               + L * d * n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(Ab, W)
    return out.reshape(lead + (d, n))


def _qvar_fwd(A, W, cov, interpret):
    return qvar_fused(A, W, cov, interpret), (A, W)


def _qvar_bwd(cov, interpret, res, g):
    """Recompute backward (no residual is stored — that is the point).

    Gradients of the MATHEMATICAL quadratic form at f32; the forward's
    bf16 operand rounding is treated as identity, exactly like AD through
    the var_precision='default' XLA path.
    """
    A, W = res
    hp = jax.lax.Precision.DEFAULT
    WT = jnp.swapaxes(W, -1, -2)
    Ax = A[..., None, :, :]                       # [..., 1, M, N]
    g = g[..., :, None, :]                        # [..., D, 1, N]
    if cov:
        # out_d = A^T S_d A  (S symmetric in use): dA = 2 S_d A g,
        # dS_d = (A g) A^T
        SA = jnp.matmul(W, Ax, precision=hp)      # [..., D, M, N]
        dA = 2.0 * jnp.sum(SA * g, axis=-3)
        Ag = Ax * g                               # [..., D, M, N]
        dW = jnp.matmul(Ag, jnp.swapaxes(Ax, -1, -2), precision=hp)
        dW = dW.reshape((-1,) + dW.shape[-3:]).sum(0)
        return dA, dW
    LTA = jnp.matmul(WT, Ax, precision=hp)        # [..., D, M, N]
    dLTA = 2.0 * LTA * g
    dA = jnp.sum(jnp.matmul(W, dLTA, precision=hp), axis=-3)
    dW = jnp.matmul(Ax, jnp.swapaxes(dLTA, -1, -2), precision=hp)
    dW = dW.reshape((-1,) + dW.shape[-3:]).sum(0)
    return dA, dW


qvar_fused.defvjp(_qvar_fwd, _qvar_bwd)


# ---------------------------------------------------------------------------
# Fused TRAINING path: Pallas forward AND Pallas backward.
#
# qvar_fused's recompute vjp above re-materializes the [*, D, M, N] inner
# product through XLA — fine for the rare grad-through-prediction, but in
# the training objective that tensor (671 MB f32 at the B=8192 flagship
# shape) is exactly the traffic the roofline audit (docs/ROOFLINE_B8192.md)
# shows pinning the step to the HBM peak: the forward store plus the two
# parameter-gradient reads are the top 3 ops of the whole step (1.6 of
# 5.2 ms), each already at ~100% of attainable bandwidth. The only way
# past that roofline is to stop moving the tensor: the backward kernel
# below recomputes each [D, M, TN] inner-product tile in VMEM from A and
# W (one extra MXU dot per tile) and contracts it into dA and dW
# in-place, so neither LTA/SA nor its cotangent ever reaches HBM. HBM
# traffic for the whole fwd+bwd drops from ~5x to ~2x the size of A.
#
# Numerics: identical rounding class to the XLA bf16-residual path — bf16
# dot operands, f32 MXU accumulation (preferred_element_type), f32
# elementwise; dW additionally accumulates across grid steps in a
# f32 VMEM-resident block. Quality-gated like every precision knob
# (benchmarks/quality_gate.py --qvar_pallas_train).
# ---------------------------------------------------------------------------


def _qvar_bwd_kernel(a_ref, w_ref, g_ref, da_ref, dw_ref, *,
                     d_out: int, cov: bool):
    a32 = a_ref[0]                                   # [M, TN] f32
    a = a32.astype(jnp.bfloat16)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    da = jnp.zeros_like(a32)
    for d in range(d_out):
        w = w_ref[d].astype(jnp.bfloat16)            # [M, M]
        gd = g_ref[0, d, :][None, :]                 # [1, TN] f32
        if cov:
            # out_d = sum_m a (S_d a): dA = g*(S_d a) + S_d^T (g*a),
            # dS_d = (g*a) a^T — exact AD shape, no symmetry assumed
            sa = jnp.dot(w, a, preferred_element_type=jnp.float32)
            ga = (a32 * gd).astype(jnp.bfloat16)
            da = da + gd * sa
            da = da + jnp.dot(w.T, ga, preferred_element_type=jnp.float32)
            dw_ref[d] = dw_ref[d] + jnp.dot(
                ga, a.T, preferred_element_type=jnp.float32)
        else:
            # out_d = sum_m (W_d^T a)^2: recompute T = W_d^T a, then
            # dT = 2 g T, dA = W_d dT, dW_d = a dT^T
            t = jnp.dot(w.T, a, preferred_element_type=jnp.float32)
            dt = (2.0 * gd * t).astype(jnp.bfloat16)
            da = da + jnp.dot(w, dt, preferred_element_type=jnp.float32)
            dw_ref[d] = dw_ref[d] + jnp.dot(
                a, dt.T, preferred_element_type=jnp.float32)
    da_ref[0] = da


def qvar_bwd_fused(A: jax.Array, W: jax.Array, g: jax.Array,
                   cov: bool, interpret: bool = False):
    """Fused backward: (dA [..., M, N], dW [D, M, M]) from cotangent
    g [..., D, N]. dW accumulates across the whole grid in a VMEM-resident
    block (its index map is constant, so the TPU's sequential grid keeps
    it live between steps — the standard Pallas accumulator pattern)."""
    lead = A.shape[:-2]
    m, n = A.shape[-2:]
    d = W.shape[0]
    L = 1
    for s in lead:
        L *= s
    Ab = A.reshape((L, m, n))
    gb = g.reshape((L, d, n))
    tn = _pick_tile(n)
    kernel = functools.partial(_qvar_bwd_kernel, d_out=d, cov=cov)
    dA, dW = pl.pallas_call(
        kernel,
        grid=(L, n // tn),
        in_specs=[
            pl.BlockSpec((1, m, tn), lambda l, t: (l, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m, m), lambda l, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tn), lambda l, t: (l, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m, tn), lambda l, t: (l, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m, m), lambda l, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, m, n), jnp.float32),
            jax.ShapeDtypeStruct((d, m, m), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(6 * L * d * m * m * n),
            bytes_accessed=int(2 * L * m * n * 4 + L * d * n * 4
                               + 2 * d * m * m * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(Ab, W, gb)
    return dA.reshape(A.shape), dW


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def qvar_fused_train(A: jax.Array, W: jax.Array, cov: bool = False,
                     interpret: bool = False) -> jax.Array:
    """qvar_fused with the fused Pallas backward — the training-objective
    entry point (ops/conditionals.py QVAR_PALLAS_TRAIN)."""
    return qvar_fused(A, W, cov, interpret)


def _qvar_train_fwd(A, W, cov, interpret):
    return qvar_fused(A, W, cov, interpret), (A, W)


def _qvar_train_bwd(cov, interpret, res, g):
    A, W = res
    return qvar_bwd_fused(A, W, g, cov, interpret)


qvar_fused_train.defvjp(_qvar_train_fwd, _qvar_train_bwd)
