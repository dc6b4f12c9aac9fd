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

import contextlib
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import kernels
from .linalg import cholesky_with_jitter, solve_triangular, DEFAULT_JITTER


# Wide-solve strategy switch (see base_conditional_whitened): True turns the
# wide triangular solve into Linv matmuls. Module-level so benchmarks can
# A/B it; read at trace time.
INVERSE_SOLVE = True

# Precision of the TRANSPOSED (backward) dots of the solve-path matmuls
# (dKuf = Linv^T dA, dLinv = dA Kuf^T, and the mean matmul's cotangents).
# The PRIMAL solve must run at >= 'high': a 1-pass-bf16 A corrupts the
# Kff - sum(A^2) cancellation and was rejected decisively by the quality
# gate (docs/PERF.md). The backward dots never touch that cancellation —
# they only add ~1e-3 relative rounding to gradients that already carry
# minibatch + MC noise, so they are a separate, independently-gated knob.
# "same" (conservative) reuses solve_precision; "default" runs them
# single-pass bf16. Read at trace time.
SOLVE_BWD_PRECISION: str = "same"


def _solve_bwd_prec(sp):
    if SOLVE_BWD_PRECISION == "same":
        return sp
    return _var_prec(SOLVE_BWD_PRECISION)


def _reduce_to_shape(g, shape):
    """Sum g over broadcasted leading axes so it matches shape."""
    extra = g.ndim - len(shape)
    if extra > 0:
        g = jnp.sum(g, axis=tuple(range(extra)))
    axes = tuple(i for i, (gs, s) in enumerate(zip(g.shape, shape))
                 if s == 1 and gs != 1)
    if axes:
        g = jnp.sum(g, axis=axes, keepdims=True)
    return g


def matmul_split_precision(x, y, fwd_precision, bwd_precision,
                           y_res_bf16: bool = False):
    """matmul whose transposed (cotangent) dots run at bwd_precision.

    jax's transpose rule reuses the primal dot's precision; this custom_vjp
    decouples them so the numerically critical forward (e.g. the solve path
    feeding the Kff - sum(A^2) cancellation) can keep bf16x3 while its
    gradient dots — 2x the forward FLOPs — run single-pass. Supports the
    broadcasting jnp.matmul performs over leading batch axes (operands must
    be >= 2-D; the 1-D vector special cases of jnp.matmul are not).

    y_res_bf16 stores the saved y operand in bf16 (forward math unchanged;
    dx's y^T operand is bf16-rounded). Used for the wide Kuf operand of the
    solve dot in the VMEM-eviction regime — the SAME bf16 tensor the gram
    vjp keeps (kernels.KRES_BF16_RESIDUAL), so CSE shares one buffer and
    the f32 Kuf dies right after the forward dot.
    """
    if fwd_precision == bwd_precision and not y_res_bf16:
        return jnp.matmul(x, y, precision=fwd_precision)
    return _matmul_split(x, y, fwd_precision, bwd_precision, y_res_bf16)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _matmul_split(x, y, fwd_precision, bwd_precision, y_res_bf16=False):
    return jnp.matmul(x, y, precision=fwd_precision)


def _matmul_split_fwd(x, y, fwd_precision, bwd_precision, y_res_bf16=False):
    out = jnp.matmul(x, y, precision=fwd_precision)
    return out, (x, y.astype(jnp.bfloat16) if y_res_bf16 else y)


def _matmul_split_bwd(fwd_precision, bwd_precision, y_res_bf16, res, g):
    x, y = res
    # bf16 y promotes to g's dtype inside the dot read; the dot itself
    # still runs at bwd_precision
    dx = jnp.matmul(g, jnp.swapaxes(y, -1, -2).astype(g.dtype),
                    precision=bwd_precision)
    dy = jnp.matmul(jnp.swapaxes(x, -1, -2), g, precision=bwd_precision)
    return (_reduce_to_shape(dx, x.shape),
            _reduce_to_shape(dy, y.shape).astype(x.dtype))


_matmul_split.defvjp(_matmul_split_fwd, _matmul_split_bwd)


# Rematerialize the q-variance quadratic form in the backward pass instead
# of storing its [*, D, M, N] inner product (S A or q_sqrt^T A) as an AD
# residual. SHAPE-DEPENDENT, measured on v5e (benchmarks/remat_ab.py +
# the year-config A/B):
#   flagship LGG K=20 (residual 42 MB):  remat LOSES  (0.586 -> 0.606 ms)
#   year LGGG K=50, D=30 (residual 98 MB): remat WINS (4.72 -> 3.18 ms,
#   +49% steps/s — those ops sit at the roofline ridge on the residual
#   write; recomputing the one [D,M,M]x[M,cols] dot makes them MXU-bound).
# "auto" (default) remats exactly when the stored inner product would
# exceed REMAT_QVAR_THRESHOLD_BYTES *and* M is small enough that the
# recompute is cheap relative to the avoided traffic: recompute FLOPs
# scale with D*M^2*cols while the residual scales with D*M*cols, so the
# trade flips as M grows — measured M=128 B=8192 (671 MB): remat wins
# 1.18x; M=512 B=2048 (671 MB): remat LOSES 0.89x. True/False force it
# for A/B.
REMAT_QVAR: bool | str = "auto"
REMAT_QVAR_THRESHOLD_BYTES = 64 * 1024 * 1024
REMAT_QVAR_MAX_M = 256

# Store the q-variance inner product's AD residual in bfloat16 instead of
# f32 (halves the dominant HBM traffic of the flagship backward: the
# [*, D, M, N] LTA/SA tensor is written once forward and read once
# backward). The squared-sum still accumulates in f32 on the MXU
# (preferred_element_type), so only the residual VALUES round to bf16 —
# the same rounding class var_precision='default' already accepts for the
# dot inputs themselves. Quality-gated: benchmarks/quality_gate.py
# --qvar_bf16_residual PASSED at 15k steps on all 4 gate configs
# (benchmarks/QUALITY_GATE_bf16res.md). Measured v5e step times
# (benchmarks/qvar_bf16_ab.py, spc=500 on an IDLE host, vs the prior
# remat-auto policy; an earlier spc=100 run under host contention had
# inflated the flagship gain to +5.5%):
#   flagship  M=128 B=512  (42 MB res):  +1%     year LGGG K=50: +10.5%
#   B=8192    M=128 (671 MB res):        +10.7%  deep M=512:     -9%
#   mid M=256 B=2048 (335 MB res, r5):   +7.3% vs f32 (351 vs 327 st/s)
# bf16-noremat beats REMAT at every M=128 shape (half-traffic store is
# cheaper than the recompute dot), but LOSES at M=512 where the program
# is MXU-bound and the casts only add work. The M=256 cap boundary was
# measured directly in r5 (VERDICT r4 weak #6): bf16 still wins there
# (and remat still beats noremat-f32, 332 vs 327), so both caps sit on
# the right side of their endpoints AND of the boundary point. "auto"
# (default) stores bf16 exactly when M <= QVAR_BF16_MAX_M and the compute
# dtype is float32 (f64 runs — CPU parity validation — stay exact);
# True/False force it. Read at trace time.
QVAR_BF16_RESIDUAL: bool | str = "auto"
QVAR_BF16_MAX_M = 256

# MEASURED NEGATIVE — keep the q-variance COTANGENT (dLTA / dSA) in bf16
# via an explicit custom vjp. Hypothesis from docs/ROOFLINE_B8192.md: AD
# materializes the [*, D, M, cols] cotangent in f32 (2 GB/step at B=8192).
# Measured (benchmarks/qvar_bf16grad_ab.py, v5e, spc=200): +0.4% at every
# shape — noise. Byte accounting of the traced ops shows why: XLA's
# bfloat16 propagation + operand fusion ALREADY fuse the elementwise
# 2g*LTA into both consuming dots as bf16 operands (each top op moves
# ~420 MB = bf16-sized reads + the f32 dA write; the f32 cotangent never
# reaches HBM). The custom vjp therefore buys nothing the compiler does
# not already do. Default False (plain AD); the path is kept as the
# documented experiment and for trace-level determinism A/Bs.
QVAR_BF16_GRAD: bool | str = False

# Backend for the q-variance quadratic form on INFERENCE paths. The XLA
# path materializes the [D, M, cols] inner product to HBM — a necessary
# AD residual in training, pure traffic at prediction time (43% of the
# serving device call at S=100 B=8192 M=128: 5.3 of 12.3 ms, hlo_stats
# 2026-08-18). The fused Pallas kernel (ops/pallas/qvar.py) keeps each
# tile in VMEM. "auto" (default) uses it exactly when a prediction entry
# point has set the inference hint (models/dgp.py predict_*) AND the
# shape/precision preconditions hold (f32, var_precision='default',
# M % 8 == 0, cols % 128 == 0); training objectives never take it — the
# bf16-residual XLA backward measured faster than recompute at M <= 256.
# "on"/"off" force it for A/B (benchmarks/qvar_pallas_ab.py).
QVAR_PALLAS: bool | str = "auto"
_QVAR_INFERENCE_HINT = False  # set via qvar_inference_mode()

# Backend for the q-variance quadratic form in TRAINING objectives. The
# XLA path must store the [*, D, M, cols] inner product as the AD
# residual; at the B=8192 throughput shape that store plus its two
# backward reads are the top 3 ops of the whole step, each AT the HBM
# roofline (docs/ROOFLINE_B8192.md) — a bound no scheduling can beat,
# only byte elimination. qvar_fused_train (ops/pallas/qvar.py) recomputes
# the inner product tile-wise in VMEM in a fused Pallas BACKWARD kernel,
# so the tensor never reaches HBM in either direction. Same rounding
# class as the bf16-residual path (bf16 dot operands, f32 MXU accumulate)
# — quality-gated. "auto" uses it on training paths exactly when the
# kernel preconditions hold (f32, var_precision='default', lane-aligned
# cols >= 1024 — i.e. the large-batch regime; the flagship B=512 shape
# keeps the measured-faster XLA bf16-residual path); "on"/"off" force it
# for A/B (benchmarks/qvar_pallas_train_ab.py).
QVAR_PALLAS_TRAIN: bool | str = "auto"

# Fuse the whitened conditional's EPILOGUE (mean = A^T q_mu, the
# prior-variance sumsq(A), and the q-variance quadratic form) into ONE
# Pallas pass over each A tile (ops/pallas/qvar.py epi_fused*). After the
# q-variance kernels eliminated the [D, M, cols] round trip, the remaining
# A-sized HBM traffic at large batch IS the epilogue: the XLA mean dot and
# sumsq reduce each re-read A forward, and backward the mean's dA
# cotangent (q_mu g^T) materializes a full A-sized tensor that the dA add
# chain re-reads, while dq_mu and the prior cotangent read A again
# (docs/ROOFLINE_B8192.md). "auto" (default) activates exactly when the
# corresponding q-variance kernel gate fires (inference hint ->
# epi_fused; training trace -> epi_fused_train) and q_mu is the standard
# [M, D] column block; "off" restores the separate-op composition for A/B
# (benchmarks/epi_fused_ab.py). Precision: quadratic form unchanged
# (bf16-operand/f32-accumulate); mean, dq_mu and dA_mean run HIGHEST
# in-kernel vs the XLA path's solve_precision 'high' — strictly tighter.
EPI_PALLAS: bool | str = "auto"

# Which epilogue variant TRAINING objectives take (inference traces always
# fuse the full epilogue — measured +9.5% serving). The skinny rank-D mean
# dots ran at HIGHEST = 6 bf16 MXU passes in Mosaic until r4's
# EPI_MEAN_PRECISION="high" (bf16x3 emulation) halved their pass count —
# which moved the crossover: the original floor (32768, from the r4
# measurements 16384 LOSE / 65536 WIN) was STALE by r5. Re-measured
# steps/s with the shipped kernel (benchmarks/epi_fused_ab.py, spc=200,
# idle host, r5 — noise scale +-1-3%):
#     shape   d*n     off   ps    mean
#     year    15360   422   409   418     <- mean -0.9% (noise-level LOSS)
#     B=2048  16384   946   962   964     <- mean +1.9%
#     B=2560  20480   716   682   720     <- mean +0.6%
#     B=3072  24576   583   636   659     <- mean +13.0%
#     B=4096  32768   425   443   449     <- mean +5.6%
#     B=8192  65536   202   191   215     <- mean +6.4%
# "auto" (default): the full (mean) variant iff d*n >= 16384 (splits the
# year loss at 15360 from the wins at >= 16384), else the separate-op
# path. "mean"/"ps"/"off" force a variant for A/B. The ps (mean-less)
# variant stays off under auto: it flips sign shape-to-shape (it won at
# 16384/24576, lost at 20480/65536) — scheduling-noise-dominated, no
# stable win to harvest.
EPI_TRAIN: str = "auto"
EPI_TRAIN_MIN_DN = 16384


@contextlib.contextmanager
def qvar_inference_mode():
    """Trace-time hint: the enclosing trace is a prediction path (no ELBO
    backward will consume the q-variance residual)."""
    global _QVAR_INFERENCE_HINT
    saved = _QVAR_INFERENCE_HINT
    _QVAR_INFERENCE_HINT = True
    try:
        yield
    finally:
        _QVAR_INFERENCE_HINT = saved


@contextlib.contextmanager
def qvar_pallas_disabled():
    """Trace-time override forcing the XLA q-variance path. Used when a
    trace must stay platform-portable — e.g. serving.export_scorer with a
    non-TPU platform in the target list, where a baked Mosaic custom call
    would make the artifact's CPU copy unloadable."""
    global QVAR_PALLAS
    saved = QVAR_PALLAS
    QVAR_PALLAS = "off"
    try:
        yield
    finally:
        QVAR_PALLAS = saved


def _use_qvar_pallas(A: jax.Array, W, vp) -> bool:
    if QVAR_PALLAS == "off" or QVAR_PALLAS is False:
        return False
    want = (QVAR_PALLAS == "on" or QVAR_PALLAS is True
            or (QVAR_PALLAS == "auto" and _QVAR_INFERENCE_HINT))
    if not want or vp != jax.lax.Precision.DEFAULT or W is None:
        return False
    if W.ndim != 3:
        return False
    from .pallas.qvar import applicable
    if QVAR_PALLAS == "auto":
        return applicable(A.shape, W, A.dtype)
    # forced "on": allow CPU via the interpreter (parity tests)
    m, n = A.shape[-2], A.shape[-1]
    return (A.dtype == jnp.float32 and m == W.shape[-1]
            and m % 8 == 0 and n % 128 == 0)


def _qvar_train_fn():
    """Which fused-backward training kernel the dispatch uses: the
    monolithic qvar_fused_train, or the d-grouped variant that fits the
    deep-M VMEM budget (QVAR_PALLAS_TRAIN == 'grouped', A/B only)."""
    from .pallas.qvar import qvar_fused_train, qvar_fused_train_grouped
    return (qvar_fused_train_grouped if QVAR_PALLAS_TRAIN == "grouped"
            else qvar_fused_train)


def _use_qvar_train_pallas(A: jax.Array, W, vp) -> bool:
    """Gate for the fused-backward training kernel (QVAR_PALLAS_TRAIN).

    Mirrors _use_qvar_pallas but for objective traces: never on inference
    paths (the residual-free qvar_fused already covers those), and never
    when the trace must stay portable (qvar_pallas_disabled covers both
    knobs so exported artifacts carry no Mosaic custom call)."""
    if QVAR_PALLAS_TRAIN == "off" or QVAR_PALLAS_TRAIN is False:
        return False
    if QVAR_PALLAS == "off":  # portability override (serving export)
        return False
    if _QVAR_INFERENCE_HINT or W is None or W.ndim != 3:
        return False
    if vp != jax.lax.Precision.DEFAULT:
        return False
    from .pallas.qvar import applicable_train
    if QVAR_PALLAS_TRAIN == "auto":
        return applicable_train(A.shape, W, A.dtype)
    # forced "on": allow CPU via the interpreter (parity tests)
    m, n = A.shape[-2], A.shape[-1]
    return (A.dtype == jnp.float32 and m == W.shape[-1]
            and m % 8 == 0 and n % 128 == 0)


def _maybe_epi_fused(A, q_sqrt, q_S, vp, q_mu):
    """Dispatch the epilogue-fused kernel (EPI_PALLAS); None -> fall back
    to the separate-op composition. Returns (qvar [*, D, N], sumsq [*, N],
    mean [*, D, N] | None) on the kernel path; a None mean means the
    caller computes the mean dot itself (the EPI_TRAIN='ps' A/B variant;
    inference and large-batch training fuse the mean — see EPI_TRAIN)."""
    if EPI_PALLAS == "off" or EPI_PALLAS is False:
        return None
    if q_S is not None and q_S.ndim == 3:
        W, cov = q_S, True
    elif q_S is None and q_sqrt is not None and q_sqrt.ndim == 3:
        W, cov = q_sqrt, False
    else:
        return None
    m = A.shape[-2]
    if (q_mu.ndim != 2 or q_mu.shape != (m, W.shape[0])
            or q_mu.dtype != A.dtype):
        return None
    from .pallas.qvar import (epi_fused, epi_fused_train, ps_fused_train)
    interp = jax.default_backend() == "cpu"
    Wk = W if cov else jnp.tril(W)
    if _use_qvar_pallas(A, W, vp):
        return epi_fused(A, Wk, q_mu, cov, interp)
    if _use_qvar_train_pallas(A, W, vp):
        mode = EPI_TRAIN
        if mode == "auto":
            mode = ("mean" if W.shape[0] * A.shape[-1] >= EPI_TRAIN_MIN_DN
                    else "off")
        if mode == "mean":
            return epi_fused_train(A, Wk, q_mu, cov, interp)
        if mode == "ps":
            qv, ss = ps_fused_train(A, Wk, cov, interp)
            return qv, ss, None
    return None


def _use_bf16_residual(m: int, dtype) -> bool:
    if QVAR_BF16_RESIDUAL == "auto":
        return m <= QVAR_BF16_MAX_M and dtype == jnp.float32
    return bool(QVAR_BF16_RESIDUAL)


def _use_bf16_grad() -> bool:
    # only reachable from a branch where _use_bf16_residual already held
    return QVAR_BF16_GRAD != False  # noqa: E712 — "auto" and True both on


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _qvar_root_bf16(A, L, vp):
    """sum_m (L^T A)^2 -> [..., D, N], bf16 residual AND bf16 cotangent.

    Forward is bitwise-identical to the plain bf16-residual path (same
    matmul, same einsum); only the backward changes: dLTA stays bf16, so
    the three [*, D, M, cols]-sized HBM transfers of the AD backward
    (f32 write + two f32 reads) halve. See QVAR_BF16_GRAD.
    """
    LTA = jnp.matmul(jnp.swapaxes(L, -1, -2), A[..., None, :, :],
                     precision=vp).astype(jnp.bfloat16)
    return jnp.einsum("...dmn,...dmn->...dn", LTA, LTA,
                      preferred_element_type=A.dtype)


def _qvar_root_bf16_fwd(A, L, vp):
    LTA = jnp.matmul(jnp.swapaxes(L, -1, -2), A[..., None, :, :],
                     precision=vp).astype(jnp.bfloat16)
    out = jnp.einsum("...dmn,...dmn->...dn", LTA, LTA,
                     preferred_element_type=A.dtype)
    return out, (A, L, LTA)


def _qvar_root_bf16_bwd(vp, res, g):
    A, L, LTA = res
    f32, bf16 = A.dtype, jnp.bfloat16
    # d out/d LTA = 2 g LTA — kept in bf16 (the whole point)
    dLTA = (2.0 * g)[..., :, None, :].astype(bf16) * LTA  # [..., D, M, N]
    # LTA_{d,p,n} = sum_m L_{d,m,p} A_{m,n}
    dL = jnp.einsum("...mn,...dpn->...dmp", A.astype(bf16), dLTA,
                    preferred_element_type=f32)
    dA = jnp.einsum("...dmp,...dpn->...mn", L.astype(bf16), dLTA,
                    preferred_element_type=f32)
    return (_reduce_to_shape(dA, A.shape).astype(A.dtype),
            _reduce_to_shape(dL, L.shape).astype(L.dtype))


_qvar_root_bf16.defvjp(_qvar_root_bf16_fwd, _qvar_root_bf16_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _qvar_cov_bf16(A, S, vp):
    """sum_m A (S A) -> [..., D, N], bf16 residual AND bf16 cotangent.

    Covariance-form sibling of _qvar_root_bf16 (natgrad layers store S,
    not its root). No symmetry of S is assumed — the backward mirrors
    exact AD of the forward, only with the [*, D, M, cols] cotangent dSA
    held in bf16.
    """
    SA = jnp.matmul(S, A[..., None, :, :],
                    precision=vp).astype(jnp.bfloat16)
    return jnp.einsum("...mn,...dmn->...dn", A.astype(jnp.bfloat16), SA,
                      preferred_element_type=A.dtype)


def _qvar_cov_bf16_fwd(A, S, vp):
    SA = jnp.matmul(S, A[..., None, :, :],
                    precision=vp).astype(jnp.bfloat16)
    Ab = A.astype(jnp.bfloat16)
    out = jnp.einsum("...mn,...dmn->...dn", Ab, SA,
                     preferred_element_type=A.dtype)
    return out, (Ab, S, SA)


def _qvar_cov_bf16_bwd(vp, res, g):
    Ab, S, SA = res
    f32, bf16 = S.dtype, jnp.bfloat16
    gb = g[..., :, None, :]                                # [..., D, 1, N]
    # via the einsum's A operand: sum_d g SA (g cast to bf16 so jnp's type
    # promotion cannot silently upcast the big SA operand to f32)
    dA1 = jnp.einsum("...dn,...dmn->...mn", g.astype(bf16), SA,
                     preferred_element_type=f32)
    # via SA = S A: dSA = g (x) A, then the matmul transposes
    dSA = gb.astype(bf16) * Ab[..., None, :, :]            # [..., D, M, N]
    dS = jnp.einsum("...dmn,...pn->...dmp", dSA, Ab,
                    preferred_element_type=f32)
    dA2 = jnp.einsum("...dmp,...dmn->...pn", S.astype(bf16), dSA,
                     preferred_element_type=f32)
    dA = dA1 + dA2
    return (_reduce_to_shape(dA, Ab.shape).astype(f32),
            _reduce_to_shape(dS, S.shape).astype(S.dtype))


_qvar_cov_bf16.defvjp(_qvar_cov_bf16_fwd, _qvar_cov_bf16_bwd)


def _maybe_remat(fn, residual_bytes: int, m: int, dtype):
    if _use_bf16_residual(m, dtype):
        # bf16 storage dominates remat at every shape it activates for
        # (qvar_bf16_ab.py: 170 vs 154 steps/s even at the 671 MB B=8192
        # shape where remat used to win) — never recompute on top of it.
        return fn
    if REMAT_QVAR == "auto":
        # residual_bytes is symbolic under polymorphic-batch export (an
        # inference trace, where the AD-residual choice is moot) — the
        # size policy is undecidable there, so skip the remat.
        do = (isinstance(residual_bytes, int)
              and residual_bytes > REMAT_QVAR_THRESHOLD_BYTES
              and m <= REMAT_QVAR_MAX_M)
    else:
        do = bool(REMAT_QVAR)
    return jax.checkpoint(fn) if do else fn


def safe_sqrt(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """sqrt(max(v, eps)) — the gradient-safe standard deviation.

    sqrt(max(v, 0)) has an inf * 0 = NaN backward at v == 0: sqrt's
    derivative is infinite there and max's zero subgradient cannot mask it.
    A marginal GP variance sits EXACTLY at that point whenever the
    cancellation Kff - sum(A^2) rounds to or below zero — guaranteed at a
    whitened near-deterministic layer's initialization once the solve path
    runs below HIGHEST precision (reproduced: GG-energy NaN'd at step 1
    with solve_precision='high'), and possible at HIGHEST for points on
    top of an inducing location. The eps floor (noise scale sqrt(eps) =
    1e-6) is far below every other noise source in the model.
    """
    return jnp.sqrt(jnp.maximum(v, eps))


def _var_prec(var_precision: str | None) -> jax.lax.Precision:
    hp = jax.lax.Precision.HIGHEST
    return {None: hp, "highest": hp,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[var_precision]


def _q_variance(A: jax.Array, q_sqrt, q_S, vp) -> jax.Array:
    """diag of the q-covariance quadratic form: A [..., M, N] -> [..., N, D].

    One implementation for every family and both parameterizations
    (whitened and non-whitened consume it identically — only A differs):
    - q_S [D, M, M]: covariance form (natgrad state), sum_M A * (S A)
    - q_S [M, D]:    diagonal covariance form (variances directly)
    - q_sqrt [D, M, M]: root form, sum_M (q_sqrt^T A)^2
    - q_sqrt [M, D]:    q_diag scales, (A^2)^T s^2
    The [D, M, cols] inner product of the 3-D families is rematerialized in
    the backward pass per the REMAT_QVAR policy (see module header).
    """
    m = A.shape[-2]
    n_cols = 1
    for s in (*A.shape[:-2], A.shape[-1]):
        n_cols *= s
    if q_S is not None:
        if q_S.ndim == 2:
            return jnp.matmul(jnp.swapaxes(jnp.square(A), -1, -2), q_S,
                              precision=vp)                 # [..., N, D]
        if _use_qvar_pallas(A, q_S, vp):
            from .pallas.qvar import qvar_fused
            interp = jax.default_backend() == "cpu"
            return jnp.swapaxes(
                qvar_fused(A, q_S, True, interp), -1, -2)   # [..., N, D]
        if _use_qvar_train_pallas(A, q_S, vp):
            interp = jax.default_backend() == "cpu"
            return jnp.swapaxes(
                _qvar_train_fn()(A, q_S, True, interp), -1, -2)

        def _qvar_cov(A, S):
            if _use_bf16_residual(m, A.dtype):
                if _use_bf16_grad():
                    return _qvar_cov_bf16(A, S, vp)
                SA = jnp.matmul(S, A[..., None, :, :],
                                precision=vp).astype(jnp.bfloat16)
                # contraction over M as a dot so the bf16 SA (not an f32
                # upcast) is the saved residual; f32 MXU accumulation
                return jnp.einsum(
                    "...mn,...dmn->...dn", A.astype(jnp.bfloat16), SA,
                    preferred_element_type=A.dtype)
            SA = jnp.matmul(S, A[..., None, :, :], precision=vp)  # [..., D, M, N]
            return jnp.sum(A[..., None, :, :] * SA, axis=-2)      # [..., D, N]

        res_bytes = q_S.shape[0] * n_cols * m * A.dtype.itemsize
        fvar_q = _maybe_remat(_qvar_cov, res_bytes, m, A.dtype)(A, q_S)
        return jnp.swapaxes(fvar_q, -1, -2)
    if q_sqrt.ndim == 2:
        return jnp.matmul(jnp.swapaxes(jnp.square(A), -1, -2),
                          jnp.square(q_sqrt), precision=vp)  # [..., N, D]
    if _use_qvar_pallas(A, q_sqrt, vp):
        from .pallas.qvar import qvar_fused
        interp = jax.default_backend() == "cpu"
        Ltri = jnp.tril(q_sqrt)
        return jnp.swapaxes(
            qvar_fused(A, Ltri, False, interp), -1, -2)      # [..., N, D]
    if _use_qvar_train_pallas(A, q_sqrt, vp):
        interp = jax.default_backend() == "cpu"
        # tril is a no-op on the stored parameter but masks the dense dW
        # the fused backward produces back onto the triangle
        return jnp.swapaxes(
            _qvar_train_fn()(A, jnp.tril(q_sqrt), False, interp), -1, -2)

    def _qvar_root(A, L):
        if _use_bf16_residual(m, A.dtype):
            if _use_bf16_grad():
                return _qvar_root_bf16(A, L, vp)
            LTA = jnp.matmul(jnp.swapaxes(L, -1, -2), A[..., None, :, :],
                             precision=vp).astype(jnp.bfloat16)
            return jnp.einsum("...dmn,...dmn->...dn", LTA, LTA,
                              preferred_element_type=A.dtype)
        # (q_sqrt^T A): [D, M, M] x [..., M, N] -> [..., D, M, N]
        LTA = jnp.matmul(jnp.swapaxes(L, -1, -2), A[..., None, :, :],
                         precision=vp)
        return jnp.sum(jnp.square(LTA), axis=-2)            # [..., D, N]

    res_bytes = q_sqrt.shape[0] * n_cols * m * A.dtype.itemsize
    fvar_q = _maybe_remat(_qvar_root, res_bytes, m, A.dtype)(A, q_sqrt)
    return jnp.swapaxes(fvar_q, -1, -2)


class ConditionalOut(NamedTuple):
    mean: jax.Array  # [..., N, D]
    var: jax.Array   # [..., N, D] (marginal) or [..., D, N, N] (full_cov)


def base_conditional_whitened(
    Kuf: jax.Array,      # [..., M, N]
    Lm: jax.Array,       # [M, M] lower Cholesky of Kuu (+jitter)
    Kff_diag: jax.Array,  # [..., N]
    q_mu: jax.Array,     # [M, D]
    q_sqrt: jax.Array,   # [D, M, M] lower-triangular (or [M, D] q_diag)
    var_precision: str | None = None,
    Linv: jax.Array | None = None,
    q_S: jax.Array | None = None,   # [D, M, M] covariance form (natgrad)
    solve_precision: str | None = None,
) -> ConditionalOut:
    """Whitened marginal conditional; broadcasts over leading axes of Kuf.

    q_S (covariance form): when given, the q-variance term is computed as
    diag(A^T S A) = sum_M A * (S A) directly from the covariance — the
    natural-gradient state — so the training step never has to factorize S
    (q_sqrt is ignored). Identical math and FLOPs as the root form.

    var_precision controls ONLY the q-variance matmuls (the (q_sqrt^T A)
    contraction and its square-sum): this is the FLOP-dominant term of the
    whole DGP step ([D, M, M] x [M, K*S*B]) and, being a cancellation-free
    sum of squares, tolerates fewer bf16 MXU passes — 'high' (bf16x3)
    measured 6e-8 relative ELBO error vs 'highest' at the flagship shape
    while removing ~0.13 ms/step of MXU time (fwd + both transposed dots).
    The gram always stays HIGHEST, and the solve path has its own
    solve_precision (default 'high', quality-gated — see DGPConfig). One
    caveat: the exact Kff - sum(A^2) + sum((L^T A)^2)
    cancellation at q_sqrt == I (whitened init) is no longer bit-exact, so
    Z/lengthscale grads that are exactly 0 at HIGHEST come out ~1e-3-absolute
    instead; one optimizer step breaks that symmetry anyway.
    """
    # solve-path precision (A and the mean): feeds the Kff - sum(A^2)
    # cancellation; defaults to 'high' (DGPConfig.solve_precision), which
    # passes the convergence quality gate once safe_sqrt floors the
    # cancellation's AD hazard (an earlier FAIL on GG-energy was that
    # step-1 NaN, not precision).
    sp = _var_prec(solve_precision)
    bp = _solve_bwd_prec(sp)
    vp = _var_prec(var_precision)
    # Wide solves (many K*S*B columns against one small well-conditioned
    # jittered factor): invert Lm once ([M, M] solve) and turn the wide
    # sequential triangular solve — and its whole backward pass — into pure
    # MXU matmuls. Identical math; measurably faster on TPU.
    n_cols = 1
    for s in (*Kuf.shape[:-2], Kuf.shape[-1]):
        n_cols *= s
    m = Lm.shape[-1]
    # bf16 Kuf residual in the VMEM-eviction regime: the same bf16 tensor
    # the gram vjp stores (kernels.KRES_BF16_RESIDUAL) — CSE shares it and
    # the f32 Kuf dies after this forward dot (n_cols int-ness guards the
    # polymorphic-export trace, where n_cols is symbolic)
    _kres16 = kernels.kres_bf16_active(
        (n_cols * m * Kuf.dtype.itemsize) if isinstance(n_cols, int) else 0,
        Kuf.dtype)
    if Linv is not None:
        A = matmul_split_precision(Linv, Kuf, sp, bp,      # [..., M, N]
                                   y_res_bf16=_kres16)
    elif INVERSE_SOLVE and Lm.ndim == 2 and n_cols >= 4 * m:
        Linv = solve_triangular(Lm, jnp.eye(m, dtype=Lm.dtype), lower=True)
        A = matmul_split_precision(Linv, Kuf, sp, bp,      # [..., M, N]
                                   y_res_bf16=_kres16)
    else:
        A = solve_triangular(Lm, Kuf, lower=True)          # [..., M, N]
    # Epilogue-fused path (EPI_PALLAS): mean + prior sumsq + q-variance in
    # one Pallas pass over A — active exactly when the q-variance kernel
    # gates fire; identical math, measured A/B in benchmarks/epi_fused_ab.py
    epi = _maybe_epi_fused(A, q_sqrt, q_S, vp, q_mu)
    if epi is not None:
        qv, ss, mn = epi
        mean = (jnp.swapaxes(mn, -1, -2) if mn is not None else
                jnp.matmul(jnp.swapaxes(A, -1, -2), q_mu, precision=sp))
        fvar_prior = jnp.maximum(Kff_diag - ss, 0.0)
        return ConditionalOut(mean,
                              fvar_prior[..., None]
                              + jnp.swapaxes(qv, -1, -2))
    # the mean matmul's cotangent dq_mu = A g feeds the natural-gradient
    # closed form — the known precision-sensitive consumer (docs/PERF.md
    # natgrad trap) — and is FLOP-trivial (D columns), so it is NOT
    # relaxed. (An r4 experiment rewrote its dA cotangent — a rank-D
    # outer product the roofline flags at 382 us — as an elementwise
    # broadcast for XLA to fuse: the general sum-over-D form measured
    # WORSE (5.42 vs 5.00 ms/step at B=8192, the reduce did not fuse)
    # and the D=1 broadcast form measured NEUTRAL (5.012) — AD's dot is
    # already optimal here; reverted.)
    mean = jnp.matmul(jnp.swapaxes(A, -1, -2), q_mu, precision=sp)
    # clamp the cancellation to its mathematical domain: Kff - Qff >= 0,
    # but rounding (especially solve_precision < HIGHEST) can push it
    # negative, which would reach the likelihood as a negative variance
    fvar_prior = jnp.maximum(
        Kff_diag - jnp.sum(jnp.square(A), axis=-2), 0.0)     # [..., N]
    fvar_q = _q_variance(A, q_sqrt, q_S, vp)                 # [..., N, D]
    return ConditionalOut(mean, fvar_prior[..., None] + fvar_q)


def base_conditional(
    Kuf: jax.Array,      # [..., M, N]
    Lm: jax.Array,       # [M, M] lower Cholesky of Kuu (+jitter)
    Kff_diag: jax.Array,  # [..., N]
    q_mu: jax.Array,     # [M, D]
    q_sqrt: jax.Array,   # [D, M, M] lower-triangular
    *,
    white: bool = True,
    var_precision: str | None = None,
    q_S: jax.Array | None = None,
    solve_precision: str | None = None,
) -> ConditionalOut:
    """gpflow-style base_conditional supporting BOTH parameterizations.

    white=True: q over v with u = Lm v (the reference's choice; fast path
    above). white=False: q directly over u = f(Z):
        A    = Kuu^-1 Kuf  (two triangular solves)
        mean = A^T q_mu
        var  = Kff_diag - diag(Kuf^T Kuu^-1 Kuf) + rowsum((q_sqrt^T A)^2)
    """
    if white:
        return base_conditional_whitened(Kuf, Lm, Kff_diag, q_mu, q_sqrt,
                                         var_precision=var_precision,
                                         q_S=q_S,
                                         solve_precision=solve_precision)
    sp = _var_prec(solve_precision)
    vp = _var_prec(var_precision)
    A1 = solve_triangular(Lm, Kuf, lower=True)             # [..., M, N]
    fvar_prior = jnp.maximum(
        Kff_diag - jnp.sum(jnp.square(A1), axis=-2), 0.0)
    A = solve_triangular(Lm, A1, lower=True, trans=True)   # Kuu^-1 Kuf
    mean = jnp.matmul(jnp.swapaxes(A, -1, -2), q_mu, precision=sp)
    fvar_q = _q_variance(A, q_sqrt, q_S, vp)               # [..., N, D]
    return ConditionalOut(mean, fvar_prior[..., None] + fvar_q)


def base_conditional_whitened_fullcov(
    Kuf: jax.Array,      # [M, N]
    Lm: jax.Array,       # [M, M]
    Kff: jax.Array,      # [N, N]
    q_mu: jax.Array,     # [M, D]
    q_sqrt: jax.Array,   # [D, M, M] lower-triangular, or [M, D] q_diag scales
    *,
    white: bool = True,
) -> ConditionalOut:
    """Full-covariance variant (tests / small-N prediction only).

    white=True: A = Lm^-1 Kuf (q over whitened v, u = Lm v).
    white=False: A = Kuu^-1 Kuf (q directly over u; second solve against
    Lm^T), matching gpflow base_conditional(full_cov=True, white=False).
    The prior term Kff - Kuf^T Kuu^-1 Kuf is identical in both.

    A 2-D q_sqrt is the q_diag family's per-dim scale matrix s [M, D]
    (S_d = diag(s[:, d]^2)): the quadratic term is A^T S_d A per output dim.
    """
    hp = jax.lax.Precision.HIGHEST
    A1 = solve_triangular(Lm, Kuf, lower=True)             # [M, N]
    prior_cov = Kff - jnp.matmul(A1.T, A1, precision=hp)   # [N, N]
    A = A1 if white else solve_triangular(Lm, A1, lower=True, trans=True)
    mean = jnp.matmul(A.T, q_mu, precision=hp)             # [N, D]
    if q_sqrt.ndim == 2:  # q_diag scales [M, D] -> per-dim diag covariance
        B = q_sqrt.T[:, :, None] * A[None]                 # [D, M, N]
        cov = prior_cov[None] \
            + jnp.matmul(jnp.swapaxes(B, -1, -2), B, precision=hp)
        return ConditionalOut(mean, cov)
    LTA = jnp.matmul(jnp.swapaxes(q_sqrt, -1, -2), A, precision=hp)
    cov = prior_cov[None] \
        + jnp.matmul(jnp.swapaxes(LTA, -1, -2), LTA, precision=hp)
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
    Linv: jax.Array | None = None,
    use_pallas: bool = False,
    jitter_tries: int = 4,
    white: bool = True,
    var_precision: str | None = None,
    q_S: jax.Array | None = None,
    solve_precision: str | None = None,
    feature_raw_scales: jax.Array | None = None,
) -> ConditionalOut:
    """End-to-end whitened conditional: grams -> chol -> solve -> (mean, var).

    Pass a precomputed ``Lm`` to share the Kuu Cholesky across calls within
    one step (e.g. training + KL both need it).

    feature_raw_scales: raw [M, D] Multiscale window scales
    (ops/features.py) — Kuu/Kuf become the window-integral covariances
    (RBF only); Kff and everything downstream of (Kuu, Kuf) is unchanged.

    use_pallas=True routes the gram+solve+moments pipeline through the fused
    TPU kernel (ops/pallas/conditional.py): Kuf and A stay in VMEM and the
    triangular solve becomes a Linv matmul on the MXU. RBF only; falls back
    to the XLA path for other kernels. Interpreted (slow, exact) off-TPU.
    """
    if feature_raw_scales is not None:
        from . import features as _feat  # deferred: import cycle

        assert kernel_kind == "rbf", \
            "multiscale features are defined for the RBF kernel only"
        if Lm is None:
            Kuu = _feat.multiscale_Kuu(kernel_params, Z, feature_raw_scales)
            Lm = cholesky_with_jitter(Kuu, jitter, max_tries=jitter_tries)
        Kuf = _feat.multiscale_Kuf(kernel_params, Z, feature_raw_scales, X)
        Kff_diag = kernels.Kdiag(kernel_params, X, kind=kernel_kind)
        if white:
            return base_conditional_whitened(
                Kuf, Lm, Kff_diag, q_mu, q_sqrt,
                var_precision=var_precision, Linv=Linv, q_S=q_S,
                solve_precision=solve_precision)
        return base_conditional(Kuf, Lm, Kff_diag, q_mu, q_sqrt, white=white,
                                var_precision=var_precision, q_S=q_S,
                                solve_precision=solve_precision)
    if Lm is None:
        Kuu = kernels.K(kernel_params, Z, Z, kind=kernel_kind)
        Lm = cholesky_with_jitter(Kuu, jitter, max_tries=jitter_tries)
    if use_pallas == "auto":
        use_pallas = False  # measured: XLA >= pallas at every shape (docs/PALLAS_SWEEP.md)
    if (use_pallas and kernel_kind == "rbf" and white and q_S is None
            and q_sqrt.ndim == 3):
        from .pallas.conditional import fused_conditional

        ls = kernels.kernel_lengthscales(kernel_params)
        var = kernels.kernel_variance(kernel_params)
        lead = X.shape[:-2]
        n, d_in = X.shape[-2], X.shape[-1]
        d_out = q_mu.shape[1]
        xs = (X / ls).reshape((-1, d_in))
        zs = Z / ls
        m = Z.shape[0]
        if Linv is None:
            Linv = solve_triangular(Lm, jnp.eye(m, dtype=Lm.dtype), lower=True)
        interpret = jax.default_backend() != "tpu"
        mean, v = fused_conditional(xs, zs, var, Linv, q_mu, q_sqrt,
                                    interpret)
        mean = mean.reshape(lead + (n, d_out)).astype(X.dtype)
        v = v.reshape(lead + (n, d_out)).astype(X.dtype)
        return ConditionalOut(mean, v)
    # Z:[M,D] broadcasts against X:[..., N, D] -> Kuf:[..., M, N]
    Kuf = kernels.K(kernel_params, Z, X, kind=kernel_kind)
    Kff_diag = kernels.Kdiag(kernel_params, X, kind=kernel_kind)
    if white:
        return base_conditional_whitened(Kuf, Lm, Kff_diag, q_mu, q_sqrt,
                                         var_precision=var_precision,
                                         Linv=Linv, q_S=q_S,
                                         solve_precision=solve_precision)
    return base_conditional(Kuf, Lm, Kff_diag, q_mu, q_sqrt, white=white,
                            var_precision=var_precision, q_S=q_S,
                            solve_precision=solve_precision)


# Fully-fused INFERENCE conditional (ops/pallas/serve_cond.py): gram ->
# A -> moments -> sample per VMEM tile, nothing [M, cols]-sized touches
# HBM. MEASURED NEGATIVE — "auto" resolves to OFF: at the serving shape
# it reached only 420k points/s vs 600k plain-XLA and 850k with the
# qvar-only kernel (QVAR_PALLAS), despite correct outputs (mean
# log-density delta 2e-7). The arithmetic: ~30 Mosaic ops per tile
# (three manual-bf16x3 dot stages + D q-variance dots + splits) at the
# ~0.35 us/op small-op constant that also sank the chol kernel, and
# VMEM caps the tile at 1024 rows so the op cost can't amortize.
# Mosaic's measured sweet spot is ONE dot + reduce per tile (the qvar
# kernel); long serial in-kernel chains lose to XLA's scheduler even
# when they save 4x HBM traffic. Kept behind "on" for re-measurement;
# quality-parity pinned in tests/test_serve_fused.py.
SERVE_PALLAS: bool | str = "off"
_SERVE_FUSED_MIN_COLS = 1024


def _serve_fused_applicable(X, Z, q_sqrt, q_S, kernel_kind, white,
                            var_precision, solve_precision) -> bool:
    if SERVE_PALLAS == "off" or SERVE_PALLAS is False:
        return False
    want = (SERVE_PALLAS == "on" or SERVE_PALLAS is True
            or (SERVE_PALLAS == "auto" and _QVAR_INFERENCE_HINT))
    if not want:
        return False
    if kernel_kind != "rbf" or not white or q_S is not None:
        return False
    if q_sqrt is None or q_sqrt.ndim != 3:
        return False
    if X.dtype != jnp.float32 or Z.shape[0] % 128 != 0:
        return False
    if var_precision != "default" or solve_precision != "high":
        return False
    n_cols = 1
    for s in X.shape[:-1]:
        n_cols *= s
    if n_cols < _SERVE_FUSED_MIN_COLS:
        return False
    if SERVE_PALLAS == "auto" and jax.default_backend() == "cpu":
        return False
    return True


def infer_conditional_fused(
    key: jax.Array | None,
    X: jax.Array,          # [..., N, D_in]
    Z: jax.Array,
    kernel_params,
    q_mu: jax.Array,
    q_sqrt: jax.Array,
    *,
    sample: bool,
    jitter: float = DEFAULT_JITTER,
    jitter_tries: int = 4,
    Lm: jax.Array | None = None,
    Linv: jax.Array | None = None,
) -> tuple[jax.Array | None, ConditionalOut]:
    """Inference-only fused conditional (+ optional reparameterized
    sample with ORDINARY threefry noise, drawn outside the kernel).
    Callers must have checked _serve_fused_applicable."""
    from .pallas.serve_cond import fused_conditional_infer

    if Linv is None:
        if Lm is None:
            Kuu = kernels.K(kernel_params, Z, Z, kind="rbf")
            Lm = cholesky_with_jitter(Kuu, jitter, max_tries=jitter_tries)
        Linv = solve_triangular(Lm, jnp.eye(Z.shape[0], dtype=Lm.dtype),
                                lower=True)
    ls = kernels.kernel_lengthscales(kernel_params)
    var = kernels.kernel_variance(kernel_params)
    lead = X.shape[:-2]
    n, d_in = X.shape[-2], X.shape[-1]
    d_out = q_mu.shape[1]
    xs = (jax.lax.stop_gradient(X) / ls).reshape((-1, d_in))
    zs = Z / ls
    shape = lead + (n, d_out)
    interp = jax.default_backend() == "cpu"
    if sample:
        eps = jax.random.normal(key, shape, jnp.float32).reshape(
            (-1, d_out))
        samp, mean, v = fused_conditional_infer(
            xs, zs, var, Linv, q_mu, q_sqrt, eps, sample=True,
            interpret=interp)
        return (samp.reshape(shape).astype(X.dtype),
                ConditionalOut(mean.reshape(shape).astype(X.dtype),
                               v.reshape(shape).astype(X.dtype)))
    mean, v = fused_conditional_infer(
        xs, zs, var, Linv, q_mu, q_sqrt, None, sample=False,
        interpret=interp)
    return None, ConditionalOut(mean.reshape(shape).astype(X.dtype),
                                v.reshape(shape).astype(X.dtype))


def sample_conditional_fused(
    key: jax.Array,
    X: jax.Array,          # [..., N, D_in]
    Z: jax.Array,
    kernel_params,
    q_mu: jax.Array,
    q_sqrt: jax.Array,
    *,
    kernel_kind: str = "rbf",
    jitter: float = DEFAULT_JITTER,
    Lm: jax.Array | None = None,
    jitter_tries: int = 4,
) -> tuple[jax.Array, ConditionalOut]:
    """Conditional + reparameterized sample as ONE fused Pallas kernel
    (gram -> Linv matmul -> moments -> on-core PRNG sample; the complete
    BASELINE.json pipeline stage). TPU + RBF only; anything else falls back
    to :func:`sample_conditional` (same moments, different noise stream).
    """
    if jax.default_backend() != "tpu" or kernel_kind != "rbf":
        return sample_conditional(key, X, Z, kernel_params, q_mu, q_sqrt,
                                  kernel_kind=kernel_kind, jitter=jitter,
                                  Lm=Lm)
    from .pallas.conditional import fused_conditional_sample

    if Lm is None:
        Kuu = kernels.K(kernel_params, Z, Z, kind=kernel_kind)
        Lm = cholesky_with_jitter(Kuu, jitter, max_tries=jitter_tries)
    ls = kernels.kernel_lengthscales(kernel_params)
    var = kernels.kernel_variance(kernel_params)
    lead = X.shape[:-2]
    n, d_in = X.shape[-2], X.shape[-1]
    d_out = q_mu.shape[1]
    xs = (X / ls).reshape((-1, d_in))
    zs = Z / ls
    m = Z.shape[0]
    Linv = solve_triangular(Lm, jnp.eye(m, dtype=Lm.dtype), lower=True)
    seed = jax.random.bits(key, (), jnp.uint32).astype(jnp.int32)
    samp, mean, v = fused_conditional_sample(xs, zs, var, Linv, q_mu,
                                             q_sqrt, seed, False)
    shape = lead + (n, d_out)
    return (samp.reshape(shape).astype(X.dtype),
            ConditionalOut(mean.reshape(shape).astype(X.dtype),
                           v.reshape(shape).astype(X.dtype)))


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
    sample = out.mean + safe_sqrt(out.var) * eps
    return sample, out
