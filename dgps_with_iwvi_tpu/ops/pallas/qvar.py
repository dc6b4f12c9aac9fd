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
import os

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
            and m % 8 == 0 and n % LANE == 0 and n >= 1024 and m <= 256
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

    The m <= 256 bound is load-bearing twice over: the monolithic
    backward's scoped-VMEM footprint (W + dW + tile-sized stack
    temporaries) is a COMPILE error at m=512 d=8 — which the old
    d*m*m*4 <= 8 MB test admitted exactly, a latent auto-policy crash,
    r5 — and the d-grouped variant that does fit (tn=256 tiles,
    qvar_fused_train_grouped) measured 0.88x vs the XLA path at M=512
    B=2048 (8.50 -> 9.70 ms/step): the deep-M regime is MXU-bound and
    the recompute dot only adds passes, consistent with bf16-residual
    (-9%) and remat (0.89x) there.
    """
    m, n = A_shape[-2], A_shape[-1]
    d = W.shape[0]
    return (dtype == jnp.float32 and W.dtype == jnp.float32
            and W.ndim == 3 and m == W.shape[-1]
            and m % 8 == 0 and n % LANE == 0 and d * n >= 12288
            and m <= 256 and d * m * m * 4 <= _MAX_W_BYTES
            and jax.default_backend() not in ("cpu",))


def _qvar_kernel(a_ref, w_ref, out_ref, *, d_out: int, cov: bool):
    a32 = a_ref[0]                                  # [M, TN] f32
    # cov: T = S_d a, out_d = sum_m a*T; root: T = W_d^T a, out_d = sum T^2
    _qvar_loop(a32, a32.astype(jnp.bfloat16), w_ref, out_ref, d_out, cov)


def _pick_tile(n: int, m: int = 128) -> int:
    # prefer big tiles: per-grid-step overhead dominates at small tiles
    # (measured 0.74x vs XLA at 100 programs x [128, 128] tiles); A-tile +
    # inner-product tile stay comfortably in VMEM up to tn=2048 at M=128.
    # Deep-M cap: the scoped-VMEM cost of a grid step is dominated by the
    # [m, tn]-sized KERNEL STACK temporaries (da accumulator, t, dt, the
    # bf16 copy of a — ~6-8 tile-sized buffers) plus the double-buffered
    # A/dA blocks; at m=512 a tn=1024 backward still spilled 21 MB
    # against the 16 MB limit (measured compile error, r5). m <= 256
    # keeps the measured-optimal 2 MB tile cap (tn=2048 at m=128);
    # deeper M drops to 0.5 MB tiles (tn=256 at m=512) — the price the
    # d-grouped deep-M variant pays to compile at all.
    cap = (2 if m <= 256 else 0.5) * 1024 * 1024
    for tn in (2048, 1024, 512, 256, 128):
        if n % tn == 0 and m * tn * 4 <= cap:
            return tn
    for tn in (2048, 1024, 512, 256, 128):  # m > 4096 rows: best effort
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
    tn = _pick_tile(n, m)
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
    tn = _pick_tile(n, m)
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


def qvar_fused_train_grouped(A: jax.Array, W: jax.Array, cov: bool = False,
                             interpret: bool = False) -> jax.Array:
    """qvar_fused_train split over d-groups — the deep-M (M=512) variant.

    The monolithic backward kernel's VMEM blocks (W stack + dW
    accumulator + A/dA tiles) exceed the 16 MB Mosaic scoped limit at
    M=512 d=8 (a measured compile blocker, docs/PERF.md ledger). Calling
    the SAME kernels per d-slice keeps every block under budget: W/dW
    shrink to dg slices while A is re-read (and a dA contribution
    re-written) once per group — the d-split trade the r4 ledger left
    unmeasured. Group size is the largest dg whose backward blocks fit
    a ~14 MB budget at this shape's tile; the concat's vjp splits the
    cotangent per group and AD sums the dA contributions."""
    m, n = A.shape[-2], A.shape[-1]
    tn = _pick_tile(n, m)
    # streamed A + dA tiles are DOUBLE-buffered by Mosaic (4 tile copies);
    # the W slice and dW accumulator have constant index maps (1 copy each)
    budget = 13 * 1024 * 1024 - 4 * m * tn * 4
    dg = max(1, budget // (2 * m * m * 4))
    d = W.shape[0]
    if dg >= d:
        return qvar_fused_train(A, W, cov, interpret)
    outs = [qvar_fused_train(A, W[i:i + dg], cov, interpret)
            for i in range(0, d, dg)]
    return jnp.concatenate(outs, axis=-2)


# ---------------------------------------------------------------------------
# Epilogue-fused variants: the whole whitened-conditional EPILOGUE —
#
#     mean_d  = q_mu_d^T A          ([M, D]^T [*, M, N] -> [*, D, N])
#     sumsq   = sum_m A^2           (the Kff - Qff prior-variance term)
#     qvar_d  = quadratic form      (exactly qvar_fused)
#
# — in ONE pass over each A tile. Rationale (docs/ROOFLINE_B8192.md): at
# the B=8192 training shape A is 84 MB per layer, and after the fused
# q-variance kernels removed the [D, M, N] round trip, the REMAINING
# A-sized traffic is the epilogue itself: the XLA mean dot and the sumsq
# reduce each re-read A forward (~210 us), and the mean's backward
# materializes dA_mean = q_mu g^T as a FULL A-sized tensor (the 382 us
# roofline row) that is then re-read by the dA add chain, while dq_mu and
# the prior cotangent each read A again. Folding these into the existing
# winning kernels adds only rank-D MXU dots and a VPU reduce per tile
# (independent of the per-d main dots, so they pipeline — unlike the
# serial-chain fully-fused conditional that measured negative, see
# ops/pallas/conditional.py) and eliminates every epilogue-sized HBM
# transfer except A's single read.
#
# Precision: the main quadratic-form dots keep the measured bf16-operand /
# f32-accumulate pipeline (var_precision='default' class). The mean dot,
# dq_mu and dA_mean run at Precision.HIGHEST f32 in-kernel — the XLA path
# runs them at solve_precision 'high' (bf16x3), so the fused epilogue is
# strictly tighter there (Mosaic lowers f32 dots at DEFAULT/HIGHEST only).
# sumsq and its cotangent are exact f32 VPU math, as in XLA.
# ---------------------------------------------------------------------------


# Precision of the in-kernel MEAN-term dots (forward mean, dq_mu, dA_mean).
# Mosaic lowers f32 dots at DEFAULT (1 bf16 pass) or HIGHEST (6) only; the
# XLA path runs these at solve_precision 'high' (bf16x3). "highest" = 6
# passes; "high" = 3-pass hi/lo-split emulation of the XLA class (_dot3);
# "default" = 1 pass (A/B only — dq_mu feeds the natgrad closed form, the
# known precision-sensitive consumer). Measured: see docs/PERF.md ledger.
EPI_MEAN_PRECISION = os.environ.get("DGP_EPI_MEAN_PRECISION", "high")


def _mean_dot(x, y):
    if EPI_MEAN_PRECISION == "highest":
        return jnp.dot(x, y, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if EPI_MEAN_PRECISION == "high":
        return _dot3(x, y)
    return jnp.dot(x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _dot3(x, y):
    """bf16x3 emulated f32 dot (the XLA Precision.HIGH class): hi/lo bf16
    operand split, f32 MXU accumulation, 3 passes instead of HIGHEST's 6.
    Error term dropped: xl @ yl (the xl*yl products are ~2^-16 relative —
    exactly what XLA's HIGH drops too)."""
    f32 = jnp.float32
    xh = x.astype(jnp.bfloat16)
    yh = y.astype(jnp.bfloat16)
    xl = (x - xh.astype(f32)).astype(jnp.bfloat16)
    yl = (y - yh.astype(f32)).astype(jnp.bfloat16)
    return (jnp.dot(xh, yh, preferred_element_type=f32)
            + jnp.dot(xh, yl, preferred_element_type=f32)
            + jnp.dot(xl, yh, preferred_element_type=f32))


def _qvar_loop(a32, a, w_ref, out_ref, d_out: int, cov: bool):
    """Shared per-d quadratic-form loop (bf16 operands, f32 MXU accum)."""
    for d in range(d_out):
        w = w_ref[d].astype(jnp.bfloat16)           # [M, M]
        if cov:
            t = jnp.dot(w, a, preferred_element_type=jnp.float32)
            out_ref[0, d, :] = jnp.sum(a32 * t, axis=0)
        else:
            t = jnp.dot(w.T, a, preferred_element_type=jnp.float32)
            out_ref[0, d, :] = jnp.sum(t * t, axis=0)


def _epi_kernel(a_ref, w_ref, qmu_ref, out_ref, ss_ref, mean_ref, *,
                d_out: int, cov: bool):
    a32 = a_ref[0]                                  # [M, TN] f32
    ss_ref[0, 0, :] = jnp.sum(a32 * a32, axis=0)
    mean_ref[0] = _mean_dot(qmu_ref[...].T, a32)    # [D, TN]
    _qvar_loop(a32, a32.astype(jnp.bfloat16), w_ref, out_ref, d_out, cov)


def _ps_kernel(a_ref, w_ref, out_ref, ss_ref, *, d_out: int, cov: bool):
    """qvar + prior sumsq only (no mean): the pure-VPU epilogue subset —
    the sumsq reduce and its cotangent add zero MXU passes, so it wins at
    shapes where the skinny HIGHEST mean dots do not amortize."""
    a32 = a_ref[0]                                  # [M, TN] f32
    ss_ref[0, 0, :] = jnp.sum(a32 * a32, axis=0)
    _qvar_loop(a32, a32.astype(jnp.bfloat16), w_ref, out_ref, d_out, cov)


def _epi_call(A, W, q_mu, cov: bool, interpret: bool):
    """(qvar, sumsq[, mean]) fused forward; q_mu=None -> the mean-less
    _ps_kernel (mean stays a separate XLA dot)."""
    lead = A.shape[:-2]
    m, n = A.shape[-2:]
    d = W.shape[0]
    L = 1
    for s in lead:
        L *= s
    Ab = A.reshape((L, m, n))
    tn = _pick_tile(n, m)
    with_mean = q_mu is not None
    a_spec = pl.BlockSpec((1, m, tn), lambda l, t: (l, 0, t),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((d, m, m), lambda l, t: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    qv_spec = pl.BlockSpec((1, d, tn), lambda l, t: (l, 0, t),
                           memory_space=pltpu.VMEM)
    ss_spec = pl.BlockSpec((1, 1, tn), lambda l, t: (l, 0, t),
                           memory_space=pltpu.VMEM)
    qv_shape = jax.ShapeDtypeStruct((L, d, n), jnp.float32)
    ss_shape = jax.ShapeDtypeStruct((L, 1, n), jnp.float32)
    if with_mean:
        kernel = functools.partial(_epi_kernel, d_out=d, cov=cov)
        in_specs = [a_spec, w_spec,
                    pl.BlockSpec((m, d), lambda l, t: (0, 0),
                                 memory_space=pltpu.VMEM)]
        out_specs = [qv_spec, ss_spec, qv_spec]
        out_shape = [qv_shape, ss_shape, qv_shape]
        args = (Ab, W, q_mu)
    else:
        kernel = functools.partial(_ps_kernel, d_out=d, cov=cov)
        in_specs = [a_spec, w_spec]
        out_specs = [qv_spec, ss_spec]
        out_shape = [qv_shape, ss_shape]
        args = (Ab, W)
    out = pl.pallas_call(
        kernel,
        grid=(L, n // tn),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * L * d * m * m * n + 4 * L * m * n
                      + (2 * L * m * n * d if with_mean else 0)),
            bytes_accessed=int(L * m * n * 4 + d * m * m * 4
                               + (1 + with_mean) * L * d * n * 4
                               + L * n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    qv, ss = out[0], out[1]
    ret = (qv.reshape(lead + (d, n)), ss.reshape(lead + (n,)))
    if with_mean:
        ret += (out[2].reshape(lead + (d, n)),)
    return ret


def _epi_xla_bwd(A, W, q_mu, cov, g):
    """Recompute backward of the fused epilogue in plain XLA ops (used by
    the inference-trace variant, where grad-through-prediction is rare).
    Mathematical gradients at f32; mean terms at HIGHEST like the kernel.
    """
    g_qv, g_ss, g_mn = g
    hp = jax.lax.Precision.HIGHEST
    dA_q, dW = _qvar_bwd(cov, False, (A, W), g_qv)
    dA = dA_q + 2.0 * A * g_ss[..., None, :]
    dA = dA + jnp.matmul(q_mu, g_mn, precision=hp)     # [M,D]x[*,D,N]
    dqmu = jnp.einsum("...mn,...dn->md", A, g_mn,
                      precision=hp)
    return dA, dW, dqmu


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def epi_fused(A: jax.Array, W: jax.Array, q_mu: jax.Array,
              cov: bool = False, interpret: bool = False):
    """(qvar [*, D, N], sumsq [*, N], mean [*, D, N]) in one fused pass.

    Inference-trace variant: backward recomputes through XLA (prediction
    paths are rarely differentiated; the point of this kernel is the
    forward's single read of A).
    """
    return _epi_call(A, W, q_mu, cov, interpret)


def _epi_fwd(A, W, q_mu, cov, interpret):
    return _epi_call(A, W, q_mu, cov, interpret), (A, W, q_mu)


def _epi_bwd(cov, interpret, res, g):
    A, W, q_mu = res
    return _epi_xla_bwd(A, W, q_mu, cov, g)


epi_fused.defvjp(_epi_fwd, _epi_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ps_fused(A: jax.Array, W: jax.Array, cov: bool = False,
             interpret: bool = False):
    """(qvar [*, D, N], sumsq [*, N]) in one fused pass — the mean-less
    epilogue subset (the mean stays a separate XLA dot). Inference-trace
    variant: backward recomputes through XLA."""
    return _epi_call(A, W, None, cov, interpret)


def _ps_fwd(A, W, cov, interpret):
    return _epi_call(A, W, None, cov, interpret), (A, W)


def _ps_bwd(cov, interpret, res, g):
    A, W = res
    g_qv, g_ss = g
    dA_q, dW = _qvar_bwd(cov, False, (A, W), g_qv)
    return dA_q + 2.0 * A * g_ss[..., None, :], dW


ps_fused.defvjp(_ps_fwd, _ps_bwd)


def _epi_bwd_kernel(a_ref, w_ref, qmu_ref, gq_ref, gs_ref, gm_ref,
                    da_ref, dw_ref, dqmu_ref, *, d_out: int, cov: bool):
    a32 = a_ref[0]                                   # [M, TN] f32
    a = a32.astype(jnp.bfloat16)
    hp = jax.lax.Precision.HIGHEST
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dqmu_ref[...] = jnp.zeros_like(dqmu_ref)

    gm = gm_ref[0]                                   # [D, TN] f32
    # prior sumsq term: d(sum A^2)/dA = 2A, cotangent g_ss
    da = 2.0 * a32 * gs_ref[0, 0, :][None, :]
    # mean terms at EPI_MEAN_PRECISION (matches/bounds the XLA class)
    da = da + _mean_dot(qmu_ref[...], gm)
    dqmu_ref[...] = dqmu_ref[...] + _mean_dot(a32, gm.T)
    for d in range(d_out):
        w = w_ref[d].astype(jnp.bfloat16)            # [M, M]
        gd = gq_ref[0, d, :][None, :]                # [1, TN] f32
        if cov:
            sa = jnp.dot(w, a, preferred_element_type=jnp.float32)
            ga = (a32 * gd).astype(jnp.bfloat16)
            da = da + gd * sa
            da = da + jnp.dot(w.T, ga, preferred_element_type=jnp.float32)
            dw_ref[d] = dw_ref[d] + jnp.dot(
                ga, a.T, preferred_element_type=jnp.float32)
        else:
            t = jnp.dot(w.T, a, preferred_element_type=jnp.float32)
            dt = (2.0 * gd * t).astype(jnp.bfloat16)
            da = da + jnp.dot(w, dt, preferred_element_type=jnp.float32)
            dw_ref[d] = dw_ref[d] + jnp.dot(
                a, dt.T, preferred_element_type=jnp.float32)
    da_ref[0] = da


def epi_bwd_fused(A, W, q_mu, g_qv, g_ss, g_mn, cov: bool,
                  interpret: bool = False):
    """Fused backward of the epilogue: (dA, dW, dq_mu) with the inner
    product recomputed tile-wise (qvar_bwd_fused) plus the mean and
    prior-variance cotangent terms folded into the same dA tile. dW and
    dq_mu accumulate across the grid in VMEM-resident blocks."""
    lead = A.shape[:-2]
    m, n = A.shape[-2:]
    d = W.shape[0]
    L = 1
    for s in lead:
        L *= s
    Ab = A.reshape((L, m, n))
    gqb = g_qv.reshape((L, d, n))
    gsb = g_ss.reshape((L, 1, n))
    gmb = g_mn.reshape((L, d, n))
    tn = _pick_tile(n, m)
    kernel = functools.partial(_epi_bwd_kernel, d_out=d, cov=cov)
    dA, dW, dqmu = pl.pallas_call(
        kernel,
        grid=(L, n // tn),
        in_specs=[
            pl.BlockSpec((1, m, tn), lambda l, t: (l, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m, m), lambda l, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tn), lambda l, t: (l, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda l, t: (l, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tn), lambda l, t: (l, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m, tn), lambda l, t: (l, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m, m), lambda l, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, m, n), jnp.float32),
            jax.ShapeDtypeStruct((d, m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(6 * L * d * m * m * n + 4 * L * m * n * d),
            bytes_accessed=int(2 * L * m * n * 4 + 2 * L * d * n * 4
                               + L * n * 4 + 2 * d * m * m * 4
                               + 2 * m * d * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(Ab, W, q_mu, gqb, gsb, gmb)
    return dA.reshape(A.shape), dW, dqmu


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def epi_fused_train(A: jax.Array, W: jax.Array, q_mu: jax.Array,
                    cov: bool = False, interpret: bool = False):
    """epi_fused with the fused Pallas backward — the training-objective
    entry point (ops/conditionals.py EPI_PALLAS policy)."""
    return _epi_call(A, W, q_mu, cov, interpret)


def _epi_train_fwd(A, W, q_mu, cov, interpret):
    return _epi_call(A, W, q_mu, cov, interpret), (A, W, q_mu)


def _epi_train_bwd(cov, interpret, res, g):
    A, W, q_mu = res
    g_qv, g_ss, g_mn = g
    return epi_bwd_fused(A, W, q_mu, g_qv, g_ss, g_mn, cov, interpret)


epi_fused_train.defvjp(_epi_train_fwd, _epi_train_bwd)


def _ps_bwd_kernel(a_ref, w_ref, gq_ref, gs_ref, da_ref, dw_ref, *,
                   d_out: int, cov: bool):
    a32 = a_ref[0]                                   # [M, TN] f32
    a = a32.astype(jnp.bfloat16)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    # prior sumsq term: d(sum A^2)/dA = 2A, cotangent g_ss — pure VPU
    da = 2.0 * a32 * gs_ref[0, 0, :][None, :]
    for d in range(d_out):
        w = w_ref[d].astype(jnp.bfloat16)            # [M, M]
        gd = gq_ref[0, d, :][None, :]                # [1, TN] f32
        if cov:
            sa = jnp.dot(w, a, preferred_element_type=jnp.float32)
            ga = (a32 * gd).astype(jnp.bfloat16)
            da = da + gd * sa
            da = da + jnp.dot(w.T, ga, preferred_element_type=jnp.float32)
            dw_ref[d] = dw_ref[d] + jnp.dot(
                ga, a.T, preferred_element_type=jnp.float32)
        else:
            t = jnp.dot(w.T, a, preferred_element_type=jnp.float32)
            dt = (2.0 * gd * t).astype(jnp.bfloat16)
            da = da + jnp.dot(w, dt, preferred_element_type=jnp.float32)
            dw_ref[d] = dw_ref[d] + jnp.dot(
                a, dt.T, preferred_element_type=jnp.float32)
    da_ref[0] = da


def ps_bwd_fused(A, W, g_qv, g_ss, cov: bool, interpret: bool = False):
    """Fused backward of the mean-less epilogue: (dA, dW) with the prior
    cotangent folded into the recompute-tile dA (qvar_bwd_fused + one VPU
    FMA per tile)."""
    lead = A.shape[:-2]
    m, n = A.shape[-2:]
    d = W.shape[0]
    L = 1
    for s in lead:
        L *= s
    Ab = A.reshape((L, m, n))
    gqb = g_qv.reshape((L, d, n))
    gsb = g_ss.reshape((L, 1, n))
    tn = _pick_tile(n, m)
    kernel = functools.partial(_ps_bwd_kernel, d_out=d, cov=cov)
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
            pl.BlockSpec((1, 1, tn), lambda l, t: (l, 0, t),
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
            flops=int(6 * L * d * m * m * n + 2 * L * m * n),
            bytes_accessed=int(2 * L * m * n * 4 + L * d * n * 4
                               + L * n * 4 + 2 * d * m * m * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(Ab, W, gqb, gsb)
    return dA.reshape(A.shape), dW


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ps_fused_train(A: jax.Array, W: jax.Array, cov: bool = False,
                   interpret: bool = False):
    """ps_fused with the fused Pallas backward — the training-objective
    entry point for the mean-less epilogue."""
    return _epi_call(A, W, None, cov, interpret)


def _ps_train_fwd(A, W, cov, interpret):
    return _epi_call(A, W, None, cov, interpret), (A, W)


def _ps_train_bwd(cov, interpret, res, g):
    A, W = res
    g_qv, g_ss = g
    return ps_bwd_fused(A, W, g_qv, g_ss, cov, interpret)


ps_fused_train.defvjp(_ps_train_fwd, _ps_train_bwd)
