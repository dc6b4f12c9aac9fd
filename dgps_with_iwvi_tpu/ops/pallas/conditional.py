"""Fused Pallas TPU kernel for the whitened sparse-variational conditional.

The BASELINE.json north star: "RBF gram construction (Kuu, Kuf),
jitter-stabilized Cholesky, whitened sparse-variational conditionals, and
reparameterized layer-wise sampling all run as fused Pallas kernels over
batched [K, N, M] tensors". This kernel fuses, per tile of the flattened
K*S*B sample-batch axis:

    d2    = |xs|^2 - 2 xs zs^T + |zs|^2          (MXU cross-term)
    Kxz   = var * exp(-1/2 d2)                   (VPU, fused in VMEM)
    A     = Kxz Linv^T                           (MXU; Linv = Lm^-1 replaces
                                                  the sequential triangular
                                                  solve with a pure matmul)
    mean  = A q_mu                               (MXU)
    varp  = var - rowsum(A^2)                    (VPU)
    varq_d= rowsum((A Lq_d)^2)   for each d      (MXU + VPU)
    var   = varp + varq

so Kuf and A never round-trip through HBM. The backward pass is a manual
VJP in plain XLA ops (matmul-dominated, which XLA already schedules well)
using (Kxz, A) residuals written by the forward kernel.

Inputs are pre-scaled by the ARD lengthscales OUTSIDE the kernel so that
lengthscale/variance gradients flow through ordinary autodiff around the
custom_vjp boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flatten_lq(lq):
    """[D, M, M] lower-tri blocks -> [M, D*M] concatenated along lanes."""
    d, m, _ = lq.shape
    return jnp.moveaxis(jnp.tril(lq).astype(jnp.float32), 0, 1).reshape(
        m, d * m)


def _fused_kernel(var_ref, xs_ref, zs_ref, linv_ref, qmu_ref, lq_ref,
                  mean_ref, varo_ref, kxz_ref, a_ref, *, n_out: int,
                  d_in: int):
    """One [TB, Dp] tile of samples against all M inducing points."""
    var = var_ref[0, 0]
    xs = xs_ref[...]                      # [TB, Dp]
    zs = zs_ref[...]                      # [M, Dp]
    # MXU gram even for small d_in: lane-sliced VPU accumulation measured
    # SLOWER than the lane-padded dot (strided lane extracts serialize)
    del d_in
    xx = jnp.sum(xs * xs, axis=1, keepdims=True)          # [TB, 1]
    zz = jnp.sum(zs * zs, axis=1, keepdims=True).T        # [1, M]
    cross = jnp.dot(xs, zs.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(xx - 2.0 * cross + zz, 0.0)
    kxz = var * jnp.exp(-0.5 * d2)                        # [TB, M]
    a = jnp.dot(kxz, linv_ref[...].T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # [TB, M]
    kxz_ref[...] = kxz
    a_ref[...] = a
    mean_ref[...] = jnp.dot(a, qmu_ref[...],
                            preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [TB, D]
    varp = var - jnp.sum(a * a, axis=1, keepdims=True)    # [TB, 1]
    # ONE wide MXU dot against the [M, D*M] concatenated q_sqrt blocks
    # (lq_ref arrives pre-flattened), then 128-aligned lane-block reduces —
    # beats D separate [TB,M]x[M,M] dots (per-dot overhead dominates at
    # small M).
    m = a.shape[1]
    # NOTE: the XLA path runs this variance dot at Precision.HIGH (bf16x3,
    # ops/conditionals.py var_precision default) but Mosaic's dot lowering
    # supports only DEFAULT/HIGHEST — a structural handicap for the fused
    # kernel recorded in docs/PALLAS_SWEEP.md.
    ball = jnp.dot(a, lq_ref[...], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)   # [TB, D*M]
    sq = ball * ball
    cols = [jnp.sum(sq[:, d * m:(d + 1) * m], axis=1, keepdims=True)
            for d in range(n_out)]
    varo_ref[...] = varp + jnp.concatenate(cols, axis=1)


def _sample_kernel(var_ref, seed_ref, xs_ref, zs_ref, linv_ref, qmu_ref,
                   lq_ref, mean_ref, varo_ref, samp_ref, kxz_ref, a_ref,
                   *, n_out: int, d_in: int):
    """Conditional + reparameterized sample in one VMEM pass.

    eps comes from the on-core PRNG (pltpu.prng_random_bits -> Box-Muller),
    seeded per (user seed, grid tile) so tiles draw independent noise —
    this is the "reparameterized layer-wise sampling" stage of the fused
    pipeline. The noise stream differs from jax.random.normal by design
    (documented); moments match.
    """
    _fused_kernel(var_ref, xs_ref, zs_ref, linv_ref, qmu_ref, lq_ref,
                  mean_ref, varo_ref, kxz_ref, a_ref, n_out=n_out, d_in=d_in)
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    shape = mean_ref.shape
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uniforms in (0, 1]: top 24 bits; uint32->f32 is unsupported in Mosaic,
    # so hop through int32 (values < 2^24 are exactly representable)
    u1 = (b1 >> 8).astype(jnp.int32).astype(jnp.float32) \
        * (1.0 / 16777216.0) + 1e-12
    u2 = (b2 >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
    eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    samp_ref[...] = mean_ref[...] + jnp.sqrt(
        jnp.maximum(varo_ref[...], 0.0)) * eps


def _fused_forward(xs, zs, var, linv, q_mu, lq, *, tile_n: int = 512,
                   interpret: bool = False):
    """Pads + launches the kernel. Returns (mean, var, kxz, a) residuals."""
    n, d_in = xs.shape
    m = zs.shape[0]
    d_out = q_mu.shape[1]
    dp = _round_up(max(d_in, 1), LANE)
    n_pad = _round_up(max(n, 1), tile_n)
    f32 = jnp.float32

    xs_p = jnp.zeros((n_pad, dp), f32).at[:n, :d_in].set(xs.astype(f32))
    zs_p = jnp.zeros((m, dp), f32).at[:, :d_in].set(zs.astype(f32))
    var_arr = jnp.reshape(var.astype(f32), (1, 1))

    grid = (n_pad // tile_n,)
    out_shape = (
        jax.ShapeDtypeStruct((n_pad, d_out), f32),   # mean
        jax.ShapeDtypeStruct((n_pad, d_out), f32),   # var
        jax.ShapeDtypeStruct((n_pad, m), f32),       # kxz residual
        jax.ShapeDtypeStruct((n_pad, m), f32),       # a residual
    )
    tile_spec = lambda w: pl.BlockSpec((tile_n, w), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    mean, varo, kxz, a = pl.pallas_call(
        functools.partial(_fused_kernel, n_out=d_out, d_in=d_in),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            tile_spec(dp),
            full((m, dp)),
            full((m, m)),
            full((m, d_out)),
            full((m, d_out * m)),
        ],
        out_specs=(tile_spec(d_out), tile_spec(d_out),
                   tile_spec(m), tile_spec(m)),
        out_shape=out_shape,
        interpret=interpret,
    )(var_arr, xs_p, zs_p, linv.astype(f32), q_mu.astype(f32),
      _flatten_lq(lq))
    return mean[:n], varo[:n], kxz[:n], a[:n]


def _fused_sample_forward(xs, zs, var, linv, q_mu, lq, seed, *,
                          tile_n: int = 512, interpret: bool = False):
    n, d_in = xs.shape
    m = zs.shape[0]
    d_out = q_mu.shape[1]
    dp = _round_up(max(d_in, 1), LANE)
    n_pad = _round_up(max(n, 1), tile_n)
    f32 = jnp.float32

    xs_p = jnp.zeros((n_pad, dp), f32).at[:n, :d_in].set(xs.astype(f32))
    zs_p = jnp.zeros((m, dp), f32).at[:, :d_in].set(zs.astype(f32))
    var_arr = jnp.reshape(var.astype(f32), (1, 1))
    seed_arr = jnp.reshape(seed.astype(jnp.int32), (1, 1))

    grid = (n_pad // tile_n,)
    out_shape = (
        jax.ShapeDtypeStruct((n_pad, d_out), f32),   # mean
        jax.ShapeDtypeStruct((n_pad, d_out), f32),   # var
        jax.ShapeDtypeStruct((n_pad, d_out), f32),   # sample
        jax.ShapeDtypeStruct((n_pad, m), f32),       # kxz residual
        jax.ShapeDtypeStruct((n_pad, m), f32),       # a residual
    )
    tile_spec = lambda w: pl.BlockSpec((tile_n, w), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    mean, varo, samp, kxz, a = pl.pallas_call(
        functools.partial(_sample_kernel, n_out=d_out, d_in=d_in),
        grid=grid,
        in_specs=[smem, smem, tile_spec(dp), full((m, dp)), full((m, m)),
                  full((m, d_out)), full((m, d_out * m))],
        out_specs=(tile_spec(d_out), tile_spec(d_out), tile_spec(d_out),
                   tile_spec(m), tile_spec(m)),
        out_shape=out_shape,
        interpret=interpret,
    )(var_arr, seed_arr, xs_p, zs_p, linv.astype(f32), q_mu.astype(f32),
      _flatten_lq(lq))
    return mean[:n], varo[:n], samp[:n], kxz[:n], a[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_conditional_sample(xs, zs, var, linv, q_mu, lq, seed,
                             interpret=False):
    """Fused conditional + reparameterized sample: the full BASELINE.json
    pipeline stage (gram -> whitened conditional -> sample) in one kernel.

    Returns (sample, mean, var), each [N, D]. `seed` is an int32 scalar;
    the TPU on-core PRNG stream is deterministic per (seed, tile) but
    distinct from jax.random.normal's threefry stream.
    """
    mean, varo, samp, _, _ = _fused_sample_forward(xs, zs, var, linv, q_mu,
                                                   lq, seed,
                                                   interpret=interpret)
    return samp, mean, varo


def _sample_fwd(xs, zs, var, linv, q_mu, lq, seed, interpret):
    mean, varo, samp, kxz, a = _fused_sample_forward(
        xs, zs, var, linv, q_mu, lq, seed, interpret=interpret)
    return (samp, mean, varo), (xs, zs, var, linv, q_mu, lq, kxz, a,
                                mean, varo, samp)


def _sample_bwd(interpret, res, cotangents):
    xs, zs, var, linv, q_mu, lq, kxz, a, mean, varo, samp = res
    g_samp, g_mean, g_var = cotangents
    # sample = mean + sqrt(max(var, 0)) * eps with eps fixed by the PRNG:
    # recover eps from the saved primals instead of replaying the stream.
    sd = jnp.sqrt(jnp.maximum(varo, 0.0))
    eps = jnp.where(sd > 0, (samp - mean) / jnp.maximum(sd, 1e-30), 0.0)
    g_mean = g_mean + g_samp
    g_var = g_var + jnp.where(sd > 0, g_samp * eps / (2.0 * jnp.maximum(sd, 1e-30)), 0.0)
    grads = _bwd(interpret, (xs, zs, var, linv, q_mu, lq, kxz, a),
                 (g_mean, g_var))
    return grads + (None,)  # no gradient for seed


fused_conditional_sample.defvjp(_sample_fwd, _sample_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_conditional(xs, zs, var, linv, q_mu, lq, interpret=False):
    """Whitened marginal conditional, fused on TPU.

    xs: [N, D_in] lengthscale-scaled inputs; zs: [M, D_in] scaled inducing;
    var: [] kernel variance; linv: [M, M] = Lm^-1; q_mu: [M, D];
    lq: [D, M, M] lower-triangular. Returns (mean [N, D], var [N, D]).

    Semantics == ops.conditionals.base_conditional_whitened with
    A = Linv Kuf (tested to parity).
    """
    mean, varo, _, _ = _fused_forward(xs, zs, var, linv, q_mu, lq,
                                      interpret=interpret)
    return mean, varo


def _fwd(xs, zs, var, linv, q_mu, lq, interpret):
    mean, varo, kxz, a = _fused_forward(xs, zs, var, linv, q_mu, lq,
                                        interpret=interpret)
    return (mean, varo), (xs, zs, var, linv, q_mu, lq, kxz, a)


def _bwd(interpret, res, cotangents):
    xs, zs, var, linv, q_mu, lq, kxz, a = res
    g_mean, g_var = cotangents
    f32 = jnp.float32
    xs, zs = xs.astype(f32), zs.astype(f32)
    lq_t = jnp.tril(lq).astype(f32)
    d_out = q_mu.shape[1]

    hp = jax.lax.Precision.HIGHEST
    mm = lambda a_, b_: jnp.matmul(a_, b_, precision=hp)
    gv_sum = jnp.sum(g_var, axis=1, keepdims=True)            # [N, 1]
    d_qmu = mm(a.T, g_mean)                                   # [M, D]
    dA = mm(g_mean, q_mu.astype(f32).T) - 2.0 * a * gv_sum    # [N, M]
    d_lq = []
    for d in range(d_out):
        bd = mm(a, lq_t[d])                                   # [N, M]
        wbd = 2.0 * bd * g_var[:, d:d + 1]
        d_lq.append(jnp.tril(mm(a.T, wbd)))
        dA = dA + mm(wbd, lq_t[d].T)
    d_lq = jnp.stack(d_lq, axis=0)                            # [D, M, M]
    d_linv = mm(dA.T, kxz)                                    # [M, M]
    d_kxz = mm(dA, linv.astype(f32))                          # [N, M]
    # var: through kxz = var * E and through varp's + var
    d_var = (jnp.sum(d_kxz * kxz) / var + jnp.sum(gv_sum)).astype(f32)
    d_d2 = -0.5 * kxz * d_kxz                                 # [N, M]
    row = jnp.sum(d_d2, axis=1, keepdims=True)                # [N, 1]
    col = jnp.sum(d_d2, axis=0, keepdims=True)                # [1, M]
    d_xs = 2.0 * xs * row - 2.0 * mm(d_d2, zs)
    d_zs = 2.0 * zs * col.T - 2.0 * mm(d_d2.T, xs)
    return (d_xs.astype(xs.dtype), d_zs.astype(zs.dtype),
            jnp.reshape(d_var, jnp.shape(var)), d_linv, d_qmu, d_lq)


fused_conditional.defvjp(_fwd, _bwd)
