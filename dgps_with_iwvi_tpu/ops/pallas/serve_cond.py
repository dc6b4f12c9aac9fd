"""Fused INFERENCE conditional: gram -> whitened conditional -> sample,
one VMEM pass, nothing layer-sized materialized to HBM.

Why a separate kernel from ops/pallas/conditional.py: that kernel was
built for TRAINING — it writes its (Kxz, A) tensors to HBM because the
backward pass needs them, and it runs every dot at Precision.HIGHEST
because Mosaic's dot lowering has no HIGH. On a prediction trace both
choices are pure waste: there is no backward, and the production
precision policy (docs/PERF.md) only requires the HIGH (bf16x3) class
for the gram/solve/mean dots — which this kernel implements MANUALLY by
operand splitting (hi = bf16(x), lo = bf16(x - hi), three DEFAULT-pass
dots dropping the lo*lo term — the same decomposition XLA's
Precision.HIGH executes on the MXU).

Per [TB, Dp] tile of the flattened sample-batch axis:

    d2    = |xs|^2 - 2 xs zs^T + |zs|^2      (bf16x3 cross term)
    kxz   = var * exp(-1/2 d2)
    a     = kxz Linv^T                       (bf16x3 — the quality floor:
                                              1-pass corrupts the
                                              kff - sum(a^2) cancellation,
                                              QUALITY_GATE_solvedef.md)
    mean  = a q_mu                           (bf16x3)
    var   = var - rowsum(a^2) + rowsum((Lq_d^T a)^2)   (q-var at DEFAULT,
                                              the gated production class)
    out   = mean + sqrt(var) * eps           (eps supplied by the caller —
                                              ordinary threefry noise, so
                                              the serving RNG convention
                                              matches the XLA path's)

At the serving shape (S=100, B=8192, M=128, LGG) the XLA path spends
~5.5 of 8 ms/call writing A-sized [M, S*B] tensors and reading them back
3-4 times; here they never leave VMEM. RBF + whitened + root-form only —
other configurations fall back to the XLA path (ops/conditionals.py).

Measured + parity-tested: benchmarks/serve_fused_ab.py,
tests/test_serve_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# 2048 OOMs scoped VMEM (17.6M > 16M: the bf16 split copies of the
# [TB, M]-sized gram/A stages are all live at once); 1024 fits
TILE_N = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(x, y):
    """Precision.HIGH-equivalent matmul: bf16x3 with f32 MXU accumulation."""
    xh, xl = _split(x)
    yh, yl = _split(y)
    f = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return f(xh, yh) + f(xh, yl) + f(xl, yh)


def _infer_kernel(var_ref, xs_ref, zs_ref, linvt_ref, qmu_ref, lq_ref,
                  eps_ref, mean_ref, varo_ref, samp_ref, *, n_out: int,
                  sample: bool):
    var = var_ref[0, 0]
    xs = xs_ref[...]                                   # [TB, Dp]
    zs = zs_ref[...]                                   # [M, Dp]
    xx = jnp.sum(xs * xs, axis=1, keepdims=True)
    zz = jnp.sum(zs * zs, axis=1, keepdims=True).T
    d2 = jnp.maximum(xx - 2.0 * _dot3(xs, zs.T) + zz, 0.0)
    kxz = var * jnp.exp(-0.5 * d2)                     # [TB, M]
    a = _dot3(kxz, linvt_ref[...])                     # [TB, M]
    mean = _dot3(a, qmu_ref[...])                      # [TB, D]
    varp = var - jnp.sum(a * a, axis=1, keepdims=True)
    # q-variance at the gated DEFAULT class: bf16 operands, f32 accumulate
    ab = a.astype(jnp.bfloat16)
    m = a.shape[1]
    cols = []
    for d in range(n_out):
        lqd = lq_ref[pl.ds(d * m, m), :].astype(jnp.bfloat16)   # [M, M]
        t = jnp.dot(ab, lqd, preferred_element_type=jnp.float32)
        cols.append(jnp.sum(t * t, axis=1, keepdims=True))
    varo = jnp.maximum(varp, 0.0) + jnp.concatenate(cols, axis=1)
    mean_ref[...] = mean
    varo_ref[...] = varo
    if sample:
        samp_ref[...] = mean + jnp.sqrt(jnp.maximum(varo, 1e-12)) \
            * eps_ref[...]


@functools.partial(jax.jit,
                   static_argnames=("sample", "interpret", "tile_n"))
def fused_conditional_infer(xs, zs, var, linv, q_mu, lq, eps=None, *,
                            sample: bool = True, interpret: bool = False,
                            tile_n: int = TILE_N):
    """(sample, mean, var) — or (mean, var) when sample=False — for the
    whitened RBF conditional, computed tile-by-tile in VMEM.

    xs [N, d_in] and zs [M, d_in] must be PRE-SCALED by the ARD
    lengthscales (the existing fused-kernel convention); `var` is the
    kernel variance scalar, linv the [M, M] triangular inverse of
    chol(Kuu), q_mu [M, D], lq [D, M, M] lower-triangular, eps [N, D]
    standard normal noise (required when sample=True).

    NOT differentiable — inference only (training keeps the XLA path and
    its residual-based backward).
    """
    n, d_in = xs.shape
    m = zs.shape[0]
    d_out = q_mu.shape[1]
    dp = _round_up(max(d_in, 1), LANE)
    n_pad = _round_up(max(n, 1), tile_n)
    f32 = jnp.float32

    xs_p = jnp.zeros((n_pad, dp), f32).at[:n, :d_in].set(xs.astype(f32))
    zs_p = jnp.zeros((m, dp), f32).at[:, :d_in].set(zs.astype(f32))
    var_arr = jnp.reshape(var.astype(f32), (1, 1))
    if sample:
        eps_p = jnp.zeros((n_pad, d_out), f32).at[:n].set(eps.astype(f32))
    else:
        eps_p = jnp.zeros((n_pad, d_out), f32)
    lq_flat = jnp.tril(lq).astype(f32).reshape(d_out * m, m)
    linvt = jnp.swapaxes(linv, -1, -2).astype(f32)

    grid = (n_pad // tile_n,)
    tile_spec = lambda w: pl.BlockSpec((tile_n, w), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    mean, varo, samp = pl.pallas_call(
        functools.partial(_infer_kernel, n_out=d_out, sample=sample),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            tile_spec(dp),
            full((m, dp)),
            full((m, m)),
            full((m, d_out)),
            full((d_out * m, m)),
            tile_spec(d_out),
        ],
        out_specs=(tile_spec(d_out), tile_spec(d_out), tile_spec(d_out)),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d_out), f32),
            jax.ShapeDtypeStruct((n_pad, d_out), f32),
            jax.ShapeDtypeStruct((n_pad, d_out), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n_pad * m * (3 * dp + 3 * m + 3 * d_out
                                       + d_out * m)),
            bytes_accessed=int(n_pad * (dp + 3 * d_out) * 4),
            transcendentals=int(n_pad * m),
        ),
        interpret=interpret,
    )(var_arr, xs_p, zs_p, linvt, q_mu.astype(f32), lq_flat, eps_p)
    if sample:
        return samp[:n], mean[:n], varo[:n]
    return mean[:n], varo[:n]
