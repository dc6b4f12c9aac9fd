#!/usr/bin/env python
"""Isolated speed-of-light microbench for the solve-path dot.

Both rooflines (docs/ROOFLINE_B512.md, docs/ROOFLINE_B8192.md) flag the
A = Linv @ Kuf forward dots at 1.66-1.78x the byte model's attainable
time (~460-490 GB/s effective vs the HBM roof). One hypothesis said the
headroom was a byte-model artifact of solve_precision='high' (bf16x3
re-streams operands for 3 MXU passes). This benchmark times the SAME dot
shape in isolation at every precision class: if the isolated HIGH dot
also runs at ~490 GB/s the in-step dots are at their true roofline;
if it runs at the HBM roof, the headroom is real.

Measurement notes (hard-won, see docs/PERF.md methodology):
- per-dispatch timing is meaningless under the axon tunnel
  (block_until_ready returns at enqueue) AND each jit call carries
  ~25 ms fixed dispatch+fetch latency — a single fori_loop chains the
  dots on device and a TWO-POINT iteration fit (t_hi - t_lo)/(n_hi -
  n_lo) cancels the fixed cost exactly.
- the chain must consume EVERY output element: a sliced dependency
  (out[:, :128]) gets pushed INTO the dot by XLA's slice-of-dot
  optimization and silently shrinks the measured matmul. Here the full
  out accumulates into a carried [m, cols] buffer (also matching the
  real step, which writes A to HBM), and L is perturbed by a scalar so
  the matmul is not loop-invariant.
- byte model: 3 streaming passes (read K, read acc, write acc); L and
  out stay in VMEM.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _chain(iters, prec, K):
    @jax.jit
    def chain(L, acc):
        def body(_, carry):
            L, acc = carry
            out = jnp.matmul(L, K, precision=prec)
            acc = acc + out
            # scalar perturbation: blocks loop-invariant hoisting; the
            # [m, 1] slice is free and the full dot is already forced
            # by the acc consumer
            L = L + 1e-30 * jnp.sum(jnp.abs(out[:, :1]))
            return (L, acc)
        L, acc = jax.lax.fori_loop(0, iters, body, (L, acc))
        return L[0, 0] + acc[0, 0]
    return chain


def time_dot(m, cols, precision, rounds=5):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    L = jax.random.normal(kx, (m, m), jnp.float32)
    K = jax.random.normal(ky, (m, cols), jnp.float32) * 1e-3
    acc = jnp.zeros((m, cols), jnp.float32)

    def run(iters):
        fn = _chain(iters, precision, K)
        float(fn(L, acc))  # compile + warm
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            float(fn(L, acc))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # scale the iteration span so the fitted delta dwarfs tunnel jitter:
    # at the flagship shape (~25 us/dot) a 200-iter span is only 5 ms
    # against ~25 ms dispatch noise and the fit went NEGATIVE (r5 run);
    # target >= ~100 ms of fitted device time.
    span = max(200, int(4_000_000 / max(cols, 1)))
    n_lo, n_hi = 50, 50 + span
    dt = (run(n_hi) - run(n_lo)) / (n_hi - n_lo)
    nbytes = 3 * (m * cols * 4)  # read K + read acc + write acc
    return dt * 1e6, nbytes / dt / 1e9


def main():
    print(f"devices: {jax.devices()}")
    P = jax.lax.Precision
    # [M, K*B] for the flagship (B=512, K=20) and throughput (B=8192) steps
    shapes = [(128, 20 * 512), (128, 20 * 8192)]
    print("| m | cols | precision | us/dot | GB/s (3-pass model) |")
    print("|---|---|---|---|---|")
    for m, cols in shapes:
        for name, prec in [("DEFAULT(bf16x1)", P.DEFAULT),
                           ("HIGH(bf16x3)", P.HIGH),
                           ("HIGHEST(f32)", P.HIGHEST)]:
            us, gbs = time_dot(m, cols, prec)
            print(f"| {m} | {cols} | {name} | {us:.1f} | {gbs:.0f} |",
                  flush=True)


if __name__ == "__main__":
    main()
