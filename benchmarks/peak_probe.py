#!/usr/bin/env python
"""Measure this chip's ACTUAL HBM and MXU peaks (the roofline inputs).

Motivated by r5's solve-dot microbench: dots with honest HBM streaming
measured 1292 GB/s effective against the v5e spec sheet's 819 GB/s —
either the byte model lies or the "TPU v5 lite" tunnel chip has a higher
roof than the label implies. Two chained single-purpose loops settle it:

- HBM: x = x * c + d over an 84 MB f32 array (read + write = 168 MB per
  iteration, zero reuse, trivially fused VPU math).
- MXU: [4096, 4096] @ [4096, 4096] bf16-operand dot at DEFAULT
  precision, output accumulated (137 GFLOP per iteration, operands
  VMEM-cacheable? no — 64 MB bf16 total, streams but compute-bound at
  AI ~ 1000).

Same two-point iteration fit as solve_dot_sol.py (cancels the ~25 ms
tunnel fixed latency); the chain carries a data dependency so nothing
folds.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def two_point(make_chain, rounds=5, n_lo=20, n_hi=100):
    def run(iters):
        fn, args = make_chain(iters)
        float(fn(*args))
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    return (run(n_hi) - run(n_lo)) / (n_hi - n_lo)


def hbm_probe():
    # the working set must DWARF the 128 MB VMEM: an 84 MB array measured
    # 4-6 TB/s here — XLA's memory-space assignment had parked it on-chip
    # and the "HBM" probe was reading VMEM (the same mechanism behind the
    # S(1) copy-done rows in the roofline). 512 MB cannot be cached.
    n = 128 * 1024 * 1024  # 512 MB f32
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9

    def make(iters):
        @jax.jit
        def chain(x):
            def body(i, x):
                return x * 0.999999 + 1e-12 * (i + 1)
            return jax.lax.fori_loop(0, iters, body, x)[0]
        return chain, (x,)

    dt = two_point(make, n_lo=20, n_hi=120)
    gbs = 2 * n * 4 / dt / 1e9
    print(f"HBM copy chain: {dt * 1e6:.1f} us/iter over 1 GB "
          f"-> {gbs:.0f} GB/s", flush=True)
    return gbs


def mxu_probe():
    m = 4096
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    A = jax.random.normal(kx, (m, m), jnp.float32) * 1e-3
    B = jax.random.normal(ky, (m, m), jnp.float32) * 1e-3

    def make(iters):
        @jax.jit
        def chain(A, B):
            def body(_, A):
                out = jnp.matmul(A, B,
                                 precision=jax.lax.Precision.DEFAULT)
                return A + 1e-30 * out
            return jax.lax.fori_loop(0, iters, body, A)[0, 0]
        return chain, (A, B)

    dt = two_point(make)
    tfs = 2 * m ** 3 / dt / 1e12
    print(f"MXU dot chain: {dt * 1e6:.1f} us/iter at [4096]^3 "
          f"-> {tfs:.0f} TF/s (bf16 DEFAULT)", flush=True)
    return tfs


def mxu_probe_bf16():
    m = 4096
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    A = (jax.random.normal(kx, (m, m), jnp.float32) * 1e-3).astype(
        jnp.bfloat16)
    B = (jax.random.normal(ky, (m, m), jnp.float32) * 1e-3).astype(
        jnp.bfloat16)

    def make(iters):
        @jax.jit
        def chain(A, B):
            def body(_, A):
                out = jnp.matmul(A, B,
                                 preferred_element_type=jnp.float32)
                return A + (1e-8 * out[:m]).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, A)[0, 0].astype(
                jnp.float32)
        return chain, (A, B)

    dt = two_point(make)
    tfs = 2 * m ** 3 / dt / 1e12
    print(f"MXU bf16-operand chain: {dt * 1e6:.1f} us/iter at [4096]^3 "
          f"-> {tfs:.0f} TF/s", flush=True)
    return tfs


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    hbm_probe()
    mxu_probe()
    mxu_probe_bf16()
