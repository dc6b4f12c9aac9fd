#!/usr/bin/env python
"""A/B: fused Pallas q-variance kernel vs XLA path on the SERVING trace.

The prediction path has no ELBO backward, so the XLA q-variance's
[D, M, cols] HBM materialization (the training AD residual) is pure
traffic — 5.3 of 12.3 ms device time at the serving shape (hlo_stats).
ops/pallas/qvar.py keeps each tile in VMEM; QVAR_PALLAS='auto' enables it
exactly on prediction traces. This script measures the end-to-end scorer
both ways (pipelined, per docs/PERF.md methodology: in-process, compile
both first, discard rounds, medians).

Usage: python benchmarks/qvar_pallas_ab.py [--S 100] [--B 8192]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dgps_with_iwvi_tpu.models import (BuildArgs, build_model,
                                       predict_y_and_log_density)
from dgps_with_iwvi_tpu.ops import conditionals as C


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=100)
    ap.add_argument("--B", type=int, default=8192)
    ap.add_argument("--calls", type=int, default=24)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kx, (args.B, 8), jnp.float32)
    Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (args.B, 1),
                                                    jnp.float32)
    bargs = BuildArgs(configuration="LGG", mode="IW", num_inducing=128,
                      num_iw_samples=20)
    config, params = build_model(jax.random.PRNGKey(0), bargs,
                                 X[:2048], Y[:2048])

    def make(backend):
        C.QVAR_PALLAS = backend
        f = jax.jit(lambda xb, yb, k: predict_y_and_log_density(
            params, config, xb, yb, k, args.S))
        out = f(X, Y, ky)
        jax.device_get(out[1])
        return f

    fns = {"xla": make("off"), "pallas": make("auto")}
    results = {k: [] for k in fns}
    for rep in range(args.rounds + 1):  # first round = discard
        for name, fn in fns.items():
            t0 = time.perf_counter()
            outs = [fn(X, Y, jax.random.fold_in(ky, 1000 * rep + i))
                    for i in range(args.calls)]
            jax.device_get(outs[-1])
            t = time.perf_counter() - t0
            if rep:
                results[name].append(args.calls * args.B / t)
    # parity on the same key
    (m0, _), ld0 = fns["xla"](X, Y, jax.random.fold_in(ky, 7))
    (m1, _), ld1 = fns["pallas"](X, Y, jax.random.fold_in(ky, 7))
    dld = float(jnp.max(jnp.abs(ld0 - ld1)))
    r_x = float(np.median(results["xla"]))
    r_p = float(np.median(results["pallas"]))
    print(f"S={args.S} B={args.B} M=128 LGG")
    print(f"xla    : {r_x/1e3:8.1f}k points/s")
    print(f"pallas : {r_p/1e3:8.1f}k points/s  ({r_p/r_x:.2f}x)")
    print(f"max |d logdensity| same key: {dld:.2e}")


if __name__ == "__main__":
    main()
