#!/usr/bin/env python
"""Serving/inference benchmark: mixture-predictive throughput on the
flagship model (LGG, M=128, amortized encoder), S=100 prior samples —
the reference's evaluation protocol (SURVEY.md §3.3) run as a production
scorer.

Measures, per batch size:
- predict_y_and_log_density (moments + density, one propagate) points/s
- single-batch latency (ms)

Protocol: compile first, two discard rounds, median of 7.
"""

from __future__ import annotations

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


def main(S=100, rounds=7):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    N, D = 7372, 8
    X = jax.random.normal(kx, (N, D), jnp.float32)
    Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (N, 1), jnp.float32)
    args = BuildArgs(configuration="LGG", mode="IW", num_inducing=128,
                     num_iw_samples=20)
    config, params = build_model(jax.random.PRNGKey(0), args, X, Y)

    @jax.jit
    def score(xb, yb, k):
        return predict_y_and_log_density(params, config, xb, yb, k, S)

    lines = ["| batch | blocking ms/call | points/s blocking | points/s "
             "pipelined (8 in flight) |", "|---|---|---|---|"]
    print(lines[0]); print(lines[1])
    for B in (128, 512, 2048, 8192):
        xb = jnp.tile(X, (max(1, B // N + 1), 1))[:B]
        yb = jnp.tile(Y, (max(1, B // N + 1), 1))[:B]
        for w in range(3):  # compile + discard
            (m, v), ld = score(xb, yb, jax.random.fold_in(ky, w))
            jax.block_until_ready(ld)
        ts = []
        for r in range(rounds):
            t0 = time.perf_counter()
            (m, v), ld = score(xb, yb, jax.random.fold_in(ky, 100 + r))
            jax.block_until_ready(ld)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        # pipelined: JAX dispatch is async — keep 8 calls in flight so the
        # host<->device round trip (~30 ms through the axon tunnel; absent
        # with a local PJRT client) overlaps with device compute.
        depth = 8
        pts = []
        for r in range(3):
            t0 = time.perf_counter()
            outs = [score(xb, yb, jax.random.fold_in(ky, 200 + r * depth + i))
                    for i in range(depth)]
            jax.block_until_ready(outs[-1][1])
            pts.append(depth * B / (time.perf_counter() - t0))
        row = (f"| {B} | {ms:.2f} | {B / ms * 1e3:,.0f} | "
               f"{float(np.median(pts)):,.0f} |")
        lines.append(row)
        print(row, flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SERVING.md")
    with open(out, "w") as f:
        f.write("# Serving throughput (predict_y_and_log_density scorer)\n\n"
                "Flagship LGG IWVI model, S=100 mixture predictive, one "
                "v5e chip through the tunneled PJRT client (the ~30 ms "
                "per-call round trip is tunnel latency, absent with a "
                "local client; pipelining keeps 8 calls in flight). "
                "Multi-chip serving shards rows via serve.py --shard "
                "(GSPMD; outputs bit-identical to single device).\n\n"
                + "\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
