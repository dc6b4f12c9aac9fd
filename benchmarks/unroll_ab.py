#!/usr/bin/env python
"""In-process A/B: lax.scan unroll factor for the train chunk (flagship
config, production var_precision). Targets the measured ~24 us/step of
while-loop bookkeeping self-time in the xprof breakdown.
"""

from __future__ import annotations

import dataclasses
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

from dgps_with_iwvi_tpu.models import BuildArgs, build_model
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer


def main(M=128, B=512, K=20, steps_per_call=500, rounds=7):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    N, D = 7372, 8
    X = jax.random.normal(kx, (N, D), jnp.float32)
    Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (N, 1), jnp.float32)
    args = BuildArgs(configuration="LGG", mode="IW", num_inducing=M,
                     num_iw_samples=K)
    config, params = build_model(jax.random.PRNGKey(0), args, X, Y)
    variants = (1, 2, 4)
    fs = {}
    for u in variants:
        tc = TrainConfig(lr=5e-3, gamma=1e-2, natgrad="final",
                         minibatch_size=B, steps_per_call=steps_per_call,
                         scan_unroll=u)
        init_fn, _, chunk_fn, _ = make_trainer(config, tc)
        f, s = jax.jit(chunk_fn), init_fn(params)
        key = jax.random.PRNGKey(1)
        for w in range(2):
            s2, l = f(s, X, Y, jax.random.fold_in(key, 90 + w))
            jax.block_until_ready(l)
        fs[u] = (f, s)
    key = jax.random.PRNGKey(1)
    res = {u: [] for u in variants}
    for r in range(rounds):
        for u, (f, s) in fs.items():
            t0 = time.perf_counter()
            s2, l = f(s, X, Y, jax.random.fold_in(key, r))
            jax.block_until_ready(l)
            res[u].append((time.perf_counter() - t0) / steps_per_call * 1e3)
    print("| unroll | ms/step | steps/s |")
    print("|---|---|---|")
    for u in variants:
        ms = float(np.median(res[u]))
        print(f"| {u} | {ms:.3f} | {1e3 / ms:.0f} |", flush=True)


if __name__ == "__main__":
    main()
