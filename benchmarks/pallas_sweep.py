#!/usr/bin/env python
"""Shape sweep: fused Pallas conditional vs XLA fusion, at the train-step
level (VERDICT r1 item 1 'make it win or prove it can't').

In-process A/B per the verified methodology: compile everything first, two
discard rounds, then alternate pallas/XLA measurements and report medians.
Run on the real TPU; writes a markdown table to stdout (paste into
docs/PALLAS_SWEEP.md).
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


def measure(M: int, B: int, K: int = 20, steps_per_call: int = 100,
            rounds: int = 5):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    N, D = 7372, 8
    X = jax.random.normal(kx, (N, D), jnp.float32)
    Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (N, 1), jnp.float32)
    args = BuildArgs(configuration="LGG", mode="IW", num_inducing=M,
                     num_iw_samples=K)
    config, params = build_model(jax.random.PRNGKey(0), args, X, Y)
    tc = TrainConfig(lr=5e-3, gamma=1e-2, natgrad="final",
                     minibatch_size=B, steps_per_call=steps_per_call)
    fs = {}
    for name, up in (("xla", False), ("pallas", True)):
        cfg = dataclasses.replace(config, use_pallas=up)
        init_fn, _, chunk_fn, _ = make_trainer(cfg, tc)
        fs[name] = (jax.jit(chunk_fn), init_fn(params))
    key = jax.random.PRNGKey(1)
    for name, (f, s) in fs.items():  # compile + 2 discard rounds
        for w in range(2):
            s2, l = f(s, X, Y, jax.random.fold_in(key, 90 + w))
            jax.block_until_ready(l)
    res = {n: [] for n in fs}
    for r in range(rounds):
        for name, (f, s) in fs.items():
            t0 = time.perf_counter()
            s2, l = f(s, X, Y, jax.random.fold_in(key, r))
            jax.block_until_ready(l)
            res[name].append((time.perf_counter() - t0) / steps_per_call * 1e3)
    return {n: float(np.median(v)) for n, v in res.items()}


def main():
    print("| M | B | K | XLA ms/step | Pallas ms/step | pallas/xla |")
    print("|---|---|---|---|---|---|")
    for M in (128, 256, 512):
        for B in (512, 2048):
            r = measure(M, B)
            ratio = r["pallas"] / r["xla"]
            print(f"| {M} | {B} | 20 | {r['xla']:.3f} | {r['pallas']:.3f} "
                  f"| {ratio:.2f} |", flush=True)


if __name__ == "__main__":
    main()
