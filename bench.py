#!/usr/bin/env python
"""Headline benchmark: ELBO training steps/sec on the flagship config.

Config (BASELINE.md north star): 2-layer latent-variable DGP ('LGG'),
K=20 IW samples, amortized encoder, M=128 inducing points, minibatch 512,
kin8nm-shaped data (N=7372, D=8), natural-gradient q(u) + Adam — trained as
scan-chunked jitted steps on the TPU.

Baseline: the same computation in CPU float64 (torch autograd stand-in for
the unavailable TF1/GPflow CPU stack; see benchmarks/torch_cpu_baseline.py
— it omits the reference's extra natgrad graph run, so the ratio reported
here is conservative).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": R, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# Persistent compilation cache: the axon remote-compile tunnel costs
# seconds per (re)compiled executable, and every fresh process would
# otherwise recompile even tiny init ops.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def measure_tpu_steps_per_sec(chunks: int = 5, steps_per_call: int = 100):
    from dgps_with_iwvi_tpu.data import get_regression_data
    from dgps_with_iwvi_tpu.models import BuildArgs, build_model
    from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

    data = get_regression_data("kin8nm", 0)
    X, Y = jnp.asarray(data.X_train), jnp.asarray(data.Y_train)
    key = jax.random.PRNGKey(0)
    args = BuildArgs(configuration="LGG", mode="IW", num_inducing=128,
                     num_iw_samples=20)
    config, params = build_model(key, args, X, Y)
    tc = TrainConfig(lr=5e-3, gamma=1e-2, natgrad="final",
                     minibatch_size=512, steps_per_call=steps_per_call)
    init_fn, _, chunk_fn, _ = make_trainer(config, tc)
    state = init_fn(params)
    chunk_jit = jax.jit(chunk_fn)
    # compile + two warm rounds: the first executed program in a process
    # pays tunnel/allocator warmup that would understate steady-state rate
    for w in range(2):
        state, losses = chunk_jit(state, X, Y, jax.random.fold_in(key, 1000 + w))
        jax.block_until_ready(losses)
    t0 = time.time()
    for c in range(1, chunks + 1):
        state, losses = chunk_jit(state, X, Y, jax.random.fold_in(key, c))
    jax.block_until_ready(losses)
    dt = time.time() - t0
    assert bool(jnp.all(jnp.isfinite(losses))), "non-finite training loss"
    return chunks * steps_per_call / dt


def main():
    value = measure_tpu_steps_per_sec()
    try:
        from benchmarks.torch_cpu_baseline import measure_torch_steps_per_sec

        baseline = measure_torch_steps_per_sec()
    except Exception:
        baseline = None
    out = {
        "metric": "train_steps_per_sec (LGG latent-variable DGP, IWVI K=20, "
                  "M=128, B=512, kin8nm-shaped, natgrad+Adam)",
        "value": round(value, 2),
        "unit": "steps/s",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
        "baseline_cpu_f64_steps_per_sec": round(baseline, 3) if baseline else None,
        "baseline_cpu_cores": os.cpu_count(),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
