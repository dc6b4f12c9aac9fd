"""A/B kernels.GRAM_FWD_PRECISION ('highest' vs 'high') at the policy shapes.

The gram cross-term dot has run at HIGHEST (bf16x6) since round 1 — the
sq-dist expansion cancels catastrophically at single-pass DEFAULT (~6%%
gram error). The intermediate HIGH (bf16x3) was never measured: its gram
error is ~1.5e-5 max relative (f32-level; /tmp probe, docs/PERF.md), so
it is a candidate default IF it buys step time AND passes the 15k-step
quality gate (benchmarks/quality_gate.py). The gram dots scale with D, so
the year config (D=90) is where this can matter; flagship D=8 should be
noise.

    python benchmarks/gram_fwd_ab.py [steps_per_call]

Idle host, spc >= 500 (see qvar_bf16_ab.py for the contention trap).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dgps_with_iwvi_tpu.models import BuildArgs, build_model
from dgps_with_iwvi_tpu.ops import kernels
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

SHAPES = [
    # label, configuration, K, M, B, D_in, N
    ("flagship", "LGG", 20, 128, 512, 8, 7372),
    ("throughput", "LGG", 20, 128, 8192, 8, 20000),
    ("year", "LGGG", 50, 128, 512, 90, 20000),
]

VARIANTS = ["highest", "high"]


def main():
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    for label, conf, K, M, B, D_in, N in SHAPES:
        kx, ky = jax.random.split(jax.random.PRNGKey(0))
        X = jax.random.normal(kx, (N, D_in), jnp.float32)
        Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (N, 1), jnp.float32)
        args = BuildArgs(configuration=conf, mode="IW",
                         num_inducing=M, num_iw_samples=K)
        config, params = build_model(jax.random.PRNGKey(0), args, X, Y)
        tc = TrainConfig(lr=5e-3, gamma=1e-2, natgrad="final",
                         minibatch_size=B, steps_per_call=spc)
        init_fn, _, chunk_fn, _ = make_trainer(config, tc)
        fs = {}
        for prec in VARIANTS:
            kernels.GRAM_FWD_PRECISION = prec  # trace-time module switch
            f, s = jax.jit(chunk_fn), init_fn(params)
            for w in range(2):  # compile + discard (first-measurement trap)
                s2, l = f(s, X, Y, jax.random.fold_in(ky, 90 + w))
                jax.block_until_ready(l)
            fs[prec] = (f, s)
        kernels.GRAM_FWD_PRECISION = "highest"
        res = {v: [] for v in fs}
        for r in range(7):  # alternate variants; median of rounds
            for name, (f, s) in fs.items():
                t0 = time.perf_counter()
                s2, l = f(s, X, Y, jax.random.fold_in(ky, r))
                jax.block_until_ready(l)
                res[name].append((time.perf_counter() - t0) / spc)
        for name in fs:
            ms = float(np.median(res[name][1:]) * 1e3)
            print(f"{label:11s} gram_fwd={name:8s}: {ms:.3f} ms/step = "
                  f"{1e3 / ms:.0f} steps/s", flush=True)


if __name__ == "__main__":
    main()
