"""A/B the solve-path matmul precision (DGPConfig.solve_precision).

The solve path (A = Linv Kuf and the mean matmul, ops/conditionals.py)
runs at 'high' (bf16x3) by default — 2.08 of the flagship's 11.7 nominal
GFLOP/step, i.e. 6.25 of its 16.8 pass-adjusted GF. Dropping it to
'default' (single-pass bf16) removes ~25% of the MXU work the chip
actually executes; this sweep measures what that buys in step time at
the policy-defining shapes. Any default change must ALSO pass
benchmarks/quality_gate.py --solve_precision default — 'default' feeds
the Kff - sum(A^2) cancellation, the numerically scariest spot in the
model (see base_conditional_whitened).

    python benchmarks/solve_prec_ab.py [steps_per_call]

Run on an idle host (see qvar_bf16_ab.py: host contention at small
steps_per_call once inflated a flagship delta 5x).
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
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

SHAPES = [
    # label, configuration, K, M, B, D_in, N
    ("flagship", "LGG", 20, 128, 512, 8, 7372),
    ("throughput", "LGG", 20, 128, 8192, 8, 20000),
    ("year", "LGGG", 50, 128, 512, 90, 20000),
]

VARIANTS = ["highest", "high", "default"]


def main():
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    for label, conf, K, M, B, D_in, N in SHAPES:
        kx, ky = jax.random.split(jax.random.PRNGKey(0))
        X = jax.random.normal(kx, (N, D_in), jnp.float32)
        Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (N, 1), jnp.float32)
        tc = TrainConfig(lr=5e-3, gamma=1e-2, natgrad="final",
                         minibatch_size=B, steps_per_call=spc)
        fs = {}
        for sp in VARIANTS:
            args = BuildArgs(configuration=conf, mode="IW", num_inducing=M,
                             num_iw_samples=K, solve_precision=sp)
            config, params = build_model(jax.random.PRNGKey(0), args, X, Y)
            init_fn, _, chunk_fn, _ = make_trainer(config, tc)
            f, s = jax.jit(chunk_fn), init_fn(params)
            for w in range(2):  # compile + discard (first-measurement trap)
                s2, l = f(s, X, Y, jax.random.fold_in(ky, 90 + w))
                jax.block_until_ready(l)
            fs[sp] = (f, s)
        res = {v: [] for v in fs}
        for r in range(7):  # alternate variants; median of rounds
            for name, (f, s) in fs.items():
                t0 = time.perf_counter()
                s2, l = f(s, X, Y, jax.random.fold_in(ky, r))
                jax.block_until_ready(l)
                res[name].append((time.perf_counter() - t0) / spc)
        for name in fs:
            ms = float(np.median(res[name][1:]) * 1e3)
            print(f"{label:11s} solve={name:8s}: {ms:.3f} ms/step = "
                  f"{1e3 / ms:.0f} steps/s", flush=True)


if __name__ == "__main__":
    main()
