"""A/B kernels.KRES_BF16_RESIDUAL: bf16 vs f32 storage for the Kuf
residual (the gram output the gram-kres vjp keeps + the solve dot's
saved y — one CSE-shared buffer).

The r5 HLO audit (docs/PERF.md ledger) attributed the ROOFLINE_B8192
"copy-done" row to this residual: XLA parks the 84 MB f32 Kuf in VMEM so
the forward solve dot reads it at TB/s, then evicts it to HBM (123 us)
for the backward and re-prefetches it in four async slices (~124 us).
bf16 halves the eviction, the reload, and the backward dots' Kuf-operand
bytes; forward math is unchanged (bit-equal loss).

Protocol per .claude/skills/verify: compile all variants first, discard
round, alternate, median.

    AB_SHAPES=B=4096,B=8192 python benchmarks/kres_bf16_ab.py [spc]
"""

from __future__ import annotations

import os
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
    # Kuf/layer: B=2048 21 MB, B=4096 42 MB, B=8192 84 MB (the measured
    # eviction shape). B=512 (5 MB) has no eviction — control only.
    ("B=512", "LGG", 20, 128, 512, 8, 7372),
    ("B=2048", "LGG", 20, 128, 2048, 8, 20000),
    ("B=4096", "LGG", 20, 128, 4096, 8, 20000),
    ("B=8192", "LGG", 20, 128, 8192, 8, 20000),
]
SHAPES = [s for s in SHAPES if s[0] in
          os.environ.get("AB_SHAPES", "B=4096,B=8192").split(",")]

VARIANTS = [False, True]


def train_ab(spc: int):
    for label, conf, K, M, B, D_in, N in SHAPES:
        kx, ky = jax.random.split(jax.random.PRNGKey(0))
        X = jax.random.normal(kx, (N, D_in), jnp.float32)
        Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (N, 1),
                                                        jnp.float32)
        args = BuildArgs(configuration=conf, mode="IW",
                         num_inducing=M, num_iw_samples=K)
        config, params = build_model(jax.random.PRNGKey(0), args, X, Y)
        tc = TrainConfig(lr=5e-3, gamma=1e-2, natgrad="final",
                         minibatch_size=B, steps_per_call=spc)
        fs = {}
        for v in VARIANTS:
            kernels.KRES_BF16_RESIDUAL = v
            init_fn, _, chunk_fn, _ = make_trainer(config, tc)
            f, s = jax.jit(chunk_fn), init_fn(params)
            for w in range(2):
                s2, l = f(s, X, Y, jax.random.fold_in(ky, 90 + w))
                jax.block_until_ready(l)
            fs[v] = (f, s)
        res = {v: [] for v in fs}
        for r in range(7):
            for v, (f, s) in fs.items():
                t0 = time.perf_counter()
                s2, l = f(s, X, Y, jax.random.fold_in(ky, r))
                jax.block_until_ready(l)
                res[v].append((time.perf_counter() - t0) / spc)
        for v in fs:
            ms = float(np.median(res[v][1:]) * 1e3)
            print(f"train {label:8s} kres_bf16={str(v):5s}: {ms:.3f} "
                  f"ms/step = {1e3 / ms:.0f} steps/s", flush=True)
        kernels.KRES_BF16_RESIDUAL = "auto"


if __name__ == "__main__":
    train_ab(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
