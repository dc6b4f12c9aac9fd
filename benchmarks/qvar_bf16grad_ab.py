"""A/B the QVAR_BF16_GRAD switch (bf16 q-variance COTANGENT custom vjp,
ops/conditionals.py) at the shapes where the bf16 residual is active.

Motivation (docs/ROOFLINE_B8192.md): the top 3 ops of the B=8192 training
step are the q-variance backward dots, AT the HBM roofline — plain AD
materializes the [*, D, M, cols] cotangent in f32 (written once, read by
both parameter-gradient dots). The custom vjp keeps it bf16, halving
those three transfers. This script measures the end-to-end step-time
effect; quality is adjudicated separately by quality_gate.py.

Variants (QVAR_BF16_RESIDUAL stays "auto" — ON at M=128, OFF at M=512):
  ad-f32-cotangent   — QVAR_BF16_GRAD=False (round-3 behavior)
  vjp-bf16-cotangent — QVAR_BF16_GRAD="auto" (the candidate)

Protocol per .claude/skills/verify: compile both, one discard round,
alternate measurements, median. Run on an IDLE host.

    python benchmarks/qvar_bf16grad_ab.py [steps_per_call]
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
from dgps_with_iwvi_tpu.ops import conditionals
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

SHAPES = [
    # label, configuration, K, M, B, D_in, N
    ("flagship", "LGG", 20, 128, 512, 8, 7372),
    ("throughput", "LGG", 20, 128, 8192, 8, 20000),
    ("year", "LGGG", 50, 128, 512, 90, 20000),
]

VARIANTS = {
    "ad-f32-cotangent": False,
    "vjp-bf16-cotangent": "auto",
}


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
        fs = {}
        for name, flag in VARIANTS.items():
            conditionals.QVAR_BF16_GRAD = flag
            init_fn, _, chunk_fn, _ = make_trainer(config, tc)
            f, s = jax.jit(chunk_fn), init_fn(params)
            for w in range(2):  # compile + discard (first-measurement trap)
                s2, l = f(s, X, Y, jax.random.fold_in(ky, 90 + w))
                jax.block_until_ready(l)
            fs[name] = (f, s)
        res = {v: [] for v in fs}
        for r in range(7):
            for name, (f, s) in fs.items():
                t0 = time.perf_counter()
                s2, l = f(s, X, Y, jax.random.fold_in(ky, r))
                jax.block_until_ready(l)
                res[name].append((time.perf_counter() - t0) / spc)
        for name in fs:
            ms = float(np.median(res[name][1:]) * 1e3)
            print(f"{label:11s} {name:18s}: {ms:.3f} ms/step = "
                  f"{1e3 / ms:.0f} steps/s", flush=True)
        conditionals.QVAR_BF16_GRAD = "auto"


if __name__ == "__main__":
    main()
