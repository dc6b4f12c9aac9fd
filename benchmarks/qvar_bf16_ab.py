"""A/B the QVAR_BF16_RESIDUAL switch against REMAT_QVAR across the shapes
that define the auto policy (ops/conditionals.py).

Shapes (mirroring remat_ab.py and the measured policy crossovers):
  flagship   LGG  K=20 M=128 B=512   (residual  42 MB; auto remat OFF)
  throughput LGG  K=20 M=128 B=8192  (residual 671 MB; auto remat ON, won 1.18x)
  year       LGGG K=50 M=128 B=512 D=90 (residual 98 MB; auto remat ON, won 1.49x)
  deep-M     LGG  K=20 M=512 B=2048  (residual 671 MB; auto remat OFF by M cap)

For each shape, times one jitted 100-step training chunk under:
  remat(auto)      — the shipped policy, f32 residual where stored
  noremat+f32res   — force-store f32 residual
  noremat+bf16res  — force-store bf16 residual (the candidate)
  remat+bf16res    — remat on; bf16 flag irrelevant inside the remat'd
                     region but exercises the combined trace

Prints one line per (shape, variant): ms/step and steps/s.
Run on the real TPU; first compiles go through the remote-compile cache.
Run it on an IDLE host: per-call dispatch overhead (~25 ms through the
tunnel / steps_per_call) is sensitive to host contention, which inflated
an early run of this sweep at spc=100 (+5.5% flagship) relative to the
clean spc=500 numbers tabled in docs/PERF.md.

    python benchmarks/qvar_bf16_ab.py [steps_per_call]
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
from dgps_with_iwvi_tpu.ops import conditionals
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

SHAPES = [
    # label, configuration, K, M, B, D_in, N
    ("flagship", "LGG", 20, 128, 512, 8, 7372),
    ("throughput", "LGG", 20, 128, 8192, 8, 20000),
    ("year", "LGGG", 50, 128, 512, 90, 20000),
    ("deep-M512", "LGG", 20, 512, 2048, 8, 20000),
    # mid-M: sits ON the QVAR_BF16_MAX_M / REMAT_QVAR_MAX_M = 256 caps,
    # which until r5 interpolated the M=128 win and M=512 loss with no
    # measurement in between (VERDICT r4 weak #6). Same B as deep-M512 so
    # the M axis is the only change.
    ("mid-M256", "LGG", 20, 256, 2048, 8, 20000),
]
SHAPES = [s for s in SHAPES if s[0] in os.environ.get(
    "AB_SHAPES", ",".join(s[0] for s in SHAPES)).split(",")]

VARIANTS = {
    "remat(auto)": ("auto", False),
    "noremat+f32res": (False, False),
    "noremat+bf16res": (False, True),
    "remat+bf16res": (True, True),
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
        for name, (remat, bf16) in VARIANTS.items():
            conditionals.REMAT_QVAR = remat
            conditionals.QVAR_BF16_RESIDUAL = bf16
            init_fn, _, chunk_fn, _ = make_trainer(config, tc)
            f, s = jax.jit(chunk_fn), init_fn(params)
            for w in range(2):  # compile + discard (first-measurement trap)
                s2, l = f(s, X, Y, jax.random.fold_in(ky, 90 + w))
                jax.block_until_ready(l)
            fs[name] = (f, s)
        res = {v: [] for v in fs}
        for r in range(7):  # alternate variants; median of rounds
            for name, (f, s) in fs.items():
                t0 = time.perf_counter()
                s2, l = f(s, X, Y, jax.random.fold_in(ky, r))
                jax.block_until_ready(l)
                res[name].append((time.perf_counter() - t0) / spc)
        for name in fs:
            ms = float(np.median(res[name][1:]) * 1e3)
            print(f"{label:11s} {name:16s}: {ms:.3f} ms/step = "
                  f"{1e3 / ms:.0f} steps/s", flush=True)
        conditionals.REMAT_QVAR = "auto"
        conditionals.QVAR_BF16_RESIDUAL = "auto"


if __name__ == "__main__":
    main()
