"""A/B the EPI_PALLAS switch: epilogue-fused conditional (mean + prior
sumsq + q-variance in ONE Pallas pass over A, ops/pallas/qvar.py
epi_fused*) vs the separate-op composition with the q-variance kernels.

Why it should win (docs/ROOFLINE_B8192.md): after the fused q-variance
kernels eliminated the [D, M, cols] round trip, the REMAINING A-sized HBM
traffic at large batch is the epilogue — the XLA mean dot and sumsq
reduce each re-read A forward, and backward the mean's dA cotangent
(q_mu g^T, the 382 us roofline row) materializes a full A-sized tensor
re-read by the dA add chain, while dq_mu and the prior cotangent read A
again. The fused epilogue adds only rank-D MXU dots + a VPU reduce per
tile to the already-winning kernels.

TRAIN A/B: EPI_PALLAS "auto" vs "off" with QVAR_PALLAS_TRAIN="auto" both
sides (so the delta isolates the epilogue). SERVE A/B: the prediction
path with QVAR_PALLAS active both sides.

Protocol per .claude/skills/verify: compile both, one discard round,
alternate, median.

    AB_SHAPES=B=2048,B=8192,year python benchmarks/epi_fused_ab.py [spc]
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

from dgps_with_iwvi_tpu.models import (BuildArgs, build_model,
                                       predict_y_and_log_density)
from dgps_with_iwvi_tpu.ops import conditionals
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

SHAPES = [
    # label, configuration, K, M, B, D_in, N
    ("B=512", "LGG", 20, 128, 512, 8, 7372),
    ("B=1024", "LGG", 20, 128, 1024, 8, 20000),
    ("B=2048", "LGG", 20, 128, 2048, 8, 20000),
    # mid-shapes bracketing EPI_TRAIN_MIN_DN = 32768, which until r5 was
    # bisected from a 4x gap (d*n = 16384 LOSE / 65536 WIN — VERDICT r4
    # weak #6): d*n = 24576 and 32768 exactly.
    ("B=2560", "LGG", 20, 128, 2560, 8, 20000),
    ("B=3072", "LGG", 20, 128, 3072, 8, 20000),
    ("B=4096", "LGG", 20, 128, 4096, 8, 20000),
    ("B=8192", "LGG", 20, 128, 8192, 8, 20000),
    ("year", "LGGG", 50, 128, 512, 90, 20000),
]
SHAPES = [s for s in SHAPES if s[0] in
          os.environ.get("AB_SHAPES", "B=2048,B=8192,year").split(",")]

# (EPI_PALLAS, EPI_TRAIN): off / mean-less (sumsq-only) / full / policy
VARIANTS = {
    "epi-off": ("off", "off"),
    "epi-ps": ("auto", "ps"),
    "epi-mean": ("auto", "mean"),
    "epi-auto": ("auto", "auto"),
}


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
        for name, (flag, mean_flag) in VARIANTS.items():
            conditionals.EPI_PALLAS = flag
            conditionals.EPI_TRAIN = mean_flag
            init_fn, _, chunk_fn, _ = make_trainer(config, tc)
            f, s = jax.jit(chunk_fn), init_fn(params)
            for w in range(2):
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
            print(f"train {label:8s} {name:8s}: {ms:.3f} ms/step = "
                  f"{1e3 / ms:.0f} steps/s", flush=True)
        conditionals.EPI_PALLAS, conditionals.EPI_TRAIN = "auto", "auto"


def serve_ab(S: int = 100, B: int = 8192, calls: int = 16):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kx, (B, 8), jnp.float32)
    Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (B, 1), jnp.float32)
    bargs = BuildArgs(configuration="LGG", mode="IW", num_inducing=128,
                      num_iw_samples=20)
    config, params = build_model(jax.random.PRNGKey(0), bargs,
                                 X[:2048], Y[:2048])
    fs = {}
    for name, (flag, mean_flag) in VARIANTS.items():
        if name in ("epi-ps", "epi-auto"):
            continue  # inference always fuses the mean (epi_fused)
        conditionals.EPI_PALLAS = flag
        conditionals.EPI_TRAIN = mean_flag
        f = jax.jit(lambda xb, yb, k: predict_y_and_log_density(
            params, config, xb, yb, k, S))
        out = f(X, Y, ky)
        jax.device_get(out[1])
        fs[name] = f
    res = {v: [] for v in fs}
    for rep in range(4):
        for name, f in fs.items():
            t0 = time.perf_counter()
            outs = [f(X, Y, jax.random.fold_in(ky, 1000 * rep + i))
                    for i in range(calls)]
            jax.device_get(outs[-1][1])
            res[name].append(calls * B / (time.perf_counter() - t0))
    for name in fs:
        pts = float(np.median(res[name][1:]))
        print(f"serve S={S} B={B} {name:8s}: {pts / 1e3:.0f}k points/s",
              flush=True)
    conditionals.EPI_PALLAS, conditionals.EPI_TRAIN = "auto", "auto"


if __name__ == "__main__":
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    if os.environ.get("AB_MODE", "both") in ("both", "train"):
        train_ab(spc)
    if os.environ.get("AB_MODE", "both") in ("both", "serve"):
        serve_ab()
