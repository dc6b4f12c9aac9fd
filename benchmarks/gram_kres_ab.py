"""A/B the GRAM_KUF_RESIDUAL knob: which residual the RBF cross-gram's
backward keeps.

Plain AD keeps the [M, K*B] squared-distance tensor d2 live from forward
to backward; at B=8192 that is 84 MB/layer and XLA's memory-space
assignment evicts + re-prefetches it (the 124 us "copy-done" + ~100 us
of "slice-done" rows in docs/ROOFLINE_B8192.md). The Kuf-residual custom
vjp (ops/kernels.py _rbf_gram_kres) derives every gram gradient from the
gram output itself — already materialized as the solve operand — so d2
is never saved.

Protocol per .claude/skills/verify: compile all variants first, discard
round, alternate, median.

    AB_SHAPES=B=512,B=8192,year python benchmarks/gram_kres_ab.py [spc]
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
    ("B=512", "LGG", 20, 128, 512, 8, 7372),
    ("B=2048", "LGG", 20, 128, 2048, 8, 20000),
    ("B=8192", "LGG", 20, 128, 8192, 8, 20000),
    ("year", "LGGG", 50, 128, 512, 90, 20000),
]
SHAPES = [s for s in SHAPES if s[0] in
          os.environ.get("AB_SHAPES", "B=512,B=8192,year").split(",")]

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
        for kres in VARIANTS:
            kernels.GRAM_KUF_RESIDUAL = kres
            init_fn, _, chunk_fn, _ = make_trainer(config, tc)
            f, s = jax.jit(chunk_fn), init_fn(params)
            for w in range(2):
                s2, l = f(s, X, Y, jax.random.fold_in(ky, 90 + w))
                jax.block_until_ready(l)
            fs[kres] = (f, s)
        res = {v: [] for v in fs}
        for r in range(7):
            for kres, (f, s) in fs.items():
                t0 = time.perf_counter()
                s2, l = f(s, X, Y, jax.random.fold_in(ky, r))
                jax.block_until_ready(l)
                res[kres].append((time.perf_counter() - t0) / spc)
        for kres in fs:
            ms = float(np.median(res[kres][1:]) * 1e3)
            print(f"train {label:8s} kres={str(kres):5s}: {ms:.3f} ms/step "
                  f"= {1e3 / ms:.0f} steps/s", flush=True)
        kernels.GRAM_KUF_RESIDUAL = "auto"


if __name__ == "__main__":
    train_ab(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
