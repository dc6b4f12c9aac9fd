"""A/B the EPI_MEAN_PRECISION knob: precision class of the in-kernel
mean-term dots of the fused epilogue (forward mean, dq_mu, dA_mean in
ops/pallas/qvar.py epi_fused_train).

Why it matters (docs/ROOFLINE_B8192.md r4): the fused epilogue backward
pallas_call runs at ~64% of the pure q-variance kernel's MXU rate because
the skinny rank-D mean dots were lowered at Precision.HIGHEST — 6 bf16
passes on a mostly-idle systolic array. "high" replaces them with a
3-pass hi/lo bf16-split emulation of the XLA path's HIGH class (_dot3),
"default" with a single bf16 pass (numerically looser than the XLA path —
A/B only; dq_mu feeds the natgrad closed form).

Protocol per .claude/skills/verify: compile all variants first, discard
round, alternate, median.

    AB_SHAPES=B=2048,B=8192,year python benchmarks/epi_meanprec_ab.py [spc]
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
from dgps_with_iwvi_tpu.ops.pallas import qvar
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

SHAPES = [
    # label, configuration, K, M, B, D_in, N
    ("B=512", "LGG", 20, 128, 512, 8, 7372),
    ("B=2048", "LGG", 20, 128, 2048, 8, 20000),
    ("B=8192", "LGG", 20, 128, 8192, 8, 20000),
    ("year", "LGGG", 50, 128, 512, 90, 20000),
]
SHAPES = [s for s in SHAPES if s[0] in
          os.environ.get("AB_SHAPES", "B=2048,B=8192,year").split(",")]

VARIANTS = ["highest", "high", "default"]


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
        for name in VARIANTS:
            qvar.EPI_MEAN_PRECISION = name
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
            print(f"train {label:8s} mean={name:8s}: {ms:.3f} ms/step = "
                  f"{1e3 / ms:.0f} steps/s", flush=True)
        qvar.EPI_MEAN_PRECISION = "high"


if __name__ == "__main__":
    train_ab(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
