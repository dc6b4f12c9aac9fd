"""A/B the FUSED_GATHER switch (training/train.py): one row gather over
the concatenated [N, Dx+Dy] table per minibatch draw vs two separate
gathers. The gathers are latency-bound (docs/ROOFLINE_B8192.md: ~86 us at
B=8192 for the pair), so halving the count is the only available lever.

Protocol per .claude/skills/verify: compile both, one discard round,
alternate, median.

    python benchmarks/gather_ab.py [steps_per_call]
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
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer
from dgps_with_iwvi_tpu.training import train as train_mod

SHAPES = [
    ("B=512", "LGG", 20, 128, 512, 8, 7372),
    ("B=8192", "LGG", 20, 128, 8192, 8, 20000),
]
SHAPES = [s for s in SHAPES if s[0] in
          os.environ.get("AB_SHAPES", "B=512,B=8192").split(",")]


def main():
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 500
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
        for name, flag in (("two-gathers", False), ("fused", True)):
            train_mod.FUSED_GATHER = flag
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
            print(f"{label:8s} {name:12s}: {ms:.4f} ms/step = "
                  f"{1e3 / ms:.0f} steps/s", flush=True)
        train_mod.FUSED_GATHER = True


if __name__ == "__main__":
    main()
