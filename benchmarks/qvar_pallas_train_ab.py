"""A/B the QVAR_PALLAS_TRAIN switch: fused Pallas backward for the
q-variance quadratic form in the TRAINING objective (ops/pallas/qvar.py
qvar_fused_train) vs the XLA bf16-residual path.

Why it should win (docs/ROOFLINE_B8192.md): the XLA path's residual store
and its two backward reads are the top 3 ops of the B=8192 step, each AT
the HBM roofline — the fused backward recomputes the [D, M, TN] tile in
VMEM instead, eliminating that traffic for one extra MXU dot per tile.

Shapes: the LGG flagship at several minibatch sizes (the kernel's n >=
1024 lane-aligned floor keeps auto OFF at B=512 — this script forces it
on everywhere measurable to locate the real crossover for the policy).

Protocol per .claude/skills/verify: compile both, one discard round,
alternate, median.

    python benchmarks/qvar_pallas_train_ab.py [steps_per_call]
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
    ("B=512", "LGG", 20, 128, 512, 8, 7372),
    ("B=2048", "LGG", 20, 128, 2048, 8, 20000),
    ("B=8192", "LGG", 20, 128, 8192, 8, 20000),
    ("year", "LGGG", 50, 128, 512, 90, 20000),
    ("B=1024", "LGG", 20, 128, 1024, 8, 20000),
    ("deep-M512", "LGG", 20, 512, 2048, 8, 20000),
]
SHAPES = [s for s in SHAPES if s[0] in
          __import__("os").environ.get("AB_SHAPES", "B=512,B=2048,B=8192,year").split(",")
]

VARIANTS = {
    "xla-bf16res": "off",
    "pallas-auto": "auto",
    "pallas-all-on": "on",
    # d-grouped deep-M variant (the monolithic kernel is a VMEM compile
    # blocker at M=512 — AB_VARIANTS=xla-bf16res,pallas-grouped there)
    "pallas-grouped": "grouped",
}
_sel = __import__("os").environ.get(
    "AB_VARIANTS", "xla-bf16res,pallas-auto,pallas-all-on").split(",")
VARIANTS = {k: v for k, v in VARIANTS.items() if k in _sel}


def main():
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 200
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
            conditionals.QVAR_PALLAS_TRAIN = flag
            # the epilogue-fused kernel has the SAME VMEM blowup at deep
            # M — keep the comparison to the pure q-variance kernels
            conditionals.EPI_TRAIN = "off" if flag == "grouped" else "auto"
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
            print(f"{label:8s} {name:13s}: {ms:.3f} ms/step = "
                  f"{1e3 / ms:.0f} steps/s", flush=True)
        conditionals.QVAR_PALLAS_TRAIN = "auto"
        conditionals.EPI_TRAIN = "auto"


if __name__ == "__main__":
    main()
