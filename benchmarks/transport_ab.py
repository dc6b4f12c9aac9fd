#!/usr/bin/env python
"""Delivered-rate A/B for narrow serving transports (VERDICT r4 item 5).

The end-to-end delivered artifact rate (bench.py serving row) is
transfer-bound on the axon tunnel (~13.5 MB/s both directions,
docs/PERF.md "Transfer envelope"). A full scoring round trip moves
48 bytes/row in f32: 36 up (X[8] + Y[1]) and 12 down (mean, var,
log_density). The two knobs under test:

  --transport bfloat16      results cross D2H in bf16 (12 -> 6 B/row):
                            pure OUTPUT rounding, compute untouched
  --transport_in bfloat16   the table crosses H2D in bf16 (36 -> 18),
                            upcast to f32 on device: INPUT rounding,
                            f32 compute on rounded inputs

Expected ceilings on a purely bandwidth-bound link: 48/42 = 1.14x for
the result side alone, 48/24 = 2.0x for both. This script measures the
real rates in-process (protocol: compile everything first, one discard
round, alternate variants) AND the quality cost: per-row log-density
shift of each variant vs the f32 baseline, compared against the S-sample
mixture estimator's own seed-to-seed noise on identical inputs.

    python benchmarks/transport_ab.py --B 8192 --S 100 --batches 12
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def build_artifact(B: int, S: int):
    from dgps_with_iwvi_tpu.models import BuildArgs, build_model
    from dgps_with_iwvi_tpu.serving import (export_scorer, load_scorer,
                                            save_scorer)

    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kx, (2048, 8), jnp.float32)
    Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (2048, 1),
                                                    jnp.float32)
    bargs = BuildArgs(configuration="LGG", mode="IW", num_inducing=128,
                      num_iw_samples=20)
    config, params = build_model(jax.random.PRNGKey(0), bargs, X, Y)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    exp = export_scorer(params, config, batch_size=B, d_in=8, d_out=1,
                        num_samples=S)
    with tempfile.NamedTemporaryFile(suffix=".npz") as tf:
        save_scorer(tf.name, exp, num_samples=S, has_stats=False)
        return load_scorer(tf.name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8192)
    ap.add_argument("--S", type=int, default=100)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out-md", default=None)
    args = ap.parse_args()

    art = build_artifact(args.B, args.S)
    n = args.batches * args.B
    rng = np.random.default_rng(0)
    Xs = rng.standard_normal((n, 8)).astype(np.float32)
    Ys = rng.standard_normal((n, 1)).astype(np.float32)

    variants = [("f32/f32", {}),
                ("bf16-out", {"transport": "bfloat16"}),
                ("bf16-both", {"transport": "bfloat16",
                               "transport_in": "bfloat16"})]
    # compile + warm every variant, keep outputs for the quality check
    outs = {}
    for name, kw in variants:
        outs[name] = art.score(Xs, Ys, seed=0, **kw)
    seed_noise = art.score(Xs, Ys, seed=1)  # same inputs, new mixture keys

    rates = {name: [] for name, _ in variants}
    for rep in range(args.rounds + 1):
        for name, kw in variants:  # alternate variants within each round
            t0 = time.perf_counter()
            art.score(Xs, Ys, seed=2 + rep, **kw)
            if rep:  # discard the first round
                rates[name].append(n / (time.perf_counter() - t0))

    base = float(np.median(rates["f32/f32"]))
    ld0 = outs["f32/f32"]["log_density"]
    noise = float(np.mean(np.abs(seed_noise["log_density"] - ld0)))
    lines = [f"B={args.B} S={args.S} n={n} rounds={args.rounds} "
             f"backend={jax.default_backend()}",
             f"S-sample mixture seed noise (mean |dlogp|): {noise:.4g}", "",
             "| variant | pts/s | vs f32 | mean |dlogp| | /seed-noise |",
             "|---|---|---|---|---|"]
    for name, _ in variants:
        r = float(np.median(rates[name]))
        dl = float(np.mean(np.abs(outs[name]["log_density"] - ld0)))
        lines.append(f"| {name} | {r:,.0f} | {r / base:.2f}x "
                     f"| {dl:.4g} | {dl / max(noise, 1e-12):.3f} |")
    print("\n".join(lines))
    if args.out_md:
        with open(args.out_md, "w") as f:
            f.write("\n".join(lines) + "\n")
    print(json.dumps({name: float(np.median(rates[name]))
                      for name, _ in variants}))


if __name__ == "__main__":
    main()
