#!/usr/bin/env python
"""Op-level profile of the flagship train step (xprof trace -> top ops).

Captures a jax.profiler trace of a few scan-chunked train calls on the
real TPU and prints the device-time breakdown by op category, so perf
work targets measured costs instead of guesses (VERDICT r1 item 2).

Usage: python benchmarks/profile_step.py [--steps-per-call 100]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-call", type=int, default=100)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--minibatch", type=int, default=512,
                    help="512 = the flagship latency-sensitive config; "
                         "8192 = the compute-bound throughput row")
    ap.add_argument("--out", default="/tmp/dgp_profile")
    ap.add_argument("--tool", default="framework_op_stats",
                    help="xprof tool: framework_op_stats | hlo_stats | "
                         "op_profile | overview_page")
    args = ap.parse_args()

    from dgps_with_iwvi_tpu.data import get_regression_data
    from dgps_with_iwvi_tpu.models import BuildArgs, build_model
    from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

    data = get_regression_data("kin8nm", 0)
    X, Y = jnp.asarray(data.X_train), jnp.asarray(data.Y_train)
    if args.minibatch > X.shape[0]:
        # same tiling as bench.py: keep a true B-row minibatch rather than
        # silently falling back to full-batch N=7372 rows
        reps = (args.minibatch + X.shape[0] - 1) // X.shape[0] + 1
        X, Y = jnp.tile(X, (reps, 1)), jnp.tile(Y, (reps, 1))
    key = jax.random.PRNGKey(0)
    bargs = BuildArgs(configuration="LGG", mode="IW", num_inducing=128,
                      num_iw_samples=20)
    config, params = build_model(key, bargs, X, Y)
    tc = TrainConfig(lr=5e-3, gamma=1e-2, natgrad="final",
                     minibatch_size=args.minibatch,
                     steps_per_call=args.steps_per_call)
    init_fn, _, chunk_fn, _ = make_trainer(config, tc)
    state = init_fn(params)
    chunk_jit = jax.jit(chunk_fn)

    # compile + warm
    for w in range(2):
        state, losses = chunk_jit(state, X, Y, jax.random.fold_in(key, w))
        jax.block_until_ready(losses)

    with jax.profiler.trace(args.out):
        for c in range(args.calls):
            state, losses = chunk_jit(state, X, Y, jax.random.fold_in(key, 10 + c))
        jax.block_until_ready(losses)

    # find the xplane and dump per-op totals
    planes = sorted(glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("no xplane captured", file=sys.stderr)
        return
    path = planes[-1]
    from xprof.convert import raw_to_tool_data as conv

    data_out, _ = conv.xspace_to_tool_data([path], args.tool, {})
    if isinstance(data_out, bytes):
        try:
            data_out = gzip.decompress(data_out)
        except OSError:
            pass
        data_out = data_out.decode("utf-8", "replace")
    tables = json.loads(data_out)
    total_steps = args.steps_per_call * args.calls
    if isinstance(tables, dict):  # some tools return ONE table, not a list
        tables = [tables]
    if args.tool != "framework_op_stats":
        cols = [c["id"] for c in tables[0]["cols"]]
        print("cols:", cols)
        rows = [dict(zip(cols, [c.get("v") for c in r["c"]]))
                for r in tables[0]["rows"]]
        tkey = next((k for k in ("total_self_time_us", "total_self_time",
                                 "self_time_us", "total_time_us",
                                 "occurrences") if k in cols), cols[-1])
        rows.sort(key=lambda d: -(d.get(tkey) or 0))
        for d in rows[:40]:
            print({k: (round(v, 2) if isinstance(v, float) else
                       (v[:110] if isinstance(v, str) else v))
                   for k, v in d.items() if v not in (None, "", 0.0)})
        return
    cols = [c["id"] for c in tables[0]["cols"]]
    rows = []
    for r in tables[0]["rows"]:
        d = dict(zip(cols, [c.get("v") for c in r["c"]]))
        if d.get("host_or_device") == "Device":
            rows.append(d)
    rows.sort(key=lambda d: -d["total_self_time"])
    dev_total = sum(d["total_self_time"] for d in rows)
    print(f"device self-time total: {dev_total:.0f} us over {total_steps} "
          f"steps = {dev_total / total_steps:.1f} us/step\n")
    print(f"{'us/step':>8}  {'%':>5}  {'bound':>7}  op")
    for d in rows[:30]:
        name = d["operation"]
        name = name.replace("jit(chunk_fn)/while/body/closed_call/", "")
        print(f"{d['total_self_time'] / total_steps:8.1f}  "
              f"{100 * d['total_self_time'] / dev_total:5.1f}  "
              f"{str(d.get('bound_by')):>7}  {d['type']:<22} {name[:90]}")


if __name__ == "__main__":
    main()
