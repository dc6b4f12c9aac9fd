#!/usr/bin/env python
"""Per-op roofline table for a training step (VERDICT r3 item 1).

Captures an xprof trace of the scan-chunked train step, pulls hlo_stats,
and emits a markdown table with, per op: measured time, measured HBM
bandwidth and MXU flop rate, the ATTAINABLE time on a v5e
(max(bytes / HBM peak, flops / MXU peak)) and the headroom ratio — so
"near roofline for the op mix" is a table, not a plea. The final row sums
to a program-level speed-of-light bound for the current op mix.

    python benchmarks/roofline.py --minibatch 8192 --steps-per-call 50

Peaks (TPU v5e / "TPU v5 lite"): 197 TF/s dense bf16 MXU, ~819 GB/s HBM.
model_flop_rate from hlo_stats is NOMINAL (precision-adjusted passes are
folded in per bench.py's convention downstream; for per-op attainability
the nominal rate vs the bf16 peak is the right comparison for DEFAULT
dots, and a 3x/6x understatement for HIGH/HIGHEST ones — flagged in the
notes column via the op's program).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

HBM_PEAK_GBS = 819.0    # v5e HBM
MXU_PEAK_GFS = 197000.0  # v5e dense bf16


def capture(minibatch: int, steps_per_call: int, calls: int, out: str):
    from dgps_with_iwvi_tpu.data import get_regression_data
    from dgps_with_iwvi_tpu.models import BuildArgs, build_model
    from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer

    data = get_regression_data("kin8nm", 0)
    X, Y = jnp.asarray(data.X_train), jnp.asarray(data.Y_train)
    if minibatch > X.shape[0]:
        reps = (minibatch + X.shape[0] - 1) // X.shape[0] + 1
        X, Y = jnp.tile(X, (reps, 1)), jnp.tile(Y, (reps, 1))
    key = jax.random.PRNGKey(0)
    bargs = BuildArgs(configuration="LGG", mode="IW", num_inducing=128,
                      num_iw_samples=20)
    config, params = build_model(key, bargs, X, Y)
    tc = TrainConfig(lr=5e-3, gamma=1e-2, natgrad="final",
                     minibatch_size=minibatch, steps_per_call=steps_per_call)
    init_fn, _, chunk_fn, _ = make_trainer(config, tc)
    state = init_fn(params)
    chunk_jit = jax.jit(chunk_fn)
    for w in range(2):
        state, losses = chunk_jit(state, X, Y, jax.random.fold_in(key, w))
        jax.block_until_ready(losses)
    with jax.profiler.trace(out):
        for c in range(calls):
            state, losses = chunk_jit(state, X, Y,
                                      jax.random.fold_in(key, 10 + c))
        jax.block_until_ready(losses)


def hlo_rows(trace_dir: str):
    planes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    assert planes, "no xplane captured"
    from xprof.convert import raw_to_tool_data as conv

    data_out, _ = conv.xspace_to_tool_data([planes[-1]], "hlo_stats", {})
    if isinstance(data_out, bytes):
        try:
            data_out = gzip.decompress(data_out)
        except OSError:
            pass
        data_out = data_out.decode("utf-8", "replace")
    tables = json.loads(data_out)
    if isinstance(tables, dict):
        tables = [tables]
    cols = [c["id"] for c in tables[0]["cols"]]
    return [dict(zip(cols, [c.get("v") for c in r["c"]]))
            for r in tables[0]["rows"]]


def render(rows, total_steps: int, top: int, out_md: str | None):
    lines = []

    def emit(s=""):
        lines.append(s)
        print(s)

    def src_of(r):
        m = re.search(r">([^<]*?)</div>", r.get("source_info", "") or "")
        return m.group(1).split("/")[-1] if m and m.group(1) else ""

    rows = [r for r in rows if r.get("total_self_time")]
    rows.sort(key=lambda r: -r["total_self_time"])
    tot_us = sum(r["total_self_time"] for r in rows) / total_steps
    emit(f"Measured device self time: {tot_us:.0f} us/step "
         f"({total_steps} steps traced).\n")
    emit("| us/step | % | bound | GB/s | GF/s | attainable us | headroom "
         "| source | op |")
    emit("|---|---|---|---|---|---|---|---|---|")
    sol = 0.0
    for i, r in enumerate(rows):
        t = r["total_self_time"] / total_steps           # us/step
        bw = r.get("measured_memory_bw") or 0.0          # GB/s
        fr = r.get("model_flop_rate") or 0.0             # GF/s
        byts = bw * t * 1e3                              # bytes (GB/s*us)
        flops = fr * t * 1e3
        att = max(byts / HBM_PEAK_GBS, flops / MXU_PEAK_GFS) / 1e3
        # ops with no modeled flops/bytes (copies, custom calls): their
        # attainable time is unknown -> count measured time as the bound
        att_eff = att if (bw or fr) else t
        sol += min(att_eff, t)
        if i < top:
            head = (t / att) if att > 0.005 else float("nan")
            name = (r.get("tf_op_name") or r.get("hlo_op_name", ""))
            name = name.replace("jit(chunk_fn)/while/body/closed_call/", "")
            emit(f"| {t:.1f} | {100 * t / tot_us:.1f} "
                 f"| {r.get('bound_by', '')} | {bw:.0f} | {fr:.0f} "
                 f"| {att:.1f} | {head:.2f}x | {src_of(r)} | {name[:70]} |")
    emit(f"\nSpeed-of-light for THIS op mix: {sol:.0f} us/step "
         f"(measured {tot_us:.0f} -> {tot_us / max(sol, 1e-9):.2f}x "
         "headroom if every op hit its own roofline; changing the op mix "
         "— fusing away intermediates — moves the bound itself).")
    if out_md:
        with open(out_md, "w") as f:
            f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minibatch", type=int, default=8192)
    ap.add_argument("--steps-per-call", type=int, default=50)
    ap.add_argument("--calls", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/dgp_roofline")
    ap.add_argument("--out-md", default=None)
    ap.add_argument("--reuse-trace", action="store_true")
    args = ap.parse_args()
    if not args.reuse_trace:
        capture(args.minibatch, args.steps_per_call, args.calls,
                args.trace_dir)
    render(hlo_rows(args.trace_dir), args.steps_per_call * args.calls,
           args.top, args.out_md)


if __name__ == "__main__":
    main()
