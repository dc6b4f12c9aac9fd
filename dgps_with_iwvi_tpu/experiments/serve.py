#!/usr/bin/env python
"""Batch prediction server/scorer: checkpoint -> predictions file.

Production-serving counterpart of the experiment harness: restores a
checkpoint written by experiments/main.py (--ckpt_dir), rebuilds the model
from the same flags, and scores an input table with the S-sample mixture
predictive (mean, variance, and per-point log-density when targets are
provided) — in ORIGINAL units, using the training split's normalization
statistics, exactly like the evaluation path (SURVEY.md §3.3).

Throughput: fixed-size padded batches so every call hits one compiled
program, with `--depth` async calls in flight so host<->device latency
overlaps device compute (measured 4.5x on the tunneled v5e — see
benchmarks/predict_bench.py).

Examples:
  # score the held-out test split of the training dataset
  python experiments/serve.py --dataset kin8nm --configuration LGG \\
      --mode IW --K 20 --ckpt_dir /tmp/ck --output /tmp/pred.npz

  # score an external delimited table of raw X rows
  python experiments/serve.py ... --input newdata.csv --output pred.npz
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dgps_with_iwvi_tpu.data import get_regression_data
from dgps_with_iwvi_tpu.models import BuildArgs, build_model, \
    load_build_args, predict_y_and_log_density
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer
from dgps_with_iwvi_tpu.training.checkpoint import latest_step, \
    restore_checkpoint


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--dataset", default="energy",
                   help="training dataset (fixes normalization stats)")
    p.add_argument("--split", type=int, default=0)
    p.add_argument("--configuration", default="G")
    p.add_argument("--mode", default="VI")
    p.add_argument("--M", type=int, default=128)
    p.add_argument("--K", type=int, default=5)
    p.add_argument("--d_w", type=int, default=1)
    p.add_argument("--kernel", default="rbf")
    p.add_argument("--likelihood", default="gaussian")
    p.add_argument("--natgrad", default=None,
                   help="TrainState layout of the checkpoint "
                        "(default: from build_args.json, else 'final')")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_dir", default=None,
                   help="checkpoint directory (required unless --from_export)")
    p.add_argument("--input", default=None,
                   help="npz (arrays X[, Y]) or delimited table of raw X "
                        "rows; default = the dataset's test split")
    p.add_argument("--output", default=None,
                   help="npz output path (required unless only --export)")
    p.add_argument("--export", default=None, metavar="PATH",
                   help="write a self-contained StableHLO serving artifact "
                        "(params + normalization baked in; see "
                        "dgps_with_iwvi_tpu/serving.py) and, if --output is "
                        "absent, exit without scoring")
    p.add_argument("--export_platforms", default=None,
                   help="comma list, e.g. 'tpu,cpu' for a portable artifact "
                        "(default: current backend only)")
    p.add_argument("--from_export", default=None, metavar="PATH",
                   help="score with a previously exported artifact instead "
                        "of a checkpoint (no model rebuild; single-device; "
                        "--ckpt_dir/--shard ignored)")
    p.add_argument("--num_predict_samples", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=2048,
                   help="scoring batch; with --export, 0 exports a "
                        "POLYMORPHIC-batch artifact (symbolic dim: one "
                        "artifact scores any n with no padding waste, one "
                        "compile per distinct size at load time)")
    p.add_argument("--depth", type=int, default=8,
                   help="async calls in flight")
    p.add_argument("--transport", default="float32",
                   choices=["float32", "bfloat16", "float16"],
                   help="dtype the RESULTS cross the device->host link in; "
                        "compute is untouched (the cast is a device-side "
                        "epilogue), so the only effect is rounding of the "
                        "delivered values in exchange for half the D2H "
                        "bytes on a transfer-bound link (docs/PERF.md). "
                        "Outputs are float32 on the host either way")
    p.add_argument("--transport_in", default="float32",
                   choices=["float32", "bfloat16"],
                   help="dtype the INPUT table crosses the host->device "
                        "link in (artifact path only). Inputs are upcast "
                        "to f32 on device, so compute stays f32 — but "
                        "this rounds the inputs themselves (~3 decimal "
                        "digits), perturbing the predictions, unlike the "
                        "output-only --transport. The input side is 36 of "
                        "the 48 B/row of a scoring round trip "
                        "(benchmarks/TRANSPORT_AB.md)")
    p.add_argument("--shard", action="store_true",
                   help="shard scoring rows over ALL local devices (params "
                        "replicated, GSPMD-partitioned predictive) — "
                        "per-point outputs identical to single-device")
    p.add_argument("--data_dir", default=None)
    return p.parse_args(argv)


def _load_input_raw(args, data):
    """-> (X_raw, Y_raw | None) in ORIGINAL units (for raw-unit artifacts).

    The stored test split is train-standardized, so reconstruct raw by
    inverting the exact standardization (data keeps the train stats)."""
    if args.input is None:
        X_raw = np.asarray(data.X_test) * data.X_std + data.X_mean
        Y_raw = np.asarray(data.Y_test) * data.Y_std + data.Y_mean
        return X_raw, Y_raw
    if args.input.endswith(".npz"):
        z = np.load(args.input)
        return (np.asarray(z["X"], np.float64),
                np.asarray(z["Y"], np.float64) if "Y" in z.files else None)
    from dgps_with_iwvi_tpu.data.native_loader import parse_table

    return parse_table(args.input), None


def _run_from_export(args) -> dict:
    """Score with a frozen StableHLO artifact: no checkpoint, no rebuild."""
    from dgps_with_iwvi_tpu.serving import load_scorer

    art = load_scorer(args.from_export)
    if not art.meta.get("raw_units"):
        raise SystemExit(
            "artifact was exported without normalization stats (raw_units="
            "false); score it via dgps_with_iwvi_tpu.serving.ServingArtifact "
            "in your own units instead")
    print(f"[serve] loaded artifact {args.from_export}: batch="
          f"{art.meta['batch_size']} S={art.meta['num_samples']} "
          f"platforms={art.meta['platforms']}")
    if args.input is None:
        data_kw = {} if args.data_dir is None else {"data_dir": args.data_dir}
        data = get_regression_data(args.dataset, args.split, **data_kw)
    else:
        data = None
    X_raw, Y_raw = _load_input_raw(args, data)
    t0 = time.perf_counter()
    out = art.score(X_raw, Y_raw, seed=args.seed, depth=args.depth,
                    transport=args.transport,
                    transport_in=args.transport_in)
    dt = time.perf_counter() - t0
    n = X_raw.shape[0]
    np.savez(args.output, num_samples=art.meta["num_samples"], **out)
    rate = n / dt
    print(f"[serve] scored {n} points in {dt:.2f}s = {rate:,.0f} points/s "
          f"(artifact, S={art.meta['num_samples']}, "
          f"batch={art.meta['batch_size']}, depth={args.depth}) "
          f"-> {args.output}")
    return {"n": n, "points_per_sec": rate, "output": args.output}


def _load_input(args, data):
    """-> (X_norm, Y_norm | None) in the train-split-standardized space."""
    if args.input is None:  # test split is stored already standardized
        return np.asarray(data.X_test), np.asarray(data.Y_test)
    if args.input.endswith(".npz"):
        z = np.load(args.input)
        X_raw = np.asarray(z["X"], np.float64)
        Y_raw = np.asarray(z["Y"], np.float64) if "Y" in z.files else None
    else:
        from dgps_with_iwvi_tpu.data.native_loader import parse_table

        X_raw, Y_raw = parse_table(args.input), None
    Xn = (X_raw - data.X_mean) / data.X_std
    Yn = None if Y_raw is None else (Y_raw - data.Y_mean) / data.Y_std
    return Xn, Yn


def run(args) -> dict:
    if args.output is None and args.export is None:
        raise SystemExit("need --output (scoring) and/or --export (artifact)")
    if args.from_export is not None:
        if args.output is None:
            raise SystemExit("--from_export needs --output")
        if args.export is not None:
            raise SystemExit("--from_export cannot re-export; run a "
                             "--ckpt_dir --export pass instead")
        return _run_from_export(args)
    if args.ckpt_dir is None:
        raise SystemExit("need --ckpt_dir (or --from_export)")
    data_kw = {} if args.data_dir is None else {"data_dir": args.data_dir}
    data = get_regression_data(args.dataset, args.split, **data_kw)
    key = jax.random.PRNGKey(args.seed)
    # Prefer the BuildArgs persisted by experiments/main.py next to the
    # checkpoint: it records the FULL model structure (q_diag, white,
    # amortized, precision knobs, ...), so any checkpoint restores exactly.
    loaded = load_build_args(args.ckpt_dir, with_meta=True)
    natgrad = args.natgrad
    if loaded is None:
        build = BuildArgs(
            configuration=args.configuration, mode=args.mode.upper(),
            num_inducing=args.M, num_iw_samples=args.K, d_w=args.d_w,
            kernel_kind=args.kernel, likelihood=args.likelihood)
        natgrad = natgrad or "final"
        print("[serve] no build_args.json in ckpt_dir; rebuilding from "
              "flags (pre-r3 checkpoint?) — structure flags like --q_diag/"
              "--no_white are NOT representable this way")
    else:
        build, meta = loaded
        natgrad = natgrad or meta.get("natgrad", "final")
        print(f"[serve] model structure from {args.ckpt_dir}/build_args.json"
              f" ({build.configuration} mode={build.mode} M="
              f"{build.num_inducing} K={build.num_iw_samples} "
              f"natgrad={natgrad})")
    kb, kt, ke = jax.random.split(key, 3)
    X_tr = jnp.asarray(data.X_train)
    Y_tr = jnp.asarray(data.Y_train)
    config, params0 = build_model(kb, build, X_tr, Y_tr)

    step = latest_step(args.ckpt_dir)
    if step is None:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    tc = TrainConfig(natgrad=natgrad)
    init_fn, _, _, params_fn = make_trainer(config, tc)
    like = {"state": init_fn(params0), "key": kt}
    state = restore_checkpoint(args.ckpt_dir, step, like)["state"]
    params = params_fn(state)
    print(f"[serve] restored step {step} from {args.ckpt_dir}")

    if args.export is not None:
        from dgps_with_iwvi_tpu.serving import (NormalizationStats,
                                                export_scorer, save_scorer)

        platforms = (tuple(args.export_platforms.split(","))
                     if args.export_platforms else None)
        exp = export_scorer(
            params, config,
            batch_size="b" if args.batch_size == 0 else args.batch_size,
            d_in=X_tr.shape[1], d_out=Y_tr.shape[1],
            num_samples=args.num_predict_samples,
            stats=NormalizationStats.from_dataset(data),
            platforms=platforms)
        meta = save_scorer(
            args.export, exp, num_samples=args.num_predict_samples,
            has_stats=True,
            extra_meta={"checkpoint_step": step, "dataset": args.dataset,
                        "split": args.split})
        print(f"[serve] exported StableHLO artifact -> {args.export} "
              f"(batch={meta['batch_size']}, S={meta['num_samples']}, "
              f"platforms={meta['platforms']}, raw units)")
        if args.output is None:
            return {"export": args.export, **meta}

    Xn, Yn = _load_input(args, data)
    n = Xn.shape[0]
    Xs = jnp.asarray(Xn, jnp.float32)
    have_y = Yn is not None
    Ys = (jnp.asarray(Yn, jnp.float32) if have_y
          else jnp.zeros((n, Y_tr.shape[1]), jnp.float32))

    S = args.num_predict_samples
    bs = min(args.batch_size, n)
    mesh = None
    if args.shard and len(jax.devices()) > 1:
        from dgps_with_iwvi_tpu.evaluation.metrics import replicate_for_eval
        from dgps_with_iwvi_tpu.parallel import make_mesh

        mesh = make_mesh(n_dp=len(jax.devices()), n_k=1)
        bs += (-bs) % mesh.devices.size
        params = replicate_for_eval(mesh, params)
        print(f"[serve] sharding rows over {mesh.devices.size} devices")

    transport_dt = jnp.dtype(args.transport)

    @jax.jit
    def score(params, xb, yb, k):
        import contextlib
        from dgps_with_iwvi_tpu.ops.conditionals import qvar_pallas_disabled
        # GSPMD cannot auto-partition a Mosaic custom call — the sharded
        # path stays pure-XLA (single-device scoring keeps the fused
        # q-variance kernel, ops/pallas/qvar.py)
        ctx = qvar_pallas_disabled() if mesh is not None \
            else contextlib.nullcontext()
        with ctx:
            out = predict_y_and_log_density(params, config, xb, yb, k, S)
        # --transport: results cross D2H narrow; compute above is untouched
        return jax.tree.map(lambda a: a.astype(transport_dt), out)

    def _place(xb, yb):
        if mesh is None:
            return xb, yb
        from dgps_with_iwvi_tpu.evaluation.metrics import shard_eval_batch

        return shard_eval_batch(mesh, xb, yb)

    # compile outside the timed region (first call traces + compiles)
    wx, wy = Xs[:bs], Ys[:bs]
    if wx.shape[0] < bs:
        padw = bs - wx.shape[0]
        wx = jnp.concatenate([wx, jnp.zeros((padw,) + wx.shape[1:], wx.dtype)])
        wy = jnp.concatenate([wy, jnp.zeros((padw,) + wy.shape[1:], wy.dtype)])
    warm = score(params, *_place(wx, wy), ke)
    jax.block_until_ready(warm[1])

    # fixed-size padded batches; --depth calls kept in flight
    t0 = time.perf_counter()
    outs = []
    starts = list(range(0, n, bs))
    for start in starts:
        xb, yb = Xs[start:start + bs], Ys[start:start + bs]
        pad = bs - xb.shape[0]
        if pad:
            xb = jnp.concatenate([xb, jnp.zeros((pad,) + xb.shape[1:], xb.dtype)])
            yb = jnp.concatenate([yb, jnp.zeros((pad,) + yb.shape[1:], yb.dtype)])
        xb, yb = _place(xb, yb)
        outs.append(((start, pad),
                     score(params, xb, yb, jax.random.fold_in(ke, start))))
        if len(outs) >= args.depth:  # bound in-flight work
            jax.block_until_ready(outs[-args.depth][1][1])
    # one device_get for all batches: per-array np.asarray would pay a
    # sequential host<->device round trip each (~30 ms through the tunnel)
    fetched = jax.device_get([o for _, o in outs])
    means, variances, lds = [], [], []
    for ((start, pad), _), ((m, v), ld) in zip(outs, fetched):
        take = bs - pad
        means.append(np.asarray(m[:take], np.float32))
        variances.append(np.asarray(v[:take], np.float32))
        lds.append(np.asarray(ld[:take], np.float32))
    dt = time.perf_counter() - t0
    mean = np.concatenate(means)
    var = np.concatenate(variances)
    ld = np.concatenate(lds)

    y_std = np.asarray(data.Y_std).reshape(1, -1)
    y_mean = np.asarray(data.Y_mean).reshape(1, -1)
    out = {
        "mean": mean * y_std + y_mean,            # original units
        "var": var * y_std ** 2,
        "num_samples": S,
        "checkpoint_step": step,
    }
    if have_y:
        out["log_density"] = ld - float(np.sum(np.log(y_std)))
    np.savez(args.output, **out)
    rate = n / dt
    print(f"[serve] scored {n} points in {dt:.2f}s = {rate:,.0f} points/s "
          f"(S={S}, batch={bs}, depth={args.depth}) -> {args.output}")
    return {"n": n, "points_per_sec": rate, "output": args.output}


def main(argv=None):
    """Console entry point (`dgp-serve`)."""
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
