#!/usr/bin/env python
"""UCI regression experiment runner.

TPU-native rebuild of ref:experiments/main.py (SURVEY.md §2.5, §3.1): the
same flag surface — dataset, split, configuration string (G/L tokens), mode
(VI/IW), M inducing points, K importance samples, minibatch size,
iterations, Adam lr, natgrad gamma — wired to the JAX stack: data ->
build_model (k-means Z init) -> jitted natgrad+Adam training with monitor ->
mixture-NLL/RMSE evaluation -> sqlite results DB (bb schema).

Example (paper flagship config):
    python experiments/main.py --dataset kin8nm --configuration LG \
        --mode IW --K 20 --M 128 --iterations 20000
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the axon remote-compile tunnel costs
# seconds per (re)compiled executable, and every fresh process would
# otherwise recompile even tiny init ops.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dgps_with_iwvi_tpu.data import (get_classification_data,
                                     get_multiclass_data, get_regression_data)
from dgps_with_iwvi_tpu.evaluation import Database, evaluate
from dgps_with_iwvi_tpu.models import (BuildArgs, build_model, elbo,
                                       parse_prior_flag)
from dgps_with_iwvi_tpu.training import TrainConfig, fit
from dgps_with_iwvi_tpu.training.checkpoint import save_checkpoint
from dgps_with_iwvi_tpu.training.monitor import Monitor, hyperparameter_scalars


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="energy")
    p.add_argument("--split", type=int, default=0)
    p.add_argument("--configuration", default="G",
                   help="layer tokens: G=GP layer, L=latent-variable layer")
    p.add_argument("--mode", default="VI", choices=["VI", "IW", "vi", "iw"])
    p.add_argument("--M", type=int, default=128, help="inducing points")
    p.add_argument("--K", type=int, default=5, help="importance samples")
    p.add_argument("--num_samples", type=int, default=1, help="VI MC samples S")
    p.add_argument("--num_predict_samples", type=int, default=100)
    p.add_argument("--minibatch_size", type=int, default=512)
    p.add_argument("--iterations", type=int, default=20000)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--gamma", type=float, default=1e-2)
    p.add_argument("--gamma_warmup", type=int, default=0,
                   help="linear natgrad step-size warm-up over N steps")
    p.add_argument("--natgrad", default="final", choices=["final", "all", "none"])
    p.add_argument("--schedule", default="joint", choices=["joint", "alternating"])
    p.add_argument("--d_w", type=int, default=1, help="latent dim per LV layer")
    p.add_argument("--kernel", default="rbf",
                   help="leaf kinds rbf|matern12|matern32|matern52|rq|"
                        "cosine|arccosine[0|2]|linear|polynomial|periodic|"
                        "white|constant|coregion<C>x<R>, composable with "
                        "'+'/'*' (e.g. 'rbf+linear', 'rbf*periodic'); "
                        "per-leaf active dims as a '[...]' suffix "
                        "(e.g. 'rbf[0:3]*periodic[3]', 'linear[0,2,5]', "
                        "ICM multi-task: 'rbf[0:3]*coregion4x1[3]')")
    p.add_argument("--likelihood", default="gaussian",
                   choices=["gaussian", "bernoulli", "student_t",
                            "multiclass", "softmax", "ordinal"],
                   help="observation model; gaussian/student_t use the "
                        "standardized regression loader, bernoulli/"
                        "multiclass/ordinal the label-preserving loaders "
                        "(ordinal shares the quantile-binned loader — its "
                        "classes ARE ordered). The count/positive/interval "
                        "families (poisson, exponential, gamma, beta) and "
                        "the multi-task switched_gaussian (per-task noise, "
                        "task index in Y's last column — pair with a "
                        "coregion kernel) are library-level "
                        "(models.BuildArgs) since UCI targets are "
                        "real-valued single-task")
    p.add_argument("--num_classes", type=int, default=3,
                   help="multiclass/ordinal: number of classes C")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64"],
                   help="compute/parameter dtype for the WHOLE stack "
                        "(data, params, training, eval). 'float64' is the "
                        "reference's gpflow default and the escape hatch "
                        "for bound-comparison studies where even the "
                        "escalated-f32 policy is in question — pair it "
                        "with JAX_PLATFORMS=cpu (TPU MXUs have no native "
                        "f64; XLA:TPU emulation is orders slower). All "
                        "precision knobs below are f32-path no-ops under "
                        "float64: every dot is exact at width")
    p.add_argument("--pallas", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused Pallas conditional kernels (auto: currently "
                        "OFF at every shape — XLA's fusion measured faster "
                        "1.47-2.12x across the 6-shape sweep, "
                        "docs/PALLAS_SWEEP.md; 'on' forces the kernel)")
    p.add_argument("--var_precision", default="default",
                   choices=["highest", "high", "default"],
                   help="MXU precision for the q-variance matmuls only "
                        "(gram always runs HIGHEST); 'default' "
                        "measured quality-neutral at full convergence on "
                        "4 configs, ~+19%% steps/s (see DGPConfig)")
    p.add_argument("--solve_precision", default="high",
                   choices=["highest", "high"],
                   help="MXU precision for the conditional solve-path "
                        "matmuls (A = Linv Kuf, mean); 'high' quality-gated "
                        "at full convergence on 4 configs (+14%% steps/s); "
                        "set 'highest' to re-verify on new data families")
    p.add_argument("--solve_bwd_precision", default="auto",
                   choices=["auto", "same", "high", "default"],
                   help="MXU precision for the solve path's TRANSPOSED "
                        "(gradient) dots; 'auto' = single-pass bf16 when "
                        "natgrad layers exist (quality-gated, +3-7%% "
                        "steps/s), exact ('same') for pure-Adam training "
                        "(see TrainConfig.solve_bwd_precision)")
    p.add_argument("--gram_fwd_precision", default="highest",
                   choices=["highest", "high"],
                   help="MXU precision for the kernel gram cross-term dot "
                        "(kernels.GRAM_FWD_PRECISION). 'high' (bf16x3, "
                        "~1.5e-5 max rel gram error) — A/B with "
                        "benchmarks/gram_fwd_ab.py and pass "
                        "benchmarks/quality_gate.py --gram_fwd_precision "
                        "high before relying on it")
    p.add_argument("--gram_bwd_relax", action="store_true",
                   help="opt-in: single-pass bf16 for the kernel gram's "
                        "TRANSPOSED dots (kernels.GRAM_BWD_RELAX). ~+5%% "
                        "steps/s at D~90 (year scale), noise at small D; "
                        "quality-gate-MARGINAL (failed LGG by 0.001 nats "
                        "NLL) so NOT a default — see QUALITY_GATE_grambwd.md")
    p.add_argument("--prior", action="append", default=[],
                   help="hyperparameter prior, repeatable: "
                        "target=kind(a,b) with target in "
                        "{kernel_variance, lengthscales, noise_variance} "
                        "and kind in {gamma, lognormal, gaussian}; e.g. "
                        "--prior 'noise_variance=lognormal(-2,1)'")
    p.add_argument("--mean_function", default="auto",
                   choices=["auto", "zero", "skip", "constant", "linear"],
                   help="GP-layer mean function: 'auto' = reference "
                        "convention (Zero on the final layer, fixed "
                        "identity skips between inner layers); 'constant'/"
                        "'linear' are gpflow's TRAINABLE Constant / "
                        "Linear(A, b), Adam-optimized")
    p.add_argument("--feature", default="points",
                   choices=["points", "multiscale"],
                   help="inducing-feature family (ops/features.py): "
                        "'multiscale' gives every inducing point a "
                        "trainable Gaussian window (gpflow Multiscale; "
                        "RBF kernel only)")
    p.add_argument("--feature_init_scale", type=float, default=0.1,
                   help="multiscale window init width (0-ish starts at "
                        "plain inducing points)")
    p.add_argument("--non_amortized", action="store_true",
                   help="per-datapoint q(w) instead of the encoder (small N)")
    p.add_argument("--no_white", action="store_true",
                   help="non-whitened q(u) parameterization")
    p.add_argument("--q_diag", action="store_true",
                   help="diagonal q(u) covariance (requires --natgrad none)")
    p.add_argument("--shard", action="store_true",
                   help="train AND evaluate over all local devices: "
                        "('dp','k') mesh, minibatch rows sharded over "
                        "'dp', IW/MC samples over 'k', psum'd gradients "
                        "(parallel/sharding.py)")
    p.add_argument("--n_k", type=int, default=1,
                   help="with --shard: devices along the IW-sample mesh "
                        "axis (must divide K); the rest go to 'dp'")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps_per_call", type=int, default=500,
                   help="steps per scan-chunked dispatch (amortizes the "
                        "~30 ms host<->device round trip)")
    p.add_argument("--print_every", type=int, default=1000)
    p.add_argument("--results_db", default="results.db")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--log_dir", default=None, help="TensorBoard dir")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--ckpt_every", type=int, default=5000)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --ckpt_dir")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the training loop "
                        "(view with xprof/tensorboard)")
    p.add_argument("--max_n", type=int, default=None,
                   help="cap dataset size (smoke tests)")
    return p.parse_args(argv)


def run(args) -> dict:
    key = jax.random.PRNGKey(args.seed)
    data_kw = {} if args.data_dir is None else {"data_dir": args.data_dir}
    if args.likelihood == "bernoulli":
        get_data = get_classification_data
    elif args.likelihood in ("multiclass", "softmax", "ordinal"):
        data_kw["n_classes"] = args.num_classes
        get_data = get_multiclass_data
    else:
        get_data = get_regression_data
    data = get_data(args.dataset, args.split, max_n=args.max_n, **data_kw)
    if data.synthetic:
        print(f"[data] {args.dataset}: no pre-staged file found -> "
              f"deterministic synthetic surrogate (N={data.N}, D={data.D})")

    if args.dtype == "float64" and not jax.config.jax_enable_x64:
        # before any trace; harmless if the process already enabled it
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.dtype(args.dtype)
    X = jnp.asarray(data.X_train, dtype)
    Y = jnp.asarray(data.Y_train, dtype)
    build = BuildArgs(
        configuration=args.configuration, mode=args.mode.upper(),
        num_inducing=args.M, num_iw_samples=args.K,
        num_samples=args.num_samples, d_w=args.d_w,
        kernel_kind=args.kernel,
        use_pallas={"auto": "auto", "on": True, "off": False}[args.pallas],
        amortized=not args.non_amortized, likelihood=args.likelihood,
        num_classes=args.num_classes, mean_function=args.mean_function,
        white=not args.no_white, q_diag=args.q_diag,
        priors=tuple(parse_prior_flag(s) for s in args.prior),
        feature=args.feature, feature_init_scale=args.feature_init_scale,
        var_precision=args.var_precision,
        solve_precision=args.solve_precision)
    if args.gram_bwd_relax or args.gram_fwd_precision != "highest":
        from dgps_with_iwvi_tpu.ops import kernels as _kernels

        _kernels.GRAM_BWD_RELAX = args.gram_bwd_relax
        _kernels.GRAM_FWD_PRECISION = args.gram_fwd_precision
    kb, kt, ke = jax.random.split(key, 3)
    config, params = build_model(kb, build, X, Y)
    if args.ckpt_dir:
        # full model-structure record next to the checkpoints, so serve.py
        # rebuilds the exact model without re-specifying every flag
        from dgps_with_iwvi_tpu.models import save_build_args

        save_build_args(args.ckpt_dir, build, natgrad=args.natgrad)
    print(f"[model] {args.configuration} mode={config.objective} M={args.M} "
          f"K={args.K} N={data.N} D={data.D} on {jax.default_backend()}")

    tc_holder = []  # filled below; the monitor closure needs the TrainConfig

    def _scalars(state):
        return hyperparameter_scalars(state.rest, config,
                                      tc=tc_holder[0] if tc_holder else None,
                                      step=int(state.step))

    mon = Monitor(print_every=args.print_every, log_dir=args.log_dir,
                  scalars_fn=_scalars)
    last_ckpt = [0]

    def callback(step, mean_loss, state):
        mon(step, mean_loss, state)
        if args.ckpt_dir and step - last_ckpt[0] >= args.ckpt_every:
            save_checkpoint(args.ckpt_dir, step, state, kt)
            last_ckpt[0] = step

    tc = TrainConfig(
        lr=args.lr, gamma=args.gamma, gamma_warmup=args.gamma_warmup,
        natgrad=args.natgrad,
        schedule=args.schedule, minibatch_size=args.minibatch_size,
        iterations=args.iterations, steps_per_call=args.steps_per_call,
        solve_bwd_precision=args.solve_bwd_precision)
    tc_holder.append(tc)
    state0 = None
    if args.resume and args.ckpt_dir:
        from dgps_with_iwvi_tpu.training import make_trainer
        from dgps_with_iwvi_tpu.training.checkpoint import (
            latest_step, restore_checkpoint)

        step = latest_step(args.ckpt_dir)
        if step is not None:
            like = {"state": make_trainer(config, tc)[0](params), "key": kt}
            state0 = restore_checkpoint(args.ckpt_dir, step, like)["state"]
            last_ckpt[0] = step
            print(f"[resume] restored step {step} from {args.ckpt_dir}")
    mesh = None
    if args.shard:
        n_dev = len(jax.devices())
        if n_dev > 1:
            from dgps_with_iwvi_tpu.parallel import make_mesh

            mesh = make_mesh(n_dp=n_dev // args.n_k, n_k=args.n_k)
            print(f"[shard] ('dp','k') mesh {n_dev // args.n_k}x{args.n_k} "
                  f"over {n_dev} devices")
        else:
            print("[shard] single device visible — running unsharded")
    t0 = time.time()
    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            trained, state = fit(kt, config, params, X, Y, tc,
                                 callback=callback, state=state0, mesh=mesh)
    else:
        trained, state = fit(kt, config, params, X, Y, tc, callback=callback,
                             state=state0, mesh=mesh)
    train_time = time.time() - t0

    metrics = evaluate(
        trained, config, jnp.asarray(data.X_test, dtype),
        jnp.asarray(data.Y_test, dtype), ke,
        y_std=data.Y_std, num_samples=args.num_predict_samples,
        likelihood=args.likelihood, mesh=mesh)
    nb = min(args.minibatch_size, X.shape[0])
    final_elbo = float(elbo(trained, config, X[:nb], Y[:nb], ke,
                            data_idx=jnp.arange(nb)))
    # steady-state rate from the monitor (excludes jit compile); fall back
    # to the crude wall-clock estimate for very short runs
    import math

    steps_per_sec = mon.median_steps_per_sec
    if not math.isfinite(steps_per_sec) or steps_per_sec <= 0:
        steps_per_sec = mon.mean_steps_per_sec
    if not math.isfinite(steps_per_sec) or steps_per_sec <= 0:
        steps_per_sec = args.iterations / train_time

    # nominal + pass-adjusted MFU of the training step (utils/flops.py);
    # the chunk program is already compiled (cache hit), so this is cheap
    mfu = mfu_adj = flops_per_step = None
    try:
        from dgps_with_iwvi_tpu.training import make_trainer
        from dgps_with_iwvi_tpu.utils.flops import device_peak, program_cost

        init_fn, _, chunk_fn, _ = make_trainer(config, tc)
        cost = program_cost(jax.jit(chunk_fn).lower(
            init_fn(params), X, Y, kt))
        _, peak = device_peak()
        flops_per_step = cost["flops"]
        if peak and cost["flops"]:
            mfu = cost["flops"] * steps_per_sec / peak
        if peak and cost["adjusted_flops"]:
            mfu_adj = cost["adjusted_flops"] * steps_per_sec / peak
    except Exception:
        pass

    row = {
        "dataset": args.dataset, "split": args.split,
        "configuration": args.configuration, "mode": args.mode.upper(),
        "M": args.M, "K": args.K, "num_samples": args.num_samples,
        "minibatch_size": args.minibatch_size, "iterations": args.iterations,
        "lr": args.lr, "gamma": args.gamma,
        **metrics,
        "elbo": final_elbo, "steps_per_sec": steps_per_sec,
        "flops_per_step": flops_per_step,
        "mfu": mfu, "mfu_adjusted": mfu_adj,
        "synthetic_data": data.synthetic, "dtype": args.dtype,
        "backend": jax.default_backend(), "train_time_s": train_time,
    }
    Database(args.results_db).write_result(row)
    acc = (f"test_accuracy={metrics['test_accuracy']:.4f} "
           if "test_accuracy" in metrics else "")
    print(f"[result] test_loglik={metrics['test_loglik']:.4f} "
          f"test_rmse={metrics['test_rmse']:.4f} {acc}"
          f"({steps_per_sec:.1f} steps/s, {train_time:.1f}s train)")
    return row


def main(argv=None):
    """Console entry point (`dgp-train`)."""
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
