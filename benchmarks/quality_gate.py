#!/usr/bin/env python
"""Codified precision/numerics quality gate (VERDICT r2 item 5).

The rule this repo learned the hard way (docs/PERF.md): CPU-float64 unit
tests CANNOT catch TPU matmul-precision regressions — only full-convergence
trained-quality A/B against a known-good setting can. Round 2 ran that A/B
by hand to gate `var_precision='default'` and `solve_precision='high'`;
this script makes it one reproducible command so no future precision or
numerics change lands ungated.

Protocol (exactly the round-2 gate):
- 4 configs spanning the objective/optimizer space, chosen because they
  caught real regressions before: LG-energy (natgrad+Adam, the config where
  default-precision natgrad matmuls silently degraded ELBO -551 -> -2258),
  LG-kin8nm, LGG-kin8nm (deep + IW), GG-energy ADAM-ONLY (the config whose
  step-1 NaN exposed the sqrt-at-zero AD hazard — always gate on an
  Adam-only config).
- each trained 15k steps under (a) the reference setting — everything
  HIGHEST — and (b) the candidate setting (default: the production
  defaults), same seed/data.
- PASS iff on EVERY config: all losses finite, converged ELBO within
  rel_tol (default 1e-3), test NLL within nll_tol (default 0.005 nats).

Writes benchmarks/QUALITY_GATE.md (+ .json) with a dated verdict.

    python benchmarks/quality_gate.py                   # gate the defaults
    python benchmarks/quality_gate.py --var_precision high   # gate a change
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --mesh gates the SHARDED trainer (parallel/sharding.py) at convergence on
# a virtual CPU device mesh — the backend choice must happen before the
# first backend initialization, hence this pre-import argv sniff (the
# container's sitecustomize pre-imports jax, so plain env vars are too
# late; jax.config.update still works until a backend is live).
_MESH_ARG = next((a.split("=", 1)[1] if "=" in a else sys.argv[i + 1]
                  for i, a in enumerate(sys.argv)
                  if a == "--mesh" or a.startswith("--mesh=")), None)

import jax

if _MESH_ARG:
    _dp, _k = map(int, _MESH_ARG.lower().split("x"))
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", _dp * _k)
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dgps_with_iwvi_tpu.data import get_regression_data
from dgps_with_iwvi_tpu.evaluation import evaluate
from dgps_with_iwvi_tpu.models import BuildArgs, build_model, elbo
from dgps_with_iwvi_tpu.training import TrainConfig, fit

# (label, dataset, configuration, mode, K, natgrad)
GATE_CONFIGS = [
    ("LG-energy natgrad", "energy", "LG", "IW", 5, "final"),
    ("LG-kin8nm natgrad", "kin8nm", "LG", "IW", 5, "final"),
    ("LGG-kin8nm natgrad", "kin8nm", "LGG", "IW", 20, "final"),
    ("GG-energy ADAM-ONLY", "energy", "GG", "VI", 1, "none"),
    # BASELINE.md config 5 (year scale): the one shape regime that stacks
    # EVERY production relaxation at once — remat (98 MB residual), bf16
    # residual, the fused train kernel (d*n=15360 clears its floor), the
    # epilogue policy, solve_bwd — yet was absent from the gate set until
    # r5 (the B=2048 solve_bwd collapse showed gates catch what A/Bs
    # miss). N=515345 keeps it minibatched at every gate batch size.
    ("LGGG-year natgrad", "year", "LGGG", "IW", 50, "final"),
]


def run_setting(label, dataset, conf, mode, K, natgrad, *, var_precision,
                solve_precision, iterations, seed=0, qvar_bf16="auto",
                solve_bwd="same", gram_fwd="highest", mesh=None,
                qvar_train="off", minibatch=512, epi="auto",
                epi_train="auto", full_batch="auto", gram_kres="auto",
                kuf_bf16="off"):
    from dgps_with_iwvi_tpu.ops import conditionals as _cond
    from dgps_with_iwvi_tpu.ops import kernels as _kern

    _cond.QVAR_BF16_RESIDUAL = qvar_bf16  # trace-time module switch
    _cond.QVAR_PALLAS_TRAIN = qvar_train  # trace-time module switch
    _cond.EPI_PALLAS = epi  # trace-time module switch
    _cond.EPI_TRAIN = epi_train  # trace-time module switch
    _kern.GRAM_FWD_PRECISION = gram_fwd  # trace-time module switch
    _kern.GRAM_KUF_RESIDUAL = gram_kres  # trace-time module switch
    _kern.KRES_BF16_RESIDUAL = kuf_bf16  # trace-time module switch
    data = get_regression_data(dataset, 0)
    X, Y = jnp.asarray(data.X_train), jnp.asarray(data.Y_train)
    key = jax.random.PRNGKey(seed)
    b = BuildArgs(configuration=conf, mode=mode, num_inducing=128,
                  num_iw_samples=K, var_precision=var_precision,
                  solve_precision=solve_precision)
    cfg, params = build_model(key, b, X, Y)
    tc = TrainConfig(lr=5e-3, gamma=1e-2, natgrad=natgrad,
                     minibatch_size=minibatch, iterations=iterations,
                     steps_per_call=min(500, iterations),
                     solve_bwd_precision=solve_bwd,
                     full_batch_precision=full_batch)
    losses = []
    tr, _ = fit(key, cfg, params, X, Y, tc,
                callback=lambda s, l, _st: losses.append(l), mesh=mesh)
    nb = min(2048, X.shape[0])
    # the bound is an MC estimate for LV/IW models (per-point SE ~1e-3 at
    # this batch size) — average 8 eval keys so eval noise cannot flip the
    # gate; trajectory-level noise is handled by the seed-band calibration.
    # MEASUREMENT precision is pinned to highest for BOTH sides: the gate
    # compares TRAINED-PARAMETER quality, and evaluating each side with its
    # own knobs mixes eval rounding into the verdict (measured 2.7e-3 rel
    # on LGG-kin8nm B=8192 — bit-identical trajectories, different eval
    # precision — vs the 1e-3 tolerance floor; r5)
    import dataclasses as _dc
    cfg_eval = _dc.replace(cfg, var_precision="highest",
                           solve_precision="highest")
    ej = jax.jit(lambda k: elbo(tr, cfg_eval, X[:nb], Y[:nb], k))
    e = float(np.mean([float(ej(jax.random.PRNGKey(100 + i)))
                       for i in range(8)])) / cfg.num_data
    m = evaluate(tr, cfg_eval, data.X_test, data.Y_test,
                 jax.random.PRNGKey(100),
                 y_std=data.Y_std, num_samples=100)
    return {"elbo_per_point": e, "test_nll": -m["test_loglik"],
            "test_rmse": m["test_rmse"],
            "finite": bool(np.all(np.isfinite(losses)))}


def run_mesh_gate(args):
    """Converged-trajectory gate for the sharded trainer (VERDICT r3 item
    2): single-device vs fit(mesh=...) on a virtual CPU mesh, both at the
    production precision defaults, judged against the single-device
    seed-to-seed band. Complements tests/test_parallel.py, which pins
    sharded == single-device only at step/chunk granularity."""
    import numpy as np

    from jax.sharding import Mesh

    dp, k = map(int, args.mesh.lower().split("x"))
    gc = next((g for g in GATE_CONFIGS if g[0] == args.mesh_config), None)
    assert gc is not None, (args.mesh_config, [g[0] for g in GATE_CONFIGS])
    mesh = Mesh(np.array(jax.devices()[:dp * k]).reshape(dp, k),
                ("dp", "k"))
    kw = dict(var_precision="default", solve_precision="high",
              iterations=args.iterations)
    t0 = time.time()
    ref = run_setting(*gc, seed=0, **kw)
    ref2 = run_setting(*gc, seed=1, **kw)
    cand = run_setting(*gc, seed=0, mesh=mesh, **kw)
    scale = max(abs(ref["elbo_per_point"]), 1e-9)
    band = abs(ref2["elbo_per_point"] - ref["elbo_per_point"]) / scale
    band_nll = abs(ref2["test_nll"] - ref["test_nll"])
    tol_elbo = max(args.rel_tol, 1.5 * band)
    tol_nll = max(args.nll_tol, 1.5 * band_nll)
    d_elbo = abs(cand["elbo_per_point"] - ref["elbo_per_point"]) / scale
    d_nll = abs(cand["test_nll"] - ref["test_nll"])
    ok = (ref["finite"] and ref2["finite"] and cand["finite"]
          and d_elbo <= tol_elbo and d_nll <= tol_nll)
    verdict = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "mesh": {"dp": dp, "k": k}, "config": gc[0],
        "iterations": args.iterations, "backend": jax.default_backend(),
        "pass": ok,
        "rows": [{"config": gc[0], "ok": ok,
                  "elbo_single": ref["elbo_per_point"],
                  "elbo_single_seed1": ref2["elbo_per_point"],
                  "elbo_mesh": cand["elbo_per_point"],
                  "d_elbo_rel": d_elbo, "seed_band_rel": band,
                  "tol_elbo_rel": tol_elbo,
                  "nll_single": ref["test_nll"], "nll_mesh": cand["test_nll"],
                  "d_nll": d_nll, "seed_band_nll": band_nll,
                  "tol_nll": tol_nll, "seconds": time.time() - t0}],
    }
    out = args.out + "_mesh"
    with open(out + ".json", "w") as f:
        json.dump(verdict, f, indent=1)
    r = verdict["rows"][0]
    with open(out + ".md", "w") as f:
        f.write(
            f"# Sharded-trainer convergence gate — "
            f"{'PASS' if ok else 'FAIL'}\n\n"
            f"{verdict['date']}, backend={verdict['backend']} "
            f"({dp}x{k} virtual mesh), config {gc[0]}, "
            f"{args.iterations} steps, production precision defaults "
            "both sides. The sharded trajectory (rows over 'dp', samples "
            "over 'k', psum'd grads) must land within 1.5x the "
            "single-device seed-to-seed band — a TRAJECTORY property; the "
            "test suite pins only step-granular exactness.\n\n"
            "| config | verdict | ELBO/n single | ELBO/n seed1 | ELBO/n "
            "mesh | dELBO rel | band | NLL single | NLL mesh | dNLL |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
            f"| {gc[0]} | {'PASS' if ok else 'FAIL'} | "
            f"{r['elbo_single']:+.4f} | {r['elbo_single_seed1']:+.4f} | "
            f"{r['elbo_mesh']:+.4f} | {r['d_elbo_rel']:.2e} | "
            f"{r['seed_band_rel']:.2e} | {r['nll_single']:+.4f} | "
            f"{r['nll_mesh']:+.4f} | {r['d_nll']:.4f} |\n")
    print(f"mesh gate: {'PASS' if ok else 'FAIL'} dELBO={d_elbo:.2e} "
          f"(band {band:.2e}) dNLL={d_nll:.4f} (band {band_nll:.4f}) "
          f"-> {out}.md ({time.time() - t0:.0f}s)")
    return verdict


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--var_precision", default="default",
                   choices=["highest", "high", "default"],
                   help="candidate q-variance matmul precision")
    p.add_argument("--solve_precision", default="high",
                   choices=["highest", "high", "default"],
                   help="candidate solve-path precision")
    p.add_argument("--iterations", type=int, default=15000)
    p.add_argument("--rel_tol", type=float, default=1e-3,
                   help="max |ELBO_cand - ELBO_ref| / |ELBO_ref|")
    p.add_argument("--nll_tol", type=float, default=0.005,
                   help="max |NLL_cand - NLL_ref| (nats)")
    p.add_argument("--qvar_bf16_residual", default="auto",
                   choices=["auto", "on", "off"],
                   help="candidate q-variance AD-residual storage "
                        "(ops/conditionals.QVAR_BF16_RESIDUAL): auto = the "
                        "shipped policy (bf16 iff M<=256 and f32 compute), "
                        "on/off force it; the all-HIGHEST reference always "
                        "runs exact f32 residuals")
    p.add_argument("--minibatch", type=int, default=512,
                   help="training minibatch for all gate runs (default 512 "
                        "= the flagship config; 2048 puts the gate in the "
                        "regime where the QVAR_PALLAS_TRAIN auto policy "
                        "actually dispatches the fused kernel)")
    p.add_argument("--epi_pallas", default="auto",
                   help="EPI_PALLAS for the CANDIDATE runs (the "
                        "epilogue-fused conditional kernel; 'auto' fires "
                        "exactly when a q-variance kernel gate fires, so "
                        "pair with --qvar_pallas_train auto and a large "
                        "--minibatch to exercise it)")
    p.add_argument("--epi_train", default="auto",
                   help="EPI_TRAIN for the CANDIDATE runs ('mean' forces "
                        "the full epilogue-fused training kernel below "
                        "its d*n floor — use to gate it at gateable "
                        "minibatch sizes)")
    p.add_argument("--qvar_pallas_train", default="off",
                   help="QVAR_PALLAS_TRAIN for the candidate: off (default "
                        "— gate the precision knobs alone) | auto | on. "
                        "'on' forces the fused Pallas backward kernel at "
                        "the gate's B=512 shapes (below the auto floor) so "
                        "its bf16-class rounding is convergence-gated")
    p.add_argument("--solve_bwd_precision", default="auto",
                   choices=["auto", "same", "high", "default"],
                   help="candidate precision for the solve path's "
                        "TRANSPOSED dots (TrainConfig.solve_bwd_precision; "
                        "'auto' = single-pass bf16 iff natgrad layers "
                        "exist); the all-HIGHEST reference always runs "
                        "'same'")
    p.add_argument("--gram_fwd_precision", default="highest",
                   choices=["highest", "high"],
                   help="candidate precision for the kernel gram cross-term "
                        "dot (kernels.GRAM_FWD_PRECISION); 'high' = bf16x3, "
                        "~1.5e-5 max rel gram error vs 4.8e-7 at 'highest'; "
                        "the all-HIGHEST reference always runs 'highest'")
    p.add_argument("--gram_kres", default="auto",
                   choices=["auto", "on", "off"],
                   help="candidate kernels.GRAM_KUF_RESIDUAL: the RBF "
                        "gram vjp that keeps the gram OUTPUT as its "
                        "residual instead of the squared distance (same "
                        "precision class, different rounding order in "
                        "dls/dZ/dvar); the all-HIGHEST reference always "
                        "runs the plain AD path")
    p.add_argument("--kuf_bf16", default="off",
                   choices=["auto", "on", "off"],
                   help="candidate kernels.KRES_BF16_RESIDUAL (bf16 Kuf "
                        "residual): QUALITY-REJECTED r5 — forced on at "
                        "B=2048 it collapses LGG-kin8nm by 17% ELBO "
                        "(QUALITY_GATE_kres.md); default off = shipped")
    p.add_argument("--full_batch_precision", default="auto",
                   choices=["auto", "off"],
                   help="candidate TrainConfig.full_batch_precision: 'auto' "
                        "= the shipped B >= N escalation policy "
                        "(train.resolve_full_batch), 'off' reproduces the "
                        "pre-escalation behavior (the r4 B=8192 FAIL)")
    p.add_argument("--reuse_ref", default=None, metavar="VERDICT_JSON",
                   help="reuse the all-HIGHEST reference rows (both seeds) "
                        "from a previous gate verdict JSON instead of "
                        "re-training them — valid only when minibatch/"
                        "iterations match and that verdict's reference was "
                        "'highest' (the escalation policy provably leaves "
                        "the all-HIGHEST trajectory unchanged: every knob "
                        "it touches is already at its exact setting there)")
    p.add_argument("--configs", default=None,
                   help="comma-separated substrings selecting a SUBSET of "
                        "GATE_CONFIGS (e.g. 'LGG-kin8nm') — for isolating "
                        "which config a candidate knob breaks; a subset run "
                        "is diagnostic, not a shippable gate verdict")
    p.add_argument("--quick", action="store_true",
                   help="smoke mode: 500 iterations, loose tolerances")
    p.add_argument("--mesh", default=None, metavar="DPxK",
                   help="gate the SHARDED trainer at convergence: train one "
                        "gate config through fit(mesh=Mesh(dp,k)) on a "
                        "virtual CPU mesh and compare converged ELBO/NLL to "
                        "the single-device run (same backend, same "
                        "production precision) against the seed band. "
                        "Checks accumulated drift of the psum'd trajectory "
                        "over the full run — the step-granular exactness "
                        "tests (tests/test_parallel.py) cannot. Writes "
                        "QUALITY_GATE_mesh.*")
    p.add_argument("--mesh_config", default="LG-energy natgrad",
                   help="--mesh: which GATE_CONFIGS label to run (pick one "
                        "whose K is divisible by the mesh's k axis)")
    p.add_argument("--reference", default="highest",
                   choices=["highest", "production"],
                   help="what the candidate is judged against: 'highest' "
                        "(default) = the all-HIGHEST-precision run — gates "
                        "the WHOLE candidate stack; 'production' = the "
                        "shipped production defaults (var=default, "
                        "solve=high, bf16 residual auto, no candidate "
                        "knobs) — isolates ONE knob under test from the "
                        "already-gated precision policy")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "QUALITY_GATE"))
    args = p.parse_args(argv)
    if args.quick:
        args.iterations, args.rel_tol, args.nll_tol = 500, 0.2, 0.5
    if args.mesh:
        return run_mesh_gate(args)

    reuse = None
    if args.reuse_ref:
        with open(args.reuse_ref) as f:
            prev = json.load(f)
        assert prev["candidate"]["minibatch"] == args.minibatch, \
            (prev["candidate"]["minibatch"], args.minibatch)
        assert prev["iterations"] == args.iterations
        assert prev["reference"].get("var_precision") == "highest" \
            and args.reference == "highest", \
            "--reuse_ref requires all-HIGHEST references on both sides"
        reuse = {r["config"]: r for r in prev["rows"]}

    gate_configs = GATE_CONFIGS
    if args.configs:
        sel = [s.strip() for s in args.configs.split(",")]
        gate_configs = [g for g in GATE_CONFIGS
                        if any(s in g[0] for s in sel)]
        assert gate_configs, (args.configs, [g[0] for g in GATE_CONFIGS])

    rows, ok_all = [], True
    for gc in gate_configs:
        label = gc[0]
        t0 = time.time()
        if args.reference == "production":
            ref_kw = dict(var_precision="default", solve_precision="high",
                          qvar_bf16="auto")
        else:
            ref_kw = dict(var_precision="highest", solve_precision="highest",
                          qvar_bf16=False, gram_kres="off", kuf_bf16="off")
        if reuse is not None and label in reuse:
            pr = reuse[label]
            ref = {"elbo_per_point": pr["elbo_ref"],
                   "test_nll": pr["nll_ref"], "finite": pr["finite"]}
            # only the BAND of seed 1 is persisted; reconstruct a value at
            # the recorded distance — the gate consumes |ref2 - ref| only
            ref2 = {"elbo_per_point": pr["elbo_ref_seed1"],
                    "test_nll": pr["nll_ref"] + pr["seed_band_nll"],
                    "finite": pr["finite"]}
        else:
            ref = run_setting(*gc, minibatch=args.minibatch,
                              iterations=args.iterations, **ref_kw)
            # second reference SEED at the same (highest) setting: two
            # RNG-different trajectories land at different points of the
            # optimizer's stationary distribution, so the seed band is the
            # noise floor any candidate comparison must respect — a candidate
            # cannot be held to a tighter tolerance than the reference's own
            # run-to-run variation (measured ~2e-3 rel on LGG-kin8nm)
            ref2 = run_setting(*gc, minibatch=args.minibatch,
                               iterations=args.iterations, seed=1, **ref_kw)
        cand = run_setting(*gc, var_precision=args.var_precision,
                           solve_precision=args.solve_precision,
                           iterations=args.iterations,
                           qvar_bf16={"auto": "auto", "on": True,
                                      "off": False}[args.qvar_bf16_residual],
                           solve_bwd=args.solve_bwd_precision,
                           gram_fwd=args.gram_fwd_precision,
                           qvar_train=args.qvar_pallas_train,
                           minibatch=args.minibatch,
                           epi=args.epi_pallas, epi_train=args.epi_train,
                           full_batch=args.full_batch_precision,
                           gram_kres={"auto": "auto", "on": True,
                                      "off": False}[args.gram_kres],
                           kuf_bf16={"auto": "auto", "on": True,
                                     "off": False}[args.kuf_bf16])
        scale = max(abs(ref["elbo_per_point"]), 1e-9)
        band = abs(ref2["elbo_per_point"] - ref["elbo_per_point"]) / scale
        band_nll = abs(ref2["test_nll"] - ref["test_nll"])
        tol_elbo = max(args.rel_tol, 1.5 * band)
        tol_nll = max(args.nll_tol, 1.5 * band_nll)
        d_elbo = abs(cand["elbo_per_point"] - ref["elbo_per_point"]) / scale
        d_nll = abs(cand["test_nll"] - ref["test_nll"])
        ok = (ref["finite"] and ref2["finite"] and cand["finite"]
              and d_elbo <= tol_elbo and d_nll <= tol_nll)
        ok_all = ok_all and ok
        rows.append({
            "config": label, "ok": ok,
            "elbo_ref": ref["elbo_per_point"],
            "elbo_ref_seed1": ref2["elbo_per_point"],
            "elbo_cand": cand["elbo_per_point"], "d_elbo_rel": d_elbo,
            "seed_band_rel": band, "tol_elbo_rel": tol_elbo,
            "nll_ref": ref["test_nll"], "nll_cand": cand["test_nll"],
            "d_nll": d_nll, "seed_band_nll": band_nll, "tol_nll": tol_nll,
            "finite": ref["finite"] and ref2["finite"] and cand["finite"],
            "seconds": time.time() - t0,
        })
        print(f"  {label:24s} {'PASS' if ok else 'FAIL'} "
              f"dELBO={d_elbo:.2e} (band {band:.2e}) dNLL={d_nll:.4f} "
              f"(band {band_nll:.4f}) ({rows[-1]['seconds']:.0f}s)",
              flush=True)

    verdict = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "candidate": {"var_precision": args.var_precision,
                      "solve_precision": args.solve_precision,
                      "qvar_bf16_residual": args.qvar_bf16_residual,
                      "qvar_pallas_train": args.qvar_pallas_train,
                      "epi_pallas": args.epi_pallas,
                      "epi_train": args.epi_train,
                      "minibatch": args.minibatch,
                      "solve_bwd_precision": args.solve_bwd_precision,
                      "gram_fwd_precision": args.gram_fwd_precision,
                      "full_batch_precision": args.full_batch_precision,
                      "gram_kres": args.gram_kres,
                      "kuf_bf16": args.kuf_bf16,
                      "reused_ref": bool(args.reuse_ref)},
        "reference": ({"var_precision": "highest",
                       "solve_precision": "highest"}
                      if args.reference == "highest" else
                      {"var_precision": "default", "solve_precision": "high",
                       "qvar_bf16_residual": "auto",
                       "note": "production defaults — single-knob gate"}),
        "iterations": args.iterations,
        "tolerances": {"elbo_rel": args.rel_tol, "nll_nats": args.nll_tol},
        "backend": jax.default_backend(),
        "pass": ok_all,
        "rows": rows,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(verdict, f, indent=1)
    with open(args.out + ".md", "w") as f:
        f.write(f"# Quality gate — {'PASS' if ok_all else 'FAIL'}\n\n"
                f"{verdict['date']}, backend={verdict['backend']}, "
                f"candidate var={args.var_precision} "
                f"solve={args.solve_precision} "
                f"solve_bwd={args.solve_bwd_precision} "
                f"qvar_bf16={args.qvar_bf16_residual} "
                f"qvar_pallas_train={args.qvar_pallas_train} "
                f"epi_pallas={args.epi_pallas} "
                f"epi_train={args.epi_train} "
                f"gram_fwd={args.gram_fwd_precision} "
                f"gram_kres={args.gram_kres} "
                f"kuf_bf16={args.kuf_bf16} "
                f"full_batch={args.full_batch_precision} vs "
                f"{'all-HIGHEST' if args.reference == 'highest' else 'production defaults'} "
                f"(minibatch {args.minibatch}), "
                f"{args.iterations} steps. Tolerance per config = "
                f"max(floor, 1.5x the reference's own seed-to-seed band); "
                f"floors: ELBO rel {args.rel_tol}, NLL {args.nll_tol} "
                "nats. Bound values are 8-key MC averages.\n\n"
                "| config | verdict | ELBO/n ref | ELBO/n cand | dELBO rel "
                "| seed band | NLL ref | NLL cand | dNLL |\n"
                "|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['config']} | {'PASS' if r['ok'] else 'FAIL'} | "
                    f"{r['elbo_ref']:+.4f} | {r['elbo_cand']:+.4f} | "
                    f"{r['d_elbo_rel']:.2e} | {r['seed_band_rel']:.2e} | "
                    f"{r['nll_ref']:+.4f} | "
                    f"{r['nll_cand']:+.4f} | {r['d_nll']:.4f} |\n")
    print(f"gate: {'PASS' if ok_all else 'FAIL'} -> {args.out}.md")
    return verdict


if __name__ == "__main__":
    sys.exit(0 if main()["pass"] else 1)
