#!/usr/bin/env python
"""Run the five BASELINE.md parity configs and write benchmarks/RESULTS.md.

Data note: this container is zero-egress, so each UCI dataset resolves to
its deterministic synthetic surrogate (datasets.py); rows are tagged
synthetic in the DB. Re-run with staged real UCI files for true parity
numbers — configs and harness are identical either way.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.main import parse_args, run

CONFIGS = [
    # (label, argv)
    ("1: SVGP G, energy", [
        "--dataset", "energy", "--configuration", "G", "--mode", "VI",
        "--M", "100", "--minibatch_size", "256", "--iterations", "15000"]),
    ("2: DGP GG (doubly-stochastic VI), kin8nm", [
        "--dataset", "kin8nm", "--configuration", "GG", "--mode", "VI",
        "--M", "128", "--iterations", "15000"]),
    ("3: LV-DGP LG + IWVI K=5, power", [
        "--dataset", "power", "--configuration", "LG", "--mode", "IW",
        "--K", "5", "--M", "128", "--iterations", "15000"]),
    ("4: 2-layer LV-DGP LGG, IWVI K=20, protein", [
        "--dataset", "protein", "--configuration", "LGG", "--mode", "IW",
        "--K", "20", "--M", "128", "--iterations", "15000"]),
    ("5: 3-layer LV-DGP LGGG, IWVI K=50, natgrad, year (full N=515345)", [
        "--dataset", "year", "--configuration", "LGGG", "--mode", "IW",
        "--K", "50", "--M", "128", "--iterations", "10000"]),
]

COMMON = ["--natgrad", "final", "--print_every", "5000",
          "--steps_per_call", "500",  # amortize per-dispatch tunnel latency
          "--results_db", os.path.join(os.path.dirname(__file__), "results.db")]


def main():
    rows = []
    for label, argv in CONFIGS:
        print(f"\n=== {label} ===", flush=True)
        t0 = time.time()
        row = run(parse_args(argv + COMMON))
        row["label"] = label
        row["total_s"] = time.time() - t0
        rows.append(row)

    out = os.path.join(os.path.dirname(__file__), "RESULTS.md")
    with open(out, "w") as f:
        f.write("# BASELINE parity configs — results\n\n")
        f.write(f"Backend: {rows[0]['backend']}; data: deterministic "
                "synthetic surrogates (zero-egress container — see "
                "datasets.py; re-run with staged UCI files for published-"
                "number parity).\n\n")
        f.write("| config | test NLL (orig units) | test RMSE | ELBO "
                "steps/s | train s |\n|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['label']} | {r['test_loglik']:.4f} | "
                    f"{r['test_rmse']:.4f} | {r['steps_per_sec']:.0f} | "
                    f"{r['train_time_s']:.0f} |\n")
        f.write("\nServing throughput for the flagship model: "
                "benchmarks/SERVING.md (points/s table, "
                "benchmarks/predict_bench.py); training-mode throughput: "
                "bench.py B=8192 row. Multi-chip: serve.py --shard / "
                "evaluate(mesh=...).\n")
    print(f"\nwrote {out}")
    print(json.dumps([{k: r[k] for k in
                       ('label', 'test_loglik', 'test_rmse', 'steps_per_sec')}
                      for r in rows], indent=1))


if __name__ == "__main__":
    main()
