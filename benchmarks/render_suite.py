#!/usr/bin/env python
"""Render the run_suite.py sqlite DB into a paper-style markdown table
(datasets x configurations x modes), written to benchmarks/SUITE.md."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgps_with_iwvi_tpu.evaluation import Database

DB = os.path.join(os.path.dirname(__file__), "suite.db")
OUT = os.path.join(os.path.dirname(__file__), "SUITE.md")


def main(db_path: str = DB, out_path: str = OUT):
    rows = Database(db_path).read()
    if not rows:
        print("no rows in", db_path)
        return
    datasets = sorted({r["dataset"] for r in rows})
    combos = sorted({(r["configuration"], r["mode"]) for r in rows},
                    key=lambda c: (len(c[0]), c[0], c[1]))
    by = {(r["dataset"], r["configuration"], r["mode"]): r for r in rows}
    syn = any(r.get("synthetic_data") for r in rows)
    with open(out_path, "w") as f:
        f.write("# Configuration sweep — test NLL (original units)\n\n")
        f.write("Mean per-point mixture test log-likelihood (HIGHER is "
                "better), one 90/10 split, 15k iterations, M=128, K=20 for "
                "IW mode, natgrad(final)+Adam.\n")
        if syn:
            f.write("Data: deterministic synthetic surrogates "
                    "(zero-egress container) — these rows demonstrate the "
                    "full harness + training stability, NOT paper-number "
                    "parity; stage real UCI files and re-run for that.\n")
        f.write("\n| dataset | " + " | ".join(f"{c} {m}" for c, m in combos)
                + " |\n")
        f.write("|---|" + "---|" * len(combos) + "\n")
        for ds in datasets:
            cells = []
            for c, m in combos:
                r = by.get((ds, c, m))
                cells.append(f"{r['test_loglik']:.3f}" if r else "—")
            f.write(f"| {ds} | " + " | ".join(cells) + " |\n")
        f.write("\n## steps/s (same grid)\n\n")
        f.write("| dataset | " + " | ".join(f"{c} {m}" for c, m in combos)
                + " |\n")
        f.write("|---|" + "---|" * len(combos) + "\n")
        for ds in datasets:
            cells = []
            for c, m in combos:
                r = by.get((ds, c, m))
                cells.append(f"{r['steps_per_sec']:.0f}" if r else "—")
            f.write(f"| {ds} | " + " | ".join(cells) + " |\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
