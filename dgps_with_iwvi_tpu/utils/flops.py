"""MXU FLOP accounting — nominal and pass-adjusted (VERDICT r2 item 4).

Nominal model FLOPs come from XLA's own cost analysis of the compiled
program. On TPU that UNDERSTATES the MXU work whenever matmuls run above
DEFAULT precision: a HIGH-precision dot executes 3 bf16 MXU passes per
nominal FLOP (bf16x3), a HIGHEST dot 6. This framework's quality-gated
precision policy (gram at HIGHEST, solve path at HIGH, q-variance at
DEFAULT — docs/PERF.md) therefore makes nominal MFU look far lower than
the chip's real occupancy.

`dot_flops_by_precision` parses every `stablehlo.dot_general` out of the
LOWERED (pre-optimization) module text with its precision attribute, so
the pass-adjusted total

    adjusted = nominal + sum_dots dot_flops * (passes(precision) - 1)

counts the MXU work actually executed. Both parses count a scan body ONCE
(the XLA cost-analysis convention — verified identical totals across
steps_per_call values), so per-chunk figures are per-step figures.
"""

from __future__ import annotations

import os
import re

import jax

# dense bf16 MXU peak FLOP/s by device kind; override via DGP_PEAK_FLOPS
PEAK_FLOPS = {
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
}

# bf16 MXU passes per nominal FLOP at each jax matmul precision
PASSES = {"DEFAULT": 1, "HIGH": 3, "HIGHEST": 6}

_DOT_RE = re.compile(
    r"stablehlo\.dot_general\s+%[\w#.]+,\s+%[\w#.]+,\s*(.*?)\s*:\s*"
    r"\(tensor<([^>]+)>,\s*tensor<([^>]+)>\)\s*->\s*tensor<([^>]+)>")


def dot_flops_by_precision(stablehlo_text: str) -> dict:
    """Nominal dot-general FLOPs grouped by precision attribute."""

    def dims(s: str) -> list[int]:
        return [int(t) for t in s.split("x")[:-1]]

    out: dict = {}
    for m in _DOT_RE.finditer(stablehlo_text):
        attrs, lhs_s, _, out_s = m.groups()
        cm = re.search(r"contracting_dims = \[([\d, ]*)\]", attrs)
        pm = re.search(r"precision = \[(\w+)", attrs)
        prec = pm.group(1) if pm else "DEFAULT"
        lhs, outd = dims(lhs_s), dims(out_s)
        fl = 2.0
        if cm and cm.group(1).strip():
            for i in cm.group(1).split(","):
                fl *= lhs[int(i)]
        for d in outd:
            fl *= d
        out[prec] = out.get(prec, 0.0) + fl
    return out


def device_peak() -> tuple[str, float | None]:
    """(device_kind, dense bf16 peak FLOP/s or None if unknown)."""
    kind = jax.devices()[0].device_kind
    if os.environ.get("DGP_PEAK_FLOPS"):
        return kind, float(os.environ["DGP_PEAK_FLOPS"])
    for k, v in PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return kind, v
    return kind, None


def program_cost(lowered) -> dict:
    """FLOP figures for a jax Lowered object:
    {flops, adjusted_flops, dot_flops_by_precision} (entries None on
    backends where the analysis is unavailable)."""
    flops = None
    try:
        cost = lowered.compile().cost_analysis()
        if cost and cost.get("flops", 0) > 0:
            flops = float(cost["flops"])
    except Exception:
        pass
    by_prec = adjusted = None
    try:
        by_prec = dot_flops_by_precision(lowered.as_text())
        if flops and by_prec:
            adjusted = flops + sum(fl * (PASSES.get(p, 1) - 1)
                                   for p, fl in by_prec.items())
    except Exception:
        pass
    return {"flops": flops, "adjusted_flops": adjusted,
            "dot_flops_by_precision": by_prec}
