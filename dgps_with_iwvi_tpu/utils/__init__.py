"""Shared utilities: FLOP/MFU accounting for benchmarks and the harness."""

from .flops import (PASSES, PEAK_FLOPS, device_peak, dot_flops_by_precision,
                    program_cost)

__all__ = ["PASSES", "PEAK_FLOPS", "device_peak", "dot_flops_by_precision",
           "program_cost"]
