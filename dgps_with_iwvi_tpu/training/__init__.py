"""Optimization: natural-gradient q(u) updates + Adam, jitted train loop.

TPU-native rebuild of the reference's optimizer layer
(gpflow natgrad_optimizer / AdamOptimizer wiring in ref:experiments/main.py).
"""

from .natgrad import (
    extract_natvars,
    insert_natvars,
    natgrad_layer_ids,
    natgrad_update,
    natvars_to_canonical,
)
from .train import TrainConfig, TrainState, fit, make_trainer

__all__ = [
    "TrainConfig",
    "TrainState",
    "extract_natvars",
    "fit",
    "insert_natvars",
    "make_trainer",
    "natgrad_layer_ids",
    "natgrad_update",
    "natvars_to_canonical",
]
