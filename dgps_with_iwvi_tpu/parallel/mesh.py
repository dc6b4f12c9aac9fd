"""Device-mesh construction for data- and sample-parallel training.

The reference is a single-process TF1 program with NO distributed execution
(SURVEY.md §2.0 parallelism inventory); multi-chip scaling is a NEW
capability mandated by BASELINE.json: minibatch gradients allreduced over
ICI. The natural mesh for this model family is 2-D:

  'dp' — shards the minibatch axis N (gradient psum over ICI);
  'k'  — shards the K importance-sample axis for large-K IWVI (cross-chip
         logsumexp via pmax/psum).

M (inducing points) stays replicated: M <= a few hundred means chol(Kuu)
is tiny and duplicating it beats communicating it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_dp: int | None = None, n_k: int = 1, devices=None) -> Mesh:
    """2-D ('dp', 'k') mesh. Defaults to all devices on the dp axis."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_dp is None:
        assert len(devices) % n_k == 0
        n_dp = len(devices) // n_k
    assert n_dp * n_k <= len(devices), (n_dp, n_k, len(devices))
    grid = np.array(devices[: n_dp * n_k]).reshape(n_dp, n_k)
    return Mesh(grid, ("dp", "k"))
