"""dgps_with_iwvi_tpu — TPU-native deep Gaussian processes with
importance-weighted variational inference.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
hughsalimbeni/DGPs_with_IWVI (Salimbeni, Dutordoir, Hensman, Deisenroth,
ICML 2019) and its GPflow-1.5.x dependency layer, redesigned TPU-first:
pure-functional params pytrees, one jitted train step, batched [K*S*B, M]
conditional pipelines on the MXU, data-parallel sharding over an ICI mesh.
"""

__version__ = "0.1.0"

from . import data, evaluation, models, ops, parallel, serving, training  # noqa: F401
