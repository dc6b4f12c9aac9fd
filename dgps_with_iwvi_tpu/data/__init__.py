"""Dataset layer: UCI regression registry, splits, normalization.

TPU-native rebuild of the bayesian_benchmarks data dependency
(bb:bayesian_benchmarks/data.py).
"""

from .datasets import (DEFAULT_DATA_DIR, UCI_REGISTRY, Dataset,
                       get_classification_data, get_multiclass_data,
                       get_regression_data)

__all__ = ["DEFAULT_DATA_DIR", "UCI_REGISTRY", "Dataset",
           "get_classification_data", "get_multiclass_data",
           "get_regression_data"]
