"""Evaluation: mixture test NLL / RMSE metrics and the sqlite results DB.

TPU-native rebuild of bb:bayesian_benchmarks/tasks/regression.py +
database_utils.py.
"""

from .database import Database
from .metrics import evaluate

__all__ = ["Database", "evaluate"]
