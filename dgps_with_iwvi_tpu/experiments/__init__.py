"""Experiment harness (L5): training runner, batch scorer/server, sweep driver.

TPU-native rebuild of the reference's ``ref:experiments/`` directory
(SURVEY.md §2.5): ``main`` is the UCI regression runner, ``serve`` the
batch scorer / StableHLO artifact exporter, ``run_suite`` the
bayesian_benchmarks-style sweep driver. Modules are imported lazily —
each configures the persistent jax compilation cache at import, which
library users may not want.
"""
