"""--dtype float64 end-to-end harness path (SURVEY.md §7 design stance:
the f64 fallback flag — the reference's gpflow float64 default as an
escape hatch for bound-comparison studies)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class TestDtypeFlag:
    def test_f64_run_end_to_end(self, tmp_path):
        from experiments.main import parse_args, run

        db = str(tmp_path / "r.db")
        args = parse_args([
            "--dataset", "yacht", "--configuration", "LG", "--mode", "IW",
            "--K", "3", "--M", "8", "--iterations", "100",
            "--minibatch_size", "64", "--steps_per_call", "50",
            "--num_predict_samples", "20", "--print_every", "0",
            "--dtype", "float64", "--results_db", db, "--seed", "0"])
        row = run(args)
        assert row["dtype"] == "float64"
        assert np.isfinite(row["test_loglik"]) and np.isfinite(row["test_rmse"])
        assert np.isfinite(row["elbo"])

    def test_f64_builds_f64_params(self):
        """The harness threads dtype via the data arrays: build_model on
        f64 inputs must give f64 parameters everywhere (the property the
        flag relies on)."""
        import jax
        import jax.numpy as jnp

        from dgps_with_iwvi_tpu.models import BuildArgs, build_model

        key = jax.random.PRNGKey(0)
        X = jax.random.normal(key, (40, 3), jnp.float64)
        Y = jax.random.normal(key, (40, 1), jnp.float64)
        b = BuildArgs(configuration="LG", mode="IW", num_inducing=8,
                      num_iw_samples=3)
        _, params = build_model(key, b, X, Y)
        leaves = jax.tree.leaves(params)
        float_leaves = [l for l in leaves if jnp.issubdtype(l.dtype,
                                                            jnp.floating)]
        assert float_leaves
        assert all(l.dtype == jnp.float64 for l in float_leaves)
