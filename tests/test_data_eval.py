"""Dataset conventions, metrics un-normalization, sqlite round-trip
(SURVEY.md §4: bayesian_benchmarks-equivalent coverage)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dgps_with_iwvi_tpu.data import UCI_REGISTRY, get_regression_data
from dgps_with_iwvi_tpu.evaluation import Database, evaluate
from dgps_with_iwvi_tpu.models import DGPConfig, GPLayerConfig, init_dgp


class TestData:
    def test_registry_shapes(self):
        d = get_regression_data("energy", 0, dtype=np.float64)
        n, dim = UCI_REGISTRY["energy"]
        assert d.X_train.shape == (int(0.9 * n), dim)
        assert d.X_test.shape[0] + d.X_train.shape[0] == n
        assert d.Y_train.shape[1] == 1
        assert d.synthetic  # no staged files in this container

    def test_split_determinism_and_difference(self):
        a = get_regression_data("yacht", 3)
        b = get_regression_data("yacht", 3)
        c = get_regression_data("yacht", 4)
        np.testing.assert_array_equal(a.X_train, b.X_train)
        assert not np.array_equal(a.X_train, c.X_train)

    def test_standardization_by_train_stats(self):
        d = get_regression_data("boston", 0, dtype=np.float64)
        np.testing.assert_allclose(d.X_train.mean(0), 0.0, atol=1e-9)
        np.testing.assert_allclose(d.X_train.std(0), 1.0, atol=1e-9)
        np.testing.assert_allclose(d.Y_train.mean(), 0.0, atol=1e-9)
        # test split standardized with TRAIN stats -> not exactly 0/1
        assert abs(float(d.X_test.mean())) > 1e-12

    def test_prestaged_file_wins(self, tmp_path):
        X = np.arange(40, dtype=np.float64).reshape(20, 2)
        Y = np.arange(20, dtype=np.float64)
        np.savez(tmp_path / "mydata.npz", X=X, Y=Y)
        d = get_regression_data("mydata", 0, data_dir=str(tmp_path))
        assert not d.synthetic
        assert d.X_train.shape == (18, 2)
        assert d.Y_train.shape == (18, 1)

    def test_unknown_dataset_raises(self, tmp_path):
        import pytest

        with pytest.raises(FileNotFoundError):
            get_regression_data("nope", data_dir=str(tmp_path))


class TestUCIIngest:
    """Per-dataset raw-file conventions (bb:bayesian_benchmarks/data.py):
    each checked-in miniature fixture mimics the REAL file's format (header
    rows, ';' delimiters, dual targets, constant columns, first-column
    targets); targets are hand-coded as 1000+row so a wrong target column is
    caught immediately."""

    FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

    # name -> (file, expected D after ingest)
    CASES = {
        "boston": ("boston.data", 13),
        "concrete": ("concrete.csv", 8),
        "energy": ("energy.csv", 8),
        "kin8nm": ("kin8nm.csv", 8),
        "naval": ("naval.txt", 14),      # 16 raw - 2 constant columns
        "power": ("power.csv", 4),
        "protein": ("protein.csv", 9),
        "wine_red": ("wine_red.csv", 11),
        "yacht": ("yacht.data", 6),
        "year": ("year.txt", 90),
    }

    def _load(self, name):
        from dgps_with_iwvi_tpu.data.datasets import _load_raw

        return _load_raw(name, self.FIXTURES)

    def test_every_dataset_target_column(self):
        for name, (fname, d_expect) in self.CASES.items():
            X, Y, synthetic = self._load(name)
            assert not synthetic, name
            assert X.shape == (5, d_expect), (name, X.shape)
            assert Y.shape == (5, 1), (name, Y.shape)
            # fixture targets are 1000+row; decoys (second targets) are -999
            np.testing.assert_array_equal(
                Y[:, 0], 1000.0 + np.arange(5), err_msg=name)
            assert not np.any(X == -999.0), f"{name}: dropped target leaked into X"

    def test_naval_constant_columns_dropped(self):
        X, _, _ = self._load("naval")
        assert np.all(X.std(0) > 0), "constant columns must be dropped"

    def test_energy_uses_heating_not_cooling(self):
        X, Y, _ = self._load("energy")
        assert np.all(Y != -999.0)  # -999 is the cooling-load decoy

    def test_wrong_column_count_refused(self, tmp_path):
        import pytest
        from dgps_with_iwvi_tpu.data.datasets import _load_raw

        # a 'protein' file with one missing column must be REFUSED, not
        # silently re-split (fake-parity guard)
        bad = "\n".join(
            ",".join(str(float(j)) for j in range(9)) for _ in range(4))
        (tmp_path / "protein.csv").write_text(bad + "\n")
        with pytest.raises(ValueError, match="Refusing to guess"):
            _load_raw("protein", str(tmp_path))

    def test_header_skipped_identically_in_both_parsers(self):
        from dgps_with_iwvi_tpu.data import native_loader

        path = os.path.join(self.FIXTURES, "wine_red.csv")
        a = native_loader._parse_table_numpy(path)
        if native_loader.native_available():
            b = native_loader.parse_table(path)
            np.testing.assert_array_equal(a, b)
        assert a.shape == (5, 12)

    def test_end_to_end_through_get_regression_data(self):
        d = get_regression_data("protein", 0, data_dir=self.FIXTURES,
                                dtype=np.float64)
        assert not d.synthetic
        assert d.X_train.shape[1] == 9
        # un-standardized targets recover the 1000+row fixture values
        y_orig = d.Y_train * d.Y_std + d.Y_mean
        assert set(np.round(y_orig[:, 0]).astype(int)) <= set(range(1000, 1005))


class TestEvaluate:
    def test_unnormalization_and_padding(self):
        key = jax.random.PRNGKey(0)
        n, d = 37, 3  # deliberately not a multiple of the eval batch
        X = jax.random.normal(key, (n, d), jnp.float64)
        Y = 0.5 * X[:, :1]
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=d, d_out=1, num_inducing=5, final=True),),
            num_data=n, num_samples=8)
        params = init_dgp(key, cfg, dtype=jnp.float64)
        y_std = np.array([2.0])
        m = evaluate(params, cfg, X, Y, key, y_std=y_std, num_samples=8,
                     batch_size=16)
        # original-units loglik = normalized - log sigma; rmse scales by sigma
        np.testing.assert_allclose(
            m["test_loglik"], m["test_loglik_normalized"] - np.log(2.0), rtol=1e-12)
        np.testing.assert_allclose(
            m["test_rmse"], m["test_rmse_normalized"] * 2.0, rtol=1e-12)
        # padding must not poison the average: compare against one big batch
        m2 = evaluate(params, cfg, X, Y, key, y_std=y_std, num_samples=8,
                      batch_size=64)
        np.testing.assert_allclose(m["test_rmse"], m2["test_rmse"], rtol=0.2)


class TestDatabase:
    def test_roundtrip(self, tmp_path):
        db = Database(str(tmp_path / "r.db"))
        db.write_result({
            "dataset": "energy", "split": 0, "configuration": "LG",
            "mode": "IW", "M": 128, "K": 20, "test_loglik": -0.7,
            "test_rmse": 0.4, "steps_per_sec": 123.4,
            "synthetic_data": True, "custom_field": "hello"})
        rows = db.read("energy")
        assert len(rows) == 1
        r = rows[0]
        assert r["configuration"] == "LG" and r["K"] == 20
        assert r["synthetic_data"] == 1
        assert "custom_field" in r["extra"]
        assert db.read("kin8nm") == []
