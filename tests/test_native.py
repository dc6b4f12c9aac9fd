"""Native C++ data-layer runtime: build, bindings, parity with numpy.

Covers native/src/dgp_data.cpp via the ctypes bindings
(data/native_loader.py). Skips cleanly when no C++ toolchain is available.
"""

import numpy as np
import pytest

from dgps_with_iwvi_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.native_available(),
    reason="native library not buildable (no C++ toolchain)")


class TestParseTable:
    def test_csv_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        ref = rng.randn(50, 7)
        p = tmp_path / "t.csv"
        np.savetxt(p, ref, delimiter=",")
        got = native_loader.parse_table(str(p))
        np.testing.assert_allclose(got, ref, rtol=1e-12)

    def test_mixed_delims_comments_blank_lines(self, tmp_path):
        p = tmp_path / "m.txt"
        p.write_text("# header\n1, 2.5\t3\n\n4;5 6\n")
        got = native_loader.parse_table(str(p))
        np.testing.assert_allclose(got, [[1, 2.5, 3], [4, 5, 6]])

    def test_ragged_raises(self, tmp_path):
        p = tmp_path / "r.txt"
        p.write_text("1 2 3\n4 5\n")
        with pytest.raises(ValueError):
            native_loader.parse_table(str(p))

    def test_large_parse_speed(self, tmp_path):
        """year-scale-ish: 100k x 20 parses without issue."""
        rng = np.random.RandomState(1)
        ref = rng.randn(100_000, 20)
        p = tmp_path / "big.csv"
        np.savetxt(p, ref, delimiter=",", fmt="%.9g")
        got = native_loader.parse_table(str(p))
        assert got.shape == (100_000, 20)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-8)

    def test_dataset_integration(self, tmp_path):
        """get_regression_data consumes a pre-staged raw CSV via the
        native parser (last column = target)."""
        from dgps_with_iwvi_tpu.data import get_regression_data

        rng = np.random.RandomState(2)
        table = np.hstack([rng.randn(30, 4), rng.randn(30, 1)])
        np.savetxt(tmp_path / "mycsv.csv", table, delimiter=",")
        d = get_regression_data("mycsv", 0, data_dir=str(tmp_path))
        assert not d.synthetic
        assert d.X_train.shape == (27, 4) and d.Y_train.shape == (27, 1)


class TestNumpyParity:
    def test_standardize_matches_numpy(self):
        rng = np.random.RandomState(3)
        X = rng.randn(100, 5) * 3 + 1
        X[:, 2] = 7.0  # zero-variance column -> std floored to 1
        got, mean, std = native_loader.standardize(X, 80)
        ref_mean = X[:80].mean(0)
        ref_std = X[:80].std(0)
        ref_std = np.where(ref_std <= 1e-10, 1.0, ref_std)
        np.testing.assert_allclose(mean, ref_mean, rtol=1e-12)
        np.testing.assert_allclose(std, ref_std, rtol=1e-12)
        np.testing.assert_allclose(got, (X - ref_mean) / ref_std, rtol=1e-12)

    def test_kmeans_separates_clusters(self):
        rng = np.random.RandomState(4)
        X = np.concatenate([rng.randn(200, 2) * 0.1,
                            rng.randn(200, 2) * 0.1 + 10.0])
        C = native_loader.kmeans(X, 2, iters=15, seed=0)
        C = C[np.argsort(C[:, 0])]
        np.testing.assert_allclose(C[0], [0, 0], atol=0.5)
        np.testing.assert_allclose(C[1], [10, 10], atol=0.5)

    def test_year_target_first_column(self, tmp_path):
        """YearPredictionMSD layout: target in the FIRST column."""
        import numpy as np

        from dgps_with_iwvi_tpu.data import get_regression_data

        rng = np.random.RandomState(5)
        y = rng.randn(30, 1) * 10 + 2000
        X = rng.randn(30, 90)  # the real file has 90 timbre features
        np.savetxt(tmp_path / "year.csv", np.hstack([y, X]), delimiter=",")
        d = get_regression_data("year", 0, data_dir=str(tmp_path))
        assert not d.synthetic
        assert d.X_train.shape[1] == 90
        # un-standardized train targets should recover the ~2000 scale
        raw = d.Y_train * d.Y_std + d.Y_mean
        assert 1950 < float(raw.mean()) < 2050
