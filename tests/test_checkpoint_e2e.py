"""Checkpoint/deterministic-resume, harness end-to-end, monitor, and the
f32-vs-f64 tolerance check (SURVEY.md §4 items 4-5, §5 aux subsystems)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dgps_with_iwvi_tpu.models import BuildArgs, DGPConfig, GPLayerConfig, build_model, elbo, init_dgp
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer
from dgps_with_iwvi_tpu.training.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from dgps_with_iwvi_tpu.training.monitor import Monitor

KEY = jax.random.PRNGKey(0)


def _small_problem(dtype=jnp.float32):
    kx, ky = jax.random.split(KEY)
    X = jax.random.normal(kx, (64, 3), dtype)
    Y = (jnp.sin(X[:, :1]) + 0.05 * jax.random.normal(ky, (64, 1))).astype(dtype)
    args = BuildArgs(configuration="LG", mode="IW", num_inducing=8,
                     num_iw_samples=3)
    cfg, params = build_model(KEY, args, X, Y)
    return cfg, params, X, Y


class TestCheckpoint:
    def test_save_restore_resume_bitexact(self, tmp_path):
        """Restore mid-run and continue: identical trajectory to an
        uninterrupted run (deterministic resume, SURVEY.md §5)."""
        cfg, params, X, Y = _small_problem()
        tc = TrainConfig(lr=1e-2, natgrad="final", minibatch_size=32,
                         iterations=40, steps_per_call=10)
        init_fn, _, chunk_fn, params_fn = make_trainer(cfg, tc)
        chunk = jax.jit(chunk_fn)

        # uninterrupted: 2 chunks
        st = init_fn(params)
        st, _ = chunk(st, X, Y, jax.random.fold_in(KEY, 0))
        st_mid = st
        st, _ = chunk(st, X, Y, jax.random.fold_in(KEY, 1))
        ref_leaves = jax.tree.leaves(params_fn(st))

        # save at midpoint, restore, continue
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, int(st_mid.step), st_mid, KEY)
        assert latest_step(ckpt) == 10
        like = {"state": init_fn(params), "key": KEY}
        restored = restore_checkpoint(ckpt, 10, like)
        st2 = restored["state"]
        assert int(st2.step) == 10
        st2, _ = chunk(st2, X, Y, jax.random.fold_in(KEY, 1))
        got_leaves = jax.tree.leaves(params_fn(st2))
        for a, b in zip(got_leaves, ref_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestHarnessE2E:
    def test_cli_run_improves_and_writes_db(self, tmp_path):
        """experiments/main.py run() end-to-end on a tiny config: finishes,
        writes a result row, metrics finite (SURVEY.md §4 item 4)."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from experiments.main import parse_args, run

        db = str(tmp_path / "r.db")
        args = parse_args([
            "--dataset", "yacht", "--configuration", "LG", "--mode", "IW",
            "--K", "3", "--M", "8", "--iterations", "100",
            "--minibatch_size", "64", "--steps_per_call", "50",
            "--num_predict_samples", "20", "--print_every", "0",
            "--results_db", db, "--seed", "0"])
        row = run(args)
        assert np.isfinite(row["test_loglik"]) and np.isfinite(row["test_rmse"])
        from dgps_with_iwvi_tpu.evaluation import Database

        rows = Database(db).read("yacht")
        assert len(rows) == 1 and rows[0]["K"] == 3

    def test_cli_ordinal_trainable_mean(self, tmp_path):
        """--likelihood ordinal + --mean_function constant through the full
        harness: the quantile-binned loader feeds integer labels, the final
        layer keeps ONE output, metrics report ordinal accuracy."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from experiments.main import parse_args, run

        args = parse_args([
            "--dataset", "yacht", "--configuration", "G",
            "--likelihood", "ordinal", "--num_classes", "4",
            "--mean_function", "constant", "--natgrad", "none",
            "--M", "8", "--iterations", "100", "--minibatch_size", "64",
            "--steps_per_call", "50", "--num_predict_samples", "10",
            "--print_every", "0", "--seed", "0"])
        row = run(args)
        assert np.isfinite(row["test_loglik"])
        assert 0.0 <= row["test_accuracy"] <= 1.0

    def test_serve_cli_scores_from_checkpoint(self, tmp_path):
        """experiments/serve.py end-to-end: train a tiny model with a
        checkpoint via main.py, then serve predictions from the checkpoint;
        outputs finite, original-units, shaped [n_test, d_y], and the
        log-density is reported (targets available on the test split)."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from experiments.main import parse_args, run
        from experiments.serve import parse_args as serve_args, run as serve

        ck = str(tmp_path / "ck")
        run(parse_args([
            "--dataset", "yacht", "--configuration", "LG", "--mode", "IW",
            "--K", "3", "--M", "8", "--iterations", "100",
            "--minibatch_size", "64", "--steps_per_call", "50",
            "--num_predict_samples", "10", "--print_every", "0",
            "--results_db", str(tmp_path / "r.db"), "--seed", "0",
            "--ckpt_dir", ck, "--ckpt_every", "50"]))
        out = str(tmp_path / "pred.npz")
        res = serve(serve_args([
            "--dataset", "yacht", "--configuration", "LG", "--mode", "IW",
            "--K", "3", "--M", "8", "--ckpt_dir", ck, "--output", out,
            "--num_predict_samples", "10", "--batch_size", "16"]))
        z = np.load(out)
        from dgps_with_iwvi_tpu.data import get_regression_data

        data = get_regression_data("yacht", 0)
        n = data.X_test.shape[0]
        assert z["mean"].shape == (n, 1) and z["var"].shape == (n, 1)
        assert np.all(np.isfinite(z["mean"])) and np.all(z["var"] > 0)
        assert z["log_density"].shape == (n,)
        assert np.all(np.isfinite(z["log_density"]))
        # un-normalization happened: predictions live near the raw-Y scale
        y_raw_mean = float(np.asarray(data.Y_test * data.Y_std
                                      + data.Y_mean).mean())
        assert abs(float(z["mean"].mean()) - y_raw_mean) < \
            10 * float(np.asarray(data.Y_std).max())
        assert res["n"] == n

    def test_serve_restores_structure_flags_from_build_args(self, tmp_path):
        """A checkpoint trained with structure flags serve.py does not
        expose (--q_diag --non_amortized) must still serve: main.py
        persists build_args.json next to the checkpoints and serve.py
        prefers it over its own reduced flag set (ADVICE r2)."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from experiments.main import parse_args, run
        from experiments.serve import parse_args as serve_args, run as serve

        ck = str(tmp_path / "ck")
        run(parse_args([
            "--dataset", "yacht", "--configuration", "LG", "--mode", "IW",
            "--K", "3", "--M", "8", "--iterations", "50",
            "--minibatch_size", "64", "--steps_per_call", "50",
            "--num_predict_samples", "10", "--print_every", "0",
            "--results_db", str(tmp_path / "r.db"), "--seed", "0",
            "--q_diag", "--non_amortized", "--natgrad", "none",
            "--ckpt_dir", ck, "--ckpt_every", "50"]))
        assert os.path.exists(os.path.join(ck, "build_args.json"))
        out = str(tmp_path / "pred.npz")
        # note: NO structure flags passed (not even --natgrad, which fixes
        # the TrainState layout) — they must all come from the json
        res = serve(serve_args([
            "--dataset", "yacht", "--ckpt_dir", ck, "--output", out,
            "--num_predict_samples", "10", "--batch_size", "16"]))
        z = np.load(out)
        assert np.all(np.isfinite(z["mean"])) and np.all(z["var"] > 0)
        assert res["n"] == z["mean"].shape[0]

    def test_serve_export_and_score_from_artifact(self, tmp_path):
        """Checkpoint -> StableHLO serving artifact -> scoring WITHOUT the
        checkpoint: serve.py --export writes a self-contained artifact
        (params + normalization baked in), --from_export scores the test
        split from it alone, and the CLI path matches in-process
        ServingArtifact.score exactly (same program, same seeds)."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from experiments.main import parse_args, run
        from experiments.serve import parse_args as serve_args, run as serve

        ck = str(tmp_path / "ck")
        run(parse_args([
            "--dataset", "yacht", "--configuration", "LG", "--mode", "IW",
            "--K", "3", "--M", "8", "--iterations", "50",
            "--minibatch_size", "64", "--steps_per_call", "50",
            "--num_predict_samples", "10", "--print_every", "0",
            "--results_db", str(tmp_path / "r.db"), "--seed", "0",
            "--ckpt_dir", ck, "--ckpt_every", "50"]))
        art_path = str(tmp_path / "scorer.npz")
        res = serve(serve_args([
            "--dataset", "yacht", "--ckpt_dir", ck, "--export", art_path,
            "--num_predict_samples", "10", "--batch_size", "16"]))
        assert res["export"] == art_path and res["raw_units"] is True
        assert res["dataset"] == "yacht"
        out = str(tmp_path / "pred.npz")
        res2 = serve(serve_args([
            "--from_export", art_path, "--dataset", "yacht",
            "--output", out, "--seed", "3"]))
        z = np.load(out)
        from dgps_with_iwvi_tpu.data import get_regression_data
        from dgps_with_iwvi_tpu.serving import load_scorer

        data = get_regression_data("yacht", 0)
        n = data.X_test.shape[0]
        assert res2["n"] == n
        assert z["mean"].shape == (n, 1) and z["var"].shape == (n, 1)
        assert np.all(np.isfinite(z["log_density"]))
        # exact parity with in-process artifact scoring (same seeds)
        art = load_scorer(art_path)
        X_raw = np.asarray(data.X_test) * data.X_std + data.X_mean
        Y_raw = np.asarray(data.Y_test) * data.Y_std + data.Y_mean
        ref = art.score(X_raw, Y_raw, seed=3)
        np.testing.assert_array_equal(z["mean"], ref["mean"])
        np.testing.assert_array_equal(z["log_density"], ref["log_density"])
        # original-units sanity: predictions near the raw-Y scale
        y_raw_mean = float(Y_raw.mean())
        assert abs(float(z["mean"].mean()) - y_raw_mean) < \
            10 * float(np.asarray(data.Y_std).max())

    def test_cli_sharded_training(self, tmp_path):
        """main.py --shard: full CLI run over the 8 virtual devices with a
        4x2 ('dp','k') mesh — trains sharded, evaluates sharded, writes a
        finite result row (completes the multi-chip CLI surface)."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from experiments.main import parse_args, run

        db = str(tmp_path / "r.db")
        row = run(parse_args([
            "--dataset", "yacht", "--configuration", "LG", "--mode", "IW",
            "--K", "4", "--M", "8", "--iterations", "100",
            "--minibatch_size", "64", "--steps_per_call", "50",
            "--num_predict_samples", "16", "--print_every", "0",
            "--results_db", db, "--seed", "0",
            "--shard", "--n_k", "2"]))
        assert np.isfinite(row["test_loglik"]) and np.isfinite(row["test_rmse"])

    def test_serve_sharded_matches_single_device(self, tmp_path):
        """serve.py --shard (rows GSPMD-sharded over the 8 virtual devices)
        must produce IDENTICAL predictions to the single-device path
        (VERDICT r2 item 3: serving symmetry with the sharded trainer)."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from experiments.main import parse_args, run
        from experiments.serve import parse_args as serve_args, run as serve

        ck = str(tmp_path / "ck")
        run(parse_args([
            "--dataset", "yacht", "--configuration", "LG", "--mode", "IW",
            "--K", "3", "--M", "8", "--iterations", "50",
            "--minibatch_size", "64", "--steps_per_call", "50",
            "--num_predict_samples", "10", "--print_every", "0",
            "--results_db", str(tmp_path / "r.db"), "--seed", "0",
            "--ckpt_dir", ck, "--ckpt_every", "50"]))
        common = ["--dataset", "yacht", "--ckpt_dir", ck,
                  "--num_predict_samples", "10", "--batch_size", "16"]
        serve(serve_args(common + ["--output", str(tmp_path / "a.npz")]))
        serve(serve_args(common + ["--shard",
                                   "--output", str(tmp_path / "b.npz")]))
        a = np.load(tmp_path / "a.npz")
        b = np.load(tmp_path / "b.npz")
        for k in ("mean", "var", "log_density"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-6, err_msg=k)

    def test_serve_external_npz_input_standardizes(self, tmp_path):
        """serve.py with --input: raw-unit X/Y rows are standardized with
        the TRAIN split's statistics before scoring; predictions on the raw
        test rows must match serving the built-in test split exactly."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from experiments.main import parse_args, run
        from experiments.serve import parse_args as serve_args, run as serve
        from dgps_with_iwvi_tpu.data import get_regression_data

        ck = str(tmp_path / "ck")
        run(parse_args([
            "--dataset", "yacht", "--configuration", "G", "--mode", "VI",
            "--M", "8", "--iterations", "60", "--minibatch_size", "64",
            "--steps_per_call", "30", "--num_predict_samples", "5",
            "--print_every", "0", "--results_db", str(tmp_path / "r.db"),
            "--ckpt_dir", ck, "--ckpt_every", "30"]))
        data = get_regression_data("yacht", 0)
        # reconstruct RAW-unit test rows and feed them through --input
        X_raw = np.asarray(data.X_test) * data.X_std + data.X_mean
        Y_raw = np.asarray(data.Y_test) * data.Y_std + data.Y_mean
        np.savez(tmp_path / "in.npz", X=X_raw, Y=Y_raw)
        common = ["--dataset", "yacht", "--configuration", "G", "--mode",
                  "VI", "--M", "8", "--ckpt_dir", ck,
                  "--num_predict_samples", "5", "--batch_size", "16"]
        serve(serve_args(common + ["--input", str(tmp_path / "in.npz"),
                                   "--output", str(tmp_path / "a.npz")]))
        serve(serve_args(common + ["--output", str(tmp_path / "b.npz")]))
        a, b = np.load(tmp_path / "a.npz"), np.load(tmp_path / "b.npz")
        np.testing.assert_allclose(a["mean"], b["mean"], rtol=1e-5)
        np.testing.assert_allclose(a["log_density"], b["log_density"],
                                   rtol=1e-5)

    def test_monitor_tracks_rate_and_history(self):
        mon = Monitor(print_every=0)
        for step in (10, 20, 30):
            mon(step, -float(step), None)
        assert len(mon.history) == 3
        assert mon.history[-1]["elbo"] == 30.0
        assert np.isfinite(mon.mean_steps_per_sec)


class TestDtypePolicy:
    def test_f32_matches_f64_within_tolerance(self):
        """The f32 TPU-default pipeline tracks the f64 objective to ~1e-3
        relative — the SURVEY §4 item-5 tolerance check."""
        kx, ky = jax.random.split(KEY)
        X64 = jax.random.normal(kx, (32, 3), jnp.float64)
        Y64 = jnp.sin(X64[:, :1]) + 0.05 * jax.random.normal(ky, (32, 1), jnp.float64)
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=3, d_out=1, num_inducing=8,
                                  mean_function="zero", final=True),),
            num_data=32, objective="vi")
        p64 = init_dgp(KEY, cfg, dtype=jnp.float64)
        p32 = jax.tree.map(lambda a: a.astype(jnp.float32), p64)
        v64 = float(elbo(p64, cfg, X64, Y64, KEY))
        v32 = float(elbo(p32, cfg, X64.astype(jnp.float32),
                         Y64.astype(jnp.float32), KEY))
        np.testing.assert_allclose(v32, v64, rtol=2e-3)
