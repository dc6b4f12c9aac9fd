"""Serving artifacts: jax.export StableHLO round trips.

The artifact must reproduce the live predict path exactly (same backend,
same seed), survive a save/load file round trip, handle padded tail
batches, and bake normalization stats so raw-unit scoring matches the
evaluation path's un-normalization (evaluation/metrics.py conventions).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgps_with_iwvi_tpu.models import (
    BuildArgs,
    build_model,
    predict_y_and_log_density,
)
from dgps_with_iwvi_tpu.serving import (
    NormalizationStats,
    ServingArtifact,
    export_scorer,
    load_scorer,
    save_scorer,
)


@pytest.fixture(scope="module")
def tiny_model():
    key = jax.random.PRNGKey(0)
    kx, ky, kb = jax.random.split(key, 3)
    # float32 throughout: the exported scorer's signature is f32 (production
    # dtype), while conftest enables x64 (which flips jax.random defaults)
    X = jax.random.normal(kx, (64, 3), jnp.float32)
    Y = jnp.sin(X.sum(-1, keepdims=True)) + 0.1 * jax.random.normal(
        ky, (64, 1), jnp.float32)
    args = BuildArgs(configuration="LG", mode="IW", num_inducing=8,
                     num_iw_samples=3)
    config, params = build_model(kb, args, X, Y)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32)
                          if jnp.issubdtype(a.dtype, jnp.floating) else a,
                          params)
    return config, params, np.asarray(X, np.float32), np.asarray(Y, np.float32)


class TestExportRoundTrip:
    def test_exported_scorer_matches_live_predict(self, tiny_model):
        config, params, X, Y = tiny_model
        B, S = 16, 5
        exp = export_scorer(params, config, batch_size=B, d_in=3, d_out=1,
                            num_samples=S)
        art = ServingArtifact(
            exp, {"batch_size": B, "d_in": 3, "d_out": 1, "num_samples": S,
                  "raw_units": False, "format_version": 1})
        m1, v1, ld1 = art._fn(X[:B], Y[:B], np.int32(7))
        key = jax.random.PRNGKey(7)
        (m2, v2), ld2 = predict_y_and_log_density(
            params, config, X[:B], Y[:B], key, S)
        # same math, same threefry stream; the artifact is compiled
        # separately from the live jit, so only fusion-order rounding
        # (~1e-7) may differ
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2),
                                   rtol=1e-5, atol=1e-5)

    def test_save_load_file_round_trip(self, tiny_model, tmp_path):
        config, params, X, Y = tiny_model
        B, S = 16, 5
        exp = export_scorer(params, config, batch_size=B, d_in=3, d_out=1,
                            num_samples=S)
        path = str(tmp_path / "scorer.npz")
        meta = save_scorer(path, exp, num_samples=S, has_stats=False,
                           extra_meta={"checkpoint_step": 123})
        assert meta["batch_size"] == B and meta["d_out"] == 1
        art = load_scorer(path)
        assert art.meta["checkpoint_step"] == 123
        assert art.meta["num_samples"] == S
        # serialize -> deserialize must preserve the program EXACTLY:
        # compare against the pre-serialization Exported, not the live jit
        m1, v1, ld1 = art._fn(X[:B], Y[:B], np.int32(3))
        m2, v2, ld2 = jax.jit(exp.call)(X[:B], Y[:B], np.int32(3))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(ld1), np.asarray(ld2))

    def test_version_guard(self, tiny_model, tmp_path):
        import json

        config, params, X, Y = tiny_model
        exp = export_scorer(params, config, batch_size=8, d_in=3, d_out=1,
                            num_samples=2)
        path = str(tmp_path / "scorer.npz")
        save_scorer(path, exp, num_samples=2, has_stats=False)
        z = dict(np.load(path))
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        meta["format_version"] = 999
        z["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
        np.savez(path, **z)
        with pytest.raises(ValueError, match="version"):
            load_scorer(path)


class TestExportAcrossFamilies:
    @pytest.mark.parametrize("kw", [
        dict(configuration="G", mode="VI"),
        dict(configuration="GG", mode="VI", q_diag=True),
        dict(configuration="LG", mode="IW", white=False,
             kernel_kind="matern52"),
        dict(configuration="LG", mode="IW", amortized=False),
        dict(configuration="LGG", mode="IW", d_w=2),
        dict(configuration="G", mode="VI", likelihood="bernoulli"),
    ], ids=["G", "GG-qdiag", "LG-nonwhite-matern52", "LG-nonamortized",
            "LGG-dw2", "G-bernoulli"])
    def test_every_buildable_family_exports_and_scores(self, kw, tmp_path):
        """Any model build_model can produce must survive export -> save ->
        load -> score: the serving artifact is a framework-wide contract,
        not a flagship-only path."""
        key = jax.random.PRNGKey(1)
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (32, 3), jnp.float32)
        if kw.get("likelihood") == "bernoulli":
            Y = (X.sum(-1, keepdims=True) > 0).astype(jnp.float32)
        else:
            Y = jnp.sin(X.sum(-1, keepdims=True))
        args = BuildArgs(num_inducing=8, num_iw_samples=2, **kw)
        config, params = build_model(kb, args, X, Y)
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32)
                              if jnp.issubdtype(a.dtype, jnp.floating) else a,
                              params)
        B, S = 8, 3
        exp = export_scorer(params, config, batch_size=B, d_in=3, d_out=1,
                            num_samples=S)
        path = str(tmp_path / "scorer.npz")
        save_scorer(path, exp, num_samples=S, has_stats=False)
        art = load_scorer(path)
        out = art.score(np.asarray(X[:20]), np.asarray(Y[:20]), seed=2)
        assert out["mean"].shape == (20, 1)
        assert np.all(np.isfinite(out["mean"]))
        assert np.all(np.isfinite(out["log_density"]))
        if kw.get("likelihood") != "bernoulli":
            assert np.all(out["var"] > 0)


class TestMultiPlatform:
    def test_tpu_cpu_artifact_lowered_and_runs_on_cpu(self, tiny_model,
                                                      tmp_path):
        """platforms=('tpu','cpu'): one artifact carries lowerings for both
        backends (lowering is platform-parameterized StableHLO — no TPU
        needed to produce it) and executes on the CPU backend here; the
        platform list survives the file round trip."""
        config, params, X, Y = tiny_model
        B, S = 8, 2
        exp = export_scorer(params, config, batch_size=B, d_in=3, d_out=1,
                            num_samples=S, platforms=("tpu", "cpu"))
        assert exp.platforms == ("tpu", "cpu")
        path = str(tmp_path / "portable.npz")
        save_scorer(path, exp, num_samples=S, has_stats=False)
        art = load_scorer(path)
        assert art.meta["platforms"] == ["tpu", "cpu"]
        m, v, ld = art._fn(X[:B], Y[:B], np.int32(1))
        assert np.all(np.isfinite(np.asarray(m)))
        assert np.all(np.asarray(v) > 0)
        assert np.all(np.isfinite(np.asarray(ld)))


class TestPaddedScoring:
    def test_tail_batch_padding_and_seed_per_batch(self, tiny_model, tmp_path):
        """n not a multiple of batch_size: per-point outputs equal direct
        per-batch calls with the per-batch folded seed; no padded rows leak."""
        config, params, X, Y = tiny_model
        B, S, n = 16, 4, 40  # 2 full batches + tail of 8
        exp = export_scorer(params, config, batch_size=B, d_in=3, d_out=1,
                            num_samples=S)
        path = str(tmp_path / "scorer.npz")
        save_scorer(path, exp, num_samples=S, has_stats=False)
        art = load_scorer(path)
        Xn, Yn = X[:n], Y[:n]
        out = art.score(Xn, Yn, seed=11, depth=2)
        assert out["mean"].shape == (n, 1)
        assert out["log_density"].shape == (n,)
        # exact reference = the SAME loaded artifact called by hand (one
        # compiled program; padding/slicing must not perturb any row)
        for i, start in enumerate(range(0, n, B)):
            xb, yb = Xn[start:start + B], Yn[start:start + B]
            take = xb.shape[0]
            if take < B:
                xb = np.concatenate([xb, np.zeros((B - take, 3), np.float32)])
                yb = np.concatenate([yb, np.zeros((B - take, 1), np.float32)])
            m, v, ld = art._fn(xb, yb, np.int32(11 + i))
            np.testing.assert_array_equal(out["mean"][start:start + take],
                                          np.asarray(m)[:take])
            np.testing.assert_array_equal(
                out["log_density"][start:start + take],
                np.asarray(ld)[:take])

    @pytest.mark.parametrize("transport", ["bfloat16", "float16"])
    def test_narrow_transport_is_rounding_only(self, tiny_model, tmp_path,
                                               transport):
        """transport='bfloat16'/'float16' must be pure output rounding:
        f32 on the host, shapes unchanged, values within one narrow-float
        ulp of the f32-transported run — and the log-density perturbation
        far below the S-sample mixture-estimator's own seed noise."""
        config, params, X, Y = tiny_model
        B, S, n = 16, 4, 40
        exp = export_scorer(params, config, batch_size=B, d_in=3, d_out=1,
                            num_samples=S)
        path = str(tmp_path / "scorer.npz")
        save_scorer(path, exp, num_samples=S, has_stats=False)
        art = load_scorer(path)
        ref = art.score(X[:n], Y[:n], seed=11, depth=2)
        out = art.score(X[:n], Y[:n], seed=11, depth=2, transport=transport)
        eps = 2.0 ** (-8 if transport == "bfloat16" else -11)
        for k in ("mean", "var", "log_density"):
            assert out[k].dtype == np.float32
            assert out[k].shape == ref[k].shape
            # one narrow-float ulp: the cast is the ONLY difference (the
            # whole-model noise comparison lives in benchmarks/SERVING.md,
            # measured on the real bench model at S=100)
            np.testing.assert_allclose(out[k], ref[k], rtol=eps,
                                       atol=eps * np.abs(ref[k]).max())
        assert not np.array_equal(out["log_density"], ref["log_density"]), \
            "transport cast had no effect — not exercised?"

    def test_transport_in_is_input_rounding_only(self, tiny_model, tmp_path):
        """transport_in='bfloat16' rounds the INPUTS (H2D bytes halve) but
        computes in f32: outputs must be f32, close to the f32-input run
        at the bf16 input-rounding scale, and EXACTLY reproducible by
        feeding the pre-rounded inputs through the f32 path."""
        config, params, X, Y = tiny_model
        B, S, n = 16, 4, 40
        exp = export_scorer(params, config, batch_size=B, d_in=3, d_out=1,
                            num_samples=S)
        path = str(tmp_path / "scorer.npz")
        save_scorer(path, exp, num_samples=S, has_stats=False)
        art = load_scorer(path)
        ref = art.score(X[:n], Y[:n], seed=7, depth=2)
        out = art.score(X[:n], Y[:n], seed=7, depth=2,
                        transport_in="bfloat16")
        import jax.numpy as jnp
        Xr = np.asarray(jnp.asarray(X[:n], jnp.bfloat16), np.float32)
        Yr = np.asarray(jnp.asarray(Y[:n], jnp.bfloat16), np.float32)
        rounded = art.score(Xr, Yr, seed=7, depth=2)
        for k in ("mean", "var", "log_density"):
            assert out[k].dtype == np.float32
            # identical to the f32 path on pre-rounded inputs: the upcast
            # on device is exact, so input rounding is the ONLY difference
            np.testing.assert_array_equal(out[k], rounded[k])
        # mean is identically zero on this init — var depends on X
        assert not np.array_equal(out["var"], ref["var"]), \
            "input cast had no effect — not exercised?"

    def test_score_without_targets_omits_log_density(self, tiny_model):
        config, params, X, Y = tiny_model
        exp = export_scorer(params, config, batch_size=8, d_in=3, d_out=1,
                            num_samples=2)
        art = ServingArtifact(
            exp, {"batch_size": 8, "d_in": 3, "d_out": 1, "num_samples": 2,
                  "raw_units": False, "format_version": 1})
        out = art.score(X[:10])
        assert set(out) == {"mean", "var"}
        assert out["mean"].shape == (10, 1)

    def test_input_shape_guard(self, tiny_model):
        config, params, X, Y = tiny_model
        exp = export_scorer(params, config, batch_size=8, d_in=3, d_out=1,
                            num_samples=2)
        art = ServingArtifact(
            exp, {"batch_size": 8, "d_in": 3, "d_out": 1, "num_samples": 2,
                  "raw_units": False, "format_version": 1})
        with pytest.raises(ValueError, match="must be"):
            art.score(X[:10, :2])


class TestBakedNormalization:
    def test_raw_unit_scoring_matches_manual_unnormalization(self, tiny_model):
        """stats baked in: raw X/Y in, original-unit mean/var/log-density
        out — must equal normalize -> live predict -> un-normalize
        (the evaluation/metrics.py convention, incl. -sum(log y_std))."""
        config, params, X, Y = tiny_model
        B, S = 16, 4
        rng = np.random.RandomState(0)
        stats = NormalizationStats(
            x_mean=rng.randn(1, 3).astype(np.float32),
            x_std=(0.5 + rng.rand(1, 3)).astype(np.float32),
            y_mean=np.asarray([[2.5]], np.float32),
            y_std=np.asarray([[3.0]], np.float32),
        )
        exp = export_scorer(params, config, batch_size=B, d_in=3, d_out=1,
                            num_samples=S, stats=stats)
        art = ServingArtifact(
            exp, {"batch_size": B, "d_in": 3, "d_out": 1, "num_samples": S,
                  "raw_units": True, "format_version": 1})
        # raw-space inputs whose normalized image is the fixture data
        X_raw = X[:B] * stats.x_std + stats.x_mean
        Y_raw = Y[:B] * stats.y_std + stats.y_mean
        m_raw, v_raw, ld_raw = art._fn(X_raw.astype(np.float32),
                                       Y_raw.astype(np.float32), np.int32(5))
        key = jax.random.PRNGKey(5)
        (m, v), ld = predict_y_and_log_density(
            params, config,
            jnp.asarray((X_raw - stats.x_mean) / stats.x_std, jnp.float32),
            jnp.asarray((Y_raw - stats.y_mean) / stats.y_std, jnp.float32),
            key, S)
        log_sigma = float(np.sum(np.log(stats.y_std.astype(np.float64))))
        np.testing.assert_allclose(np.asarray(m_raw),
                                   np.asarray(m) * 3.0 + 2.5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(v_raw),
                                   np.asarray(v) * 9.0, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(ld_raw),
                                   np.asarray(ld) - log_sigma,
                                   rtol=1e-5, atol=1e-5)


class TestPolymorphicBatch:
    """export_scorer(batch_size="b"): ONE artifact scores any n with no
    padding waste (VERDICT r3 item 4). The symbolic-dim StableHLO must
    survive the file round trip, refine at call time for each concrete
    size, and agree with the fixed-batch artifact chunk-for-chunk."""

    def test_round_trip_any_n(self, tiny_model, tmp_path):
        config, params, X, Y = tiny_model
        S = 5
        exp = export_scorer(params, config, batch_size="b", d_in=3, d_out=1,
                            num_samples=S)
        meta = save_scorer(str(tmp_path / "poly.npz"), exp, num_samples=S,
                           has_stats=False)
        assert meta["polymorphic_batch"] is True and meta["batch_size"] == 0
        art = load_scorer(str(tmp_path / "poly.npz"))
        for n in (1, 7, 64):
            out = art.score(X[:n], Y[:n], seed=3, max_batch=16)
            assert out["mean"].shape == (n, 1)
            assert out["var"].shape == (n, 1)
            assert out["log_density"].shape == (n,)
            assert np.all(np.isfinite(out["mean"]))
            assert np.all(out["var"] > 0)

    def test_matches_fixed_batch_artifact(self, tiny_model, tmp_path):
        config, params, X, Y = tiny_model
        S, B = 5, 16
        poly = export_scorer(params, config, batch_size="b", d_in=3,
                             d_out=1, num_samples=S)
        fixed = export_scorer(params, config, batch_size=B, d_in=3,
                              d_out=1, num_samples=S)
        save_scorer(str(tmp_path / "p.npz"), poly, num_samples=S,
                    has_stats=False)
        save_scorer(str(tmp_path / "f.npz"), fixed, num_samples=S,
                    has_stats=False)
        ap, af = load_scorer(str(tmp_path / "p.npz")), load_scorer(
            str(tmp_path / "f.npz"))
        # 64 rows = 4 chunks of 16 under both artifacts -> identical
        # per-chunk seeds, identical math
        op = ap.score(X, Y, seed=11, max_batch=B)
        of = af.score(X, Y, seed=11)
        np.testing.assert_allclose(op["mean"], of["mean"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(op["log_density"], of["log_density"],
                                   rtol=1e-5, atol=1e-5)
        # a 40-row table: fixed pads the 8-row tail to 16, poly runs it
        # natural-size — results must still agree on the real rows
        op = ap.score(X[:40], Y[:40], seed=2, max_batch=B)
        of = af.score(X[:40], Y[:40], seed=2)
        np.testing.assert_allclose(op["mean"], of["mean"],
                                   rtol=1e-5, atol=1e-6)

    def test_deep_m_policies_are_symbolic_safe(self):
        """Trace-time size policies must not compare symbolic dims.

        Two latent crashes found in r5: kernels._use_kuf_residual
        multiplied a polymorphic batch dim into its byte floor, and
        _maybe_remat's auto rule (reached only when M > QVAR_BF16_MAX_M
        disables the bf16-residual short-circuit) compared symbolic
        residual bytes against its threshold. M=264 exercises both on a
        polymorphic export trace.
        """
        key = jax.random.PRNGKey(3)
        kx, ky, kb = jax.random.split(key, 3)
        X = jax.random.normal(kx, (300, 3), jnp.float32)
        Y = jnp.sin(X.sum(-1, keepdims=True)) + 0.1 * jax.random.normal(
            ky, (300, 1), jnp.float32)
        args = BuildArgs(configuration="LG", mode="IW", num_inducing=264,
                         num_iw_samples=3)
        config, params = build_model(kb, args, X, Y)
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32)
                              if jnp.issubdtype(a.dtype, jnp.floating)
                              else a, params)
        exp = export_scorer(params, config, batch_size="b", d_in=3,
                            d_out=1, num_samples=3)
        art = ServingArtifact(
            exp, {"batch_size": 0, "d_in": 3, "d_out": 1, "num_samples": 3,
                  "raw_units": False, "format_version": 1,
                  "polymorphic_batch": True})
        out = art.score(np.asarray(X[:9]), np.asarray(Y[:9]), seed=1,
                        max_batch=16)
        assert out["mean"].shape == (9, 1)
        assert np.all(np.isfinite(out["log_density"]))
