"""Hyperparameter priors (the reference's log_prior objective term,
SURVEY.md §2.2) and monitor hyperparameter logging (ModelToTensorBoardTask
equivalent, SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgps_with_iwvi_tpu.models import (
    BuildArgs,
    DGPConfig,
    GPLayerConfig,
    build_model,
    elbo,
    parse_prior_flag,
)
from dgps_with_iwvi_tpu.ops import kernels, likelihoods
from dgps_with_iwvi_tpu.ops.priors import log_prior

KEY = jax.random.PRNGKey(0)


def _problem(priors=()):
    kx, ky = jax.random.split(KEY)
    X = jax.random.normal(kx, (48, 3), jnp.float64)
    Y = jnp.sin(X[:, :1]) + 0.05 * jax.random.normal(ky, (48, 1), jnp.float64)
    args = BuildArgs(configuration="G", num_inducing=8, priors=priors)
    cfg, params = build_model(KEY, args, X, Y)
    return cfg, params, X, Y


class TestLogPrior:
    def test_off_by_default(self):
        cfg, params, X, Y = _problem()
        assert cfg.priors == ()
        cfg2, params2, _, _ = _problem(
            priors=(("kernel/raw_variance", "gamma", 2.0, 3.0),))
        # same params, objectives differ exactly by the analytic prior
        v0 = float(elbo(params, cfg, X, Y, KEY))
        v1 = float(elbo(params2, cfg2, X, Y, KEY))
        assert v1 != v0

    def test_elbo_with_prior_is_elbo_plus_analytic_log_prior(self):
        from scipy import stats

        priors = (
            ("kernel/raw_variance", "gamma", 2.0, 3.0),
            ("kernel/raw_lengthscales", "lognormal", 0.5, 1.2),
            ("raw_noise_variance", "gaussian", -2.0, 0.7),
        )
        cfg, params, X, Y = _problem(priors=priors)
        cfg0, _, _, _ = _problem()
        base = float(elbo(params, cfg0, X, Y, KEY))
        with_prior = float(elbo(params, cfg, X, Y, KEY))

        kp = params["layers"][0]["kernel"]
        sig = lambda r: float(np.sum(np.log(jax.nn.sigmoid(np.asarray(r)))))
        var = float(kernels.kernel_variance(kp))
        ls = np.asarray(kernels.kernel_lengthscales(kp))
        raw_noise = np.asarray(params["likelihood"]["raw_noise_variance"])
        expect = (
            # gamma(shape=2, rate=3) on constrained variance + jacobian
            stats.gamma.logpdf(var, a=2.0, scale=1.0 / 3.0)
            + sig(kp["raw_variance"])
            # lognormal(mu=.5, sigma=1.2) on constrained lengthscales + jac
            + stats.lognorm.logpdf(ls, s=1.2, scale=np.exp(0.5)).sum()
            + sig(kp["raw_lengthscales"])
            # gaussian directly on the RAW noise param (no jacobian)
            + stats.norm.logpdf(raw_noise, loc=-2.0, scale=0.7).sum()
        )
        np.testing.assert_allclose(with_prior - base, expect, rtol=1e-9)

    def test_iw_objective_gets_same_term(self):
        priors = (("raw_noise_variance", "lognormal", -2.0, 1.0),)
        kx, ky = jax.random.split(KEY)
        X = jax.random.normal(kx, (32, 2), jnp.float64)
        Y = jnp.sin(X[:, :1])
        a0 = BuildArgs(configuration="LG", mode="IW", num_inducing=6,
                       num_iw_samples=4)
        a1 = BuildArgs(configuration="LG", mode="IW", num_inducing=6,
                       num_iw_samples=4, priors=priors)
        cfg0, params = build_model(KEY, a0, X, Y)
        cfg1, _ = build_model(KEY, a1, X, Y)
        d = (float(elbo(params, cfg1, X, Y, KEY))
             - float(elbo(params, cfg0, X, Y, KEY)))
        lp = float(log_prior(params, cfg1.priors))
        np.testing.assert_allclose(d, lp, rtol=1e-9)

    def test_prior_pulls_parameter(self):
        """Training with a tight lognormal prior on the noise pulls it toward
        the prior mode vs the no-prior run."""
        from dgps_with_iwvi_tpu.training import TrainConfig, fit

        target = np.log(0.3)
        noises = {}
        for priors in ((), (("raw_noise_variance", "lognormal", target, 0.05),)):
            cfg, params, X, Y = _problem(priors=priors)
            tc = TrainConfig(lr=5e-2, natgrad="none", minibatch_size=48,
                             iterations=300, steps_per_call=100)
            trained, _ = fit(KEY, cfg, params, X, Y, tc)
            noises[bool(priors)] = float(
                likelihoods.noise_variance(trained["likelihood"]))
        assert abs(np.log(noises[True]) - target) < abs(
            np.log(noises[False]) - target), noises

    def test_unmatched_spec_raises(self):
        cfg, params, X, Y = _problem()
        with pytest.raises(ValueError, match="no parameter path matched"):
            log_prior(params, (("nonexistent_param", "gamma", 2.0, 2.0),))

    def test_parse_prior_flag(self):
        assert parse_prior_flag("kernel_variance=gamma(2,3)") == (
            "kernel/raw_variance", "gamma", 2.0, 3.0)
        assert parse_prior_flag("noise_variance=lognormal(-2.0,1.5)") == (
            "raw_noise_variance", "lognormal", -2.0, 1.5)

    def test_sharded_objective_includes_prior(self):
        from dgps_with_iwvi_tpu.parallel import (make_mesh,
                                                 make_parallel_trainer,
                                                 replicate, shard_arrays)
        from dgps_with_iwvi_tpu.training import TrainConfig
        from dgps_with_iwvi_tpu.training.train import (_merge_params,
                                                       _split_params)

        priors = (("kernel/raw_variance", "gamma", 2.0, 3.0),)
        kx, ky = jax.random.split(KEY)
        X = jax.random.normal(kx, (64, 3), jnp.float64)
        Y = jnp.sin(X[:, :1])
        cfg = DGPConfig(
            layers=(GPLayerConfig(d_in=3, d_out=1, num_inducing=8,
                                  mean_function="zero", final=True),),
            num_data=64, objective="vi", num_samples=2, priors=priors)
        from dgps_with_iwvi_tpu.models import init_dgp
        params = init_dgp(KEY, cfg, dtype=jnp.float64)
        mesh = make_mesh(4, 2)
        tc = TrainConfig(lr=1e-2, natgrad="final", minibatch_size=32,
                         iterations=1, steps_per_call=1)
        init_fn, step_fn, _, _ = make_parallel_trainer(cfg, tc, mesh)
        state = replicate(mesh, init_fn(params))
        Xs, Ys = shard_arrays(mesh, X, Y)
        skey = jax.random.PRNGKey(7)
        _, loss = jax.jit(step_fn)(state, Xs, Ys, skey)
        from tests.test_parallel import _expected_global_batch
        xb, yb = _expected_global_batch(X, Y, 4, 8, skey)
        np.testing.assert_allclose(
            float(loss), float(-elbo(params, cfg, xb, yb, KEY)), rtol=1e-10)


class TestMonitorHyperLogging:
    def test_scalars_extracted(self):
        from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer
        from dgps_with_iwvi_tpu.training.monitor import hyperparameter_scalars

        cfg, params, X, Y = _problem()
        tc = TrainConfig(natgrad="final", gamma=0.03, gamma_warmup=0)
        init_fn, _, _, _ = make_trainer(cfg, tc)
        state = init_fn(params)
        s = hyperparameter_scalars(state.rest, cfg, tc=tc,
                                   step=int(state.step))
        assert "hypers/layer0/kernel_variance" in s
        assert "hypers/layer0/lengthscale_mean" in s
        assert "hypers/likelihood_noise_variance" in s
        np.testing.assert_allclose(s["hypers/natgrad_gamma"], 0.03)
        np.testing.assert_allclose(s["hypers/likelihood_noise_variance"],
                                   0.05, rtol=1e-5)
        assert all(np.isfinite(v) for v in s.values())

    def test_tb_event_file_contains_hyper_tags(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        from dgps_with_iwvi_tpu.training.monitor import Monitor

        log_dir = str(tmp_path / "tb")
        mon = Monitor(print_every=0, log_dir=log_dir,
                      scalars_fn=lambda st: {"hypers/layer0/kernel_variance": 1.5,
                                             "hypers/natgrad_gamma": 0.01})
        mon(10, -1.0, object())
        mon(20, -2.0, object())
        tags = set()
        for fname in os.listdir(log_dir):
            path = os.path.join(log_dir, fname)
            for rec in tf.data.TFRecordDataset(path):
                ev = tf.compat.v1.Event.FromString(rec.numpy())
                for v in ev.summary.value:
                    tags.add(v.tag)
        assert "hypers/layer0/kernel_variance" in tags, tags
        assert "hypers/natgrad_gamma" in tags, tags
        assert "elbo" in tags and "steps_per_sec" in tags
        assert mon.history[-1]["hypers/natgrad_gamma"] == 0.01
