"""Full-batch (B >= N) precision auto-escalation (train.resolve_full_batch).

The B=8192 full-batch gate (benchmarks/QUALITY_GATE_B8192.md) showed the
production precision relaxations converge to a measurably lower bound when
minibatch noise vanishes; the trainer now escalates the training-step
precision set automatically on the full-batch path. These tests pin the
policy's resolution and that the escalated set actually reaches the loss
trace (and leaks nothing afterwards) — the convergence-level evidence is
the gate artifact itself.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from dgps_with_iwvi_tpu.models import DGPConfig, GPLayerConfig, init_dgp
from dgps_with_iwvi_tpu.models import dgp as dgp_mod
from dgps_with_iwvi_tpu.ops import conditionals as cond
from dgps_with_iwvi_tpu.training import TrainConfig, make_trainer
from dgps_with_iwvi_tpu.training.train import (
    FULL_BATCH_OVERRIDES,
    resolve_full_batch,
)

KEY = jax.random.PRNGKey(0)


def _setup(n=24, m=8, d=2):
    kx, ky, kz = jax.random.split(KEY, 3)
    X = jax.random.normal(kx, (n, d), jnp.float32)
    Y = (jnp.sin(X.sum(-1, keepdims=True))
         + 0.1 * jax.random.normal(ky, (n, 1), jnp.float32))
    cfg = DGPConfig(
        layers=(GPLayerConfig(d_in=d, d_out=1, num_inducing=m,
                              mean_function="zero", final=True),),
        num_data=n, objective="vi")
    Z = jax.random.normal(kz, (m, d), jnp.float32)
    params = init_dgp(KEY, cfg, Z_inits=[Z], dtype=jnp.float32)
    return cfg, params, X, Y


class TestResolver:
    def _cfg(self, **kw):
        base = dict(layers=(GPLayerConfig(d_in=2, d_out=1, num_inducing=8,
                                          final=True),), num_data=100)
        return DGPConfig(**{**base, **kw})

    def test_escalates_production_defaults(self):
        cfg = self._cfg()  # var='default', solve='high'
        tc = TrainConfig(minibatch_size=100)
        out, ovr = resolve_full_batch(cfg, tc, True)
        assert out.var_precision == "highest"
        assert out.solve_precision == "highest"
        assert ovr == FULL_BATCH_OVERRIDES and ovr is not FULL_BATCH_OVERRIDES
        assert ovr["SOLVE_BWD_PRECISION"] == "same"
        assert ovr["QVAR_BF16_RESIDUAL"] is False
        assert ovr["QVAR_PALLAS_TRAIN"] == "off"
        assert ovr["EPI_TRAIN"] == "off"

    def test_never_downgrades(self):
        cfg = self._cfg(var_precision="highest", solve_precision="highest")
        out, _ = resolve_full_batch(cfg, TrainConfig(), True)
        assert out.var_precision == "highest"
        assert out.solve_precision == "highest"

    def test_identity_when_minibatched_or_off(self):
        cfg = self._cfg()
        assert resolve_full_batch(cfg, TrainConfig(), False) == (cfg, {})
        tc_off = TrainConfig(full_batch_precision="off")
        assert resolve_full_batch(cfg, tc_off, True) == (cfg, {})


class TestTrainerIntegration:
    def _spy_elbo(self, monkeypatch, seen):
        real = dgp_mod.elbo

        def spy(params, cfg, xb, yb, key, data_idx=None):
            seen.append({"var": cfg.var_precision,
                         "qvar_bf16": cond.QVAR_BF16_RESIDUAL,
                         "solve_bwd": cond.SOLVE_BWD_PRECISION,
                         "epi_train": cond.EPI_TRAIN})
            return real(params, cfg, xb, yb, key, data_idx=data_idx)

        monkeypatch.setattr(dgp_mod, "elbo", spy)

    @pytest.mark.parametrize("natgrad", ["none", "final"])
    def test_full_batch_trace_sees_escalated_set(self, monkeypatch, natgrad):
        cfg, params, X, Y = _setup()
        tc = TrainConfig(minibatch_size=X.shape[0], iterations=1,
                         natgrad=natgrad)
        seen = []
        self._spy_elbo(monkeypatch, seen)
        init_fn, step_fn, _, _ = make_trainer(cfg, tc)
        before = (cond.QVAR_BF16_RESIDUAL, cond.SOLVE_BWD_PRECISION,
                  cond.EPI_TRAIN)
        state, loss = step_fn(init_fn(params), X, Y, KEY)
        assert jnp.isfinite(loss)
        assert seen and all(s["var"] == "highest" for s in seen)
        assert all(s["qvar_bf16"] is False for s in seen)
        assert all(s["solve_bwd"] == "same" for s in seen)
        assert all(s["epi_train"] == "off" for s in seen)
        # trace-time overrides must not leak out of the loss body
        assert (cond.QVAR_BF16_RESIDUAL, cond.SOLVE_BWD_PRECISION,
                cond.EPI_TRAIN) == before

    def test_minibatch_trace_keeps_configured_set(self, monkeypatch):
        cfg, params, X, Y = _setup()
        tc = TrainConfig(minibatch_size=8, iterations=1, natgrad="final")
        seen = []
        self._spy_elbo(monkeypatch, seen)
        init_fn, step_fn, _, _ = make_trainer(cfg, tc)
        _, loss = step_fn(init_fn(params), X, Y, KEY)
        assert jnp.isfinite(loss)
        assert seen and all(s["var"] == "default" for s in seen)
        # solve_bwd 'auto' == 'same' since the r5 retirement (the
        # gram-kres interaction basin flip — see resolve_solve_bwd)
        assert all(s["solve_bwd"] == "same" for s in seen)

    def test_full_batch_precision_off_restores_old_behavior(self, monkeypatch):
        cfg, params, X, Y = _setup()
        tc = TrainConfig(minibatch_size=X.shape[0], iterations=1,
                         full_batch_precision="off")
        seen = []
        self._spy_elbo(monkeypatch, seen)
        init_fn, step_fn, _, _ = make_trainer(cfg, tc)
        _, loss = step_fn(init_fn(params), X, Y, KEY)
        assert jnp.isfinite(loss)
        assert seen and all(s["var"] == "default" for s in seen)

    def test_sharded_trainer_escalates(self, monkeypatch):
        import numpy as np
        from jax.sharding import Mesh

        from dgps_with_iwvi_tpu.parallel import sharding as sh

        cfg, params, X, Y = _setup()
        mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("dp", "k"))
        tc = TrainConfig(minibatch_size=X.shape[0], iterations=1)
        seen = []
        real = sh._sharded_objective

        def spy(params, c, xb, yb, idx, key, n_k, P_total):
            seen.append({"var": c.var_precision,
                         "qvar_bf16": cond.QVAR_BF16_RESIDUAL})
            return real(params, c, xb, yb, idx, key, n_k, P_total)

        monkeypatch.setattr(sh, "_sharded_objective", spy)
        init_fn, step_fn, _, _ = sh.make_parallel_trainer(cfg, tc, mesh)
        Xs, Ys = sh.shard_arrays(mesh, X, Y)
        state = sh.replicate(mesh, init_fn(params))
        _, loss = step_fn(state, Xs, Ys, KEY)
        assert jnp.isfinite(loss)
        assert seen and all(s["var"] == "highest" for s in seen)
        assert all(s["qvar_bf16"] is False for s in seen)
