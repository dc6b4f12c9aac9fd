"""bf16 Kuf residual (kernels.KRES_BF16_RESIDUAL) — a QUALITY-REJECTED
switch that must stay off by default.

The knob stores the Kuf residual — shared by the gram custom vjp and the
solve dot's saved y operand — in bf16. Forward math is UNCHANGED (the f32
gram still feeds the forward solve dot and Cholesky) and per-step
gradient deltas are tiny (2.6e-4 norm-rel), but the 15k-step convergence
gate REJECTED it: forced on at B=2048 the LGG-kin8nm bound collapses by
17% (benchmarks/QUALITY_GATE_kres.md; an isolation run with only this
knob off PASSES) — the r4 solve_bwd class of low-noise large-batch bias
the natgrad solve path amplifies. These tests pin (a) the off default and
its non-truthy string handling, (b) the forward bit-identity and
bounded-rounding of the forced-on path (so the A/B switch stays honest),
(c) the full-batch escalation and auto-floor plumbing.

Upstream spec anchor: the reference keeps all residuals at its compute
dtype (f64 — ref:DGPs_with_IWVI training path via gpflow/TF1 autodiff);
this is a TPU-native traffic/quality trade unavailable there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgps_with_iwvi_tpu.models import BuildArgs, build_model, elbo
from dgps_with_iwvi_tpu.ops import kernels
from dgps_with_iwvi_tpu.training import train as train_mod
from dgps_with_iwvi_tpu.training.train import (FULL_BATCH_OVERRIDES,
                                               TrainConfig, make_trainer)

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def small_model():
    kx, ky = jax.random.split(KEY)
    X = jax.random.normal(kx, (256, 8), jnp.float32)
    Y = jnp.sin(X[:, :1]) + 0.1 * jax.random.normal(ky, (256, 1),
                                                    jnp.float32)
    cfg, params = build_model(
        KEY, BuildArgs(configuration="LG", mode="IW", num_inducing=32,
                       num_iw_samples=3), X, Y)
    return cfg, params, X, Y


def _value_and_grad(cfg, params, X, Y, force):
    saved = (kernels.KRES_BF16_RESIDUAL, kernels.KRES_BF16_MIN_BYTES)
    kernels.KRES_BF16_RESIDUAL = force
    kernels.KRES_BF16_MIN_BYTES = 0 if force else saved[1]
    try:
        f = lambda p: elbo(p, cfg, X, Y, jax.random.PRNGKey(1))
        return jax.value_and_grad(f)(params)
    finally:
        kernels.KRES_BF16_RESIDUAL, kernels.KRES_BF16_MIN_BYTES = saved


class TestKresBf16:
    def test_forward_bit_identical_grads_bf16_class(self, small_model):
        cfg, params, X, Y = small_model
        v0, g0 = _value_and_grad(cfg, params, X, Y, False)
        v1, g1 = _value_and_grad(cfg, params, X, Y, True)
        assert float(v0) == float(v1)  # residual choice is backward-only
        worst = 0.0
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            worst = max(worst, np.linalg.norm(a - b)
                        / (np.linalg.norm(a) + 1e-12))
        # bf16-residual rounding class; exact-path deltas would be 0
        assert 0 < worst < 5e-3, worst

    def test_shipped_default_is_off(self):
        # QUALITY-REJECTED r5 (QUALITY_GATE_kres.md FAIL: 17% ELBO
        # collapse at B=2048 forced-on) — the default must stay off, and
        # the string "off" must NOT truthy-eval to on
        assert kernels.KRES_BF16_RESIDUAL == "off"
        assert not kernels.kres_bf16_active(1 << 40, jnp.float32)

    def test_auto_policy_floor(self, monkeypatch):
        monkeypatch.setattr(kernels, "KRES_BF16_RESIDUAL", "auto")
        f32 = jnp.float32
        assert not kernels.kres_bf16_active(
            kernels.KRES_BF16_MIN_BYTES - 1, f32)
        assert kernels.kres_bf16_active(kernels.KRES_BF16_MIN_BYTES, f32)
        assert not kernels.kres_bf16_active(
            kernels.KRES_BF16_MIN_BYTES, jnp.float64)
        # symbolic-dim fallback (polymorphic export): callers pass 0
        assert not kernels.kres_bf16_active(0, f32)

    def test_full_batch_escalation_disables_it(self, small_model,
                                               monkeypatch):
        assert FULL_BATCH_OVERRIDES["KRES_BF16_RESIDUAL"] is False
        assert FULL_BATCH_OVERRIDES["GRAM_KUF_RESIDUAL"] is False
        # the override must be applied to the KERNELS module inside the
        # full-batch loss trace, and restored afterwards
        cfg, params, X, Y = small_model
        monkeypatch.setattr(kernels, "KRES_BF16_RESIDUAL", True)
        monkeypatch.setattr(kernels, "KRES_BF16_MIN_BYTES", 0)
        seen = []
        real = train_mod.dgp.elbo

        def spy(params, cfg, xb, yb, key, data_idx=None):
            seen.append((kernels.KRES_BF16_RESIDUAL,
                         kernels.GRAM_KUF_RESIDUAL))
            return real(params, cfg, xb, yb, key, data_idx=data_idx)

        monkeypatch.setattr(train_mod.dgp, "elbo", spy)
        tc = TrainConfig(minibatch_size=X.shape[0], iterations=1)
        init_fn, step_fn, _, _ = make_trainer(cfg, tc)
        _, loss = step_fn(init_fn(params), X, Y, KEY)
        assert jnp.isfinite(loss)
        assert seen and all(s == (False, False) for s in seen)
        assert kernels.KRES_BF16_RESIDUAL is True  # restored


class TestGramKresRemat:
    def test_remat_grads_bit_equal(self, monkeypatch):
        """GRAM_KRES_REMAT recomputes the identical forward in the
        backward (checkpoint over the custom vjp) — gradients must be
        bit-equal to the residual-keeping path."""
        monkeypatch.setattr(kernels, "GRAM_KRES_MIN_BYTES", 0)
        kx, kz = jax.random.split(KEY)
        X = jax.random.normal(kx, (64, 5), jnp.float32)
        Z = jax.random.normal(kz, (16, 5), jnp.float32)
        params = kernels.kernel_params("rbf", 5)

        def loss(p, X, Z):
            return jnp.sum(jnp.square(kernels.K(p, X, Z, kind="rbf")))

        g0 = jax.grad(loss, argnums=(0, 1, 2))(params, X, Z)
        monkeypatch.setattr(kernels, "GRAM_KRES_REMAT", True)
        g1 = jax.grad(loss, argnums=(0, 1, 2))(params, X, Z)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
