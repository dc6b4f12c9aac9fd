"""Fused q-variance kernel (ops/pallas/qvar.py): parity + dispatch.

The kernel replaces the XLA q-variance path on PREDICTION traces (no AD
residual needed there), where the XLA path's [D, M, cols] HBM round trip
is 43% of the serving device call (docs/PERF.md). On the real v5e it is
bitwise-equal to the XLA bf16-residual path at var_precision='default'
(both run the same bf16-operand/f32-accumulate MXU pipeline); these CPU
tests check the interpreter to the bf16 rounding class.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgps_with_iwvi_tpu.ops import conditionals as C
from dgps_with_iwvi_tpu.ops.pallas.qvar import qvar_fused


def _data(seed=0, S=3, M=128, N=512, D=5):
    rng = np.random.RandomState(seed)
    A = jnp.asarray(rng.randn(S, M, N).astype(np.float32))
    L = jnp.asarray(0.3 * np.tril(rng.randn(D, M, M)).astype(np.float32))
    return A, L


def test_root_values():
    A, L = _data()
    out = qvar_fused(A, L, False, True)
    LTA = jnp.einsum("dkm,skn->sdmn", L, A)
    ref = jnp.sum(LTA ** 2, axis=-2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2 * float(jnp.max(ref)))


def test_cov_values():
    A, L = _data(seed=1)
    S_cov = jnp.matmul(L, jnp.swapaxes(L, -1, -2))
    out = qvar_fused(A, S_cov, True, True)
    SA = jnp.einsum("dmk,skn->sdmn", S_cov, A)
    ref = jnp.einsum("smn,sdmn->sdn", A, SA)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2 * float(jnp.max(jnp.abs(ref))))


def test_gradients_match_reference_ad():
    A, L = _data(S=2, N=256, D=3)
    w = jnp.cos(jnp.arange(256.0, dtype=jnp.float32))

    def loss_k(A, L):
        return jnp.sum(qvar_fused(A, L, False, True) * w)

    def loss_r(A, L):
        LTA = jnp.einsum("dkm,skn->sdmn", L, A)
        return jnp.sum(jnp.sum(LTA ** 2, -2) * w)

    gA_k, gL_k = jax.grad(loss_k, (0, 1))(A, L)
    gA_r, gL_r = jax.grad(loss_r, (0, 1))(A, L)
    # CPU recompute backward runs f32-exact
    np.testing.assert_allclose(np.asarray(gA_k), np.asarray(gA_r),
                               atol=1e-4 * float(jnp.max(jnp.abs(gA_r))))
    np.testing.assert_allclose(np.asarray(gL_k), np.asarray(gL_r),
                               atol=1e-4 * float(jnp.max(jnp.abs(gL_r))))


def test_dispatch_gating():
    """auto requires the inference hint AND a TPU backend; 'on' forces."""
    A, L = _data(N=256)
    vp = jax.lax.Precision.DEFAULT
    saved = C.QVAR_PALLAS
    try:
        C.QVAR_PALLAS = "auto"
        assert not C._use_qvar_pallas(A, L, vp)        # no hint
        with C.qvar_inference_mode():
            # hint set, but CPU backend -> still off under auto
            assert not C._use_qvar_pallas(A, L, vp)
        C.QVAR_PALLAS = "on"
        assert C._use_qvar_pallas(A, L, vp)            # forced
        # never at non-default var precision
        assert not C._use_qvar_pallas(A, L, jax.lax.Precision.HIGHEST)
        # never for misaligned shapes
        assert not C._use_qvar_pallas(A[..., :100], L, vp)
        with C.qvar_pallas_disabled():                 # portability guard
            assert not C._use_qvar_pallas(A, L, vp)
        assert C._use_qvar_pallas(A, L, vp)            # restored
    finally:
        C.QVAR_PALLAS = saved


def test_predict_parity_forced_on():
    """End-to-end predict path: forced-pallas (interpreter) vs XLA."""
    from dgps_with_iwvi_tpu.models import (BuildArgs, build_model,
                                           predict_y_and_log_density)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kx, (640, 4), jnp.float32)
    Y = jnp.sin(X[:, :1])
    args = BuildArgs(configuration="LG", mode="IW", num_inducing=32,
                     num_iw_samples=5)
    config, params = build_model(jax.random.PRNGKey(1), args, X, Y)
    # O(1) q_sqrt so the quadratic form is a visible fraction of fvar
    rng = np.random.RandomState(0)
    layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        if "q_sqrt" in lp and np.ndim(lp["q_sqrt"]) == 3:
            d, m, _ = lp["q_sqrt"].shape
            lp["q_sqrt"] = jnp.asarray(
                0.3 * np.tril(rng.randn(d, m, m)).astype(np.float32))
        layers.append(lp)
    params = dict(params, layers=layers)

    xb, yb = X[:128], Y[:128]
    saved = C.QVAR_PALLAS
    try:
        C.QVAR_PALLAS = "off"
        (m0, v0), ld0 = predict_y_and_log_density(params, config, xb, yb,
                                                  ky, 16)
        C.QVAR_PALLAS = "on"
        (m1, v1), ld1 = predict_y_and_log_density(params, config, xb, yb,
                                                  ky, 16)
    finally:
        C.QVAR_PALLAS = saved
    # same PRNG path; values differ only by the bf16 rounding class the
    # production default (var_precision='default' + bf16 residual) already
    # accepts
    np.testing.assert_allclose(np.asarray(ld0), np.asarray(ld1), atol=0.05)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                               atol=0.05 * float(jnp.max(jnp.abs(m0))))


@pytest.mark.parametrize("n", [256, 384])
def test_tile_sizes(n):
    A, L = _data(S=2, N=n, D=3)
    out = qvar_fused(A, L, False, True)
    LTA = jnp.einsum("dkm,skn->sdmn", L, A)
    ref = jnp.sum(LTA ** 2, axis=-2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2 * float(jnp.max(ref)))


class TestFusedTrainBackward:
    """qvar_fused_train: the fused Pallas BACKWARD kernel for training
    objectives (QVAR_PALLAS_TRAIN). Forward must equal qvar_fused exactly
    (same kernel); gradients must match reference AD of the mathematical
    quadratic form to the bf16 rounding class, including the cross-grid
    VMEM accumulation of dW over both leading-batch and tile dims."""

    def _data(self, seed=0, S=3, M=16, N=256, D=4):
        rng = np.random.RandomState(seed)
        A = jnp.asarray(rng.randn(S, M, N).astype(np.float32))
        L = jnp.asarray(np.tril(rng.randn(D, M, M)).astype(np.float32)
                        + 2.0 * np.eye(M, dtype=np.float32))
        return A, L

    @pytest.mark.parametrize("cov", [False, True])
    def test_forward_equals_qvar_fused(self, cov):
        from dgps_with_iwvi_tpu.ops.pallas.qvar import qvar_fused_train
        A, L = self._data()
        W = L if not cov else L @ jnp.swapaxes(L, -1, -2)
        out = qvar_fused_train(A, W, cov, True)
        ref = qvar_fused(A, W, cov, True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.parametrize("cov", [False, True])
    def test_gradients_match_reference_ad(self, cov):
        from dgps_with_iwvi_tpu.ops.pallas.qvar import qvar_fused_train
        A, L = self._data(seed=2)
        W = L if not cov else L @ jnp.swapaxes(L, -1, -2)
        w = jnp.cos(jnp.arange(256.0, dtype=jnp.float32))

        def loss_k(A, W):
            return jnp.sum(qvar_fused_train(A, W, cov, True) * w)

        def loss_r(A, W):
            if cov:
                SA = jnp.einsum("dmk,skn->sdmn", W, A)
                out = jnp.einsum("smn,sdmn->sdn", A, SA)
            else:
                LTA = jnp.einsum("dkm,skn->sdmn", W, A)
                out = jnp.sum(LTA ** 2, -2)
            return jnp.sum(out * w)

        gA_k, gW_k = jax.jit(jax.grad(loss_k, (0, 1)))(A, W)
        gA_r, gW_r = jax.grad(loss_r, (0, 1))(A, W)
        for got, ref in ((gA_k, gA_r), (gW_k, gW_r)):
            assert got.shape == ref.shape
            assert bool(jnp.all(jnp.isfinite(got)))
            atol = 2e-2 * float(jnp.max(jnp.abs(ref)))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=5e-2, atol=atol)

    def test_dw_accumulates_over_tiles_and_lead(self):
        # N spans 2 tiles of 128 and S=4 leading programs: dW must sum all
        # 8 grid steps' contributions (the VMEM accumulator pattern)
        from dgps_with_iwvi_tpu.ops.pallas.qvar import qvar_bwd_fused
        A, L = self._data(seed=3, S=4, N=256)
        g = jnp.asarray(np.random.RandomState(9).randn(4, 4, 256)
                        .astype(np.float32))
        dA, dW = qvar_bwd_fused(A, L, g, False, True)

        def loss(A, W):
            LTA = jnp.einsum("dkm,skn->sdmn", W, A)
            return jnp.sum(jnp.sum(LTA ** 2, -2) * g)

        gA_r, gW_r = jax.grad(loss, (0, 1))(A, L)
        atol = 2e-2 * float(jnp.max(jnp.abs(gW_r)))
        np.testing.assert_allclose(np.asarray(dW), np.asarray(gW_r),
                                   rtol=5e-2, atol=atol)
        atolA = 2e-2 * float(jnp.max(jnp.abs(gA_r)))
        np.testing.assert_allclose(np.asarray(dA), np.asarray(gA_r),
                                   rtol=5e-2, atol=atolA)

    def test_train_gate_policy(self):
        from dgps_with_iwvi_tpu.ops.pallas import qvar as Q
        W8 = jnp.zeros((8, 128, 128), jnp.float32)
        W1 = jnp.zeros((1, 128, 128), jnp.float32)
        W30 = jnp.zeros((30, 128, 128), jnp.float32)
        f32 = jnp.dtype(jnp.float32)
        if jax.default_backend() == "cpu":
            # kernel never auto-dispatches on CPU
            assert not Q.applicable_train((20, 128, 8192), W8, f32)
            return
        assert Q.applicable_train((20, 128, 8192), W8, f32)       # 65536
        assert Q.applicable_train((50, 128, 512), W30, f32)       # 15360
        assert not Q.applicable_train((20, 128, 1024), W8, f32)   # 8192
        assert not Q.applicable_train((20, 128, 8192), W1, f32)   # d=1


class TestGroupedTrainKernel:
    """qvar_fused_train_grouped: the d-split deep-M variant. At M=512 the
    monolithic backward's VMEM blocks exceed the Mosaic scoped limit
    (docs/PERF.md ledger); the grouped wrapper calls the same kernels per
    d-slice and must be numerically identical to the monolithic path."""

    def test_grouped_matches_monolithic_forward_and_grads(self):
        from dgps_with_iwvi_tpu.ops.pallas.qvar import (
            qvar_fused_train, qvar_fused_train_grouped)
        rng = np.random.RandomState(0)
        # m=512 so the 14 MB budget forces real grouping (dg < d)
        m, d, n = 512, 4, 128
        A = jnp.asarray(rng.randn(1, m, n).astype(np.float32))
        W = jnp.asarray(np.tril(rng.randn(d, m, m)).astype(np.float32)
                        + 2.0 * np.eye(m, dtype=np.float32))
        out_g = qvar_fused_train_grouped(A, W, False, True)
        out_m = qvar_fused_train(A, W, False, True)
        np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_m))

        w = jnp.cos(jnp.arange(float(n), dtype=jnp.float32))
        gA_g, gW_g = jax.grad(
            lambda A, W: jnp.sum(qvar_fused_train_grouped(A, W, False, True)
                                 * w), (0, 1))(A, W)
        gA_m, gW_m = jax.grad(
            lambda A, W: jnp.sum(qvar_fused_train(A, W, False, True) * w),
            (0, 1))(A, W)
        # per-group kernels see identical tiles; only the dA summation
        # order differs (f32 adds) — exact in practice at this scale
        np.testing.assert_allclose(np.asarray(gA_g), np.asarray(gA_m),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gW_g), np.asarray(gW_m),
                                   rtol=1e-6, atol=1e-6)

    def test_small_m_falls_back_to_monolithic(self):
        from dgps_with_iwvi_tpu.ops.pallas import qvar as Q
        # at m=128 the budget admits dg >= d: same function object path
        rng = np.random.RandomState(1)
        A = jnp.asarray(rng.randn(2, 128, 128).astype(np.float32))
        W = jnp.asarray(np.tril(rng.randn(8, 128, 128)).astype(np.float32)
                        + np.eye(128, dtype=np.float32))
        out_g = Q.qvar_fused_train_grouped(A, W, False, True)
        out_m = Q.qvar_fused_train(A, W, False, True)
        np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_m))
