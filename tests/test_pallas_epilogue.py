"""Epilogue-fused conditional kernel (ops/pallas/qvar.py epi_fused*):
parity + dispatch.

The kernel computes the whole whitened-conditional epilogue — mean
(A^T q_mu), the prior-variance sumsq(A), and the q-variance quadratic
form — in one pass over each A tile, replacing three separate XLA ops
that each re-read the A tensor (docs/ROOFLINE_B8192.md: at B=8192 the
epilogue is the remaining A-sized HBM traffic after the fused q-variance
kernels). These CPU tests run the interpreter and check to the bf16
rounding class for the quadratic form and near-exactly for the mean and
sumsq terms (f32 VPU / HIGHEST-dot math).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgps_with_iwvi_tpu.ops import conditionals as C
from dgps_with_iwvi_tpu.ops.pallas.qvar import (epi_bwd_fused, epi_fused,
                                                epi_fused_train, ps_fused,
                                                ps_fused_train)


def _data(seed=0, S=3, M=16, N=256, D=4):
    rng = np.random.RandomState(seed)
    A = jnp.asarray(rng.randn(S, M, N).astype(np.float32))
    L = jnp.asarray(np.tril(rng.randn(D, M, M)).astype(np.float32)
                    + 2.0 * np.eye(M, dtype=np.float32))
    qmu = jnp.asarray(rng.randn(M, D).astype(np.float32))
    return A, L, qmu


def _ref(A, W, qmu, cov):
    if cov:
        SA = jnp.einsum("dmk,skn->sdmn", W, A)
        qv = jnp.einsum("smn,sdmn->sdn", A, SA)
    else:
        LTA = jnp.einsum("dkm,skn->sdmn", W, A)
        qv = jnp.sum(LTA ** 2, -2)
    ss = jnp.sum(A * A, axis=-2)
    mn = jnp.einsum("md,smn->sdn", qmu, A)
    return qv, ss, mn


@pytest.mark.parametrize("cov", [False, True])
def test_forward_values(cov):
    A, L, qmu = _data()
    W = L if not cov else L @ jnp.swapaxes(L, -1, -2)
    qv, ss, mn = epi_fused(A, W, qmu, cov, True)
    qv_r, ss_r, mn_r = _ref(A, W, qmu, cov)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(qv_r), rtol=0,
                               atol=2e-2 * float(jnp.max(jnp.abs(qv_r))))
    # sumsq and mean are f32 / HIGHEST math — near-exact
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_r),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mn), np.asarray(mn_r),
                               rtol=1e-4, atol=1e-4 * float(jnp.max(jnp.abs(mn_r))))


def test_train_forward_equals_inference_kernel():
    A, L, qmu = _data(seed=1)
    out_t = epi_fused_train(A, L, qmu, False, True)
    out_i = epi_fused(A, L, qmu, False, True)
    for a, b in zip(out_t, out_i):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("cov", [False, True])
@pytest.mark.parametrize("variant", ["train", "inference"])
def test_gradients_match_reference_ad(cov, variant):
    A, L, qmu = _data(seed=2)
    W = L if not cov else L @ jnp.swapaxes(L, -1, -2)
    rng = np.random.RandomState(7)
    wq = jnp.asarray(rng.randn(3, 4, 256).astype(np.float32))
    ws = jnp.asarray(rng.randn(3, 256).astype(np.float32))
    wm = jnp.asarray(rng.randn(3, 4, 256).astype(np.float32))
    fn = epi_fused_train if variant == "train" else epi_fused

    def loss_k(A, W, qmu):
        qv, ss, mn = fn(A, W, qmu, cov, True)
        return jnp.sum(qv * wq) + jnp.sum(ss * ws) + jnp.sum(mn * wm)

    def loss_r(A, W, qmu):
        qv, ss, mn = _ref(A, W, qmu, cov)
        return jnp.sum(qv * wq) + jnp.sum(ss * ws) + jnp.sum(mn * wm)

    gk = jax.jit(jax.grad(loss_k, (0, 1, 2)))(A, W, qmu)
    gr = jax.grad(loss_r, (0, 1, 2))(A, W, qmu)
    for got, ref in zip(gk, gr):
        assert got.shape == ref.shape
        assert bool(jnp.all(jnp.isfinite(got)))
        atol = 2e-2 * float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-2, atol=atol)


def test_accumulators_over_tiles_and_lead():
    # N spans 2 tiles and S=4 leading programs: dW AND dq_mu must sum all
    # 8 grid steps' contributions (constant-index VMEM accumulators)
    A, L, qmu = _data(seed=3, S=4, N=256)
    rng = np.random.RandomState(9)
    gq = jnp.asarray(rng.randn(4, 4, 256).astype(np.float32))
    gs = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    gm = jnp.asarray(rng.randn(4, 4, 256).astype(np.float32))
    dA, dW, dqmu = epi_bwd_fused(A, L, qmu, gq, gs, gm, False, True)

    def loss(A, W, qmu):
        qv, ss, mn = _ref(A, W, qmu, False)
        return jnp.sum(qv * gq) + jnp.sum(ss * gs) + jnp.sum(mn * gm)

    gA_r, gW_r, gqmu_r = jax.grad(loss, (0, 1, 2))(A, L, qmu)
    for got, ref in ((dA, gA_r), (dW, gW_r), (dqmu, gqmu_r)):
        atol = 2e-2 * float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-2, atol=atol)


@pytest.mark.parametrize("cov", [False, True])
@pytest.mark.parametrize("variant", ["train", "inference"])
def test_ps_variant_values_and_grads(cov, variant):
    """Mean-less subset (ps_fused*): qvar + sumsq forward, and gradients
    incl. the prior cotangent folded into dA."""
    A, L, _ = _data(seed=4)
    W = L if not cov else L @ jnp.swapaxes(L, -1, -2)
    fn = ps_fused_train if variant == "train" else ps_fused
    qv, ss = fn(A, W, cov, True)
    qv_r, ss_r, _ = _ref(A, W, jnp.zeros((16, 4), jnp.float32), cov)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(qv_r), rtol=0,
                               atol=2e-2 * float(jnp.max(jnp.abs(qv_r))))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_r),
                               rtol=1e-5, atol=1e-4)
    rng = np.random.RandomState(11)
    wq = jnp.asarray(rng.randn(3, 4, 256).astype(np.float32))
    ws = jnp.asarray(rng.randn(3, 256).astype(np.float32))

    def loss_k(A, W):
        qv, ss = fn(A, W, cov, True)
        return jnp.sum(qv * wq) + jnp.sum(ss * ws)

    def loss_r(A, W):
        qv, ss, _ = _ref(A, W, jnp.zeros((16, 4), jnp.float32), cov)
        return jnp.sum(qv * wq) + jnp.sum(ss * ws)

    gk = jax.jit(jax.grad(loss_k, (0, 1)))(A, W)
    gr = jax.grad(loss_r, (0, 1))(A, W)
    for got, ref in zip(gk, gr):
        atol = 2e-2 * float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-2, atol=atol)


def test_conditional_parity_forced_on():
    """base_conditional_whitened with the epilogue kernel forced vs the
    separate-op XLA composition: same mean/var to the bf16 class."""
    rng = np.random.RandomState(0)
    M, N, D = 16, 256, 3
    Kuf = jnp.asarray(rng.randn(2, M, N).astype(np.float32))
    Lm = jnp.asarray(np.linalg.cholesky(
        np.eye(M) + 0.1 * np.ones((M, M))).astype(np.float32))
    Kff = jnp.asarray((10.0 + rng.rand(2, N)).astype(np.float32))
    qmu = jnp.asarray(rng.randn(M, D).astype(np.float32))
    qs = jnp.asarray(0.3 * np.tril(rng.randn(D, M, M)).astype(np.float32))
    saved = (C.QVAR_PALLAS, C.EPI_PALLAS)
    try:
        C.QVAR_PALLAS, C.EPI_PALLAS = "off", "off"
        ref = C.base_conditional_whitened(Kuf, Lm, Kff, qmu, qs,
                                          var_precision="default")
        C.QVAR_PALLAS, C.EPI_PALLAS = "on", "auto"
        got = C.base_conditional_whitened(Kuf, Lm, Kff, qmu, qs,
                                          var_precision="default")
    finally:
        C.QVAR_PALLAS, C.EPI_PALLAS = saved
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(ref.mean),
                               rtol=1e-4,
                               atol=1e-4 * float(jnp.max(jnp.abs(ref.mean))))
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(ref.var),
                               rtol=0,
                               atol=2e-2 * float(jnp.max(ref.var)))
    assert bool(jnp.all(got.var > 0))


@pytest.mark.parametrize("mean_flag", ["ps", "mean"])
def test_conditional_train_path_values_and_grads(mean_flag):
    """base_conditional_whitened through the TRAIN kernel branch
    (QVAR_PALLAS_TRAIN forced): values and parameter gradients vs the
    XLA composition, both EPI_TRAIN variants."""
    rng = np.random.RandomState(1)
    M, N, D = 16, 256, 3
    Kuf = jnp.asarray(rng.randn(2, M, N).astype(np.float32))
    Lm = jnp.asarray(np.linalg.cholesky(
        np.eye(M) + 0.1 * np.ones((M, M))).astype(np.float32))
    Kff = jnp.asarray((10.0 + rng.rand(2, N)).astype(np.float32))
    qmu = jnp.asarray(rng.randn(M, D).astype(np.float32))
    qs = jnp.asarray(0.3 * np.tril(rng.randn(D, M, M)).astype(np.float32))
    w = jnp.asarray(rng.randn(2, N, D).astype(np.float32))

    def loss(qmu, qs, Kuf):
        # the model tril-masks q_sqrt before the conditional
        # (models/layers.py:212), so gradients are compared through the
        # same masking on both paths (the XLA path's raw dq_sqrt is dense)
        out = C.base_conditional_whitened(Kuf, Lm, Kff, qmu, jnp.tril(qs),
                                          var_precision="default")
        return jnp.sum(out.mean * w) + jnp.sum(out.var * jnp.abs(w))

    saved = (C.QVAR_PALLAS_TRAIN, C.EPI_PALLAS, C.EPI_TRAIN)
    try:
        C.QVAR_PALLAS_TRAIN, C.EPI_PALLAS, C.EPI_TRAIN = "off", "off", "off"
        ref_l = loss(qmu, qs, Kuf)
        ref_g = jax.grad(loss, (0, 1, 2))(qmu, qs, Kuf)
        C.QVAR_PALLAS_TRAIN, C.EPI_PALLAS = "on", "auto"
        C.EPI_TRAIN = mean_flag
        got_l = loss(qmu, qs, Kuf)
        got_g = jax.grad(loss, (0, 1, 2))(qmu, qs, Kuf)
    finally:
        C.QVAR_PALLAS_TRAIN, C.EPI_PALLAS, C.EPI_TRAIN = saved
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=2e-3)
    for got, ref in zip(got_g, ref_g):
        atol = 2e-2 * float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-2, atol=atol)


def test_epi_train_floor_policy():
    """EPI_TRAIN='auto' fuses the mean only at d*n >= EPI_TRAIN_MIN_DN
    (measured crossover, docs/PERF.md); below it the training branch
    falls back to the separate-op composition entirely."""
    vp = jax.lax.Precision.DEFAULT
    qmu_small = jnp.zeros((16, 4), jnp.float32)
    A_small = jnp.zeros((3, 16, 256), jnp.float32)       # d*n = 1024
    A_big = jnp.zeros((3, 16, 8192), jnp.float32)        # d*n = 32768
    L = jnp.zeros((4, 16, 16), jnp.float32)
    saved = (C.QVAR_PALLAS_TRAIN, C.EPI_TRAIN)
    try:
        C.QVAR_PALLAS_TRAIN, C.EPI_TRAIN = "on", "auto"
        assert C._maybe_epi_fused(A_small, L, None, vp, qmu_small) is None
        out = C._maybe_epi_fused(A_big, L, None, vp, qmu_small)
        assert out is not None and out[2] is not None    # mean fused
        C.EPI_TRAIN = "ps"
        out = C._maybe_epi_fused(A_small, L, None, vp, qmu_small)
        assert out is not None and out[2] is None        # mean-less
        C.EPI_TRAIN = "off"
        assert C._maybe_epi_fused(A_small, L, None, vp, qmu_small) is None
    finally:
        C.QVAR_PALLAS_TRAIN, C.EPI_TRAIN = saved


def test_epi_respects_portability_override():
    A, L, qmu = _data()
    vp = jax.lax.Precision.DEFAULT
    saved = C.QVAR_PALLAS
    try:
        C.QVAR_PALLAS = "on"
        assert C._maybe_epi_fused(A, L, None, vp, qmu) is not None
        with C.qvar_pallas_disabled():
            assert C._maybe_epi_fused(A, L, None, vp, qmu) is None
        # q_diag (2-D scales) and mismatched q_mu fall back
        assert C._maybe_epi_fused(A, jnp.ones((16, 4)), None, vp,
                                  qmu) is None
        assert C._maybe_epi_fused(A, L, None, vp, qmu[:, :2]) is None
    finally:
        C.QVAR_PALLAS = saved


def test_mean_dot3_precision_class():
    """EPI_MEAN_PRECISION='high' (_dot3: hi/lo bf16-split, 3 MXU passes)
    must land in the XLA Precision.HIGH error class: orders of magnitude
    tighter than a single bf16 pass, within ~2^-16 relative of the exact
    f32 dot (the dropped xl@yl term)."""
    from dgps_with_iwvi_tpu.ops.pallas import qvar

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    y = jnp.asarray(rng.randn(128, 96).astype(np.float32))
    exact = np.asarray(
        jnp.dot(x, y, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32))
    scale = np.abs(exact).max()
    err3 = np.abs(np.asarray(qvar._dot3(x, y)) - exact).max() / scale
    err1 = np.abs(np.asarray(
        jnp.dot(x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)) - exact).max() / scale
    assert err3 < 2e-5, err3                 # ~bf16^2 class
    assert err1 > 20 * err3                  # 1-pass is much looser
    # and the dispatcher honors the three named classes
    saved = qvar.EPI_MEAN_PRECISION
    try:
        qvar.EPI_MEAN_PRECISION = "highest"
        np.testing.assert_allclose(np.asarray(qvar._mean_dot(x, y)), exact,
                                   rtol=0, atol=0)
        qvar.EPI_MEAN_PRECISION = "high"
        assert np.abs(np.asarray(qvar._mean_dot(x, y)) - exact).max() > 0
        qvar.EPI_MEAN_PRECISION = "default"
        d1 = np.abs(np.asarray(qvar._mean_dot(x, y)) - exact).max() / scale
        np.testing.assert_allclose(d1, err1)
    finally:
        qvar.EPI_MEAN_PRECISION = saved
