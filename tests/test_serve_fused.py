"""Parity tests for the fully-fused inference conditional
(ops/pallas/serve_cond.py) — a MEASURED-NEGATIVE kernel kept behind
SERVE_PALLAS='on' (see ops/conditionals.py: 420k vs 850k points/s at the
serving shape against the shipped qvar-only kernel). These tests pin its
correctness so a re-measurement on a future Mosaic/toolchain is a switch
flip, not a rewrite. CPU interpreter via the forced backend."""

import numpy as np

import jax
import jax.numpy as jnp

from dgps_with_iwvi_tpu.ops import conditionals as C
from dgps_with_iwvi_tpu.ops.pallas.serve_cond import fused_conditional_infer


def _setup(seed=0, n=1280, m=128, d_in=6, d_out=3):
    rng = np.random.RandomState(seed)
    xs = jnp.asarray(rng.randn(n, d_in).astype(np.float32))
    zs = jnp.asarray(rng.randn(m, d_in).astype(np.float32))
    var = jnp.float32(1.7)
    A = rng.randn(m, m).astype(np.float32)
    K = A @ A.T + m * np.eye(m, dtype=np.float32)
    L = np.linalg.cholesky(K)
    Linv = jnp.asarray(np.linalg.inv(L).astype(np.float32))
    q_mu = jnp.asarray(rng.randn(m, d_out).astype(np.float32))
    lq = jnp.asarray(0.3 * np.tril(rng.randn(d_out, m, m)).astype(np.float32))
    return xs, zs, var, Linv, q_mu, lq


def _reference(xs, zs, var, Linv, q_mu, lq):
    d2 = (jnp.sum(xs ** 2, 1, keepdims=True) - 2 * xs @ zs.T
          + jnp.sum(zs ** 2, 1, keepdims=True).T)
    kxz = var * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
    a = kxz @ Linv.T
    mean = a @ q_mu
    varp = jnp.maximum(var - jnp.sum(a * a, 1, keepdims=True), 0.0)
    lta = jnp.einsum("nm,dmk->ndk", a, lq)
    varq = jnp.sum(lta ** 2, axis=-1)
    return mean, varp + varq


def test_moments_match_f32_reference():
    xs, zs, var, Linv, q_mu, lq = _setup()
    mean, v = fused_conditional_infer(xs, zs, var, Linv, q_mu, lq, None,
                                      sample=False, interpret=True)
    mref, vref = _reference(xs, zs, var, Linv, q_mu, lq)
    # kernel runs bf16x3 (gram/solve/mean) + bf16x1 (q-var): the same
    # precision classes the production XLA path is quality-gated at
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mref),
                               atol=5e-3 * float(jnp.max(jnp.abs(mref))))
    np.testing.assert_allclose(np.asarray(v), np.asarray(vref),
                               rtol=2e-2, atol=2e-3 * float(var))


def test_sample_uses_supplied_noise():
    xs, zs, var, Linv, q_mu, lq = _setup(seed=1)
    eps = jnp.asarray(np.random.RandomState(9).randn(
        xs.shape[0], q_mu.shape[1]).astype(np.float32))
    samp, mean, v = fused_conditional_infer(xs, zs, var, Linv, q_mu, lq,
                                            eps, sample=True,
                                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(samp),
        np.asarray(mean + jnp.sqrt(jnp.maximum(v, 1e-12)) * eps),
        atol=1e-5 * float(jnp.max(jnp.abs(mean))) + 1e-6)


def test_layer_dispatch_forced_on():
    """Forced SERVE_PALLAS='on': the predict path matches the XLA path to
    the gated precision classes (gram bf16x3 vs bf16x6 differ ~1e-5)."""
    from dgps_with_iwvi_tpu.models import (BuildArgs, build_model,
                                           predict_y_and_log_density)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.normal(kx, (2048, 4), jnp.float32)
    Y = jnp.sin(X[:, :1])
    args = BuildArgs(configuration="LG", mode="IW", num_inducing=128,
                     num_iw_samples=5)
    config, params = build_model(jax.random.PRNGKey(1), args, X, Y)
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
    xb, yb = X[:1024], Y[:1024]
    saved = C.SERVE_PALLAS
    try:
        C.SERVE_PALLAS = "off"
        (m0, v0), ld0 = predict_y_and_log_density(params, config, xb, yb,
                                                  ky, 16)
        C.SERVE_PALLAS = "on"
        (m1, v1), ld1 = predict_y_and_log_density(params, config, xb, yb,
                                                  ky, 16)
    finally:
        C.SERVE_PALLAS = saved
    np.testing.assert_allclose(np.asarray(ld0), np.asarray(ld1), atol=0.05)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                               atol=0.05 * float(jnp.max(jnp.abs(m0)) + 1e-3))
