"""Parity tests for the fused Pallas Cholesky+inverse kernel.

The kernel (ops/pallas/chol.py) is a measured NEGATIVE result on the v5e
— XLA's cholesky/triangular_solve custom calls are ~5x faster per matrix
(see docs/PALLAS_SWEEP.md) — so CHOL_INV_BACKEND='auto' resolves to XLA.
These tests pin the kernel's correctness anyway (values, padding,
failure/NaN semantics, and the rescue + gradient path through
chol_and_inverse under the forced 'pallas' backend) so the switch stays
usable for re-measurement on future hardware/toolchains.

Runs on CPU via the Pallas interpreter (conftest forces platform=cpu).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgps_with_iwvi_tpu.ops import linalg
from dgps_with_iwvi_tpu.ops.pallas.chol import chol_inv_pallas


def _spd(rng, g, m, scale=None):
    A = rng.randn(g, m, m).astype(np.float32)
    K = A @ np.swapaxes(A, -1, -2) + (scale or m) * np.eye(m, dtype=np.float32)
    return jnp.asarray(K)


@pytest.mark.parametrize("m", [128, 100, 256])
def test_values_match_xla(m):
    rng = np.random.RandomState(0)
    K = _spd(rng, 3, m)
    L, Linv = chol_inv_pallas(K, interpret=True)
    Lref = jnp.linalg.cholesky(K)
    eye = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32), K.shape)
    Linvref = jax.lax.linalg.triangular_solve(
        Lref, eye, left_side=True, lower=True)
    # elementwise abs tolerance scaled by the factor's magnitude
    scale = float(jnp.max(jnp.abs(Lref)))
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(Linv), np.asarray(Linvref),
                               atol=2e-4)
    # structural guarantees: exact zeros above the diagonal
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0
    assert float(jnp.max(jnp.abs(jnp.triu(Linv, 1)))) == 0.0
    # self-consistency tighter than the XLA diff
    recon = jnp.matmul(L, jnp.swapaxes(L, -1, -2))
    np.testing.assert_allclose(np.asarray(recon), np.asarray(K),
                               rtol=0, atol=5e-5 * float(jnp.max(jnp.abs(K))))
    ident = jnp.matmul(Linv, L)
    np.testing.assert_allclose(np.asarray(ident),
                               np.asarray(jnp.broadcast_to(jnp.eye(m), K.shape)),
                               atol=5e-6)


def test_indefinite_produces_nonfinite_diag():
    d = np.ones(128, np.float32)
    d[17] = -1.0
    K = jnp.asarray(np.diag(d))[None]
    L, _ = chol_inv_pallas(K, interpret=True)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    assert not bool(jnp.all(jnp.isfinite(diag) & (diag > 0)))


def test_batch_isolation_of_failures():
    """A failed element must not contaminate its batch siblings."""
    rng = np.random.RandomState(1)
    K = np.asarray(_spd(rng, 3, 128))
    bad = K.copy()
    bad[1] = np.diag(np.r_[np.ones(64, np.float32),
                           -np.ones(64, np.float32)])
    L, Linv = chol_inv_pallas(jnp.asarray(bad), interpret=True)
    Lok, Linvok = chol_inv_pallas(jnp.asarray(K), interpret=True)
    np.testing.assert_array_equal(np.asarray(L[0]), np.asarray(Lok[0]))
    np.testing.assert_array_equal(np.asarray(L[2]), np.asarray(Lok[2]))
    np.testing.assert_array_equal(np.asarray(Linv[2]), np.asarray(Linvok[2]))


class TestForcedPallasBackend:
    """chol_and_inverse under CHOL_INV_BACKEND='pallas' (interpreter)."""

    def setup_method(self):
        self._saved = linalg.CHOL_INV_BACKEND
        linalg.CHOL_INV_BACKEND = "pallas"

    def teardown_method(self):
        linalg.CHOL_INV_BACKEND = self._saved

    def test_matches_xla_backend(self):
        rng = np.random.RandomState(2)
        K = _spd(rng, 2, 128)
        L, Linv = linalg.chol_and_inverse(K, 1e-6, 4)
        linalg.CHOL_INV_BACKEND = "xla"
        Lx, Linvx = linalg.chol_and_inverse(K, 1e-6, 4)
        scale = float(jnp.max(jnp.abs(Lx)))
        np.testing.assert_allclose(np.asarray(L), np.asarray(Lx),
                                   atol=2e-5 * scale)
        np.testing.assert_allclose(np.asarray(Linv), np.asarray(Linvx),
                                   atol=2e-4)

    def test_rescue_ladder_escalates(self):
        """A PSD-but-singular element forces the escalation branch; the
        result must be finite and factor K + (escalated jitter) I."""
        rng = np.random.RandomState(3)
        v = rng.randn(128, 2).astype(np.float32)
        K_sing = (v @ v.T)[None]  # rank-2, needs real jitter
        L, Linv = linalg.chol_and_inverse(jnp.asarray(K_sing), 1e-6, 6)
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)
        assert bool(jnp.all(jnp.isfinite(diag) & (diag > 0)))
        assert bool(jnp.all(jnp.isfinite(Linv)))
        # Linv L == I is NOT a stable check here (the rescued matrix has
        # cond ~ |v|^2/jitter, so the residual is cond * eps); the
        # backward-stable property is the reconstruction: L L^T must match
        # K + jit_sel*I for SOME ladder level's jitter, to eps * |K|.
        recon = np.asarray(jnp.matmul(L, jnp.swapaxes(L, -1, -2)))[0]
        diffs = []
        for lvl in range(6):
            target = K_sing[0] + (1e-6 * 10.0 ** lvl) * np.eye(
                128, dtype=np.float32)
            diffs.append(np.max(np.abs(recon - target)))
        assert min(diffs) < 5e-5 * float(np.max(np.abs(K_sing)))

    def test_gradients_match_xla_backend(self):
        """The custom-vjp backward is shared; grads through the pallas
        forward must agree with the xla forward to roundoff."""
        rng = np.random.RandomState(4)
        K = _spd(rng, 1, 128)

        def loss(K):
            L, Linv = linalg.chol_and_inverse(K, 1e-6, 4)
            return jnp.sum(L * jnp.cos(jnp.arange(128.0))) + jnp.sum(
                Linv * 0.1)

        g_p = jax.grad(loss)(K)
        linalg.CHOL_INV_BACKEND = "xla"
        g_x = jax.grad(loss)(K)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   rtol=0, atol=3e-5 * float(jnp.max(jnp.abs(g_x))))
