"""Natural-gradient optimizer for Gaussian variational parameters.

TPU-native rebuild of gpflow:gpflow/training/natgrad_optimizer.py semantics
(SURVEY.md §2.7): for each whitened variational block q(v) = N(m, S), one
step of size gamma is a gradient step in natural-parameter space using the
gradient taken w.r.t. expectation parameters:

    eta   = (m, S + m m^T)            # expectation params
    theta = (S^-1 m, -1/2 S^-1)       # natural params
    theta <- theta - gamma * dL/deta
    (m, S) <- from theta

The reference implements the eta-gradient via a forward-over-reverse
autodiff contortion (XiSqrtMeanVar); in JAX we take dL/d(m, S) directly —
the loss is evaluated with q_sqrt = chol(S) so one value_and_grad yields
(dm, G) — and apply the exact chain rule in closed form:

    H      = (G + G^T)/2              # symmetric-manifold gradient
    dL/deta1 = dm - 2 H m
    dL/deta2 = H
    S' = (S^-1 + 2 gamma H)^-1        # from theta2' = -1/2 S^-1 - gamma H
    m' = S' (S^-1 m - gamma dL/deta1)

For a conjugate (Gaussian-likelihood, full-batch, collapsed) block and
gamma = 1 this lands exactly on the optimal posterior — tested.

Known pitfall reproduced from the reference: too-large gamma can make
S^-1 + 2 gamma H lose positive-definiteness. A tiny jitter ladder absorbs
f32 roundoff-level indefiniteness; a GENUINELY indefinite precision (its
negative eigenvalue is of order gamma*|H| — no jitter worth adding fixes
that) is detected per output-dim block and that block SKIPS the update,
keeping its previous (m, S) — the full-covariance analog of the q_diag
family's vinv_new > 0 guard. Training then continues finite (where the
reference raises/NaNs and the caller must lower gamma); persistent skips
still mean gamma is too large.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..models.layers import GPLayerConfig
from ..ops.linalg import (cholesky_with_jitter, cho_solve, log_det_from_chol,
                          solve_triangular)


def _mm(a, b):
    # ALL natgrad matmuls run full-f32 MXU passes: these [D, M, M] products
    # build/update the variational covariance and its carried inverse, and
    # single-pass bf16 (the TPU default) injects ~4e-3 relative error that
    # measurably degrades converged ELBO (caught on the energy config:
    # final ELBO -2258 vs -559). They are tiny (M <= a few hundred), so
    # HIGHEST costs nothing.
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def natgrad_layer_ids(config, which: str = "final") -> tuple:
    """Indices of GP layers whose q(u) gets natural-gradient treatment.

    'final' (reference default), 'all', or 'none' (SURVEY.md §2.5 wiring).
    Both the full-covariance family and the q_diag family are supported
    (the diagonal natural gradient is elementwise — see natgrad_update).
    """
    gp_ids = [i for i, c in enumerate(config.layers)
              if isinstance(c, GPLayerConfig)]
    if which == "final":
        return (gp_ids[-1],)
    if which == "all":
        return tuple(gp_ids)
    if which == "none":
        return ()
    raise ValueError(f"unknown natgrad selection {which!r}")


def extract_natvars(params, layer_ids: Sequence[int]):
    """Pull (m, S = L L^T) blocks out of the canonical (q_mu, q_sqrt) store.

    Besides (m, S) the state carries S^-1 and log det S: the natgrad update
    needs S^-1 every step and its NEW value is the updated precision itself
    (S_new = P^-1 with P = S^-1 + 2 gamma H), and log det S_new =
    -log det P comes free from P's Cholesky diagonal — so with the
    covariance-form loss (insert_natvars / train._merge_params) NOTHING in
    the whole training step ever factorizes S. Carried entries are
    stop-gradient'd in the loss (zero cotangents, discarded by the update).
    """
    natvars = []
    for i in layer_ids:
        q_sqrt = params["layers"][i]["q_sqrt"]
        if q_sqrt.ndim == 2:  # q_diag family: [M, D] scales -> variances
            natvars.append({"q_mu": params["layers"][i]["q_mu"],
                            "q_v": jnp.square(q_sqrt)})
            continue
        L = jnp.tril(q_sqrt)                         # [D, M, M]
        S = _mm(L, jnp.swapaxes(L, -1, -2))
        eye = jnp.eye(L.shape[-1], dtype=L.dtype)
        Sinv = cho_solve(L, jnp.broadcast_to(eye, S.shape))
        Sinv = 0.5 * (Sinv + jnp.swapaxes(Sinv, -1, -2))
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1))), axis=-1)
        natvars.append({"q_mu": params["layers"][i]["q_mu"], "q_S": S,
                        "q_Sinv": Sinv, "q_logdet": logdet})
    return natvars


def insert_natvars(params, natvars, layer_ids: Sequence[int],
                   cov_form: bool | Sequence[bool] = True):
    """Rebuild full params, differentiable in natvars.

    cov_form=True (default, whitened layers): the layer gets q_cov = S plus
    the carried (logdet, Sinv) — the loss consumes the covariance directly
    (ops/conditionals.py q_S path, ops/kl.py gauss_kl_white_cov) and dL/dS
    comes straight out of one backward pass with NO Cholesky of S.
    cov_form=False: legacy root form, q_sqrt = chol(S) with the chol's
    pullback providing dL/dS (identical gradients, one more factorization).
    """
    if isinstance(cov_form, bool):
        cov_form = [cov_form] * len(layer_ids)
    layers = list(params["layers"])
    for nv, i, cov in zip(natvars, layer_ids, cov_form):
        lp = {k: v for k, v in layers[i].items()
              if k not in ("q_sqrt", "q_cov", "q_cov_diag", "q_cov_logdet",
                           "q_cov_Sinv")}
        lp["q_mu"] = nv["q_mu"]
        if "q_v" in nv:  # q_diag family: variance form, no factorization
            lp["q_cov_diag"] = nv["q_v"]
            layers[i] = lp
            continue
        if cov:
            lp["q_cov"] = nv["q_S"]
            lp["q_cov_logdet"] = jax.lax.stop_gradient(nv["q_logdet"])
            lp["q_cov_Sinv"] = jax.lax.stop_gradient(nv["q_Sinv"])
        else:
            lp["q_sqrt"] = jnp.linalg.cholesky(nv["q_S"])
        layers[i] = lp
    out = dict(params)
    out["layers"] = layers
    return out


def natgrad_update(natvars, nat_grads, gamma) -> list:
    """Closed-form natural-gradient step on each (m, S) block.

    nat_grads are the plain gradients of the LOSS (= -ELBO) w.r.t. (m, S)
    from the insert_natvars parameterization. Batched over the output-dim
    axis of each block ([M, D] means, [D, M, M] covariances).
    """
    new = []
    for nv, g in zip(natvars, nat_grads):
        if "q_v" in nv:
            # q_diag family: the same eta/theta step per element
            # (m_i, v_i), closed form:
            #   1/v' = 1/v + 2 gamma h,  h = dL/dv
            #   m'   = v' * (m/v - gamma (dm - 2 h m))
            # An element whose new precision would go non-positive (the
            # too-large-gamma failure mode) keeps its old precision —
            # the elementwise analog of the full-family jitter rescue.
            m, v = nv["q_mu"], nv["q_v"]   # [M, D] each
            dm, h = g["q_mu"], g["q_v"]
            vinv_new = 1.0 / v + 2.0 * gamma * h
            vinv_new = jnp.where(vinv_new > 0, vinv_new, 1.0 / v)
            v_new = 1.0 / vinv_new
            m_new = v_new * (m / v - gamma * (dm - 2.0 * h * m))
            new.append({"q_mu": m_new, "q_v": v_new})
            continue
        m = nv["q_mu"]                     # [M, D]
        S = nv["q_S"]                      # [D, M, M]
        Sinv = nv["q_Sinv"]                # [D, M, M] (carried; see extract)
        dm = g["q_mu"]                     # [M, D]
        G = g["q_S"]                       # [D, M, M]
        H = 0.5 * (G + jnp.swapaxes(G, -1, -2))
        # per-dim column vectors: [D, M, 1]
        mT = jnp.swapaxes(m, 0, 1)[..., None]
        dmT = jnp.swapaxes(dm, 0, 1)[..., None]
        Sinv_m = _mm(Sinv, mT)                             # [D, M, 1]
        deta1 = dmT - 2.0 * _mm(H, mT)                   # [D, M, 1]
        theta1_new = Sinv_m - gamma * deta1
        # S' = (S^-1 + 2 gamma H)^-1, via chol of the new precision;
        # the new precision IS the carried S^-1 for the next step.
        eye = jnp.eye(S.shape[-1], dtype=S.dtype)
        P = Sinv + 2.0 * gamma * H
        P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
        Lp = cholesky_with_jitter(P, 1e-12, max_tries=2)
        # S_new = P^-1 = U U^T with U = Lp^-T: ONE triangular solve + one
        # tiny matmul instead of cho_solve's two solves (the TPU triangular
        # custom calls are latency-bound at M<=128), and symmetric-PSD by
        # construction.
        U = solve_triangular(Lp, jnp.broadcast_to(eye, S.shape), lower=True,
                             trans=True)                  # [D, M, M] = Lp^-T
        S_new = _mm(U, jnp.swapaxes(U, -1, -2))
        m_new = jnp.swapaxes(_mm(S_new, theta1_new)[..., 0], 0, 1)  # [M, D]
        # carry the ACTUALLY-factorized precision Lp Lp^T (== P except when
        # the jitter rescue escalated, where P alone would drift from
        # S_new^-1 and the mismatch would persist across all later steps)
        P_eff = _mm(Lp, jnp.swapaxes(Lp, -1, -2))
        # log det S_new = -log det P_eff, free from Lp's diagonal
        logdet_new = -log_det_from_chol(Lp)
        # Too-large-gamma guard: if P lost positive-definiteness by MORE
        # than the tiny roundoff ladder above can absorb (a genuinely
        # indefinite P has a negative eigenvalue of order gamma*|H| — far
        # beyond any jitter worth adding), the factor comes back non-finite.
        # Keep the OLD (m, S, Sinv, logdet) for that output-dim block — the
        # full-family analog of the q_diag branch's vinv_new > 0 guard.
        # Without this, one bad step turns the carried state NaN PERMANENTLY
        # (the update never re-derives Sinv/logdet from scratch).
        diag_p = jnp.diagonal(Lp, axis1=-2, axis2=-1)
        ok = jnp.all(jnp.isfinite(diag_p) & (diag_p > 0),
                     axis=-1)                              # [D]
        okb = ok[:, None, None]
        new.append({
            "q_mu": jnp.where(ok[None, :], m_new, m),
            "q_S": jnp.where(okb, S_new, S),
            "q_Sinv": jnp.where(
                okb, 0.5 * (P_eff + jnp.swapaxes(P_eff, -1, -2)), Sinv),
            "q_logdet": jnp.where(ok, logdet_new, nv["q_logdet"]),
        })
    return new


def natvars_to_canonical(natvars, params, layer_ids: Sequence[int]):
    """Store updated (m, S) back as canonical (q_mu, q_sqrt = chol S;
    q_sqrt = sqrt(v) for the q_diag family)."""
    layers = list(params["layers"])
    for nv, i in zip(natvars, layer_ids):
        lp = dict(layers[i])
        lp["q_mu"] = nv["q_mu"]
        if "q_v" in nv:
            lp["q_sqrt"] = jnp.sqrt(nv["q_v"])
        else:
            lp["q_sqrt"] = cholesky_with_jitter(nv["q_S"], 1e-10, max_tries=4)
        layers[i] = lp
    out = dict(params)
    out["layers"] = layers
    return out
