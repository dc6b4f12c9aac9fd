"""Hyperparameter priors: the reference's `log_prior` objective term.

GPflow `Model` adds the log-prior of every `Parameter` that has one to the
optimization objective (gpflow:gpflow/models/model.py `_build_objective` =
likelihood + prior; SURVEY.md §2.2). Priors there are densities on the
CONSTRAINED value plus the transform's log-Jacobian, so the raw-space
objective is the true log posterior density (gpflow:gpflow/params/parameter.py
`_build_prior`). This module reproduces that: a DGPConfig carries a static
tuple of prior specs matched against parameter-pytree paths, and
:func:`log_prior` sums the matched log densities.

Spec format (hashable, jit-static): ``(path_suffix, kind, a, b)`` where
``path_suffix`` matches the end of the '/'-joined pytree path (e.g.
``"kernel/raw_variance"``, ``"raw_noise_variance"``) and ``kind`` is one of

- ``"gaussian"``: N(raw | a, b^2) directly on the RAW unconstrained value
  (no Jacobian — the prior is a regularizer in raw space);
- ``"gamma"``: Gamma(constrained | shape=a, rate=b) on the positive value,
  + log-Jacobian of the softplus transform (gpflow semantics);
- ``"lognormal"``: LogNormal(constrained | mu=a, sigma=b), + log-Jacobian.

Everything is differentiable, so the prior term flows into both the Adam
and (through dL/d(m,S) being unaffected — priors never match q_mu/q_sqrt)
natural-gradient updates exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transforms import positive

PriorSpec = tuple  # (path_suffix: str, kind: str, a: float, b: float)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _log_density(raw: jax.Array, kind: str, a: float, b: float) -> jax.Array:
    raw = jnp.asarray(raw)
    if kind == "gaussian":
        return jnp.sum(-0.5 * jnp.log(2.0 * jnp.pi * b * b)
                       - jnp.square(raw - a) / (2.0 * b * b))
    # positive-transform priors: density on constrained value x = positive(raw)
    # + log|dx/draw| = log sigmoid(raw)  (softplus derivative)
    x = positive(raw)
    log_jac = jnp.sum(jax.nn.log_sigmoid(raw))
    if kind == "gamma":  # shape a, rate b
        logp = (a * jnp.log(b) - jax.lax.lgamma(jnp.asarray(a, raw.dtype))
                + (a - 1.0) * jnp.log(x) - b * x)
        return jnp.sum(logp) + log_jac
    if kind == "lognormal":  # mu a, sigma b
        lx = jnp.log(x)
        logp = (-lx - jnp.log(b) - 0.5 * jnp.log(2.0 * jnp.pi)
                - jnp.square(lx - a) / (2.0 * b * b))
        return jnp.sum(logp) + log_jac
    raise ValueError(f"unknown prior kind {kind!r}")


def log_prior(params, priors: tuple) -> jax.Array:
    """Sum of hyperparameter log-prior densities over matched leaves.

    ``priors`` is a static tuple of (path_suffix, kind, a, b); a spec
    matches every leaf whose '/'-joined path ends with ``path_suffix``.
    Returns 0.0 for an empty tuple (priors are OFF by default).
    """
    if not priors:
        return jnp.zeros(())
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = jnp.zeros(())
    matched = 0
    for path, leaf in leaves:
        ps = _path_str(path)
        for suffix, kind, a, b in priors:
            if ps.endswith(suffix):
                total = total + _log_density(leaf, kind, float(a), float(b))
                matched += 1
    if matched == 0:
        raise ValueError(
            f"no parameter path matched any prior spec {priors!r} — "
            "check the path suffixes (e.g. 'kernel/raw_variance', "
            "'raw_noise_variance')")
    return total
