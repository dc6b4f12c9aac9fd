"""Amortized recognition network for latent-variable layers.

TPU-native equivalent of the reference's encoder MLP (inside
ref:dgps_with_iwvi/layers.py or its own module — SURVEY.md §2.4): maps
s_n = concat[x_n, y_n] to the mean and log-variance of the amortized
posterior q(w_n) = N(mu_phi(s_n), diag sigma_phi^2(s_n)).

Kept as a tiny pure-pytree MLP (no flax dependency in the hot path — the
params are plain dicts so the whole model remains one pytree). The variance
head is zero-initialized with a configurable log-variance bias so q(w)
starts near N(0, sigma0^2 I); the paper notes a small initial q(w) variance
helps IW bounds (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def encoder_init(
    key: jax.Array,
    d_in: int,
    d_w: int,
    hidden: Sequence[int] = (20, 20),
    init_logvar: float = -4.6,  # sigma0^2 ~ 0.01
    dtype=jnp.float32,
):
    """Init pytree: tanh trunk + linear (mu, logvar) heads.

    Heads are zero-init so the initial posterior is exactly
    N(0, exp(init_logvar) I) regardless of the input.
    """
    sizes = [d_in, *hidden]
    keys = jax.random.split(key, len(sizes))
    trunk = []
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        scale = jnp.sqrt(2.0 / (fan_in + fan_out)).astype(dtype)
        trunk.append({
            "W": scale * jax.random.normal(keys[i], (fan_in, fan_out), dtype),
            "b": jnp.zeros((fan_out,), dtype),
        })
    last = sizes[-1]
    return {
        "trunk": trunk,
        "mu_head": {"W": jnp.zeros((last, d_w), dtype), "b": jnp.zeros((d_w,), dtype)},
        "logvar_head": {
            "W": jnp.zeros((last, d_w), dtype),
            "b": jnp.full((d_w,), init_logvar, dtype),
        },
    }


def encode(params, s: jax.Array) -> tuple[jax.Array, jax.Array]:
    """s: [..., d_in] -> (mu, log_var), each [..., d_w]."""
    h = s
    for layer in params["trunk"]:
        h = jnp.tanh(jnp.matmul(h, layer["W"], preferred_element_type=h.dtype)
                     + layer["b"])
    mu = jnp.matmul(h, params["mu_head"]["W"],
                    preferred_element_type=h.dtype) + params["mu_head"]["b"]
    log_var = jnp.matmul(h, params["logvar_head"]["W"],
                         preferred_element_type=h.dtype) + params["logvar_head"]["b"]
    return mu, log_var
