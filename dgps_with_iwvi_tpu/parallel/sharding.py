"""Sharded training step: dp-sharded minibatches, k-sharded IW samples.

TPU-native distributed execution (SURVEY.md §5 'Distributed comm backend'
row): shard_map over a ('dp', 'k') Mesh with explicit XLA collectives —
gradient allreduce = lax.psum over BOTH axes (rides ICI), cross-chip
logsumexp for the K importance-sample axis = lax.pmax + lax.psum over 'k'.
Parameters and optimizer state stay replicated; each device computes the
identical update from the psum'd gradients, so replication is preserved
without broadcasting.

Scaling bookkeeping (P = n_dp * n_k devices): each device's local loss is
    -(N / B_global) * sum_{local batch} datafit_n / n_k  +  KL / P
so that psum over the full mesh reproduces the single-device objective
exactly — this makes 'dp-grad == single-device-grad' a testable identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import dgp
from ..models.layers import LatentVarMode
from ..ops import likelihoods
from ..training import natgrad as ng
from ..training import train as train_mod
from ..training.train import (TrainConfig, TrainState, _merge_params,
                              _split_params, gamma_schedule,
                              resolve_solve_bwd)


def _sharded_objective(params, config: dgp.DGPConfig, xb, yb, idx, key,
                       n_k: int, P_total: int):
    """Per-device negative-ELBO contribution; psum over the mesh == global loss.

    Inside shard_map: xb/yb are the device's local minibatch (identical
    across the 'k' axis); the K (or S) sample axis is split so each k-shard
    draws K/n_k (S/n_k) samples with independent keys.
    """
    B_local = xb.shape[0]
    n_dp = P_total // n_k
    B_global = B_local * n_dp
    scale = config.num_data / B_global

    # ONE batched Kuu factorization shared by the conditionals and the
    # (non-whitened) KLs, mirroring dgp.elbo
    factors = dgp.prefactor_gp_layers(params, config)
    if config.objective == "iw":
        K_local = config.num_iw_samples // n_k
        fmean, fvar, log_w, _ = dgp.propagate(
            params, config, xb, key, (K_local,),
            lv_mode=LatentVarMode.POSTERIOR, Y=yb, data_idx=idx,
            factors=factors)
        ve = likelihoods.dispatch_variational_expectations(
            params["likelihood"], fmean, fvar, yb,
            kind=config.likelihood)                       # [K_local, B]
        lw = ve + log_w
        # cross-'k' logsumexp over the global K axis; the max shift is a
        # numerical stabilizer only (logsumexp grads are shift-invariant),
        # and pmax has no differentiation rule -> stop_gradient
        m = lax.pmax(jnp.max(lax.stop_gradient(lw), axis=0), "k")  # [B]
        s = lax.psum(jnp.sum(jnp.exp(lw - m), axis=0), "k")
        iw = m + jnp.log(s) - jnp.log(float(config.num_iw_samples))
        datafit = jnp.sum(iw)
        local_kl_term = 0.0
    else:
        # divisibility is asserted in make_parallel_trainer; an uneven split
        # here would silently run a different (lower-variance) S_global
        # estimator than the single-device S run
        S_local = config.num_samples // n_k
        S_global = S_local * n_k
        fmean, fvar, _, local_kl = dgp.propagate(
            params, config, xb, key, (S_local,),
            lv_mode=LatentVarMode.POSTERIOR, Y=yb, data_idx=idx,
            factors=factors)
        ve = likelihoods.dispatch_variational_expectations(
            params["likelihood"], fmean, fvar, yb,
            kind=config.likelihood)                       # [S_local, B]
        ve_mean = lax.psum(jnp.sum(ve, axis=0), "k") / S_global  # [B]
        datafit = jnp.sum(ve_mean)
        local_kl_term = jnp.sum(local_kl)

    kl = dgp.gp_kls(params, config, factors)
    # hyperparameter log-prior: global term, counted once per device -> /P
    # (same bookkeeping as the KL so psum reproduces the single-device loss)
    if config.priors:
        from ..ops import priors as priors_mod

        kl = kl - priors_mod.log_prior(params, config.priors)
    # datafit counted once per k-replica -> /n_k; KL once per device -> /P
    return (-(scale * (datafit - local_kl_term)) / n_k + kl / P_total)


def global_row_ids(i_dp, idx, N_local: int, num_data: int):
    """Map per-shard minibatch indices to GLOBAL dataset row ids.

    Shards are contiguous chunks along axis 0 (see shard_arrays), padded to a
    multiple of n_dp by appending copies of the HEAD rows; padded global
    positions g in [num_data, num_data + rem) alias source rows
    g - num_data, which is what the modulo maps them back to. Without it,
    padded rows would jnp.take-clamp to the LAST row's per-datapoint q(w)
    parameters in non-amortized LV layers — silently wrong.
    """
    return (i_dp * N_local + idx) % num_data


def make_parallel_trainer(config: dgp.DGPConfig, tc: TrainConfig, mesh: Mesh):
    """Sharded (init_fn, step_fn, chunk_fn, params_fn).

    step_fn(state, X, Y, key): X, Y are GLOBAL arrays sharded along 'dp'
    (use shard_arrays below); state is replicated. One call = one psum'd
    natgrad+Adam step, identical semantics to the single-device trainer.
    """
    n_dp = mesh.shape["dp"]
    n_k = mesh.shape["k"]
    P_total = n_dp * n_k
    if config.objective == "iw":
        assert config.num_iw_samples % n_k == 0, \
            f"K={config.num_iw_samples} must divide over n_k={n_k}"
    else:
        assert config.num_samples % n_k == 0, \
            (f"S={config.num_samples} must divide over n_k={n_k}: an uneven "
             "split would change the VI estimator's effective sample count "
             "vs the single-device run")
    layer_ids = ng.natgrad_layer_ids(config, tc.natgrad)
    adam = optax.adam(tc.lr)
    B_local = max(tc.minibatch_size // n_dp, 1)

    def init_fn(params) -> TrainState:
        natvars, rest = _split_params(params, layer_ids)
        return TrainState(rest, natvars, adam.init(rest),
                          jnp.zeros((), jnp.int32))

    solve_bwd = resolve_solve_bwd(tc, layer_ids)
    # full-batch (B >= N) precision escalation, same policy as the
    # single-device trainer (train.resolve_full_batch). The sharded path
    # always samples with replacement, but B_global >= num_data is the same
    # near-zero-gradient-noise regime the B8192 gate characterized.
    loss_cfg, _fb_ovr = train_mod.resolve_full_batch(
        config, tc, tc.minibatch_size >= config.num_data)
    _overrides = {"SOLVE_BWD_PRECISION": solve_bwd, **_fb_ovr}

    def loss_fn(natvars, rest, xb, yb, idx, key):
        # same trace-time precision scoping as the single-device trainer
        from ..ops import conditionals as _cond
        from ..ops import kernels as _kern

        def _mod(k):
            return _cond if hasattr(_cond, k) else _kern

        prev = {k: getattr(_mod(k), k) for k in _overrides}
        for k, v in _overrides.items():
            setattr(_mod(k), k, v)
        try:
            params = _merge_params(rest, natvars, layer_ids)
            return _sharded_objective(params, loss_cfg, xb, yb, idx, key,
                                      n_k, P_total)
        finally:
            for k, v in prev.items():
                setattr(_mod(k), k, v)

    def local_grads(natvars, rest, Xl, Yl, key):
        """Runs per device inside shard_map; returns psum'd loss + grads."""
        i_dp = lax.axis_index("dp")
        i_k = lax.axis_index("k")
        kb, ke = jax.random.split(key)
        # minibatch indices: shared across 'k' (same data), distinct per 'dp'
        N_local = Xl.shape[0]
        idx = jax.random.randint(jax.random.fold_in(kb, i_dp),
                                 (B_local,), 0, N_local)
        if train_mod.FUSED_GATHER and Xl.dtype == Yl.dtype:
            # one latency-bound row gather instead of two (train.py policy)
            b = jnp.take(jnp.concatenate([Xl, Yl], axis=1), idx, axis=0)
            xb, yb = b[:, :Xl.shape[1]], b[:, Xl.shape[1]:]
        else:
            xb = jnp.take(Xl, idx, axis=0)
            yb = jnp.take(Yl, idx, axis=0)
        gidx = global_row_ids(i_dp, idx, N_local, config.num_data)
        # sample keys: distinct per (dp, k)
        kloc = jax.random.fold_in(jax.random.fold_in(ke, i_dp), i_k)
        loss, (g_nat, g_rest) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(natvars, rest, xb, yb, gidx, kloc)
        loss = lax.psum(loss, ("dp", "k"))
        g_nat = lax.psum(g_nat, ("dp", "k"))
        g_rest = lax.psum(g_rest, ("dp", "k"))
        return loss, g_nat, g_rest

    grads_sharded = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(), P("dp", None), P("dp", None), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def step_fn(state: TrainState, X, Y, key):
        gamma = gamma_schedule(tc, state.step)
        if layer_ids and tc.schedule == "alternating":
            # reference schedule: natgrad on one sharded minibatch, Adam on
            # a fresh one (two psum'd passes)
            k1, k2 = jax.random.split(key)
            _, g_nat, _ = grads_sharded(state.natvars, state.rest, X, Y, k1)
            natvars = ng.natgrad_update(state.natvars, g_nat, gamma)
            loss, _, g_rest = grads_sharded(natvars, state.rest, X, Y, k2)
        else:
            loss, g_nat, g_rest = grads_sharded(
                state.natvars, state.rest, X, Y, key)
            natvars = (ng.natgrad_update(state.natvars, g_nat, gamma)
                       if layer_ids else state.natvars)
        updates, opt_state = adam.update(g_rest, state.opt_state, state.rest)
        rest = optax.apply_updates(state.rest, updates)
        return TrainState(rest, natvars, opt_state, state.step + 1), loss

    def chunk_fn(state: TrainState, X, Y, key):
        def body(carry, i):
            st, l = step_fn(carry, X, Y, jax.random.fold_in(key, i))
            return st, l
        return jax.lax.scan(body, state, jnp.arange(tc.steps_per_call))

    def params_fn(state: TrainState):
        if not layer_ids:
            return state.rest
        return ng.natvars_to_canonical(state.natvars, state.rest, layer_ids)

    return init_fn, step_fn, chunk_fn, params_fn


def shard_arrays(mesh: Mesh, X, Y):
    """Place (X, Y) sharded along 'dp'.

    Single process (incl. the virtual-device test mesh): X/Y are the GLOBAL
    arrays; N is padded to a multiple of n_dp by repeating head rows
    (harmless under with-replacement minibatching — global_row_ids maps the
    padded rows back to their sources).

    Multi-process: X/Y are THIS PROCESS's equal-size row chunk (in
    process_id order); global arrays are assembled from per-process data
    via jax.make_array_from_process_local_data — device_put of a global
    array would require all devices to be addressable, which is exactly
    the single-controller assumption a pod slice violates. Padding is not
    supported multi-process (chunks must already be equal) — asserted.
    """
    import numpy as np

    n_dp = mesh.shape["dp"]
    sx = NamedSharding(mesh, P("dp", None))
    if jax.process_count() > 1:
        X, Y = np.asarray(X), np.asarray(Y)
        n_dp_local = max(n_dp // jax.process_count(), 1)
        assert X.shape[0] % n_dp_local == 0, (
            f"multi-process shard_arrays: this process's chunk (N_local="
            f"{X.shape[0]}) must divide evenly over its {n_dp_local} local "
            "'dp' mesh rows — pre-pad/trim the data split per process")
        return (jax.make_array_from_process_local_data(sx, X),
                jax.make_array_from_process_local_data(sx, Y))
    n = X.shape[0]
    rem = (-n) % n_dp
    if rem:
        X = jnp.concatenate([X, X[:rem]], axis=0)
        Y = jnp.concatenate([Y, Y[:rem]], axis=0)
    return jax.device_put(X, sx), jax.device_put(Y, sx)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (multi-process safe: each
    process materializes its addressable shards from host values)."""
    import numpy as np

    s = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def put(a):
            a = np.asarray(a)
            return jax.make_array_from_callback(a.shape, s,
                                                lambda idx: a[idx])
        return jax.tree.map(put, tree)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)
