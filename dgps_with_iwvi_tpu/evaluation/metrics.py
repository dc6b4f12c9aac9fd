"""Test metrics: mixture test log-likelihood and RMSE in original y units.

TPU-native rebuild of bb:bayesian_benchmarks/tasks/regression.py metrics +
the reference's evaluation path (SURVEY.md §3.3): sample w ~ prior, propagate
S samples, score the equally-weighted Gaussian mixture
    p(y*) ~= (1/S) sum_s N(y* | m_s, v_s + s2)
via logsumexp, and un-normalize — loglik shifts by -sum log(sigma_y),
RMSE scales by sigma_y. Evaluation batches over the test set in fixed-size
chunks (padded so every chunk hits the same compiled program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import dgp


@functools.lru_cache(maxsize=None)
def _batch_eval_fn(config, num_samples: int, sharded: bool):
    """Jitted one-propagate scorer, cached on (config, S, sharded).

    Hoisted out of evaluate() so repeat calls with the same model config
    (the 40-run suite, eval-in-training-loop monitors) reuse the compiled
    program instead of paying a fresh trace per invocation.
    """

    @jax.jit
    def batch_eval(params, xb, yb, k):
        # one propagate for BOTH the density and the moments (identical
        # results to separate predict_log_density/predict_y calls with the
        # same key, at half the compute)
        import contextlib

        from ..ops.conditionals import qvar_pallas_disabled

        # GSPMD cannot auto-partition a Mosaic custom call: under a mesh,
        # the fused q-variance kernel would force replication (or fail to
        # shard) — keep the sharded path pure-XLA
        ctx = qvar_pallas_disabled() if sharded else contextlib.nullcontext()
        with ctx:
            (mean, _), ld = dgp.predict_y_and_log_density(
                params, config, xb, yb, k, num_samples)
        return ld, mean

    return batch_eval


def shard_eval_batch(mesh, xb, yb):
    """Place an eval/serving batch row-sharded over EVERY mesh device (all
    axes stacked); batch size must be a device-count multiple."""
    from jax.sharding import NamedSharding, PartitionSpec

    s = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))
    return jax.device_put(xb, s), jax.device_put(yb, s)


def replicate_for_eval(mesh, params):
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.device_put(params, NamedSharding(mesh, PartitionSpec()))


def evaluate(
    params,
    config,
    X_test,
    Y_test,
    key: jax.Array,
    *,
    y_std: np.ndarray,
    num_samples: int = 100,
    # 4096 measured fastest on the v5e at year-scale test sets (87.2k vs
    # 52.2k points/s at 1024 and 62.1k at 8192, S=100 LGG M=128 — bigger
    # batches amortize per-call overhead and keep the fused q-variance
    # kernel's tiles full; 8192 loses to tail padding). bs = min(bs, n)
    # below keeps small test sets cheap.
    batch_size: int = 4096,
    likelihood: str = "gaussian",
    mesh=None,
):
    """-> dict(test_loglik, test_rmse, test_loglik_normalized, test_rmse_normalized).

    test_loglik is the mean per-point mixture log-density in ORIGINAL units;
    test_rmse the root-mean-square error of the mixture mean, original units.

    'gaussian' and 'student_t' train on standardized labels and get the
    same un-normalization (rmse * y_std, loglik - sum log y_std). The other
    families train on un-standardized labels, so model units are original
    units and no un-normalization applies; 'bernoulli' and 'multiclass'
    additionally report test_accuracy (mixture p > 0.5 / argmax over
    mixture class probabilities).

    mesh: optional jax.sharding.Mesh — shards test ROWS over every mesh
    device (params replicated) and lets GSPMD partition the one-propagate
    predictive; per-point outputs are BIT-IDENTICAL to the single-device
    path because threefry is counter-based per element
    (jax_threefry_partitionable), tested in tests/test_parallel.py.
    """
    X_test = jnp.asarray(X_test)
    Y_test = jnp.asarray(Y_test)
    n = X_test.shape[0]
    bs = min(batch_size, n)
    if mesh is not None:
        bs += (-bs) % mesh.devices.size  # device-count multiple
        params = replicate_for_eval(mesh, params)

    batch_eval = _batch_eval_fn(config, num_samples, mesh is not None)

    outs = []
    for start in range(0, n, bs):
        xb = X_test[start:start + bs]
        yb = Y_test[start:start + bs]
        pad = bs - xb.shape[0]
        if pad:  # pad to the compiled batch size, mask after
            xb = jnp.concatenate([xb, jnp.zeros((pad,) + xb.shape[1:], xb.dtype)])
            yb = jnp.concatenate([yb, jnp.zeros((pad,) + yb.shape[1:], yb.dtype)])
        if mesh is not None:
            xb, yb = shard_eval_batch(mesh, xb, yb)
        ld, mean = batch_eval(params, xb, yb, jax.random.fold_in(key, start))
        # keep results on device: dispatch stays async (batches pipeline)
        # and the single device_get below overlaps all the host copies —
        # a per-batch np.asarray here costs one ~30 ms tunnel round trip
        # EACH and serializes the whole eval loop. Labels stay host-side
        # (the caller's Y_test already holds them).
        outs.append((pad, ld, mean))

    fetched = jax.device_get([(ld, mean) for _, ld, mean in outs])
    lds = [ld[:bs - pad] for (pad, _, _), (ld, _) in zip(outs, fetched)]
    means = np.concatenate(
        [mean[:bs - pad] for (pad, _, _), (_, mean) in zip(outs, fetched)])
    ys = np.asarray(Y_test)                             # [n, d_y], host copy
    ld_norm = float(np.concatenate(lds).mean())
    if likelihood in ("multiclass", "softmax"):
        # means holds mixture class probabilities [n, C]; ys integer labels
        acc = float(np.mean(np.argmax(means, axis=-1) == ys[:, 0]))
        return {
            "test_loglik": ld_norm,
            "test_rmse": float("nan"),
            "test_loglik_normalized": ld_norm,
            "test_rmse_normalized": float("nan"),
            "test_accuracy": acc,
        }
    if likelihood == "switched_gaussian":
        # Y = [targets..., task_index]; model outputs are target-width.
        # Trains on unstandardized (or user-standardized) targets like the
        # other non-gaussian families — no un-normalization — and reports
        # per-task NLL alongside the pooled metrics (the multi-task quality
        # readout the Coregion+Switched idiom is for).
        tasks = np.round(ys[:, -1]).astype(int)
        errs_t = means - ys[:, :-1]
        ld_all = np.concatenate(lds)
        out = {
            "test_loglik": ld_norm,
            "test_rmse": float(np.sqrt(np.mean(np.sum(errs_t ** 2, -1)))),
            "test_loglik_normalized": ld_norm,
            "test_rmse_normalized": float(
                np.sqrt(np.mean(np.sum(errs_t ** 2, -1)))),
        }
        for t in np.unique(tasks):
            out[f"test_loglik_task_{t}"] = float(ld_all[tasks == t].mean())
        return out
    errs = means - ys                                   # in model units
    rmse_norm = float(np.sqrt(np.mean(np.sum(errs ** 2, -1))))
    if likelihood not in ("gaussian", "student_t"):
        # the remaining families train on UN-standardized labels (counts,
        # positives, {0,1}, [0,1]) — model units ARE original units
        out = {
            "test_loglik": ld_norm,
            "test_rmse": rmse_norm,
            "test_loglik_normalized": ld_norm,
            "test_rmse_normalized": rmse_norm,
        }
        if likelihood == "bernoulli":
            # means = mixture p(y=1): |p - y| < 0.5 <=> correct prediction
            out["test_accuracy"] = float(
                np.mean(np.all(np.abs(errs) < 0.5, axis=-1)))
        elif likelihood == "ordinal":
            # means = label-distribution mean; nearest integer label is the
            # point prediction (labels are ordered, so rounding is natural)
            out["test_accuracy"] = float(
                np.mean(np.round(means[:, 0]) == ys[:, 0]))
        return out
    # gaussian AND student_t train on standardized labels (both are
    # identity-link location-scale families fed by get_regression_data), so
    # both un-normalize: rmse scales by y_std, loglik shifts by -sum log y_std
    y_std = np.asarray(y_std).reshape(1, -1)
    rmse_orig = float(np.sqrt(np.mean(np.sum((errs * y_std) ** 2, -1))))
    log_sigma = float(np.sum(np.log(y_std)))            # per-dim sum
    return {
        "test_loglik": ld_norm - log_sigma,
        "test_rmse": rmse_orig,
        "test_loglik_normalized": ld_norm,
        "test_rmse_normalized": rmse_norm,
    }
