"""Self-contained serving artifacts via jax.export (StableHLO).

Freezes a trained DGP scorer — parameters, model structure, the S-sample
mixture predictive, and (optionally) the train-split normalization
statistics — into ONE portable StableHLO artifact. The artifact can be
loaded and executed WITHOUT the model-building code, the checkpoint
directory, or the flags that produced it: deployment needs only jax and
this module's thin batching wrapper. Multi-platform lowering
(``platforms=("tpu", "cpu")``) makes a single artifact executable on both
the training fleet and CPU fallback hosts.

This is the TPU-native analog of exporting a frozen TF1 inference graph —
the capability the reference stack gets from TF SavedModel/Saver
(gpflow:gpflow/training/monitor.py checkpoints + session reuse), redesigned
around jax.export's StableHLO serialization instead of a session graph.

Artifact layout: a single ``.npz`` holding the serialized StableHLO bytes
and a JSON meta record (batch size, sample count, dims, units). The scorer
signature inside the artifact is fixed::

    score(X[B, d_in], Y[B, d_out], seed: int32) -> (mean, var, log_density)

with RAW-unit inputs/outputs when normalization stats were baked in
(otherwise everything is in the caller's units). Y is only consumed by the
log-density output; pass zeros when targets are unknown.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

_FORMAT_VERSION = 1


@dataclasses.dataclass(frozen=True)
class NormalizationStats:
    """Train-split standardization statistics (bb conventions: X and Y are
    standardized by train mean/std; test log-lik reported in original y
    units by subtracting sum(log y_std) — evaluation/metrics.py:110)."""

    x_mean: np.ndarray  # [1, d_in] (any broadcastable shape)
    x_std: np.ndarray
    y_mean: np.ndarray  # [1, d_out]
    y_std: np.ndarray

    @classmethod
    def from_dataset(cls, data) -> "NormalizationStats":
        """From a data.datasets Dataset (X_mean/X_std/Y_mean/Y_std)."""
        return cls(
            x_mean=np.asarray(data.X_mean, np.float32).reshape(1, -1),
            x_std=np.asarray(data.X_std, np.float32).reshape(1, -1),
            y_mean=np.asarray(data.Y_mean, np.float32).reshape(1, -1),
            y_std=np.asarray(data.Y_std, np.float32).reshape(1, -1),
        )


def make_scorer_fn(params, config, num_samples: int,
                   stats: NormalizationStats | None = None):
    """Close the one-propagate serving pair over (params, config).

    Returns ``score(xb, yb, seed) -> (mean, var, log_density)``. With
    ``stats``, inputs are RAW units and outputs are mapped back to raw
    units (mean * y_std + y_mean, var * y_std^2, ld - sum(log y_std)) —
    the same un-normalization as evaluation/metrics.py.

    The PRNG key derives from the int32 ``seed`` argument inside the traced
    function (threefry is platform-invariant), so the artifact needs no key
    plumbing: the caller varies the seed per batch.

    Raw-unit caveat: the artifact's inputs are float32, so a raw feature
    whose magnitude is huge relative to its spread (|mean|/std >~ 1e5,
    e.g. unix-timestamp columns) quantizes BEFORE the baked (x-mean)/std —
    the checkpoint path standardizes on the host in float64 first. For such
    data export with ``stats=None`` and feed pre-standardized inputs.
    """
    from .models import predict_y_and_log_density

    if stats is not None:
        x_mean = jnp.asarray(stats.x_mean, jnp.float32)
        x_std = jnp.asarray(stats.x_std, jnp.float32)
        y_mean = jnp.asarray(stats.y_mean, jnp.float32)
        y_std = jnp.asarray(stats.y_std, jnp.float32)
        log_sigma = float(np.sum(np.log(np.asarray(stats.y_std, np.float64))))

    def score(xb, yb, seed):
        if stats is not None:
            xb = (xb - x_mean) / x_std
            yb = (yb - y_mean) / y_std
        key = jax.random.PRNGKey(seed)
        (m, v), ld = predict_y_and_log_density(
            params, config, xb, yb, key, num_samples)
        if stats is not None:
            m = m * y_std + y_mean
            v = v * jnp.square(y_std)
            ld = ld - log_sigma
        return m, v, ld

    return score


def export_scorer(params, config, *, batch_size: int | str, d_in: int,
                  d_out: int, num_samples: int,
                  stats: NormalizationStats | None = None,
                  platforms: tuple[str, ...] | None = None):
    """Lower + serialize the scorer. Returns a jax.export.Exported.

    ``platforms=None`` lowers for the current default backend only;
    pass e.g. ``("tpu", "cpu")`` for a portable artifact (one set of
    StableHLO per platform in the same blob).

    ``batch_size`` may be an int (fixed-batch artifact; short tails pad to
    the full batch) or the string ``"b"`` — a SYMBOLIC batch dimension
    (jax.export shape polymorphism): one artifact then scores any n >= 1
    with no padding waste and no re-export; the loader refines the
    StableHLO per concrete batch size at call time (one compile per
    distinct size, cached by jit).
    """
    fn = make_scorer_fn(params, config, num_samples, stats)
    if isinstance(batch_size, str):
        (batch_size,) = jax_export.symbolic_shape(batch_size)
    sds = (jax.ShapeDtypeStruct((batch_size, d_in), jnp.float32),
           jax.ShapeDtypeStruct((batch_size, d_out), jnp.float32),
           jax.ShapeDtypeStruct((), jnp.int32))
    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    # Artifacts contain ONLY stock StableHLO ops — no Mosaic custom calls:
    # (a) a baked TPU kernel would make any cpu-including export unloadable
    # off-TPU, and (b) measured through ServingArtifact.score's host loop
    # the fused q-variance kernel is neutral-to-slightly-negative anyway
    # (459k vs 483k points/s at B=8192 — the artifact path is bound by
    # per-batch input upload, not device compute). The LIVE serving path
    # (serve.py without --from_export, evaluate()) keeps the kernel, where
    # it measures 1.46x (docs/PERF.md).
    from .ops.conditionals import qvar_pallas_disabled
    with qvar_pallas_disabled():
        return jax_export.export(jax.jit(fn), **kw)(*sds)


def save_scorer(path: str, exported, *, num_samples: int,
                has_stats: bool, extra_meta: dict | None = None) -> dict:
    """One .npz file: StableHLO bytes + JSON meta. Returns the meta dict."""
    (x_aval, y_aval, _) = exported.in_avals
    poly = not isinstance(x_aval.shape[0], int)
    meta = {
        "format_version": _FORMAT_VERSION,
        # polymorphic artifacts record batch_size=0 ("any")
        "batch_size": 0 if poly else int(x_aval.shape[0]),
        "polymorphic_batch": poly,
        "d_in": int(x_aval.shape[1]),
        "d_out": int(y_aval.shape[1]),
        "num_samples": int(num_samples),
        "raw_units": bool(has_stats),
        "platforms": list(exported.platforms),
        **(extra_meta or {}),
    }
    blob = exported.serialize()
    # write through a file object so the artifact lands EXACTLY at `path`
    # (np.savez given a string silently appends '.npz', which would break
    # a later load_scorer on the printed path)
    with open(path, "wb") as f:
        np.savez(f,
                 stablehlo=np.frombuffer(blob, np.uint8),
                 meta=np.frombuffer(json.dumps(meta).encode("utf-8"),
                                    np.uint8))
    return meta


def load_scorer(path: str) -> "ServingArtifact":
    z = np.load(path)
    meta = json.loads(bytes(z["meta"].tobytes()).decode("utf-8"))
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"unknown serving-artifact version in {path}: "
                         f"{meta.get('format_version')}")
    exported = jax_export.deserialize(bytearray(z["stablehlo"].tobytes()))
    return ServingArtifact(exported, meta)


class ServingArtifact:
    """A loaded scorer: fixed-batch exported fn + padded pipelined scoring."""

    def __init__(self, exported, meta: dict):
        self.exported = exported
        self.meta = meta
        # jit the call so batches dispatch asynchronously and the loop can
        # keep --depth calls in flight (same pattern as experiments/serve.py)
        self._fn = jax.jit(exported.call)
        self._fns = {}  # per-(transport, transport_in)-dtype variants

    def _fn_for(self, transport: str, transport_in: str = "float32"):
        """The artifact call with the transport dtypes fused in (ONE
        dispatch: upcast inputs + call + cast results). Compiled once per
        dtype pair, cached."""
        key = (transport, transport_in)
        if key == ("float32", "float32"):
            return self._fn
        if key not in self._fns:
            dt = jnp.dtype(transport)
            call = self.exported.call
            self._fns[key] = jax.jit(
                lambda xb, yb, s: jax.tree.map(
                    lambda a: a.astype(dt),
                    call(xb.astype(jnp.float32), yb.astype(jnp.float32),
                         s)))
        return self._fns[key]

    def score(self, X, Y=None, *, seed: int = 0, depth: int = 8,
              max_batch: int = 8192, transport: str = "float32",
              transport_in: str = "float32") -> dict:
        """Score an arbitrary-length table.

        Fixed-batch artifacts run fixed-size padded batches (short tails
        pay full-batch compute). Polymorphic-batch artifacts
        (export_scorer(batch_size="b")) run ``max_batch``-row chunks plus
        one natural-size tail — no padding waste; each DISTINCT concrete
        batch size compiles once (cached by jit across calls).

        X: [n, d_in]; Y: [n, d_out] or None (log_density omitted). Units are
        raw when the artifact was exported with stats, else caller units.

        ``transport``: dtype the RESULTS cross the device->host link in
        ('float32' | 'bfloat16' | 'float16'). Compute inside the artifact
        is untouched — the cast happens on device after the scorer, so the
        only effect is rounding of the DELIVERED values (bf16: ~3 decimal
        digits, full f32 range; f16: ~3.3 digits, range +-65504 — mind raw
        y units) in exchange for half the D2H bytes; outputs are converted
        back to float32 on the host.

        ``transport_in``: dtype the INPUT table crosses the host->device
        link in ('float32' | 'bfloat16'). Inputs are upcast to float32 ON
        DEVICE before the scorer, so compute stays f32 — but unlike
        ``transport`` this rounds the inputs themselves (~3 decimal
        digits), which perturbs the computed predictions, not just their
        delivered encoding. Measured on the bench model (S=100 mixture):
        log-density shift far below the estimator's own seed noise
        (benchmarks/TRANSPORT_AB.md). Off by default; turn on when the
        link, not the chip, is the bound — the input side is 36 of the
        48 bytes/row of a full scoring round trip.
        """
        poly = self.meta.get("polymorphic_batch", False)
        bs = max_batch if poly else self.meta["batch_size"]
        d_out = self.meta["d_out"]
        X = np.asarray(X, np.float32)
        n = X.shape[0]
        if X.ndim != 2 or X.shape[1] != self.meta["d_in"]:
            raise ValueError(f"X must be [n, {self.meta['d_in']}], "
                             f"got {X.shape}")
        have_y = Y is not None
        Ys = (np.asarray(Y, np.float32) if have_y
              else np.zeros((n, d_out), np.float32))
        if Ys.shape != (n, d_out):
            raise ValueError(f"Y must be [{n}, {d_out}] to match X and the "
                             f"artifact's d_out, got {Ys.shape}")
        in_dt = jnp.dtype(transport_in)  # ml_dtypes: numpy can astype to it

        def _prep(start):
            xb, yb = X[start:start + bs], Ys[start:start + bs]
            pad = 0 if poly else bs - xb.shape[0]
            if pad:
                xb = np.concatenate([xb, np.zeros((pad, xb.shape[1]),
                                                  xb.dtype)])
                yb = np.concatenate([yb, np.zeros((pad, yb.shape[1]),
                                                  yb.dtype)])
            if in_dt != np.float32:  # narrow the H2D bytes (transport_in)
                xb, yb = xb.astype(in_dt), yb.astype(in_dt)
            # Stage the upload `depth` batches ahead of its dispatch so
            # H2D overlaps compute on hosts with real DMA engines. On the
            # axon dev tunnel this is measured NEUTRAL — the tunnel
            # serializes all transfers at ~13.5 MB/s + ~33 ms/transfer
            # (docs/PERF.md "Transfer envelope"), so end-to-end delivered
            # throughput there is transfer-bound (~270k pts/s at B=8192
            # S=100) whatever the loop does; a fetch-strategy A/B
            # (72-buffer device_get vs on-device concat to 3 buffers vs
            # copy_to_host_async) was within noise. The staged structure
            # is kept because it is the correct shape for production
            # serving hosts, where H2D/D2H run at GB/s and overlap.
            return pad, jax.device_put(xb), jax.device_put(yb)

        fn = self._fn_for(transport, transport_in)
        starts = list(range(0, n, bs))
        staged = [_prep(s) for s in starts[:depth]]
        outs = []
        for i in range(len(starts)):
            pad, xb_d, yb_d = staged[i]
            staged[i] = None  # free the reference once dispatched
            if i + depth < len(starts):
                staged.append(_prep(starts[i + depth]))
            outs.append((pad, fn(xb_d, yb_d, np.int32(seed + i))))
            if len(outs) >= depth:  # bound in-flight work
                jax.block_until_ready(outs[-depth][1][0])
        # fetch ALL results in one device_get: per-array np.asarray costs a
        # sequential host<->device round trip each (~30 ms on a tunneled
        # client — measured 6x throughput loss at B=8192); device_get
        # overlaps the copies
        fetched = jax.device_get([o for _, o in outs])
        means, variances, lds = [], [], []
        for (pad, _), (m, v, ld) in zip(outs, fetched):
            take = bs - pad
            # hosts speak float32: narrow transport dtypes convert here
            means.append(np.asarray(m[:take], np.float32))
            variances.append(np.asarray(v[:take], np.float32))
            lds.append(np.asarray(ld[:take], np.float32))
        out = {"mean": np.concatenate(means),
               "var": np.concatenate(variances)}
        if have_y:
            out["log_density"] = np.concatenate(lds)
        return out
