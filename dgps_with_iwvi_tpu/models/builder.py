"""Model builder: configuration-string DSL -> (DGPConfig, params).

TPU-native rebuild of ref:experiments/models.py build_model (SURVEY.md §2.5):
- configuration tokens: 'G' = GP layer, 'L' = latent-variable layer
  (paper models: 'G', 'GG', 'LG', 'LGG', 'LGGG');
- inducing inputs Z initialized by k-means on the (normalized) training
  inputs (scipy kmeans2 in the reference; a pure-JAX Lloyd's iteration here
  so the builder works on-device and under jit if needed);
- inner-layer width min(d_x, inner_dim_cap) per the Salimbeni-2017
  convention; final layer Gaussian likelihood with trainable noise.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .dgp import DGPConfig, init_dgp
from .layers import GPLayerConfig, LVLayerConfig


@dataclasses.dataclass(frozen=True)
class BuildArgs:
    """Mirrors the reference harness's ARGS surface (SURVEY.md §2.5)."""

    configuration: str = "G"
    mode: str = "VI"            # 'VI' | 'IW'
    num_inducing: int = 128     # M
    num_iw_samples: int = 5     # K
    num_samples: int = 1        # S
    d_w: int = 1                # latent dim per LV layer
    inner_dim_cap: int = 30     # inner GP width = min(d_x, cap)
    encoder_hidden: tuple = (20, 20)
    encoder_init_logvar: float = -4.6
    noise_variance_init: float = 0.05
    jitter: float = 1e-6
    use_pallas: bool | str = "auto"
    # leaf kinds rbf | matern12/32/52 | rq | cosine | arccosine[0|2] |
    # linear | polynomial | periodic | white | constant | coregion<C>x<R>,
    # composable with '+'/'*' ("rbf+linear", "rbf*periodic"), each leaf
    # optionally sliced to active dims ("rbf[0:3]*periodic[3]"; ICM
    # multi-task: "rbf[0:3]*coregion4x1[3]") — ops/kernels.py parse_kind
    kernel_kind: str = "rbf"
    amortized: bool = True      # False: per-datapoint q(w) params (small N)
    # observation model (ops/likelihoods.py LIKELIHOOD_KINDS): gaussian,
    # bernoulli (probit), student_t, poisson, exponential, gamma, beta,
    # multiclass (robust-max) / softmax (QMC link) — Y holds integer labels
    # in one column and the final GP layer gets num_classes outputs —
    # ordinal (probit bins; Y holds integer labels, final layer keeps ONE
    # output)
    likelihood: str = "gaussian"
    # multiclass/ordinal only: number of classes C (multiclass: final-layer
    # width; ordinal: C-1 probit bin edges). Default matches the CLI's
    # --num_classes default (3) so a library user who sets the likelihood
    # without num_classes gets the same model the CLI would build on the
    # 3-class synthetic surrogate.
    num_classes: int = 3
    # switched_gaussian only: number of tasks T (one trainable noise
    # variance per task; Y's LAST column holds the integer task index).
    # 0 = infer T from the kernel's coregion token ('coregion<C>x<R>'),
    # the usual ICM pairing.
    num_tasks: int = 0
    jitter_tries: int = 4
    # GP-layer mean function: 'auto' (reference convention — Zero on the
    # final layer, fixed identity/truncated-identity skip between inner
    # layers), or force 'zero' | 'skip' | 'constant' (trainable bias) |
    # 'linear' (trainable Linear(A, b)) on every GP layer
    # (gpflow:gpflow/mean_functions.py)
    mean_function: str = "auto"
    white: bool = True          # whitened parameterization (reference default)
    q_diag: bool = False        # diagonal q(u) covariance; works with both
                                # Adam and the elementwise natgrad family
    # hyperparameter priors: tuple of (path_suffix, kind, a, b) specs
    # (see ops/priors.py); () = off, matching the reference defaults
    priors: tuple = ()
    # inducing-feature family on every GP layer (ops/features.py):
    # 'points' (reference behavior) | 'multiscale' (trainable Gaussian
    # windows, RBF kernel only)
    feature: str = "points"
    feature_init_scale: float = 0.1
    # q-variance matmul MXU precision (see DGPConfig.var_precision)
    var_precision: str = "default"
    # conditional solve-path matmul precision (see DGPConfig.solve_precision)
    solve_precision: str = "high"


# friendly prior-target names -> parameter-path suffixes (ops/priors.py)
PRIOR_TARGETS = {
    "kernel_variance": "kernel/raw_variance",
    "lengthscales": "kernel/raw_lengthscales",
    "noise_variance": "raw_noise_variance",
}


def parse_prior_flag(spec: str) -> tuple:
    """'kernel_variance=gamma(2,3)' -> ('kernel/raw_variance','gamma',2.,3.)"""
    target, _, dist = spec.partition("=")
    kind, _, args = dist.partition("(")
    a, b = (float(v) for v in args.rstrip(")").split(","))
    suffix = PRIOR_TARGETS.get(target.strip(), target.strip())
    return (suffix, kind.strip(), a, b)


def save_build_args(ckpt_dir: str, args: BuildArgs, **train_meta) -> str:
    """Persist the FULL BuildArgs next to the checkpoints so a scorer
    (experiments/serve.py) can rebuild the exact model structure — including
    flags like q_diag / white / amortized / precision knobs that would
    otherwise cause structure-mismatch restore failures or silently
    different predict precision if reconstructed from a reduced flag set.

    Extra keyword args (e.g. natgrad='final', which fixes the TrainState
    LAYOUT a restore template must match) are stored under '_train'."""
    import json
    import os

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "build_args.json")
    d = dataclasses.asdict(args)
    if train_meta:
        d["_train"] = train_meta
    with open(path, "w") as f:
        json.dump(d, f, indent=1)
    return path


def load_build_args(ckpt_dir: str, with_meta: bool = False):
    """Inverse of save_build_args; None when no build_args.json exists
    (older checkpoints — callers fall back to their own flags).
    with_meta=True returns (BuildArgs, train_meta_dict) instead."""
    import json
    import os

    path = os.path.join(ckpt_dir, "build_args.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    meta = d.pop("_train", {})
    # JSON round-trips tuples as lists; restore the hashable/static forms
    d["encoder_hidden"] = tuple(d["encoder_hidden"])
    d["priors"] = tuple(tuple(p) for p in d["priors"])
    build = BuildArgs(**d)
    return (build, meta) if with_meta else build


def kmeans_centers(X: jax.Array, k: int, iters: int = 20,
                   key: jax.Array | None = None) -> jax.Array:
    """Lloyd's k-means on X:[N, D] -> [k, D] centres (Z init).

    Deterministic given the key; empty clusters keep their previous centre.
    If N <= k, pads with jittered resamples of X.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    N = X.shape[0]
    if N <= k:
        reps = -(-k // N)
        Xp = jnp.tile(X, (reps, 1))[:k]
        return Xp + 1e-3 * jax.random.normal(key, Xp.shape, X.dtype)
    idx = jax.random.choice(key, N, (k,), replace=False)
    centers = X[idx]

    def step(centers, _):
        d2 = (jnp.sum(X * X, 1)[:, None] - 2.0 * X @ centers.T
              + jnp.sum(centers * centers, 1)[None, :])
        assign = jnp.argmin(d2, axis=1)                      # [N]
        one_hot = jax.nn.one_hot(assign, k, dtype=X.dtype)   # [N, k]
        counts = one_hot.sum(0)                              # [k]
        sums = one_hot.T @ X                                 # [k, D]
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def _infer_num_tasks(kernel_kind: str) -> int:
    """T from the first coregion leaf of the kind string ('coregion<C>x<R>'
    -> C); used when BuildArgs.num_tasks is 0 — the ICM pairing where the
    kernel's task count IS the likelihood's."""
    import re

    m = re.search(r"coregion(\d+)x\d+", kernel_kind)
    assert m, ("switched_gaussian with num_tasks=0 needs a coregion leaf in "
               f"kernel_kind to infer the task count (got {kernel_kind!r}); "
               "set BuildArgs.num_tasks explicitly otherwise")
    return int(m.group(1))


def build_config(args: BuildArgs, d_x: int, d_y: int, num_data: int) -> DGPConfig:
    """Parse the configuration string into a static DGPConfig."""
    tokens = args.configuration.upper()
    assert tokens and set(tokens) <= {"G", "L"}, f"bad configuration {tokens!r}"
    assert tokens.endswith("G"), "configuration must end with a GP layer"
    # the final GP layer's width: d_y outputs, except multiclass where it is
    # one output per class (the encoder's Y input stays the raw label column)
    d_out_final = d_y
    if args.likelihood in ("multiclass", "softmax"):
        assert d_y == 1, "multiclass expects integer labels in one Y column"
        d_out_final = args.num_classes
    elif args.likelihood == "ordinal":
        assert d_y == 1, "ordinal expects integer labels in one Y column"
    elif args.likelihood == "switched_gaussian":
        assert d_y >= 2, ("switched_gaussian expects Y = [targets..., "
                          "task_index] — at least 2 columns")
        d_out_final = d_y - 1
    inner_dim = min(d_x, args.inner_dim_cap)
    layer_cfgs: list = []
    width = d_x
    n_gp = tokens.count("G")
    gp_seen = 0
    for t in tokens:
        if t == "L":
            layer_cfgs.append(LVLayerConfig(
                d_w=args.d_w, d_in=width, d_y=d_y, d_x=d_x,
                encoder_hidden=tuple(args.encoder_hidden),
                encoder_init_logvar=args.encoder_init_logvar,
                amortized=args.amortized,
                num_data=0 if args.amortized else num_data))
            width += args.d_w
        else:
            gp_seen += 1
            final = gp_seen == n_gp
            d_out = d_out_final if final else inner_dim
            layer_cfgs.append(GPLayerConfig(
                d_in=width, d_out=d_out, num_inducing=args.num_inducing,
                kernel_kind=args.kernel_kind, final=final, white=args.white,
                q_diag=args.q_diag, mean_function=args.mean_function,
                feature=args.feature,
                feature_init_scale=args.feature_init_scale))
            width = d_out
    return DGPConfig(
        layers=tuple(layer_cfgs),
        num_data=num_data,
        objective="iw" if args.mode.upper() in ("IW", "IWAE") else "vi",
        num_samples=args.num_samples,
        num_iw_samples=args.num_iw_samples,
        jitter=args.jitter,
        use_pallas=args.use_pallas,
        likelihood=args.likelihood,
        jitter_tries=args.jitter_tries,
        priors=tuple(args.priors),
        var_precision=args.var_precision,
        solve_precision=args.solve_precision,
    )


def build_model(key: jax.Array, args: BuildArgs, X: jax.Array, Y: jax.Array):
    """(config, params) for a standardized dataset (X, Y).

    Z for the first GP layer comes from k-means on X (padded with zeros for
    any LV dims concatenated before it); deeper layers inherit the first
    layer's centres passed through the width convention (k-means in feature
    space is meaningless before training, so the standard practice of
    reusing/padding input-space centres applies).
    """
    d_x, d_y = X.shape[1], Y.shape[1]
    config = build_config(args, d_x, d_y, num_data=X.shape[0])
    kkm, kinit = jax.random.split(key)
    # Z init is one-time host-side work: prefer the native C++ kmeans++
    # (no XLA compile — the on-device Lloyd scan costs minutes of compile
    # through the remote-compile tunnel); fall back to the JAX version.
    Zx = None
    if X.shape[0] > args.num_inducing:
        try:
            import numpy as _np

            from ..data import native_loader

            if native_loader.native_available():
                seed = int(jax.random.randint(kkm, (), 0, 2**31 - 1))
                Zx = jnp.asarray(native_loader.kmeans(
                    _np.asarray(X), args.num_inducing, seed=seed), X.dtype)
        except Exception:
            Zx = None
    if Zx is None:
        Zx = kmeans_centers(X, args.num_inducing, key=kkm)  # [M, d_x]

    Z_inits = []
    for cfg in config.layers:
        if isinstance(cfg, GPLayerConfig):
            d_in = cfg.d_in
            if d_in == d_x:
                Z = Zx
            elif d_in > d_x:
                pad = jnp.zeros((args.num_inducing, d_in - d_x), Zx.dtype)
                Z = jnp.concatenate([Zx, pad], axis=1)
            else:
                Z = Zx[:, :d_in]
            Z_inits.append(Z)
    lk_kwargs = ({"num_classes": args.num_classes}
                 if args.likelihood == "ordinal" else None)
    if args.likelihood == "switched_gaussian":
        T = args.num_tasks or _infer_num_tasks(args.kernel_kind)
        lk_kwargs = {"num_tasks": T}
    params = init_dgp(
        kinit, config, Z_inits=Z_inits,
        noise_variance=args.noise_variance_init, dtype=X.dtype,
        likelihood_kwargs=lk_kwargs)
    return config, params
