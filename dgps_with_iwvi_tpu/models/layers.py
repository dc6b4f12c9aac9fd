"""DGP layer stack: sparse-variational GP layers and latent-variable layers.

TPU-native rebuild of ref:dgps_with_iwvi/layers.py (Layer / GPLayer /
LatentVariableLayer / LatentVarMode — SURVEY.md §2.1), redesigned as static
dataclass configs + pure param pytrees + pure propagate functions so the
whole layer stack traces into one XLA program:

- No Parameterized object graph; a layer is (config, params).
- Arbitrary leading sample axes (the S MC samples and K importance samples)
  broadcast through every layer as batch dims of MXU matmuls.
- chol(Kuu) is computed once per GP layer per step and shared between the
  conditional and the KL.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import conditionals, kernels, kl, linalg, mean_functions
from . import encoders


class LatentVarMode:
    """Where latent-variable layers get w from (SURVEY.md §2.1).

    POSTERIOR: amortized q(w | x, y) — training.
    PRIOR:     w ~ N(0, I) — prediction.
    GIVEN:     externally fixed w — latent traversals / plotting.
    """

    POSTERIOR = "posterior"
    PRIOR = "prior"
    GIVEN = "given"


@dataclasses.dataclass(frozen=True)
class GPLayerConfig:
    d_in: int
    d_out: int
    num_inducing: int
    kernel_kind: str = "rbf"
    # 'skip' (identity / fixed linear), 'zero', or 'auto' — the reference
    # convention (Salimbeni-2017, ref:dgps_with_iwvi/layers.py): skip
    # connections between INNER layers, Zero mean on the FINAL layer. 'auto'
    # resolves to that; pass 'skip'/'zero' to override per layer. (Round-3
    # fix: built models previously gave the final layer a fixed skip
    # projection of the last hidden features, off-spec — it let the final
    # GP go dead under the IW objective, see benchmarks/IW_VS_VI.md.)
    # The dependency layer's TRAINABLE mean functions
    # (gpflow:gpflow/mean_functions.py Constant / Linear(A, b)) are also
    # available: 'constant' (trainable bias) and 'linear' (trainable
    # identity-initialized W plus bias), both optimized by Adam alongside
    # the hyperparameters.
    mean_function: str = "auto"
    final: bool = False  # final layers return (mean, var) instead of samples
    white: bool = True   # whitened q(v), u = Lm v (reference default)
    q_diag: bool = False  # diagonal q covariance (gpflow SVGP q_diag=True);
                          # cheaper family; natgrad supported via the
                          # elementwise variance-form family
                          # (training/natgrad.py, tests/test_qdiag.py)
    # inducing-feature family (ops/features.py, gpflow:gpflow/features.py):
    # 'points' (plain inducing points — the reference's only feature) or
    # 'multiscale' (Gaussian-window inter-domain features; RBF only; adds
    # trainable per-point-per-dim raw_Z_scales, optimized by Adam).
    feature: str = "points"
    feature_init_scale: float = 0.1  # multiscale window init (0 -> points)


@dataclasses.dataclass(frozen=True)
class LVLayerConfig:
    d_w: int
    d_in: int  # width of the propagated features entering this layer
    d_y: int   # observation dim fed to the amortized encoder
    # the amortized encoder is fed s = concat[x, y] with the ORIGINAL inputs
    # (SURVEY.md §2.1), so its input width is d_x + d_y, not d_in + d_y.
    # d_x <= 0 means "same as d_in" (an LV layer placed before any GP layer).
    d_x: int = -1
    encoder_hidden: tuple = (20, 20)
    encoder_init_logvar: float = -4.6
    # amortized=False: per-datapoint (mu_n, log sigma_n^2) variational
    # parameters instead of a recognition network — the reference's
    # small-N variant (SURVEY.md §2.1). Requires num_data and minibatch
    # data indices at propagate time.
    amortized: bool = True
    num_data: int = 0


LayerConfig = GPLayerConfig | LVLayerConfig


def gp_layer_init(
    key: jax.Array,
    cfg: GPLayerConfig,
    Z: jax.Array | None = None,
    lengthscales=1.0,
    kernel_variance: float = 1.0,
    q_sqrt_scale: float = 1.0,
    dtype=jnp.float32,
):
    """Parameter pytree for one whitened SVGP layer.

    Defaults mirror the reference stack: q_mu = 0, q_sqrt = I (times an
    optional scale — inner DGP layers commonly start at 1e-5-ish to keep
    early layers near-deterministic), ARD lengthscales, unit variance.
    Z defaults to standard-normal; the experiment builder overrides it with
    k-means centres (SURVEY.md §2.5).
    """
    kz, kq = jax.random.split(key)
    if Z is None:
        Z = jax.random.normal(kz, (cfg.num_inducing, cfg.d_in), dtype)
    if cfg.q_diag:
        q_sqrt0 = jnp.full((cfg.num_inducing, cfg.d_out),
                           q_sqrt_scale, dtype)
    else:
        q_sqrt0 = jnp.broadcast_to(
            q_sqrt_scale * jnp.eye(cfg.num_inducing, dtype=dtype),
            (cfg.d_out, cfg.num_inducing, cfg.num_inducing)).copy()
    params = {
        "kernel": kernels.kernel_params(
            cfg.kernel_kind, cfg.d_in, variance=kernel_variance,
            lengthscales=lengthscales, dtype=dtype),
        "Z": jnp.asarray(Z, dtype),
        "q_mu": jnp.zeros((cfg.num_inducing, cfg.d_out), dtype),
        "q_sqrt": q_sqrt0,
    }
    if cfg.feature == "multiscale":
        from ..ops import features as _features

        assert cfg.kernel_kind == "rbf", \
            "multiscale inducing features are defined for the RBF kernel only"
        params["raw_Z_scales"] = _features.multiscale_scales_init(
            cfg.num_inducing, cfg.d_in, cfg.feature_init_scale, dtype)
    else:
        assert cfg.feature == "points", cfg.feature
    mf = resolved_mean_function(cfg)
    assert mf in ("zero", "skip", "linear", "constant"), mf
    if mf == "skip":
        W = mean_functions.skip_projection(cfg.d_in, cfg.d_out, dtype)
        if W is not None:
            params["mean_W"] = W  # fixed; stop_gradient applied in propagate
    elif mf == "linear":  # trainable Linear(A, b), identity-initialized
        params["mean_W"] = jnp.eye(cfg.d_in, cfg.d_out, dtype=dtype)
        params["mean_b"] = jnp.zeros((cfg.d_out,), dtype)
    elif mf == "constant":  # trainable Constant(b)
        params["mean_b"] = jnp.zeros((cfg.d_out,), dtype)
    return params


def lv_layer_init(key: jax.Array, cfg: LVLayerConfig, dtype=jnp.float32):
    if not cfg.amortized:
        assert cfg.num_data > 0, "non-amortized LV layer needs num_data"
        return {
            "q_mu_w": jnp.zeros((cfg.num_data, cfg.d_w), dtype),
            "q_logvar_w": jnp.full((cfg.num_data, cfg.d_w),
                                   cfg.encoder_init_logvar, dtype),
        }
    d_x = cfg.d_x if cfg.d_x > 0 else cfg.d_in
    return {
        "encoder": encoders.encoder_init(
            key, d_x + cfg.d_y, cfg.d_w, cfg.encoder_hidden,
            cfg.encoder_init_logvar, dtype),
    }


def resolved_mean_function(cfg: GPLayerConfig) -> str:
    """'auto' -> the reference convention (Salimbeni-2017 skips): 'zero'
    on the final layer, 'skip' between inner layers."""
    if cfg.mean_function == "auto":
        return "zero" if cfg.final else "skip"
    return cfg.mean_function


def gp_layer_propagate(
    params,
    cfg: GPLayerConfig,
    F: jax.Array,          # [..., B, d_in]
    key: jax.Array | None,
    *,
    jitter: float = linalg.DEFAULT_JITTER,
    use_pallas: bool | str = "auto",
    jitter_tries: int = 4,
    var_precision: str | None = None,
    solve_precision: str | None = None,
    Lm: jax.Array | None = None,
    Linv: jax.Array | None = None,
):
    """One whitened-SVGP layer step.

    Pass precomputed (Lm, Linv) from dgp.prefactor_gp_layers to share ONE
    batched Kuu factorization across the whole layer stack.

    Non-final: returns a reparameterized marginal sample [..., B, d_out]
    (plus the conditional moments). Final: returns (mean, var) for the
    analytic/collapsed Gaussian data term — no sample drawn, matching the
    reference objective (SURVEY.md §3.2).
    """
    # natgrad covariance form: the merged params carry q(u)'s covariance —
    # full S [D, M, M] under 'q_cov' (plus carried logdet/inverse) or
    # diagonal variances [M, D] under 'q_cov_diag' — instead of a root; no
    # factorization of S anywhere in the training step (training/natgrad.py).
    q_cov = params.get("q_cov")
    if q_cov is None and "q_cov_diag" in params:
        q_cov = params["q_cov_diag"]
    if q_cov is not None:
        q_sqrt = None
    else:
        q_sqrt = (params["q_sqrt"] if cfg.q_diag
                  else jnp.tril(params["q_sqrt"]))
    if use_pallas == "auto":
        use_pallas = False  # measured: XLA >= pallas at every shape (docs/PALLAS_SWEEP.md)
    feat_scales = params.get("raw_Z_scales")  # multiscale features
    if feat_scales is not None:
        use_pallas = False  # Pallas kernels assume plain-points grams
    # inference-only fully-fused conditional (prediction traces; see
    # ops/conditionals.py SERVE_PALLAS): nothing [M, cols]-sized hits HBM
    serve_fused = (not cfg.q_diag and q_cov is None and feat_scales is None
                   and conditionals._serve_fused_applicable(
                       F, params["Z"], q_sqrt, q_cov, cfg.kernel_kind,
                       cfg.white, var_precision, solve_precision))
    fused_sample = serve_fused and not cfg.final
    if serve_fused:
        raw_sample, out = conditionals.infer_conditional_fused(
            key, F, params["Z"], params["kernel"], params["q_mu"], q_sqrt,
            sample=not cfg.final, jitter=jitter, jitter_tries=jitter_tries,
            Lm=Lm, Linv=Linv)
    elif (use_pallas and not cfg.final and cfg.white
          and not cfg.q_diag and q_cov is None):
        fused_sample = True
        # gram -> conditional -> reparameterized sample in one Pallas kernel
        raw_sample, out = conditionals.sample_conditional_fused(
            key, F, params["Z"], params["kernel"], params["q_mu"], q_sqrt,
            kernel_kind=cfg.kernel_kind, jitter=jitter,
            jitter_tries=jitter_tries, Lm=Lm)
    else:
        out = conditionals.conditional(
            F, params["Z"], params["kernel"], params["q_mu"], q_sqrt,
            kernel_kind=cfg.kernel_kind, jitter=jitter, use_pallas=use_pallas,
            jitter_tries=jitter_tries, white=cfg.white,
            var_precision=var_precision, solve_precision=solve_precision,
            Lm=Lm, Linv=Linv, q_S=q_cov, feature_raw_scales=feat_scales)
    mf_kind = resolved_mean_function(cfg)
    if mf_kind == "skip":
        W = params.get("mean_W")
        if W is not None:
            W = jax.lax.stop_gradient(W)
        mf = mean_functions.apply_mean_function(F, W)
        mean = out.mean + mf
    elif mf_kind == "linear":  # trainable: no stop_gradient
        mf = mean_functions.linear_mean(F, params["mean_W"]) \
            + params["mean_b"]
        mean = out.mean + mf
    elif mf_kind == "constant":
        mf = params["mean_b"]
        mean = out.mean + mf
    else:
        mf = 0.0
        mean = out.mean
    if cfg.final:
        return None, (mean, out.var)
    if fused_sample:
        sample = raw_sample + mf
    else:
        eps = jax.random.normal(key, mean.shape, mean.dtype)
        sample = mean + conditionals.safe_sqrt(out.var) * eps
    return sample, (mean, out.var)


def layer_Kuu(params, cfg: GPLayerConfig) -> jax.Array:
    """[M, M] prior covariance of this layer's inducing variables —
    feature-aware (plain gram for 'points', window-integral covariance for
    'multiscale'). The single place Kuu is defined for a layer; the KL and
    dgp.prefactor_gp_layers both go through it."""
    scales = params.get("raw_Z_scales")
    if scales is not None:
        from ..ops import features as _features

        return _features.multiscale_Kuu(params["kernel"], params["Z"], scales)
    return kernels.K(params["kernel"], params["Z"], params["Z"],
                     kind=cfg.kernel_kind)


def gp_layer_kl(params, cfg: GPLayerConfig,
                jitter: float = linalg.DEFAULT_JITTER,
                jitter_tries: int = 4,
                Lm: jax.Array | None = None) -> jax.Array:
    """Global KL(q(u) || p(u)) for one GP layer.

    Pass the prefactored Lm (dgp.prefactor_gp_layers) for non-whitened
    layers so the step's single batched Kuu factorization is shared with
    the conditional; whitened KLs never need Kuu."""
    if cfg.q_diag:
        assert cfg.white, "q_diag layers are whitened-only"
        if "q_cov_diag" in params:  # diagonal natgrad variance form
            return kl.gauss_kl_white_diagvar(params["q_mu"],
                                             params["q_cov_diag"])
        return kl.gauss_kl_white_diag(params["q_mu"], params["q_sqrt"])
    q_cov = params.get("q_cov")
    if cfg.white:
        if q_cov is not None:
            return kl.gauss_kl_white_cov(
                params["q_mu"], q_cov, params["q_cov_logdet"],
                params["q_cov_Sinv"])
        return kl.gauss_kl_white(params["q_mu"], jnp.tril(params["q_sqrt"]))
    if Lm is None:
        Kuu = layer_Kuu(params, cfg)
        Lm = linalg.cholesky_with_jitter(Kuu, jitter, max_tries=jitter_tries)
    if q_cov is not None:
        return kl.gauss_kl_cov(params["q_mu"], q_cov,
                               params["q_cov_logdet"],
                               params["q_cov_Sinv"], Lm)
    return kl.gauss_kl(params["q_mu"], jnp.tril(params["q_sqrt"]), Lm)


def lv_layer_propagate(
    params,
    cfg: LVLayerConfig,
    F: jax.Array,              # [..., B, d_in]
    key: jax.Array | None,
    *,
    mode: str = LatentVarMode.POSTERIOR,
    X0: jax.Array | None = None,   # [B, d_x] original inputs (encoder input)
    Y: jax.Array | None = None,    # [B, d_y] targets (encoder input)
    w_given: jax.Array | None = None,
    data_idx: jax.Array | None = None,  # [B] dataset rows (non-amortized)
):
    """Concatenate a latent w onto the features.

    Returns (F_aug, log_w, local_kl):
      log_w  : [..., B] per-sample log p(w) - log q(w|x,y) (IW bound);
               zeros in PRIOR/GIVEN modes.
      local_kl: [B] analytic KL(q(w|x,y) || p(w)) (VI bound local term);
               zeros in PRIOR/GIVEN modes.
    """
    lead = F.shape[:-2]
    B = F.shape[-2]
    dtype = F.dtype
    if mode == LatentVarMode.POSTERIOR:
        if cfg.amortized:
            assert X0 is not None and Y is not None, "posterior mode needs (x, y)"
            s = jnp.concatenate([X0, Y], axis=-1)
            mu, log_var = encoders.encode(params["encoder"], s)  # [B, d_w]
        else:
            assert data_idx is not None, \
                "non-amortized posterior mode needs data_idx"
            mu = jnp.take(params["q_mu_w"], data_idx, axis=0)       # [B, d_w]
            log_var = jnp.take(params["q_logvar_w"], data_idx, axis=0)
        eps = jax.random.normal(key, lead + (B, cfg.d_w), dtype)
        w = mu + jnp.exp(0.5 * log_var) * eps
        log_w = kl.std_gaussian_logpdf(w) - kl.diag_gaussian_logpdf(w, mu, log_var)
        local_kl = kl.gauss_kl_diag_white(mu, log_var)
    elif mode == LatentVarMode.PRIOR:
        w = jax.random.normal(key, lead + (B, cfg.d_w), dtype)
        log_w = jnp.zeros(lead + (B,), dtype)
        local_kl = jnp.zeros((B,), dtype)
    elif mode == LatentVarMode.GIVEN:
        assert w_given is not None
        w = jnp.broadcast_to(w_given, lead + (B, cfg.d_w)).astype(dtype)
        log_w = jnp.zeros(lead + (B,), dtype)
        local_kl = jnp.zeros((B,), dtype)
    else:
        raise ValueError(f"unknown LatentVarMode {mode!r}")
    F_aug = jnp.concatenate([jnp.broadcast_to(F, lead + F.shape[-2:]), w], axis=-1)
    return F_aug, log_w, local_kl


def layer_widths(configs: Sequence[LayerConfig], d_x: int) -> list[int]:
    """Feature width entering each layer (sanity check for builders)."""
    widths = [d_x]
    for cfg in configs:
        if isinstance(cfg, LVLayerConfig):
            widths.append(widths[-1] + cfg.d_w)
        else:
            widths.append(cfg.d_out)
    return widths
