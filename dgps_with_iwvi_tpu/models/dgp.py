"""DGP models and objectives: doubly-stochastic VI and importance-weighted VI.

TPU-native rebuild of ref:dgps_with_iwvi/models.py (DGP_VI / DGP_IWVI —
SURVEY.md §2.2, §3.2). One pure function per objective; the whole training
step (propagate -> bound -> grad) traces into a single XLA program.

Objectives (B = minibatch, N = num_data, S = MC samples, K = IW samples):

DGP_VI ('vi'):
    L = (N/B) * sum_B [ mean_S ve_{s,n} - local_kl_n ] - sum_{GP layers} KL_l
    where ve is the ANALYTIC Gaussian expected log-likelihood
    E_{N(f|m,v)}[log p(y|f)] and local_kl the analytic KL of each LV layer's
    amortized posterior (the reference's local-KL path).

DGP_IWVI ('iw'):
    L = (N/B) * sum_B [ logsumexp_K( ve_{k,n} + sum_lv lw_{k,n} ) - log K ]
        - sum_{GP layers} KL_l
    lw = log p(w) - log q(w|x,y); only w is importance-weighted — the f
    integral stays collapsed (the paper's partially-IW bound).

With no LV layers the two bounds coincide sample-for-sample when S == K and
the same PRNG key is used (IW(K=1) == VI(S=1) exactly); with LV layers they
agree in expectation (logsumexp over a single sample replaces the analytic
KL with its one-sample estimate).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ..ops import likelihoods, linalg, priors as priors_mod
from .layers import (
    GPLayerConfig,
    LatentVarMode,
    LVLayerConfig,
    gp_layer_init,
    gp_layer_kl,
    gp_layer_propagate,
    lv_layer_init,
    lv_layer_propagate,
)


@dataclasses.dataclass(frozen=True)
class DGPConfig:
    """Static model/objective configuration (hashable: safe as a jit static)."""

    layers: tuple  # tuple[GPLayerConfig | LVLayerConfig, ...]
    num_data: int
    objective: str = "vi"       # 'vi' | 'iw'
    num_samples: int = 1        # S (VI MC samples; also prediction default)
    num_iw_samples: int = 1     # K (IW samples)
    jitter: float = linalg.DEFAULT_JITTER
    # fused TPU conditional kernels (RBF, whitened layers): True / False /
    # "auto". Clean in-process A/B shows XLA's fusion matching or beating
    # the Pallas kernel at M=128 AND M=512 on v5e, so "auto" currently
    # resolves to False everywhere; the kernel stays available (True) as
    # the mandated fused-pipeline capability and for future tuning.
    use_pallas: bool | str = "auto"
    # observation model (ops/likelihoods.py LIKELIHOOD_KINDS): 'gaussian',
    # 'bernoulli' (probit), 'student_t', 'poisson', 'exponential', 'gamma',
    # 'beta', 'multiclass' (robust-max; final layer d_out = num classes)
    likelihood: str = "gaussian"
    # Kuu jitter-escalation depth; 1 = single fixed-jitter factorization
    # (fastest, no rescue), 4 = default 10x escalation ladder
    jitter_tries: int = 4
    # hyperparameter priors: static tuple of (path_suffix, kind, a, b) specs
    # added to the objective as log_prior(params) — the reference's GPflow
    # Model objective = likelihood + prior (SURVEY.md §2.2). Empty = off.
    priors: tuple = ()
    # MXU precision for the q-variance matmuls ONLY (the FLOP-dominant
    # (q_sqrt^T A) / (S A) contraction — a cancellation-free sum of squares
    # accumulated in f32 on the MXU): 'highest' (bf16x6), 'high' (bf16x3),
    # 'default' (single-pass bf16). The gram always runs HIGHEST
    # (catastrophic cancellation there), ALL natgrad matmuls stay HIGHEST
    # (training/natgrad.py — measured failure mode otherwise), and the
    # solve path has its own knob below.
    # Round-1 measurement: 'high' leaves the ELBO within 6e-8 relative of
    # 'highest' with identical 3k-step training quality. Round-2
    # measurement (15k-step full-convergence A/B on LG-energy, LG-kin8nm,
    # LGG-kin8nm, GG-energy): 'default' matches 'high' in converged ELBO
    # (<=0.02% delta, sign varies) and test NLL/RMSE (<=0.002 nats), and
    # removes ~110 us/step at the flagship shape (0.695 -> 0.586 ms, +19%);
    # hence 'default' is the default. Set 'high'/'highest' to re-verify on
    # a new dataset family.
    var_precision: str = "default"
    # MXU precision for the conditional's SOLVE-path matmuls (A = Linv Kuf,
    # mean = A^T q_mu), feeding the Kff - sum(A^2) cancellation. 'high'
    # (bf16x3) is +14% steps/s at the flagship shape. The first gate run
    # NaN'd on GG-energy AT STEP 1: the near-deterministic inner layer's
    # fvar_prior rounds to <= 0 below HIGHEST, and sqrt(max(v,0)) has an
    # inf*0=NaN backward exactly at 0. With the fixes (safe_sqrt's 1e-12
    # floor + fvar_prior clamped to >= 0 — both semantics-preserving), the
    # full 15k-step convergence gate passes on all four configs (GG-energy,
    # LG-energy, LG-kin8nm, LGG-kin8nm: ELBO within 0.06%, NLL within
    # 0.001 nats), so 'high' is the default. 'highest' (bf16x6) remains
    # for re-verification on new data families.
    solve_precision: str = "high"

    def __post_init__(self):
        assert self.objective in ("vi", "iw")
        gp_cfgs = [c for c in self.layers if isinstance(c, GPLayerConfig)]
        assert gp_cfgs and gp_cfgs[-1] is self.layers[-1], \
            "last layer must be a GP layer"
        assert all(not c.final for c in gp_cfgs[:-1]) and gp_cfgs[-1].final, \
            "exactly the last GP layer must have final=True"


def init_dgp(
    key: jax.Array,
    config: DGPConfig,
    Z_inits: Sequence[jax.Array | None] | None = None,
    inner_q_sqrt_scale: float = 1e-5,
    noise_variance: float = 0.05,
    dtype=jnp.float32,
    likelihood_kwargs: Dict[str, Any] | None = None,
) -> Dict[str, Any]:
    """Full model parameter pytree.

    Inner GP layers start near-deterministic (q_sqrt = 1e-5 * I, the
    doubly-stochastic DGP convention) so early training behaves like a
    single GP; the final layer starts at q_sqrt = I.
    """
    keys = jax.random.split(key, len(config.layers) + 1)
    layer_params = []
    gp_idx = 0
    n_gp = sum(isinstance(c, GPLayerConfig) for c in config.layers)
    Z_iter = list(Z_inits) if Z_inits is not None else [None] * n_gp
    for i, cfg in enumerate(config.layers):
        if isinstance(cfg, GPLayerConfig):
            scale = 1.0 if cfg.final else inner_q_sqrt_scale
            layer_params.append(gp_layer_init(
                keys[i], cfg, Z=Z_iter[gp_idx], q_sqrt_scale=scale, dtype=dtype))
            gp_idx += 1
        else:
            layer_params.append(lv_layer_init(keys[i], cfg, dtype=dtype))
    return {
        "layers": layer_params,
        "likelihood": likelihoods.init_params(
            config.likelihood, noise_variance, dtype=dtype,
            **(likelihood_kwargs or {})),
    }


def prefactor_gp_layers(params, config: DGPConfig) -> dict:
    """Batched Kuu factorization for ALL GP layers at once.

    The TPU Cholesky / triangular-solve custom calls are latency-bound at
    M <= a few hundred (~10-14 us each, serialized), so factorizing each
    layer separately puts 2 calls + 1 rescue-cond per layer on the critical
    path. Stacking every layer's Kuu (grouped by M) into ONE batched
    cholesky_with_jitter + ONE batched triangular solve costs a single
    call each. Returns {layer_id: (Lm, Linv)}.
    """
    from .layers import layer_Kuu

    groups: dict = {}
    for i, cfg in enumerate(config.layers):
        if isinstance(cfg, GPLayerConfig):
            groups.setdefault(cfg.num_inducing, []).append(i)
    out = {}
    for m, ids in groups.items():
        Kuus = jnp.stack([
            layer_Kuu(params["layers"][i], config.layers[i]) for i in ids])
        # chol_and_inverse: one batched factorization + one batched solve
        # forward; backward is pure batched matmuls (no triangular-solve
        # custom calls on the reverse path — see ops/linalg.py)
        Lms, Linvs = linalg.chol_and_inverse(Kuus, config.jitter,
                                             config.jitter_tries)
        for j, i in enumerate(ids):
            out[i] = (Lms[j], Linvs[j])
    return out


def propagate(
    params,
    config: DGPConfig,
    X: jax.Array,                  # [B, d_x]
    key: jax.Array,
    lead: tuple,                   # leading sample axes, e.g. (S,) or (K,)
    *,
    lv_mode: str = LatentVarMode.POSTERIOR,
    Y: jax.Array | None = None,
    ws_given: Sequence[jax.Array] | None = None,
    data_idx: jax.Array | None = None,
    factors: dict | None = None,
    stop_before_final: bool = False,
):
    """Thread samples through the layer stack (SURVEY.md §3.2).

    Returns (fmean, fvar, log_w, local_kl):
      fmean/fvar: [*lead, B, d_y] final-layer conditional moments
      log_w:      [*lead, B] summed LV importance log-weights
      local_kl:   [B] summed LV analytic local KLs

    factors: precomputed prefactor_gp_layers output to share the batched
    Kuu factorization with other consumers in the same step (e.g. the
    non-whitened KL); computed here when None.

    stop_before_final=True: do NOT run the final GP layer — return
    (F, log_w, local_kl, factors) with F the final layer's INPUT samples,
    so callers needing a different final-layer computation (the full-cov
    predictive) reuse this exact stack traversal instead of replaying it.
    """
    B = X.shape[0]
    dtype = X.dtype
    F = jnp.broadcast_to(X, lead + X.shape)
    log_w = jnp.zeros(lead + (B,), dtype)
    local_kl = jnp.zeros((B,), dtype)
    final_out = None
    lv_idx = 0
    if factors is None:
        factors = prefactor_gp_layers(params, config)
    for i, cfg in enumerate(config.layers):
        lkey = jax.random.fold_in(key, i)
        if isinstance(cfg, LVLayerConfig):
            w_given = None if ws_given is None else ws_given[lv_idx]
            F, lw_i, kl_i = lv_layer_propagate(
                params["layers"][i], cfg, F, lkey, mode=lv_mode, X0=X, Y=Y,
                w_given=w_given, data_idx=data_idx)
            log_w = log_w + lw_i
            local_kl = local_kl + kl_i
            lv_idx += 1
        else:
            if stop_before_final and cfg.final:
                return F, log_w, local_kl, factors
            Lm, Linv = factors[i]
            F, moments = gp_layer_propagate(
                params["layers"][i], cfg, F, lkey, jitter=config.jitter,
                use_pallas=config.use_pallas,
                jitter_tries=config.jitter_tries,
                var_precision=config.var_precision,
                solve_precision=config.solve_precision,
                Lm=Lm, Linv=Linv)
            if cfg.final:
                final_out = moments
    fmean, fvar = final_out
    return fmean, fvar, log_w, local_kl


def gp_kls(params, config: DGPConfig, factors: dict | None = None) -> jax.Array:
    """Sum of global whitened KL(q(u) || p(u)) over GP layers.

    factors: prefactor_gp_layers output — only NON-whitened KLs need
    chol(Kuu); sharing the step's batched factorization avoids a duplicate
    gram + Cholesky per non-white layer per step."""
    total = 0.0
    for i, cfg in enumerate(config.layers):
        if isinstance(cfg, GPLayerConfig):
            Lm = None if factors is None else factors[i][0]
            total = total + gp_layer_kl(params["layers"][i], cfg,
                                        jitter=config.jitter,
                                        jitter_tries=config.jitter_tries,
                                        Lm=Lm)
    return total


def elbo(params, config: DGPConfig, X: jax.Array, Y: jax.Array,
         key: jax.Array, data_idx: jax.Array | None = None) -> jax.Array:
    """The training objective (maximize): 'vi' or 'iw' per config.

    data_idx: dataset row indices of the minibatch — required only when the
    model contains non-amortized LV layers."""
    B = X.shape[0]
    scale = config.num_data / B
    # hyperparameter log-prior: a global (minibatch-independent) term added
    # once, like the -KL terms (GPflow Model: objective = likelihood + prior)
    lp = (priors_mod.log_prior(params, config.priors)
          if config.priors else 0.0)
    # ONE batched Kuu factorization per step, shared by the conditionals
    # AND the (non-whitened) KLs
    factors = prefactor_gp_layers(params, config)
    if config.objective == "vi":
        S = config.num_samples
        fmean, fvar, _, local_kl = propagate(
            params, config, X, key, (S,), lv_mode=LatentVarMode.POSTERIOR, Y=Y,
            data_idx=data_idx, factors=factors)
        ve = likelihoods.dispatch_variational_expectations(
            params["likelihood"], fmean, fvar, Y,
            kind=config.likelihood)                        # [S, B]
        datafit = jnp.sum(jnp.mean(ve, axis=0) - local_kl)
        return scale * datafit - gp_kls(params, config, factors) + lp
    # 'iw'
    K = config.num_iw_samples
    fmean, fvar, log_w, _ = propagate(
        params, config, X, key, (K,), lv_mode=LatentVarMode.POSTERIOR, Y=Y,
        data_idx=data_idx, factors=factors)
    ve = likelihoods.dispatch_variational_expectations(
        params["likelihood"], fmean, fvar, Y,
        kind=config.likelihood)                            # [K, B]
    iw = jax.nn.logsumexp(ve + log_w, axis=0) - jnp.log(float(K))  # [B]
    return scale * jnp.sum(iw) - gp_kls(params, config, factors) + lp


def predict_f(params, config: DGPConfig, X: jax.Array, key: jax.Array,
              num_samples: int | None = None, *,
              lv_mode: str = LatentVarMode.PRIOR,
              ws_given=None, Y: jax.Array | None = None,
              data_idx: jax.Array | None = None):
    """S propagated samples of the final-layer moments: [S, B, d_y] x2.

    Prediction draws latents from the PRIOR (SURVEY.md §3.3). For
    posterior reconstruction at training points pass
    lv_mode=LatentVarMode.POSTERIOR together with Y (amortized models)
    or data_idx (non-amortized).
    """
    S = num_samples or config.num_samples
    # inference hint: every predict_* path funnels through here, so the
    # q-variance can take the fused Pallas kernel (no AD residual needed —
    # ops/conditionals.py QVAR_PALLAS) whenever the shape qualifies
    from ..ops.conditionals import qvar_inference_mode
    with qvar_inference_mode():
        fmean, fvar, _, _ = propagate(
            params, config, X, key, (S,), lv_mode=lv_mode, ws_given=ws_given,
            Y=Y, data_idx=data_idx)
    return fmean, fvar


def predict_f_full_cov(params, config: DGPConfig, X: jax.Array,
                       key: jax.Array, num_samples: int | None = None, *,
                       lv_mode: str = LatentVarMode.PRIOR, ws_given=None,
                       Y: jax.Array | None = None,
                       data_idx: jax.Array | None = None):
    """Full-covariance predictive for the FINAL layer: S samples of
    (mean [N, d_y], cov [d_y, N, N]) given sampled paths through the
    earlier layers (gpflow predict_f(full_cov=True) analog; inter-layer
    propagation stays marginal per the doubly-stochastic factorization).
    """
    from ..ops import conditionals as _cond
    from ..ops import kernels as _kern
    from ..ops import mean_functions as _mf

    S = num_samples or config.num_samples
    # the exact training-time stack traversal, stopped at the final layer's
    # input (shares prefactored Kuu, LV modes, and per-layer keying with
    # propagate — no hand-maintained replica of the layer loop)
    F, _, _, factors = propagate(
        params, config, X, key, (S,), lv_mode=lv_mode, ws_given=ws_given,
        Y=Y, data_idx=data_idx, stop_before_final=True)
    final_i = len(config.layers) - 1
    fcfg = config.layers[final_i]
    fp = params["layers"][final_i]
    q_sqrt = fp["q_sqrt"] if fcfg.q_diag else jnp.tril(fp["q_sqrt"])
    Lm, _ = factors[final_i]

    def per_sample(Fs):
        scales = fp.get("raw_Z_scales")  # multiscale features (Kff unchanged)
        if scales is not None:
            from ..ops import features as _feat

            Kuf = _feat.multiscale_Kuf(fp["kernel"], fp["Z"], scales, Fs)
        else:
            Kuf = _kern.K(fp["kernel"], fp["Z"], Fs, kind=fcfg.kernel_kind)
        Kff = _kern.K(fp["kernel"], Fs, Fs, kind=fcfg.kernel_kind)
        out = _cond.base_conditional_whitened_fullcov(
            Kuf, Lm, Kff, fp["q_mu"], q_sqrt, white=fcfg.white)
        from .layers import resolved_mean_function

        mf_kind = resolved_mean_function(fcfg)
        if mf_kind == "skip":
            W = fp.get("mean_W")
            if W is not None:
                W = jax.lax.stop_gradient(W)
            return out.mean + _mf.apply_mean_function(Fs, W), out.var
        if mf_kind == "linear":
            return (out.mean + _mf.linear_mean(Fs, fp["mean_W"])
                    + fp["mean_b"], out.var)
        if mf_kind == "constant":
            return out.mean + fp["mean_b"], out.var
        return out.mean, out.var

    return jax.vmap(per_sample)(F)  # ([S, N, d_y], [S, d_y, N, N])


def predict_f_samples(params, config: DGPConfig, X: jax.Array,
                      key: jax.Array, num_samples: int | None = None, *,
                      lv_mode: str = LatentVarMode.PRIOR, ws_given=None,
                      Y: jax.Array | None = None,
                      data_idx: jax.Array | None = None):
    """S actual function draws [S, B, d_y] (gpflow Model.predict_f_samples
    analog, ref:dgps_with_iwvi usage in the demo figures): one
    reparameterized sample from each propagated path's final-layer MARGINAL
    conditional — marginal, not joint, across X, per the doubly-stochastic
    factorization (SURVEY.md §2.1). Use predict_f_full_cov for coherent
    joint draws over a small X."""
    from ..ops.conditionals import safe_sqrt

    kp, ke = jax.random.split(key)
    fmean, fvar = predict_f(params, config, X, kp, num_samples,
                            lv_mode=lv_mode, ws_given=ws_given, Y=Y,
                            data_idx=data_idx)
    eps = jax.random.normal(ke, fmean.shape, fmean.dtype)
    return fmean + safe_sqrt(fvar) * eps


def predict_y_samples(params, config: DGPConfig, X: jax.Array,
                      key: jax.Array, num_samples: int | None = None, *,
                      lv_mode: str = LatentVarMode.PRIOR, ws_given=None,
                      Y: jax.Array | None = None,
                      data_idx: jax.Array | None = None):
    """S observation draws [S, B, d_y]: function draws pushed through the
    observation model (gaussian: + N(0, noise_variance); bernoulli/probit:
    binary draws at the sampled f; every other family per
    ops/likelihoods.py dispatch_sample_observations — multiclass returns
    [S, B, 1] class labels from [S, B, C] function draws)."""
    kf, ky = jax.random.split(key)
    fs = predict_f_samples(params, config, X, kf, num_samples,
                           lv_mode=lv_mode, ws_given=ws_given, Y=Y,
                           data_idx=data_idx)
    return likelihoods.dispatch_sample_observations(
        params["likelihood"], ky, fs, kind=config.likelihood)


def predict_y(params, config: DGPConfig, X: jax.Array, key: jax.Array,
              num_samples: int | None = None, Y: jax.Array | None = None):
    """Mixture predictive moments: mean/var of (1/S) sum_s N(m_s, v_s + s2).

    Y is needed only by 'switched_gaussian' (its per-point noise is indexed
    by the task column, Y[:, -1])."""
    fmean, fvar = predict_f(params, config, X, key, num_samples)
    m, v = likelihoods.dispatch_predict_mean_and_var(
        params["likelihood"], fmean, fvar, kind=config.likelihood, y=Y)
    mix_mean = jnp.mean(m, axis=0)
    mix_var = jnp.mean(v + jnp.square(m), axis=0) - jnp.square(mix_mean)
    return mix_mean, mix_var


def predict_log_density(params, config: DGPConfig, X: jax.Array, Y: jax.Array,
                        key: jax.Array, num_samples: int | None = None) -> jax.Array:
    """Per-point mixture test log-likelihood:
    logsumexp_s log N(y | m_s, v_s + s2) - log S  -> [B]."""
    S = num_samples or config.num_samples
    fmean, fvar = predict_f(params, config, X, key, S)
    logp = likelihoods.dispatch_predict_density(
        params["likelihood"], fmean, fvar, Y, kind=config.likelihood)  # [S, B]
    return jax.nn.logsumexp(logp, axis=0) - jnp.log(float(S))


def predict_y_and_log_density(params, config: DGPConfig, X: jax.Array,
                              Y: jax.Array, key: jax.Array,
                              num_samples: int | None = None):
    """One-propagate serving/eval path: mixture predictive moments AND the
    per-point mixture log-density from the SAME S prior-latent samples.

    Identical outputs to calling predict_y and predict_log_density with the
    same key (they each re-propagate; this shares the pass — the evaluation
    loop and a production scorer both want the pair). Returns
    ((mix_mean, mix_var), log_density)."""
    S = num_samples or config.num_samples
    fmean, fvar = predict_f(params, config, X, key, S)
    m, v = likelihoods.dispatch_predict_mean_and_var(
        params["likelihood"], fmean, fvar, kind=config.likelihood, y=Y)
    mix_mean = jnp.mean(m, axis=0)
    mix_var = jnp.mean(v + jnp.square(m), axis=0) - jnp.square(mix_mean)
    logp = likelihoods.dispatch_predict_density(
        params["likelihood"], fmean, fvar, Y, kind=config.likelihood)  # [S, B]
    ld = jax.nn.logsumexp(logp, axis=0) - jnp.log(float(S))
    return (mix_mean, mix_var), ld
