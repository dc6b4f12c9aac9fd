"""Training loop: one jitted step, scan-batched dispatch, natgrad + Adam.

TPU-native rebuild of the reference's optimizer wiring
(ref:experiments/main.py — SURVEY.md §2.5, §3.1): variational (q_mu, q_sqrt)
blocks of selected GP layers are trained by natural gradients with step
gamma; everything else (kernel hypers, Z, noise, encoder weights) by Adam.

Where the reference crosses Python -> TF-C++ once per sess.run, here the
whole step — minibatch gather, forward, backward, natgrad closed form, Adam
update — is ONE XLA program, and `train_chunk` lax.scans `steps_per_call`
steps into a single dispatch so host<->device latency is amortized away
(the reference's hot loop is python-driven per step; this is the main
structural speedup on TPU).

Minibatching matches the reference's gpflow Minibatch semantics: uniform
random indices WITH replacement each step.

Two natgrad schedules:
- 'joint' (default): one forward/backward; natgrad and Adam consume the
  same linearization point. Faster; equivalent in expectation.
- 'alternating': natgrad step on one minibatch, then Adam on a fresh one —
  the reference's exact two-sess.run schedule.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import dgp
from . import natgrad as ng


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 5e-3
    gamma: float = 1e-2
    # linear warm-up of the natgrad step size from gamma_start over
    # gamma_warmup steps (0 = constant gamma). SURVEY.md §2.7 notes the
    # reference's too-large-gamma cholesky failure mode; warm-up is the
    # standard mitigation.
    gamma_start: float = 1e-4
    gamma_warmup: int = 0
    natgrad: str = "none"          # 'none' | 'final' | 'all'
    schedule: str = "joint"        # 'joint' | 'alternating'
    minibatch_size: int = 512
    iterations: int = 10000
    steps_per_call: int = 100
    # lax.scan unroll factor for the chunk: >1 amortizes the while-loop
    # bookkeeping XLA puts on every iteration (measured ~24 us/step of
    # while-op self time at the flagship shape) at the cost of a bigger
    # program; steps_per_call should be divisible by it.
    scan_unroll: int = 1
    # Precision of the solve path's TRANSPOSED dots (dKuf = Linv^T dA,
    # dLinv = dA Kuf^T — 2x the forward FLOPs, gradients only; the primal
    # stays at DGPConfig.solve_precision). The single-pass-bf16
    # relaxation ('default', +3-7% step rate) is RETIRED from 'auto' as
    # of r5 — three gate strikes: (a) it always degraded the all-Adam
    # gate config (QUALITY_GATE_solvebwd.md), (b) at minibatch=2048 it
    # collapsed LGG-kin8nm (-0.52 vs -0.37 ELBO/point — the r4 batch
    # cap, QUALITY_GATE_B2048.md), and (c) in the remaining B <= 512
    # window it interacts with the gram-kres vjp's rounding to flip
    # seed-0 LGG-kin8nm into a bad basin (dELBO 2.84e-1 at full shipped
    # defaults; either knob alone passes — r5 full-gate refresh +
    # isolation runs, see resolve_solve_bwd). 'auto' == 'same' now;
    # 'high'/'default' remain explicit opt-ins for A/B.
    solve_bwd_precision: str = "auto"
    # FULL-BATCH (B >= N) precision auto-escalation. With zero minibatch
    # noise the production relaxations converge to a measurably lower
    # bound (benchmarks/QUALITY_GATE_B8192.md: up to 1.5e-2 rel on
    # LGG-kin8nm; test NLL unaffected) — the gradient noise that masks
    # single-pass-bf16 bias in the minibatch regime is gone, the same
    # failure class as the B=2048 solve_bwd collapse. 'auto' (default)
    # escalates the TRAINING-step precision set exactly when the trainer
    # takes the full-batch path (see resolve_full_batch for the
    # gate-derived set); 'off' keeps the configured knobs unchanged.
    full_batch_precision: str = "auto"


# ONE row gather over the concatenated [N, Dx+Dy] table per minibatch draw
# instead of two (X then Y): the gathers are latency-bound, not bandwidth-
# bound (docs/ROOFLINE_B8192.md minibatch row), so halving the count is the
# only lever. Module switch for A/B (benchmarks/gather_ab.py).
FUSED_GATHER = True


_PREC_ORDER = {"default": 0, "high": 1, "highest": 2}

# The gate-derived full-batch escalation set (resolve_full_batch): the
# all-HIGHEST class. Cheaper sets were MEASURED INSUFFICIENT on the deep
# LGG-kin8nm config (15k-step full-batch gate at B=8192 >= N=7372 vs
# all-HIGHEST, benchmarks/QUALITY_GATE_B8192 history, r5 2x2 sweep —
# residual bound deficit rel:
#   var=default solve=high : 1.45e-2   var=high    solve=high   : 1.36e-2
#   var=highest solve=high : 8.18e-3   var=high    solve=highest: 3.29e-3
# tolerance 1e-3). BOTH forward knobs contribute; with zero minibatch
# noise nothing below exact-class converges to the reference bound, so the
# escalation takes the whole set to the gate reference's settings — the
# escalated full-batch trajectory is then the all-HIGHEST trajectory by
# construction. Cost: full-batch steps are bound-study steps; exactness
# outranks rate there (docs/PERF.md "FULL-BATCH envelope").
FULL_BATCH_MIN_VAR = "highest"
FULL_BATCH_MIN_SOLVE = "highest"
FULL_BATCH_OVERRIDES = {
    "SOLVE_BWD_PRECISION": "same",
    "QVAR_BF16_RESIDUAL": False,
    "QVAR_PALLAS_TRAIN": "off",
    "EPI_TRAIN": "off",
    # kernels-module switches (make_loss routes keys to the right module):
    # the escalated trajectory should be the all-HIGHEST one by
    # construction, so the gram custom vjp (rounding-ORDER-only deltas,
    # ~4e-7 rel on dls/dZ/dvar) and the bf16 Kuf residual are both off
    "GRAM_KUF_RESIDUAL": False,
    "KRES_BF16_RESIDUAL": False,
}


def resolve_full_batch(config, tc: "TrainConfig", full_batch: bool):
    """Full-batch (B >= N) precision escalation: returns the (possibly
    escalated) DGPConfig and a dict of ops.conditionals module-switch
    overrides to apply around the loss trace. Identity when the regime is
    minibatched or TrainConfig.full_batch_precision == 'off'. Shared by the
    single-device and sharded trainers."""
    if not full_batch or tc.full_batch_precision == "off":
        return config, {}
    cfg = config
    if _PREC_ORDER[cfg.var_precision] < _PREC_ORDER[FULL_BATCH_MIN_VAR]:
        cfg = dataclasses.replace(cfg, var_precision=FULL_BATCH_MIN_VAR)
    if _PREC_ORDER[cfg.solve_precision] < _PREC_ORDER[FULL_BATCH_MIN_SOLVE]:
        cfg = dataclasses.replace(cfg, solve_precision=FULL_BATCH_MIN_SOLVE)
    return cfg, dict(FULL_BATCH_OVERRIDES)


def resolve_solve_bwd(tc: "TrainConfig", layer_ids) -> str:
    """Resolve TrainConfig.solve_bwd_precision: 'auto' -> 'same'.

    The single-pass-bf16 relaxation of the solve path's transposed dots
    has now been retired from 'auto' in two steps, each by a 15k-step
    gate failure on LGG-kin8nm: r4 capped it to minibatch <= 512 (at
    B=2048 the converged bound collapsed -0.52 vs -0.37 — low-noise
    large-batch gradients expose the single-pass bias), and r5 retired
    the remaining B <= 512 window when the full-defaults gate caught it
    INTERACTING with the gram-kres vjp's reordered hyper-gradient
    rounding: gram_kres(auto) x solve_bwd('default') flips seed-0
    LGG-kin8nm into a bad basin (dELBO 2.84e-1, dNLL 0.063) while either
    knob alone passes (gram_kres off: 1.49e-2; solve_bwd 'same':
    6.58e-3 — r5 isolation runs). gram-kres is worth +6.1% flagship vs
    this relaxation's +3.7%, and this is the relaxation's SECOND
    gate-caught bias, so 'auto' now always means 'same'; 'default'
    remains an explicit opt-in for A/B. Shared by the single-device and
    sharded trainers."""
    if tc.solve_bwd_precision == "auto":
        return "same"
    return tc.solve_bwd_precision


def gamma_schedule(tc: "TrainConfig", step):
    """Natgrad step size at `step`: linear warm-up from gamma_start to gamma
    over gamma_warmup steps (constant gamma when warmup is 0). Shared by the
    single-device and sharded trainers so both honor TrainConfig identically."""
    if tc.gamma_warmup <= 0:
        return tc.gamma
    frac = jnp.clip(step / tc.gamma_warmup, 0.0, 1.0)
    return tc.gamma_start + (tc.gamma - tc.gamma_start) * frac


class TrainState(NamedTuple):
    rest: Any        # params minus natgrad (q_mu, q_sqrt) blocks
    natvars: Any     # [(m, S)] blocks for natgrad layers (possibly empty)
    opt_state: Any   # Adam state over `rest`
    step: jax.Array


def _split_params(params, layer_ids):
    natvars = ng.extract_natvars(params, layer_ids)
    layers = list(params["layers"])
    for i in layer_ids:
        lp = {k: v for k, v in layers[i].items() if k not in ("q_mu", "q_sqrt")}
        layers[i] = lp
    rest = dict(params)
    rest["layers"] = layers
    return natvars, rest


def _merge_params(rest, natvars, layer_ids):
    """Differentiable covariance-form merge (natgrad.insert_natvars): the
    loss consumes q(u)'s covariance S directly — no Cholesky of S anywhere
    in the training step."""
    return ng.insert_natvars(rest, natvars, layer_ids)


def make_trainer(config: dgp.DGPConfig, tc: TrainConfig):
    """Returns (init_fn, step_fn, chunk_fn, params_fn).

    init_fn(params) -> TrainState
    step_fn(state, X, Y, key) -> (state, loss)          # one jitted step
    chunk_fn(state, X, Y, key) -> (state, losses[steps_per_call])
    params_fn(state) -> canonical full params pytree
    """
    layer_ids = ng.natgrad_layer_ids(config, tc.natgrad)
    adam = optax.adam(tc.lr)
    solve_bwd = resolve_solve_bwd(tc, layer_ids)

    def make_loss(cfg, overrides):
        # trace-time scope: the module switches are read where the
        # conditional's matmuls trace (ops/conditionals.py), so setting
        # them around the loss body pins this trainer's policy without
        # leaking globally
        def loss_fn(natvars, rest, xb, yb, idx, key):
            from ..ops import conditionals as _cond
            from ..ops import kernels as _kern

            def _mod(k):
                return _cond if hasattr(_cond, k) else _kern

            prev = {k: getattr(_mod(k), k) for k in overrides}
            for k, v in overrides.items():
                setattr(_mod(k), k, v)
            try:
                params = _merge_params(rest, natvars, layer_ids)
                return -dgp.elbo(params, cfg, xb, yb, key, data_idx=idx)
            finally:
                for k, v in prev.items():
                    setattr(_mod(k), k, v)
        return loss_fn

    loss_minibatch = make_loss(config, {"SOLVE_BWD_PRECISION": solve_bwd})
    _cfg_fb, _ovr_fb = resolve_full_batch(config, tc, True)
    loss_full_batch = make_loss(
        _cfg_fb, {"SOLVE_BWD_PRECISION": solve_bwd, **_ovr_fb})

    def init_fn(params) -> TrainState:
        natvars, rest = _split_params(params, layer_ids)
        return TrainState(rest, natvars, adam.init(rest),
                          jnp.zeros((), jnp.int32))

    def _minibatch(X, Y, key):
        N = X.shape[0]
        if tc.minibatch_size >= N:
            return X, Y, jnp.arange(N)
        idx = jax.random.randint(key, (tc.minibatch_size,), 0, N)
        if FUSED_GATHER and X.dtype == Y.dtype:
            # ONE row gather over the concatenated [N, Dx+Dy] table instead
            # of two (the gathers are latency-bound — docs/ROOFLINE_B8192.md
            # minibatch row); the loop-invariant concat is hoisted out of
            # the scan body by XLA LICM
            b = jnp.take(jnp.concatenate([X, Y], axis=1), idx, axis=0)
            return b[:, :X.shape[1]], b[:, X.shape[1]:], idx
        return jnp.take(X, idx, axis=0), jnp.take(Y, idx, axis=0), idx

    def step_fn(state: TrainState, X, Y, key):
        kb1, kb2, ke1, ke2 = jax.random.split(key, 4)
        gamma = gamma_schedule(tc, state.step)
        # the full-batch switch is a TRACE-TIME shape property — pick the
        # matching precision policy here so it tracks _minibatch exactly
        loss_fn = (loss_full_batch if tc.minibatch_size >= X.shape[0]
                   else loss_minibatch)
        xb, yb, idx = _minibatch(X, Y, kb1)
        if layer_ids and tc.schedule == "alternating":
            # reference schedule: natgrad on batch 1, Adam on batch 2
            g_nat = jax.grad(loss_fn, argnums=0)(
                state.natvars, state.rest, xb, yb, idx, ke1)
            natvars = ng.natgrad_update(state.natvars, g_nat, gamma)
            xb2, yb2, idx2 = _minibatch(X, Y, kb2)
            loss, g_rest = jax.value_and_grad(loss_fn, argnums=1)(
                natvars, state.rest, xb2, yb2, idx2, ke2)
            updates, opt_state = adam.update(g_rest, state.opt_state, state.rest)
            rest = optax.apply_updates(state.rest, updates)
        elif layer_ids:
            loss, (g_nat, g_rest) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(state.natvars, state.rest, xb, yb,
                                         idx, ke1)
            natvars = ng.natgrad_update(state.natvars, g_nat, gamma)
            updates, opt_state = adam.update(g_rest, state.opt_state, state.rest)
            rest = optax.apply_updates(state.rest, updates)
        else:
            loss, g_rest = jax.value_and_grad(loss_fn, argnums=1)(
                state.natvars, state.rest, xb, yb, idx, ke1)
            updates, opt_state = adam.update(g_rest, state.opt_state, state.rest)
            rest = optax.apply_updates(state.rest, updates)
            natvars = state.natvars
        return TrainState(rest, natvars, opt_state, state.step + 1), loss

    def chunk_fn(state: TrainState, X, Y, key):
        """steps_per_call steps in one dispatch (lax.scan)."""
        def body(carry, i):
            st = carry
            k = jax.random.fold_in(key, i)
            st, loss = step_fn(st, X, Y, k)
            return st, loss
        return jax.lax.scan(body, state, jnp.arange(tc.steps_per_call),
                            unroll=tc.scan_unroll)

    def params_fn(state: TrainState):
        if not layer_ids:
            return state.rest
        return ng.natvars_to_canonical(state.natvars, state.rest, layer_ids)

    return init_fn, step_fn, chunk_fn, params_fn


def fit(
    key: jax.Array,
    config: dgp.DGPConfig,
    params,
    X: jax.Array,
    Y: jax.Array,
    tc: TrainConfig,
    callback=None,
    state: TrainState | None = None,
    mesh=None,
):
    """Convenience driver: jit-compiles the chunk fn and loops to
    tc.iterations. callback(step, mean_loss, state) every chunk.

    Pass a restored ``state`` (e.g. from checkpoint.restore_checkpoint) to
    resume: chunks continue from state.step with the same key schedule, so
    an interrupted run and a resumed one produce identical trajectories.

    mesh: optional ('dp','k') jax.sharding.Mesh — trains with the sharded
    step (parallel/sharding.py): minibatch rows over 'dp', IW/MC samples
    over 'k', psum'd gradients over ICI, state replicated. Same semantics,
    callback cadence, and resume behavior as the single-device path.
    """
    if mesh is not None:
        from ..parallel import sharding as _sh

        init_fn, _, chunk_fn, params_fn = _sh.make_parallel_trainer(
            config, tc, mesh)
        X, Y = _sh.shard_arrays(mesh, X, Y)
        state = _sh.replicate(mesh, init_fn(params) if state is None
                              else state)
    else:
        init_fn, _, chunk_fn, params_fn = make_trainer(config, tc)
        if state is None:
            state = init_fn(params)
    # NOTE: no buffer donation here — donate_argnums on the chunk triggers
    # 'TPU backend error (InvalidArgument)' at runtime on the axon PJRT
    # backend for multi-GP-layer programs (reproduced on GG/kin8nm), and
    # measured no speedup anyway (the scan carry already updates in place).
    chunk_jit = jax.jit(chunk_fn)
    n_chunks = -(-tc.iterations // tc.steps_per_call)
    step0 = int(state.step)
    start_chunk = step0 // tc.steps_per_call
    if step0 % tc.steps_per_call:
        # a resumed step that is not a chunk multiple would make the
        # host-side reported step (and the fold_in key schedule) drift from
        # the true device step — refuse rather than silently diverge
        raise ValueError(
            f"resume step {step0} is not a multiple of steps_per_call="
            f"{tc.steps_per_call}; resume with the original steps_per_call "
            "(checkpoints are only written at chunk boundaries)")
    # The callback runs ONE CHUNK BEHIND the dispatch: jax dispatch is
    # async, so chunk c+1 is in flight on the device while the host fetches
    # chunk c's mean loss / step for the callback. Fetching synchronously
    # instead cost two ~30 ms tunnel round trips per chunk — measured 1568
    # vs 2059 steps/s on the LGG-protein config (CLI vs bare chunk loop).
    # Values and cadence are identical; only the overlap changes.
    import numpy as np

    def _fire(cb_args):
        step, losses, st = cb_args
        # mean on HOST from one device_get — a device-side jnp.mean would
        # be an extra tiny program dispatch (another tunnel round trip)
        callback(step, float(np.asarray(losses).mean()), st)

    prev = None
    for c in range(start_chunk, n_chunks):
        new_state, losses = chunk_jit(state, X, Y, jax.random.fold_in(key, c))
        if callback is not None:
            if prev is not None:
                _fire(prev)
            prev = ((c + 1) * tc.steps_per_call, losses, new_state)
        state = new_state
    if callback is not None and prev is not None:
        _fire(prev)
    return params_fn(state), state
