"""GP kernels with ARD lengthscales: RBF / Matern family, plus the wider
gpflow kernel set (RationalQuadratic, Cosine, ArcCosine orders 0/1/2,
Linear, Polynomial, Periodic, White, Constant, Coregion) and '+'/'*'
combinators in the kind string.

TPU-native equivalent of gpflow:gpflow/kernels.py as referenced by
ref:dgps_with_iwvi/layers.py (the reference uses RBF only; the dependency
layer this module replaces ships the full family). Pure functions over a
small params pytree; positive parameters are stored unconstrained (see
ops/transforms.py). gpflow's active_dims is a per-leaf '[...]' suffix in
the kind string ("rbf[0:3]*periodic[3]", "linear[0,2,5]") — a static
column selection that composes with jit for free; a leaf without a suffix
sees every input dim, so plain kinds are unchanged.

Design notes (TPU-first):
- The squared distance uses the ||x||^2 - 2 x.y + ||y||^2 expansion so the
  cross term is ONE [N, D] x [D, M] matmul that lands on the MXU; distances
  are clipped at 0 to absorb cancellation error (same guard as the
  reference's square_dist).
- Everything broadcasts over arbitrary leading batch axes, so the K x S
  sample axes of the IWVI objective flow through as plain batched matmuls —
  no per-sample Python loops.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .transforms import positive, positive_inverse

KernelParams = Dict[str, Any]


def rbf_params(input_dim: int, variance: float = 1.0, lengthscales=1.0,
               ard: bool = True, dtype=jnp.float32) -> KernelParams:
    """Unconstrained parameter pytree for an RBF/Matern kernel.

    Mirrors gpflow RBF(input_dim, ARD=True) defaults: unit variance, unit
    lengthscales per input dim.
    """
    ls = jnp.broadcast_to(
        jnp.asarray(lengthscales, dtype), (input_dim,) if ard else (1,)
    )
    return {
        "raw_variance": positive_inverse(jnp.asarray(variance, dtype)),
        "raw_lengthscales": positive_inverse(ls),
    }


def kernel_variance(params: KernelParams) -> jax.Array:
    return positive(params["raw_variance"])


def kernel_lengthscales(params: KernelParams) -> jax.Array:
    return positive(params["raw_lengthscales"])


# Opt-in: run the gram dot's TRANSPOSED (gradient) dots single-pass bf16.
# Worth ~+5% at D~90 (year config), quality-gate-MARGINAL (failed LGG by
# 0.001 nats), so off by default — see scaled_squared_distance.
GRAM_BWD_RELAX: bool = False

# Forward precision of the gram cross-term dot (trace-time module switch).
# 'highest' (bf16x6) is the production default. 'high' (bf16x3) measures
# ~1.5e-5 max relative gram error (vs 4.8e-7 at highest, 2.6e-3 at the
# catastrophic single-pass default) — A/B with benchmarks/gram_fwd_ab.py
# and gate with benchmarks/quality_gate.py before changing the default.
GRAM_FWD_PRECISION: str = "highest"


def scaled_squared_distance(X: jax.Array, X2: jax.Array,
                            lengthscales: jax.Array) -> jax.Array:
    """||(x - x')/l||^2 for X:[..., N, D], X2:[..., M, D] -> [..., N, M].

    MXU-friendly: one batched matmul for the cross term; clipped at zero.
    """
    # deferred import: conditionals imports this module at load time, but
    # the split-precision matmul lives there; resolved at trace time,
    # after both modules exist
    from . import conditionals as _cond

    Xs = X / lengthscales
    X2s = X2 / lengthscales
    xx = jnp.sum(jnp.square(Xs), axis=-1)  # [..., N]
    yy = jnp.sum(jnp.square(X2s), axis=-1)  # [..., M]
    # Forward HIGHEST: the expansion cancels catastrophically in bf16 MXU
    # passes. The TRANSPOSED dots (dXs = g X2s, dX2s = g^T Xs) have no
    # cancellation, and relaxing them measures ~+5% on the year config
    # (D=90 makes the gram dots real work; noise-level at D=8) — but the
    # 15k-step quality gate FAILED it by a hair on LGG-kin8nm (dNLL 0.0066
    # vs tol 0.0056 nats; benchmarks/QUALITY_GATE_grambwd.md), so unlike
    # the solve path's backward it stays EXACT by default. GRAM_BWD_RELAX
    # (module switch, read at trace time) opts year-scale runs in.
    try:
        hp = {"highest": jax.lax.Precision.HIGHEST,
              "high": jax.lax.Precision.HIGH}[GRAM_FWD_PRECISION]
    except KeyError:
        raise ValueError(
            f"GRAM_FWD_PRECISION={GRAM_FWD_PRECISION!r}: only 'highest' and "
            "'high' are allowed — 'default' (single-pass bf16) corrupts the "
            "sq-dist cancellation (~6% gram error, docs/PERF.md)") from None
    bwd = (jax.lax.Precision.DEFAULT if GRAM_BWD_RELAX else hp)
    cross = _cond.matmul_split_precision(
        Xs, jnp.swapaxes(X2s, -1, -2), hp, bwd)  # [..., N, M]
    d2 = xx[..., :, None] - 2.0 * cross + yy[..., None, :]
    return jnp.maximum(d2, 0.0)


# Residual choice for the RBF cross-gram's backward. Plain AD keeps the
# [N, M] SQUARED-DISTANCE tensor d2 live from forward to backward (exp's
# vjp also keeps the exp output, but that IS Kuf — the solve's operand,
# materialized anyway). At the B=8192 training shape the d2 residual is
# 84 MB/layer and XLA's memory-space assignment parks it in alternate
# memory, evicts it (a measured 124 us HBM copy) and re-prefetches it in
# four async slices (~100 us more) — the "copy-done"/"slice-done" rows of
# docs/ROOFLINE_B8192.md. The custom vjp below derives every gradient
# from Kuf itself (dd2 = -0.5 * g * K, masked where the d2 <= 0 clamp
# bound), so d2 is never saved: the residual set is (Xs, X2s, K) and K is
# shared with the solve path's operand. "auto" uses it exactly when the
# gram is large enough for the residual traffic to matter; True/False
# force it for A/B (benchmarks/gram_kres_ab.py). Measured v5e step times
# (gram_kres_ab.py, spc=200, idle host, forced on at every shape):
#   flagship B=512:  +6.1%  (0.502 -> 0.474 ms)
#   B=8192:          +1.5%  (4.715 -> 4.643 ms)
#   year LGGG K=50:  +3.5%  (2.481 -> 2.399 ms)
# The 4 MB floor admits every layer-gram in those configs (flagship
# 5.2 MB/layer) while keeping the M x M Kuu grams — whose gradients feed
# the natgrad closed form most directly — on the unchanged AD path.
GRAM_KUF_RESIDUAL: bool | str = "auto"
GRAM_KRES_MIN_BYTES = 4 * 1024 * 1024
GRAM_KRES_REMAT = False  # experimental A/B probe, see _leaf_K rbf branch

# Store the Kuf residual (the gram OUTPUT the custom vjp above keeps, and
# the solve dot's saved y operand — the SAME tensor, shared by CSE) in
# bf16 when it is large. Forward math is UNCHANGED (the f32 gram still
# feeds the forward solve dot / Cholesky); the backward picks up bf16
# Kuf-operand rounding — the class the quality gate pins forced-on
# (quality_gate.py --kuf_bf16 on). Measured v5e (kres_bf16_ab.py, LGG
# K=20 M=128, spc=200/500, forced on):
#   B=512  (Kuf  5 MB/layer): neutral (2290 vs 2286 steps/s)
#   B=2048 (21 MB):           neutral (961 vs 960)
#   B=4096 (42 MB):           +3.7-3.8% (458->475 @200, 477->496 @500)
#   B=8192 (84 MB):           neutral (216 vs 217)
# Mechanism (r5 HLO audit): the ROOFLINE_B8192 "copy-done"+"slice-done"
# rows are Kuf's VMEM spill on the FORWARD path — at 84 MB the gram
# output cannot stay VMEM-resident next to A, so it transits HBM once
# regardless of residual dtype (hence the B=8192 neutrality; the r4
# "Pallas layout copy" and r5 "d2 residual" attributions were both
# wrong). The knob pays where Kuf stays VMEM-resident forward but its
# backward residual traffic matters (~the 32-64 MB band).
#
# SHIPPED OFF — quality-REJECTED by the convergence gate: forced on at
# B=2048 the 15k-step LGG-kin8nm bound collapses (ELBO/n -0.4364 vs
# -0.3737, dELBO 1.68e-1 rel, dNLL +0.033 — QUALITY_GATE_kres.md FAIL),
# the same low-noise large-batch bias class as the r4 solve_bwd
# collapse: per-step gradient deltas are tiny (2.6e-4 norm-rel,
# tests/test_kres_bf16.py) but systematically biased through the
# natgrad solve path, and minibatch noise no longer masks the bias at
# B >= 2048 — EXACTLY the batch regime where the knob's byte savings
# live. An isolation re-run of the identical candidate stack with only
# this knob off PASSES (dELBO 1.2e-3), pinning the collapse on the bf16
# Kuf residual alone. Fast-but-wrong; kept as an A/B switch and as the
# recorded reason this residual must stay f32.
KRES_BF16_RESIDUAL: bool | str = "off"
KRES_BF16_MIN_BYTES = 32 * 1024 * 1024


def kres_bf16_active(nbytes, dtype) -> bool:
    """Shared policy for the bf16 Kuf residual (gram vjp + solve-dot y).

    `nbytes` may be symbolic under polymorphic-batch export — undecidable
    there, and export traces are inference traces, so fall back to exact.
    """
    if KRES_BF16_RESIDUAL in ("off", False):
        return False
    if KRES_BF16_RESIDUAL in ("on", True):
        return True
    return (isinstance(nbytes, int) and nbytes >= KRES_BF16_MIN_BYTES
            and dtype == jnp.float32)


def _use_kuf_residual(X, X2) -> bool:
    if GRAM_KUF_RESIDUAL != "auto":
        return bool(GRAM_KUF_RESIDUAL)
    n_out = 1
    for s in (*X.shape[:-1], X2.shape[-2]):
        if not isinstance(s, int):
            # symbolic dim (polymorphic-batch export): the size policy is
            # undecidable at trace time, and export traces are inference
            # traces where the AD-residual choice is moot — plain path.
            return False
        n_out *= s
    for s in X2.shape[:-2]:
        if not isinstance(s, int):
            return False
        n_out *= s
    return (X.dtype == jnp.float32
            and n_out * 4 >= GRAM_KRES_MIN_BYTES)


def _sum_to_shape(g, shape):
    """Sum g over broadcasted leading axes so it matches shape."""
    extra = g.ndim - len(shape)
    if extra > 0:
        g = jnp.sum(g, axis=tuple(range(extra)))
    axes = tuple(i for i, (gs, s) in enumerate(zip(g.shape, shape))
                 if s == 1 and gs != 1)
    if axes:
        g = jnp.sum(g, axis=axes, keepdims=True)
    return g


@jax.custom_vjp
def _rbf_gram_kres(Xs: jax.Array, X2s: jax.Array,
                   var: jax.Array) -> jax.Array:
    """var * exp(-0.5 ||xs - x2s||^2) whose vjp residual is the OUTPUT.

    Forward is bit-identical to the plain path (same hp cross dot, same
    expansion and clamp). Backward: dd2 = -0.5 * g * K, zeroed where the
    max(d2, 0) clamp bound — recovered as K >= var, exact wherever f32
    exp is (see module comment). The cotangent dots run at the same
    precision class the split-precision AD path uses (GRAM_BWD_RELAX)."""
    hp = {"highest": jax.lax.Precision.HIGHEST,
          "high": jax.lax.Precision.HIGH}[GRAM_FWD_PRECISION]
    xx = jnp.sum(jnp.square(Xs), axis=-1)                  # [..., N]
    yy = jnp.sum(jnp.square(X2s), axis=-1)                 # [..., M]
    cross = jnp.matmul(Xs, jnp.swapaxes(X2s, -1, -2), precision=hp)
    d2 = xx[..., :, None] - 2.0 * cross + yy[..., None, :]
    return var * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def _rbf_gram_kres_fwd(Xs, X2s, var):
    out = _rbf_gram_kres(Xs, X2s, var)
    nbytes = out.dtype.itemsize
    for s in out.shape:
        nbytes = nbytes * s if isinstance(s, int) else 0  # symbolic: exact
    Kres = (out.astype(jnp.bfloat16)
            if kres_bf16_active(nbytes, out.dtype) else out)
    return out, (Xs, X2s, var, Kres)


def _rbf_gram_kres_bwd(res, g):
    Xs, X2s, var, K = res
    hp = {"highest": jax.lax.Precision.HIGHEST,
          "high": jax.lax.Precision.HIGH}[GRAM_FWD_PRECISION]
    bp = jax.lax.Precision.DEFAULT if GRAM_BWD_RELAX else hp
    dvar = jnp.sum(g * K) / var
    # d2 <= 0 (the clamp region) <=> K >= var: exp(-0.5 d2c) == 1 exactly
    # there; gradient is zero through max() just as in the AD path
    dd2 = jnp.where(K < var, -0.5 * g * K, 0.0)            # [..., N, M]
    dcross = -2.0 * dd2
    dXs = jnp.matmul(dcross, X2s, precision=bp)            # [..., N, D]
    dX2s = jnp.matmul(jnp.swapaxes(dcross, -1, -2), Xs, precision=bp)
    dXs = dXs + 2.0 * Xs * jnp.sum(dd2, axis=-1)[..., None]
    dX2s = dX2s + 2.0 * X2s * jnp.sum(dd2, axis=-2)[..., None]
    return (_sum_to_shape(dXs, Xs.shape), _sum_to_shape(dX2s, X2s.shape),
            jnp.reshape(dvar, var.shape))


_rbf_gram_kres.defvjp(_rbf_gram_kres_fwd, _rbf_gram_kres_bwd)


def _matern_from_r(r: jax.Array, order: int) -> jax.Array:
    if order == 1:  # Matern 1/2 (exponential)
        return jnp.exp(-r)
    if order == 3:  # Matern 3/2
        s = jnp.sqrt(3.0) * r
        return (1.0 + s) * jnp.exp(-s)
    if order == 5:  # Matern 5/2
        s = jnp.sqrt(5.0) * r
        return (1.0 + s + (5.0 / 3.0) * jnp.square(r)) * jnp.exp(-s)
    raise ValueError(f"unsupported Matern order {order}")


# --------------------------------------------------------------------------
# Wider kernel family (TPU-native rebuild of the rest of
# gpflow:gpflow/kernels.py): Linear, Polynomial, Periodic, White, Constant,
# plus '+' / '*' combinators in the kind string ("rbf+linear",
# "rbf*periodic+constant" — '*' binds tighter, matching gpflow Sum/Product
# trees). Leaf params keep the flat {raw_*} pytree; composites nest them as
# {"terms": ((leaf, ...), ...)} mirroring the sum-of-products parse, so the
# kind string (a jit static) fully determines the pytree structure.
# --------------------------------------------------------------------------

STATIONARY_KINDS = ("rbf", "matern12", "matern32", "matern52", "rq",
                    "cosine")
# 'arccosine' is the order-1 Cho & Saul kernel; the order is part of the
# kind string ('arccosine0' / 'arccosine2') because it selects a different
# closed form — a jit-static choice, like everything else in the kind.
LEAF_KINDS = STATIONARY_KINDS + ("linear", "polynomial", "periodic",
                                 "white", "constant", "arccosine",
                                 "arccosine0", "arccosine2")

ARCCOSINE_ORDERS = {"arccosine0": 0, "arccosine": 1, "arccosine2": 2}

# gpflow Coregion (gpflow:gpflow/kernels.py Coregion): k(i, j) = B[i, j]
# with B = W W^T + diag(kappa) over integer task indices read from ONE
# input column. The output dim C and rank R are part of the token —
# 'coregion3x1[2]' is a 3-task rank-1 coregionalization over column 2 —
# so the kind string (a jit static) still fully determines the params
# pytree. Composed with '*' over feature columns it gives the intrinsic
# coregionalization model: 'rbf[0:2]*coregion3x1[2]'.
_COREGION_RE = r"coregion(\d+)x(\d+)$"


def coregion_shape(name: str) -> tuple | None:
    """('coregion3x1') -> (3, 1); None when the name is not a coregion."""
    import re
    m = re.match(_COREGION_RE, name)
    return (int(m.group(1)), int(m.group(2))) if m else None


def parse_kind(kind: str) -> tuple:
    """'a*b+c' -> (('a','b'), ('c',)): sum of products of leaf tokens.

    A token is a leaf kind with an optional active-dims suffix
    ('rbf[0:3]', 'linear[0,2,5]', 'periodic[3]' — gpflow active_dims as a
    static column selection); split_token separates the two."""
    terms = tuple(tuple(f.strip() for f in t.split("*"))
                  for t in kind.split("+"))
    for t in terms:
        for f in t:
            split_token(f)  # validates kind name + dims syntax
    return terms


def split_token(token: str) -> tuple:
    """'rbf[0:3]' -> ('rbf', (0, 1, 2)); 'rbf' -> ('rbf', None).

    dims come back as a static tuple of column indices: '[a:b]' is the
    half-open range, '[i,j,...]' an explicit list, '[i]' one column."""
    name, bracket, spec = token.partition("[")
    name = name.strip()
    # gpflow alias (gpflow:gpflow/kernels.py Exponential == Matern-1/2)
    if name == "exponential":
        name = "matern12"
    if name not in LEAF_KINDS and coregion_shape(name) is None:
        raise ValueError(f"unknown kernel kind {name!r} in {token!r}; "
                         f"leaves: {LEAF_KINDS} + 'coregion<C>x<R>'")
    if not bracket:
        return name, None
    spec = spec.strip()
    if not spec.endswith("]"):
        raise ValueError(f"unterminated active-dims suffix in {token!r}")
    spec = spec[:-1].strip()
    try:
        if ":" in spec:
            a, b = spec.split(":")
            dims = tuple(range(int(a), int(b)))
        else:
            dims = tuple(int(s) for s in spec.split(","))
    except ValueError:
        raise ValueError(
            f"bad active-dims suffix in {token!r}: use '[a:b]' (half-open "
            "range) or '[i,j,...]' (explicit columns)") from None
    if not dims or len(set(dims)) != len(dims) or min(dims) < 0:
        raise ValueError(f"active dims {dims} in {token!r} must be "
                         "non-empty, unique and non-negative")
    return name, dims


def linear_params(input_dim: int, variance: float = 1.0, ard: bool = True,
                  dtype=jnp.float32) -> KernelParams:
    """gpflow Linear: k(x, x') = sum_d v_d x_d x'_d (per-dim ARD weights)."""
    v = jnp.broadcast_to(jnp.asarray(variance, dtype),
                         (input_dim,) if ard else (1,))
    return {"raw_variance": positive_inverse(v)}


def polynomial_params(input_dim: int, variance: float = 1.0,
                      offset: float = 1.0, degree: float = 3.0,
                      ard: bool = True, dtype=jnp.float32) -> KernelParams:
    """gpflow Polynomial: (sum_d v_d x_d x'_d + offset)^degree; degree is a
    fixed (stop-gradient) parameter per the gpflow convention."""
    p = linear_params(input_dim, variance, ard, dtype)
    p["raw_offset"] = positive_inverse(jnp.asarray(offset, dtype))
    p["degree"] = jnp.asarray(degree, dtype)
    return p


def periodic_params(input_dim: int, variance: float = 1.0, lengthscales=1.0,
                    period: float = 1.0, ard: bool = True,
                    dtype=jnp.float32) -> KernelParams:
    """gpflow Periodic (1.5.x convention):
    k(x, x') = v exp(-0.5 sum_d sin^2(pi (x_d - x'_d) / p_d) / l_d^2)."""
    shape = (input_dim,) if ard else (1,)
    return {
        "raw_variance": positive_inverse(jnp.asarray(variance, dtype)),
        "raw_lengthscales": positive_inverse(
            jnp.broadcast_to(jnp.asarray(lengthscales, dtype), shape)),
        "raw_period": positive_inverse(
            jnp.broadcast_to(jnp.asarray(period, dtype), shape)),
    }


def white_params(variance: float = 1.0, dtype=jnp.float32) -> KernelParams:
    return {"raw_variance": positive_inverse(jnp.asarray(variance, dtype))}


constant_params = white_params


def rq_params(input_dim: int, variance: float = 1.0, lengthscales=1.0,
              alpha: float = 1.0, ard: bool = True,
              dtype=jnp.float32) -> KernelParams:
    """gpflow RationalQuadratic: k = v (1 + r2/(2 alpha))^(-alpha) with the
    per-dim scaled squared distance r2; alpha > 0 trainable (the
    scale-mixture-of-RBFs index)."""
    p = rbf_params(input_dim, variance, lengthscales, ard, dtype)
    p["raw_alpha"] = positive_inverse(jnp.asarray(alpha, dtype))
    return p


def arccosine_params(input_dim: int, variance: float = 1.0,
                     weight_variances=1.0, bias_variance: float = 1.0,
                     ard: bool = True, dtype=jnp.float32) -> KernelParams:
    """gpflow ArcCosine (Cho & Saul 2009): the infinite-width one-hidden-
    layer network kernel. Trainable per-dim weight variances (ARD), bias
    variance, and output variance; the ORDER (0/1/2 — step/relu/quadratic
    activations) is chosen by the kind string (ARCCOSINE_ORDERS)."""
    w = jnp.broadcast_to(jnp.asarray(weight_variances, dtype),
                         (input_dim,) if ard else (1,))
    return {
        "raw_variance": positive_inverse(jnp.asarray(variance, dtype)),
        "raw_weight_variances": positive_inverse(w),
        "raw_bias_variance": positive_inverse(
            jnp.asarray(bias_variance, dtype)),
    }


def coregion_params(output_dim: int, rank: int,
                    dtype=jnp.float32) -> KernelParams:
    """gpflow Coregion: B = W W^T + diag(kappa), W: [C, R], kappa: [C] > 0.

    gpflow 1.5 initializes W = 0 — a stationary point of B = W W^T (the
    gradient through W is 2 (dB) W = 0), which is why its docs tell users
    to overwrite W by hand. Here W gets a small DETERMINISTIC asymmetric
    init instead (0.1 cos(i + Rj) pattern) so the off-diagonal structure
    is trainable out of the box; kappa = 1 matches gpflow."""
    ij = jnp.arange(output_dim * rank, dtype=dtype).reshape(output_dim, rank)
    return {
        "W": 0.1 * jnp.cos(ij),
        "raw_kappa": positive_inverse(jnp.ones((output_dim,), dtype)),
    }


def coregion_B(params: KernelParams) -> jax.Array:
    """The [C, C] task-covariance matrix W W^T + diag(kappa)."""
    W = params["W"]
    return W @ W.T + jnp.diag(positive(params["raw_kappa"]))


def kernel_params(kind: str, input_dim: int, variance: float = 1.0,
                  lengthscales=1.0, ard: bool = True,
                  dtype=jnp.float32) -> KernelParams:
    """Generic factory: one leaf's params, or the nested composite pytree
    whose structure mirrors parse_kind(kind)."""
    terms = parse_kind(kind)
    if len(terms) == 1 and len(terms[0]) == 1:
        return _leaf_params(terms[0][0], input_dim, variance, lengthscales,
                            ard, dtype)
    return {"terms": tuple(
        tuple(_leaf_params(f, input_dim, variance, lengthscales, ard, dtype)
              for f in t)
        for t in terms)}


def _leaf_params(token, input_dim, variance, lengthscales, ard, dtype):
    kind, dims = split_token(token)
    if dims is not None:
        assert max(dims) < input_dim, \
            f"active dims {dims} out of range for input_dim={input_dim}"
        input_dim = len(dims)  # per-dim params cover the selected columns
    cr = coregion_shape(kind)
    if cr is not None:
        assert input_dim == 1, \
            (f"{kind} reads ONE integer task column; select it with an "
             f"active-dims suffix ('{kind}[{input_dim - 1}]') unless the "
             "kernel input is already 1-D")
        return coregion_params(*cr, dtype=dtype)
    if kind == "rq":
        return rq_params(input_dim, variance, lengthscales, ard=ard,
                         dtype=dtype)
    if kind in ARCCOSINE_ORDERS:
        return arccosine_params(input_dim, variance, ard=ard, dtype=dtype)
    if kind in STATIONARY_KINDS:
        return rbf_params(input_dim, variance, lengthscales, ard, dtype)
    if kind == "linear":
        return linear_params(input_dim, variance, ard, dtype)
    if kind == "polynomial":
        return polynomial_params(input_dim, variance, ard=ard, dtype=dtype)
    if kind == "periodic":
        return periodic_params(input_dim, variance, lengthscales, ard=ard,
                               dtype=dtype)
    return white_params(variance, dtype)  # white | constant


def _weighted_inner(params, X, X2):
    """sum_d v_d x_d x'_d as ONE MXU dot (linear/polynomial cross term).

    Products, no cancellation — but the gram feeds a Cholesky, so it runs
    at the same forward precision policy as the stationary cross term.
    """
    from . import conditionals as _cond

    v = positive(params["raw_variance"])
    hp = {"highest": jax.lax.Precision.HIGHEST,
          "high": jax.lax.Precision.HIGH}[GRAM_FWD_PRECISION]
    bwd = (jax.lax.Precision.DEFAULT if GRAM_BWD_RELAX else hp)
    return _cond.matmul_split_precision(
        X * v, jnp.swapaxes(X2, -1, -2), hp, bwd)


def _arccos_J(theta: jax.Array, order: int) -> jax.Array:
    """Cho & Saul J_n(theta) for orders 0/1/2."""
    if order == 0:
        return jnp.pi - theta
    if order == 1:
        return jnp.sin(theta) + (jnp.pi - theta) * jnp.cos(theta)
    c = jnp.cos(theta)
    return 3.0 * jnp.sin(theta) * c + (jnp.pi - theta) * (1.0 + 2.0 * c * c)


def _arccos_moments(params, X, X2=None):
    """(cross, sxx, syy): bias-shifted weighted inner products. The cross
    term is ONE MXU dot under the gram precision policy; sxx/syy >= bias > 0
    (shifted softplus), so the sqrt/ratio below are well-posed."""
    from . import conditionals as _cond

    w = positive(params["raw_weight_variances"])
    b = positive(params["raw_bias_variance"])
    sxx = jnp.sum(w * jnp.square(X), axis=-1) + b        # [..., N]
    if X2 is None:
        return None, sxx, None
    hp = {"highest": jax.lax.Precision.HIGHEST,
          "high": jax.lax.Precision.HIGH}[GRAM_FWD_PRECISION]
    bwd = (jax.lax.Precision.DEFAULT if GRAM_BWD_RELAX else hp)
    cross = _cond.matmul_split_precision(
        X * w, jnp.swapaxes(X2, -1, -2), hp, bwd) + b    # [..., N, M]
    syy = jnp.sum(w * jnp.square(X2), axis=-1) + b       # [..., M]
    return cross, sxx, syy


# arccos has an unbounded derivative at |cos| = 1 (the gram DIAGONAL hits
# it exactly); gpflow 1.5 squeezes cos_theta by its jitter level before
# acos, which keeps both the value error (~sqrt(2 eps) rad at theta = 0)
# and the gradient (~1/sqrt(2 eps)) bounded. Same trick, same magnitude.
_ARCCOS_EPS = 1e-6


def _coregion_index(X: jax.Array, C: int) -> jax.Array:
    """[..., N, 1] float task column -> [..., N] clipped integer indices.

    Rounding (not truncation) tolerates non-integral task values from
    k-means Z initialization; indices are data, not parameters, so the
    non-differentiability is irrelevant."""
    return jnp.clip(jnp.round(X[..., 0]), 0, C - 1).astype(jnp.int32)


def _leaf_K(params, X, X2, token: str, x_equals_x2: bool) -> jax.Array:
    kind, dims = split_token(token)
    if dims is not None:  # static column selection (gpflow active_dims)
        idx = jnp.asarray(dims)
        X, X2 = X[..., idx], X2[..., idx]
    cr = coregion_shape(kind)
    if cr is not None:
        B = coregion_B(params)                      # [C, C], C small
        ix = _coregion_index(X, cr[0])              # [..., N]
        jx = _coregion_index(X2, cr[0])             # [..., M]
        return B[ix[..., :, None], jx[..., None, :]]
    if kind in STATIONARY_KINDS:
        ls = kernel_lengthscales(params)
        var = kernel_variance(params)
        if kind == "cosine":
            # v cos(sum_d (x_d - x'_d) / l_d): the PD projected form (the
            # real part of a complex exponential of a 1-D projection —
            # Bochner). gpflow 1.5's cos(euclid_dist) variant is NOT
            # positive definite for D > 1 (its Kuu Cholesky genuinely
            # fails); gpflow 2 replaced it with exactly this form.
            u = jnp.sum(X / ls, axis=-1)
            u2 = jnp.sum(X2 / ls, axis=-1)
            return var * jnp.cos(u[..., :, None] - u2[..., None, :])
        if kind == "rbf":
            if _use_kuf_residual(X, X2):
                dt = jnp.result_type(X.dtype, X2.dtype, var.dtype)
                fn = _rbf_gram_kres
                if GRAM_KRES_REMAT:
                    # experimental probe (r5): recompute the gram in the
                    # backward instead of keeping K as residual — bounds
                    # how much of the Kuf spill/reload traffic is on the
                    # critical path. jax.checkpoint over a custom_vjp
                    # saves only the primal inputs (Xs, X2s, var — tiny)
                    # and reruns the fwd before the custom bwd.
                    fn = jax.checkpoint(fn)
                return fn((X / ls).astype(dt),
                          (X2 / ls).astype(dt), var.astype(dt))
            return var * jnp.exp(-0.5 * scaled_squared_distance(X, X2, ls))
        d2 = scaled_squared_distance(X, X2, ls)
        if kind == "rq":
            alpha = positive(params["raw_alpha"])
            return var * (1.0 + d2 / (2.0 * alpha)) ** (-alpha)
        order = {"matern12": 1, "matern32": 3, "matern52": 5}[kind]
        r = jnp.sqrt(jnp.maximum(d2, 1e-36))
        return var * _matern_from_r(r, order)
    if kind in ARCCOSINE_ORDERS:
        order = ARCCOSINE_ORDERS[kind]
        var = kernel_variance(params)
        cross, sxx, syy = _arccos_moments(params, X, X2)
        denom = jnp.sqrt(sxx)[..., :, None] * jnp.sqrt(syy)[..., None, :]
        cos_t = _ARCCOS_EPS + (1.0 - 2.0 * _ARCCOS_EPS) * cross / denom
        theta = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
        return (var / jnp.pi) * denom ** order * _arccos_J(theta, order)
    if kind == "linear":
        return _weighted_inner(params, X, X2)
    if kind == "polynomial":
        inner = _weighted_inner(params, X, X2) + positive(params["raw_offset"])
        return inner ** jax.lax.stop_gradient(params["degree"])
    if kind == "periodic":
        # pairwise per-dim differences ([..., N, M, D]) — no MXU form
        # exists for sin^2 distances; fine at layer shapes (D small), but
        # this materializes N*M*D and is NOT the kernel to use at the
        # K*S*B serving extreme.
        ls = kernel_lengthscales(params)
        per = positive(params["raw_period"])
        var = kernel_variance(params)
        diff = X[..., :, None, :] - X2[..., None, :, :]
        s = jnp.sin(jnp.pi * diff / per) / ls
        return var * jnp.exp(-0.5 * jnp.sum(jnp.square(s), axis=-1))
    if kind == "white":
        # sigma^2 I when evaluated on one set (Kuu); zero cross-covariance
        # otherwise (gpflow White semantics)
        var = kernel_variance(params)
        n, m = X.shape[-2], X2.shape[-2]
        if x_equals_x2 and n == m:
            eye = jnp.eye(n, dtype=X.dtype)
            return jnp.broadcast_to(var * eye, X.shape[:-2] + (n, n))
        return jnp.zeros(jnp.broadcast_shapes(X.shape[:-2], X2.shape[:-2])
                         + (n, m), X.dtype)
    if kind == "constant":
        var = kernel_variance(params)
        n, m = X.shape[-2], X2.shape[-2]
        return jnp.broadcast_to(
            var, jnp.broadcast_shapes(X.shape[:-2], X2.shape[:-2]) + (n, m))
    raise ValueError(f"unknown kernel kind {kind!r}")


def _leaf_Kdiag(params, X, token: str) -> jax.Array:
    kind, dims = split_token(token)
    if dims is not None:
        X = X[..., jnp.asarray(dims)]
    cr = coregion_shape(kind)
    if cr is not None:
        ix = _coregion_index(X, cr[0])
        W = params["W"]
        return (jnp.sum(jnp.square(W), axis=-1)
                + positive(params["raw_kappa"]))[ix]
    if kind in STATIONARY_KINDS + ("white", "constant", "periodic"):
        return jnp.broadcast_to(kernel_variance(params), X.shape[:-1])
    if kind in ARCCOSINE_ORDERS:
        # theta = 0 on the diagonal: J(0) = pi (orders 0, 1), 3 pi (order 2)
        order = ARCCOSINE_ORDERS[kind]
        var = kernel_variance(params)
        _, sxx, _ = _arccos_moments(params, X)
        j0 = 3.0 if order == 2 else 1.0
        return var * j0 * sxx ** order
    v = positive(params["raw_variance"])
    inner = jnp.sum(v * jnp.square(X), axis=-1)
    if kind == "linear":
        return inner
    if kind == "polynomial":
        return (inner + positive(params["raw_offset"])) \
            ** jax.lax.stop_gradient(params["degree"])
    raise ValueError(f"unknown kernel kind {kind!r}")


def K(params: KernelParams, X: jax.Array, X2: jax.Array | None = None,
      *, kind: str = "rbf", same_set: bool | None = None) -> jax.Array:
    """Gram matrix k(X, X2): [..., N, D] x [..., M, D] -> [..., N, M].

    kind may be a composite sum-of-products string (parse_kind); params must
    then carry the matching {"terms": ...} structure (kernel_params).

    White-kernel caveat: k_white(X, X2) is var*I only when X and X2 are THE
    SAME set, else 0 (gpflow White semantics). Same-set detection is
    X2-omitted or object identity (call sites write K(p, Z, Z)); two
    numerically equal but DISTINCT arrays count as different sets — pass
    same_set=True explicitly if that is not what you mean. Only 'white'
    terms are affected; every other kind is identity-insensitive."""
    same = same_set if same_set is not None else (X2 is None or X2 is X)
    if X2 is None:
        X2 = X
    terms = parse_kind(kind)
    if len(terms) == 1 and len(terms[0]) == 1:
        return _leaf_K(params, X, X2, terms[0][0], same)
    out = None
    for tp, factors in zip(params["terms"], terms):
        prod = _leaf_K(tp[0], X, X2, factors[0], same)
        for fp, fk in zip(tp[1:], factors[1:]):
            prod = prod * _leaf_K(fp, X, X2, fk, same)
        out = prod if out is None else out + prod
    return out


def Kdiag(params: KernelParams, X: jax.Array, *, kind: str = "rbf") -> jax.Array:
    """diag k(X, X): [..., N, D] -> [..., N]."""
    terms = parse_kind(kind)
    if len(terms) == 1 and len(terms[0]) == 1:
        return _leaf_Kdiag(params, X, terms[0][0])
    out = None
    for tp, factors in zip(params["terms"], terms):
        prod = _leaf_Kdiag(tp[0], X, factors[0])
        for fp, fk in zip(tp[1:], factors[1:]):
            prod = prod * _leaf_Kdiag(fp, X, fk)
        out = prod if out is None else out + prod
    return out
