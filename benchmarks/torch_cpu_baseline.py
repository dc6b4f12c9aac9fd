"""CPU float64 baseline for the headline benchmark.

The reference stack is GPflow 1.5.x on TF1, running float64 on CPU
(SURVEY.md §6: the >5x north-star target is against "the TF1/GPflow CPU
baseline"). Neither TF1 nor GPflow is installable in this zero-egress
container, so this module implements the SAME computation — 2-layer
latent-variable DGP, amortized encoder, K-sample IWVI objective, whitened
conditionals, fwd+bwd+Adam — in torch CPU float64 as a stand-in baseline.
It deliberately omits the reference's extra natural-gradient graph run per
iteration, which makes the baseline FASTER than the real reference, i.e.
the reported speedup ratio is conservative.

NO torch is used anywhere in the framework itself; this file exists only to
produce a measured `vs_baseline` denominator for bench.py.
"""

from __future__ import annotations

import time

import numpy as np


def measure_torch_steps_per_sec(
    n: int = 7372, d: int = 8, M: int = 128, K: int = 20, B: int = 512,
    d_w: int = 1, inner: int = 8, steps: int = 6, warmup: int = 2,
) -> float:
    import os

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    dt = torch.float64

    X = torch.randn(n, d, dtype=dt)
    Y = torch.sin(X.sum(-1, keepdim=True)) + 0.1 * torch.randn(n, 1, dtype=dt)

    def rbf(params, A, Bm):
        ls, var = torch.nn.functional.softplus(params["raw_ls"]) + 1e-6, \
            torch.nn.functional.softplus(params["raw_var"]) + 1e-6
        a, b = A / ls, Bm / ls
        d2 = (a * a).sum(-1)[..., :, None] - 2 * a @ b.transpose(-1, -2) \
            + (b * b).sum(-1)[..., None, :]
        return var * torch.exp(-0.5 * d2.clamp_min(0))

    def gp_layer_params(d_in, d_out):
        return {
            "raw_ls": torch.zeros(d_in, dtype=dt, requires_grad=True),
            "raw_var": torch.zeros((), dtype=dt, requires_grad=True),
            "Z": torch.randn(M, d_in, dtype=dt, requires_grad=True),
            "q_mu": torch.zeros(M, d_out, dtype=dt, requires_grad=True),
            "q_sqrt": torch.eye(M, dtype=dt).repeat(d_out, 1, 1).requires_grad_(True),
        }

    enc_h = 20
    params = {
        "enc_W1": (torch.randn(d + 1, enc_h, dtype=dt) * 0.1).requires_grad_(True),
        "enc_b1": torch.zeros(enc_h, dtype=dt, requires_grad=True),
        "enc_W2": (torch.randn(enc_h, enc_h, dtype=dt) * 0.1).requires_grad_(True),
        "enc_b2": torch.zeros(enc_h, dtype=dt, requires_grad=True),
        "enc_Wm": torch.zeros(enc_h, d_w, dtype=dt, requires_grad=True),
        "enc_bm": torch.zeros(d_w, dtype=dt, requires_grad=True),
        "enc_Wv": torch.zeros(enc_h, d_w, dtype=dt, requires_grad=True),
        "enc_bv": torch.full((d_w,), -4.6, dtype=dt, requires_grad=True),
        "raw_noise": torch.zeros((), dtype=dt, requires_grad=True),
        "gp1": gp_layer_params(d + d_w, inner),
        "gp2": gp_layer_params(inner, 1),
    }
    flat = []
    for v in params.values():
        flat.extend(v.values() if isinstance(v, dict) else [v])
    opt = torch.optim.Adam(flat, lr=5e-3)

    skip_W = torch.eye(d + d_w, inner, dtype=dt)

    def conditional(gp, F):
        Kuu = rbf(gp, gp["Z"], gp["Z"]) + 1e-6 * torch.eye(M, dtype=dt)
        Lm = torch.linalg.cholesky(Kuu)
        Kuf = rbf(gp, gp["Z"], F)                           # [K, M, B]
        A = torch.linalg.solve_triangular(
            Lm.expand(Kuf.shape[0], M, M), Kuf, upper=False)
        mean = A.transpose(-1, -2) @ gp["q_mu"]             # [K, B, dout]
        Lq = torch.tril(gp["q_sqrt"])
        LTA = Lq.transpose(-1, -2).unsqueeze(0) @ A.unsqueeze(1)  # [K,dout,M,B]
        var = (torch.nn.functional.softplus(gp["raw_var"]) + 1e-6
               - (A * A).sum(-2)).unsqueeze(-1) \
            + (LTA * LTA).sum(-2).transpose(-1, -2)
        return mean, var, Lq

    def kl_white(gp, Lq):
        return 0.5 * ((gp["q_mu"] ** 2).sum() + (Lq ** 2).sum()
                      - Lq.shape[0] * M
                      - 2 * torch.log(torch.diagonal(Lq, dim1=-2, dim2=-1)).sum())

    def step():
        opt.zero_grad()
        idx = torch.randint(0, n, (B,))
        xb, yb = X[idx], Y[idx]
        s = torch.cat([xb, yb], -1)
        h = torch.tanh(torch.tanh(s @ params["enc_W1"] + params["enc_b1"])
                       @ params["enc_W2"] + params["enc_b2"])
        mu = h @ params["enc_Wm"] + params["enc_bm"]
        lv = h @ params["enc_Wv"] + params["enc_bv"]
        eps = torch.randn(K, B, d_w, dtype=dt)
        w = mu + (0.5 * lv).exp() * eps
        log_w = (-0.5 * (np.log(2 * np.pi) + w ** 2)).sum(-1) \
            - (-0.5 * (np.log(2 * np.pi) + lv + (w - mu) ** 2 / lv.exp())).sum(-1)
        F1 = torch.cat([xb.expand(K, B, d), w], -1)
        m1, v1, Lq1 = conditional(params["gp1"], F1)
        f1 = m1 + v1.clamp_min(0).sqrt() * torch.randn_like(m1) + F1 @ skip_W
        m2, v2, Lq2 = conditional(params["gp2"], f1)
        s2 = torch.nn.functional.softplus(params["raw_noise"]) + 1e-6
        ve = (-0.5 * (np.log(2 * np.pi) + s2.log()
                      + ((yb - m2) ** 2 + v2) / s2)).sum(-1)  # [K, B]
        iw = torch.logsumexp(ve + log_w, 0) - np.log(K)
        loss = -(n / B) * iw.sum() + kl_white(params["gp1"], Lq1) \
            + kl_white(params["gp2"], Lq2)
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    # per-step median: a single OS scheduling stall in a short window was
    # moving the reported ratio by ~20% run to run
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    return 1.0 / float(np.median(times))
