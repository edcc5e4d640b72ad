"""Sensitivity analysis: global Sobol indices and local derivatives.

Neither exists in the reference — its closest tool is the serial 1-D
``gradient()`` sweep (``/root/reference/ODElib/Framework.py:1063-1127``),
which probes one parameter at a time and cannot see interactions. Both
analyses here are single fused device batches:

* **Sobol / Saltelli**: variance-based global sensitivity of a scalar
  model output over the prior. The Saltelli design (A, B, and the P
  column-swapped AB_i matrices) needs N*(P+2) model evaluations — one
  ``vmap`` batch of ODE solves, exactly the fit-survey shape the TPU
  path is optimized for. First-order indices use the Saltelli 2010
  estimator, total-order the Jansen estimator; both get bootstrap
  standard errors (host-side resampling of per-sample products — no
  extra solves).
* **Local**: time-resolved relative sensitivities d y_s(t) / d log
  theta_p via ``jacfwd`` through the differentiable fixed-step solve —
  per-trajectory exact derivatives the reference cannot produce at all
  (its RHS lives behind scipy's Fortran callback).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..model import ModelSpec, ObsData, fit_metrics, integrate_theta

__all__ = ["saltelli_design", "sobol_indices", "local_sensitivity",
           "power_scale_sensitivity"]


def _weighted_shift(z, logw):
    """Normalized mean/sd shift of one dimension's draws under
    PSIS-smoothed importance log-weights. Returns (shift, khat)."""
    from .model_comparison import _psis_smooth_lw

    lw, khat = _psis_smooth_lw(np.asarray(logw, float))
    w = np.exp(lw)                      # normalized by the smoother
    m0, s0 = float(z.mean()), float(z.std())
    if s0 <= 0.0:
        return 0.0, khat
    m1 = float(np.sum(w * z))
    s1 = float(np.sqrt(max(np.sum(w * (z - m1) ** 2), 0.0)))
    return max(abs(m1 - m0) / s0, abs(s1 - s0) / s0), khat


def power_scale_sensitivity(z_draws, log_lik, log_prior, *,
                            alphas=(0.8, 1.25), labels=None,
                            threshold=0.05):
    """Power-scaling sensitivity diagnostic over EXISTING posterior
    draws — no refitting (Kallioinen, Paananen, Bürkner & Vehtari 2023,
    "Detecting and diagnosing prior and likelihood sensitivity with
    power-scaling"): perturb the posterior to ``p(y|theta)^a p(theta)``
    (likelihood-scaling) and ``p(y|theta) p(theta)^a`` (prior-scaling)
    for each ``a`` in ``alphas`` by PSIS-reweighting the draws with
    ``(a-1) * log_lik`` / ``(a-1) * log_prior``, and record each
    dimension's worst normalized mean/sd shift (a transparent variant of
    the paper's CJS distance; same default 0.05 flag threshold).

    Reading the table: likelihood-sensitive only — the data drive the
    posterior (the healthy case); prior-sensitive only — the prior
    dominates (the data barely inform this dimension); BOTH sensitive —
    prior-data conflict (prior and likelihood pull against each other);
    neither — the dimension is essentially unidentified at this scale.

    Prior-scaling is applied PER PARAMETER: dimension j's prior
    sensitivity scales only j's own prior factor (pass ``log_prior`` as
    (N, P), one column per dimension). Scaling the whole joint prior —
    the paper's default — dilutes each dimension's signal with weight
    noise from every other prior; the selective variant (their sec. 4)
    is sharper at the same draw count. A (N,) ``log_prior`` is accepted
    and broadcast (joint scaling) when per-dimension factors are not
    available.

    Parameters: ``z_draws`` (N, P) pooled draws (log-parameter space —
    the framework's walking space); ``log_lik`` (N,) per draw;
    ``log_prior`` (N, P) per dimension (or (N,) joint). Returns a
    DataFrame[label, prior_sens, lik_sens, khat, diagnosis].
    """
    import pandas as pd

    z_draws = np.asarray(z_draws, float)
    log_lik = np.asarray(log_lik, float)
    log_prior = np.asarray(log_prior, float)
    N, P = z_draws.shape
    if log_prior.ndim == 1:
        log_prior = np.tile(log_prior[:, None], (1, P))
    ok = np.isfinite(log_lik) \
        & np.all(np.isfinite(log_prior), axis=1) \
        & np.all(np.isfinite(z_draws), axis=1)
    if ok.sum() < 16:
        raise ValueError(f"only {int(ok.sum())} finite draws — too few "
                         "for power-scaling")
    z_draws, log_lik, log_prior = z_draws[ok], log_lik[ok], log_prior[ok]
    if labels is None:
        labels = [f"theta[{j}]" for j in range(P)]

    rows = []
    for j in range(P):
        z = z_draws[:, j]
        ps, ls, kh = 0.0, 0.0, 0.0
        for a in alphas:
            s_p, k1 = _weighted_shift(z, (a - 1.0) * log_prior[:, j])
            s_l, k2 = _weighted_shift(z, (a - 1.0) * log_lik)
            ps, ls = max(ps, s_p), max(ls, s_l)
            kh = max(kh, k1, k2)
        p_hit, l_hit = ps >= threshold, ls >= threshold
        diag = ("prior-data conflict" if p_hit and l_hit
                else "prior-dominated" if p_hit
                else "-" if l_hit
                else "unidentified?")
        rows.append({"parameter": labels[j],
                     "prior_sens": round(ps, 4),
                     "lik_sens": round(ls, 4),
                     "khat": round(kh, 3), "diagnosis": diag})
    return pd.DataFrame(rows)


def saltelli_design(key, dists, samples: int):
    """Build the Saltelli evaluation matrix: rows = [A; B; AB_1..AB_P]
    with A, B independent LHS draws through the prior ppfs.

    Returns (thetas, n, p) where thetas has shape (n*(p+2), p).
    """
    from ..samplers.lhs import sample_lhs

    k_a, k_b = jax.random.split(key)
    P = len(dists)
    A = sample_lhs(k_a, dists, samples)     # (N, P)
    B = sample_lhs(k_b, dists, samples)
    blocks = [A, B]
    for i in range(P):
        ABi = A.at[:, i].set(B[:, i])
        blocks.append(ABi)
    return jnp.concatenate(blocks, axis=0), samples, P


@partial(jax.jit, static_argnames=(
    "spec", "target", "num_params", "method", "rtol", "atol", "max_steps",
    "substeps"))
def _eval_target(spec, obs, times, y0_base, thetas, *, target, num_params,
                 method, rtol, atol, max_steps, substeps):
    """Scalar model output per draw. ``target`` is ('chi',) or
    ('state'|'log_state', post-summation state index)."""
    def one(theta):
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, method=method,
                             rtol=rtol, atol=atol, max_steps=max_steps,
                             substeps=substeps)
        if target[0] == "chi":
            chi, _, _ = fit_metrics(spec, obs, ys, num_params)
            return chi
        post = spec.apply_summations(ys)
        v = post[-1, target[1]]
        return jnp.log(v) if target[0] == "log_state" else v

    return jax.vmap(one)(thetas)


def sobol_indices(fA, fB, fAB, n_boot: int = 200, seed: int = 0):
    """First-order (S1) and total-order (ST) Sobol indices from Saltelli
    outputs: fA, fB of shape (N,), fAB of shape (P, N).

    S1_i = mean(fB * (fAB_i - fA)) / V      (Saltelli et al. 2010)
    ST_i = mean((fA - fAB_i)^2) / (2 V)     (Jansen 1999)

    NaN evaluations (failed integrations) are dropped pairwise. Returns
    dict of arrays S1, ST, S1_se, ST_se (bootstrap over samples).
    """
    fA = np.asarray(fA, np.float64)
    fB = np.asarray(fB, np.float64)
    fAB = np.asarray(fAB, np.float64)
    P, N = fAB.shape
    ok = np.isfinite(fA) & np.isfinite(fB) & np.all(np.isfinite(fAB), 0)
    if ok.sum() < 16:
        raise ValueError(f"only {int(ok.sum())} finite Saltelli samples")
    fA, fB, fAB = fA[ok], fB[ok], fAB[:, ok]
    n = len(fA)
    # center the outputs: the Saltelli S1 estimator is translation-
    # invariant in expectation but its variance scales with the squared
    # mean of f — removing it cuts the estimator noise by orders of
    # magnitude for outputs with large offsets (e.g. log abundances)
    mu = np.mean(np.concatenate([fA, fB]))
    fA, fB, fAB = fA - mu, fB - mu, fAB - mu

    def indices(idx):
        a, b, ab = fA[idx], fB[idx], fAB[:, idx]
        var = np.var(np.concatenate([a, b]))
        s1 = np.mean(b[None, :] * (ab - a[None, :]), axis=1) / var
        st = np.mean((a[None, :] - ab) ** 2, axis=1) / (2.0 * var)
        return s1, st

    s1, st = indices(np.arange(n))
    rng = np.random.default_rng(seed)
    bs1, bst = [], []
    for _ in range(n_boot):
        r = rng.integers(0, n, n)
        a, b = indices(r)
        bs1.append(a)
        bst.append(b)
    return {"S1": s1, "ST": st,
            "S1_se": np.std(bs1, axis=0), "ST_se": np.std(bst, axis=0),
            "n_effective": int(n)}


def local_sensitivity(spec: ModelSpec, theta, y0_base, times, *,
                      log_scale: bool = True, method: str = "fixed_dopri5",
                      rtol: float = 1e-6, atol: float = 1e-4,
                      max_steps: int = 4096, substeps=4):
    """Time-resolved sensitivity tensor d y[t, s] / d theta_p (or
    d/d log theta_p with ``log_scale``), shape (T, S_post, P), by
    forward-mode AD through the solve."""
    theta = jnp.asarray(theta)

    def traj(th):
        y0 = spec.override_inits(y0_base, th)
        ys = integrate_theta(spec, th, y0, times, method=method, rtol=rtol,
                             atol=atol, max_steps=max_steps,
                             substeps=substeps)
        return spec.apply_summations(ys)

    if log_scale:
        J = jax.jacfwd(lambda z: traj(jnp.exp(z)))(jnp.log(theta))
    else:
        J = jax.jacfwd(traj)(theta)
    return J
