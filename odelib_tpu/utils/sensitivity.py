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

__all__ = ["saltelli_design", "sobol_indices", "local_sensitivity"]


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
