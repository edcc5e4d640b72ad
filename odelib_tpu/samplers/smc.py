"""Sequential Monte Carlo with adaptive likelihood tempering.

Estimates the model evidence (marginal likelihood) alongside the
posterior — the quantity behind Bayes factors, which the reference cannot
produce at all (its only model-comparison tool is per-fit AIC,
``/root/reference/ODElib/Statistics/stats.py:44-47``). A particle
population is annealed from the prior (beta=0) to the posterior (beta=1)
through targets ``prior(theta) * exp(-chi)^beta``; each stage reweights,
resamples, and rejuvenates with covariance-adapted MH moves.

TPU-native shape: particles are the batch axis. Every stage is one jitted
device program — reweight + systematic resample (a sorted-uniform
searchsorted gather, no control flow) + K vmapped mutation sweeps, each a
fused batch of N ODE solves. The tempering schedule is chosen on the host
by bisection on the effective sample size of the incremental weights (an
O(N) numpy computation per stage on an (N,) chi vector — the device does
all solve work). Mutation proposals use the empirical particle covariance
in log space, scaled by the 2.38^2/d optimal-scaling rule: the population
itself supplies the proposal geometry, so correlated posteriors need no
hand-tuned ``rwalk_std``.

Sampling space conventions match samplers/mh.py: log-theta walks, target
density ``exp(-(beta * chi - log prior))`` over log-theta, NaN chi always
rejected (and given zero weight).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..model import ModelSpec, ObsData, fit_metrics, integrate_theta


class SMCOutput(NamedTuple):
    theta: Any            # (N, P) equal-weight posterior particles
    chi: Any              # (N,)
    rsquared: Any         # (N,)
    aic: Any              # (N,)
    log_evidence: float   # log integral of exp(-chi) against the prior
    betas: Any            # tempering schedule actually taken (list)
    acceptance: Any       # per-stage mutation acceptance rates (list)


@partial(jax.jit, static_argnames=(
    "spec", "num_params", "method", "rtol", "atol", "max_steps", "substeps"))
def _metrics_impl(spec, obs, times, y0_base, z, *, num_params, method,
                  rtol, atol, max_steps, substeps):
    def one(zi):
        theta = jnp.exp(zi)
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, method=method,
                             rtol=rtol, atol=atol, max_steps=max_steps,
                             substeps=substeps)
        return fit_metrics(spec, obs, ys, num_params)

    return jax.vmap(one)(z)


@partial(jax.jit, static_argnames=(
    "spec", "n_moves", "prior_logpdf", "num_params", "method", "rtol",
    "atol", "max_steps", "substeps"))
def _stage_impl(spec, obs, times, y0_base, z, chi, rsq, aic, lp, key,
                beta, log_w, chol, walk_mask, *, n_moves, prior_logpdf,
                num_params, method, rtol, atol, max_steps, substeps):
    """One SMC stage: systematic resample by log_w, then n_moves
    covariance-proposal MH sweeps at inverse temperature beta."""
    N, P = z.shape
    key, k_r = jax.random.split(key)

    # systematic resampling: one uniform offset, N strata
    w = jnp.exp(log_w - jnp.max(log_w))
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    cdf = jnp.cumsum(w) / jnp.sum(w)
    u = (jax.random.uniform(k_r, (), dtype=z.dtype)
         + jnp.arange(N, dtype=z.dtype)) / N
    idx = jnp.clip(jnp.searchsorted(cdf, u), 0, N - 1)
    z, chi, rsq, aic, lp = z[idx], chi[idx], rsq[idx], aic[idx], lp[idx]

    def sweep(carry, k):
        z, chi, rsq, aic, lp, acc = carry
        k_eps, k_u = jax.random.split(k)
        eps = jax.random.normal(k_eps, z.shape, z.dtype)
        prop = z + (eps @ chol.T) * walk_mask[None, :]
        chi_n, rsq_n, aic_n = _metrics_impl(
            spec, obs, times, y0_base, prop, num_params=num_params,
            method=method, rtol=rtol, atol=atol, max_steps=max_steps,
            substeps=substeps)
        lp_n = jax.vmap(lambda zi: prior_logpdf(jnp.exp(zi)))(prop)
        log_r = beta * (chi - chi_n) + (lp_n - lp)
        u = jax.random.uniform(k_u, (N,), dtype=chi.dtype)
        ok = jnp.exp(log_r) > u        # NaN -> False
        z = jnp.where(ok[:, None], prop, z)
        chi = jnp.where(ok, chi_n, chi)
        rsq = jnp.where(ok, rsq_n, rsq)
        aic = jnp.where(ok, aic_n, aic)
        lp = jnp.where(ok, lp_n, lp)
        return (z, chi, rsq, aic, lp, acc + jnp.mean(ok)), None

    keys = jax.random.split(key, n_moves)
    (z, chi, rsq, aic, lp, acc), _ = jax.lax.scan(
        sweep, (z, chi, rsq, aic, lp, jnp.zeros((), z.dtype)), keys)
    return z, chi, rsq, aic, lp, acc / n_moves


def _next_beta(chi: np.ndarray, beta: float, ess_target: float) -> float:
    """Largest beta' <= 1 whose incremental weights keep
    ESS >= ess_target * N, by bisection on the host (no solves)."""
    finite = np.isfinite(chi)
    chi_f = np.where(finite, chi, np.inf)

    def ess_frac(b):
        lw = -(b - beta) * chi_f
        lw = lw - lw.max()
        w = np.exp(lw)
        s = w.sum()
        if s <= 0:
            return 0.0
        return (s ** 2 / (w ** 2).sum()) / len(chi)

    if ess_frac(1.0) >= ess_target:
        return 1.0
    lo, hi = beta, 1.0
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if ess_frac(mid) >= ess_target:
            lo = mid
        else:
            hi = mid
    return max(lo, np.nextafter(beta, 1.0))


def smc_sample(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, key, *,
        prior_logpdf, n_moves: int = 5, ess_target: float = 0.5,
        walk_mask=None, max_stages: int = 60, scale: Optional[float] = None,
        method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
        max_steps: int = 4096, substeps=4) -> SMCOutput:
    """Anneal N prior-drawn particles to the posterior; returns equal-weight
    posterior particles and the log evidence.

    Parameters
    ----------
    theta0 : (N, P) particles drawn from the PRIOR — the beta=0 target.
        The evidence estimate is only meaningful if these are genuine
        prior draws (LHS draws through the prior ppf qualify).
    prior_logpdf : theta -> scalar log prior density over log-theta space
        (the same convention the MH samplers use with ``use_priors=True``).
        Required: tempering interpolates between this prior and the
        posterior.
    n_moves : MH rejuvenation sweeps per stage (each sweep = N solves).
    ess_target : relative ESS the adaptive schedule maintains (0 < t < 1).
    scale : proposal scale multiplier on the particle-covariance Cholesky;
        default 2.38/sqrt(d_walked) (Roberts-Rosenthal optimal scaling).

    Notes
    -----
    ``log_evidence`` estimates ``log ∫ exp(-chi(z)) prior(z) dz`` over
    log-theta — the normalizer of the same unnormalized posterior every
    sampler in this package targets. Bayes factors between two models
    fitted to the SAME data are ``exp(logZ_1 - logZ_2)``.
    """
    if not 0.0 < ess_target < 1.0:
        raise ValueError(f"ess_target must be in (0, 1), got {ess_target}")
    if prior_logpdf is None:
        raise ValueError("smc_sample requires prior_logpdf (the beta=0 "
                         "target is the prior)")
    theta0 = jnp.atleast_2d(theta0)
    N, P = theta0.shape
    if N < 8:
        raise ValueError(f"SMC needs a real population, got N={N}")
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    n_walked = int(jnp.count_nonzero(walk_mask))
    if scale is None:
        scale = 2.38 / np.sqrt(max(n_walked, 1))
    num_params = int(jnp.count_nonzero(theta0[0]))
    ikw = dict(num_params=num_params, method=method, rtol=float(rtol),
               atol=float(atol), max_steps=int(max_steps),
               substeps=substeps if isinstance(substeps, tuple)
               else int(substeps))

    z = jnp.log(theta0)
    chi, rsq, aic = _metrics_impl(spec, obs, times, y0_base, z, **ikw)
    lp = jax.vmap(lambda zi: prior_logpdf(jnp.exp(zi)))(z)

    beta = 0.0
    log_Z = 0.0
    betas, accs = [0.0], []
    for _ in range(int(max_stages)):
        chi_h = np.asarray(chi, np.float64)
        n_fin = int(np.isfinite(chi_h).sum())
        if n_fin < 8:
            # fail like MCMC's pre-survey does, not deep in LAPACK with
            # an all-NaN particle covariance / NaN evidence
            raise ValueError(
                f"SMC population collapsed: only {n_fin}/{N} particles "
                f"have finite chi at beta={beta:.4f}. Try: \n"
                " 1. Narrower/better-centred priors \n"
                " 2. More particles \n"
                " 3. A stiffer solver method for this model")
        new_beta = _next_beta(chi_h, beta, float(ess_target))
        d = new_beta - beta
        # evidence increment: log mean of incremental weights (equal
        # weights at stage start — we resample every stage)
        lw = np.where(np.isfinite(chi_h), -d * chi_h, -np.inf)
        m = lw.max()
        log_Z += m + np.log(np.mean(np.exp(lw - m)))

        # proposal geometry from the current population (host, O(N P^2))
        z_h = np.asarray(z, np.float64)
        cov = np.cov(z_h[np.isfinite(chi_h)], rowvar=False).reshape(P, P)
        cov = cov + 1e-10 * np.eye(P)
        chol = jnp.asarray(float(scale) * np.linalg.cholesky(cov),
                           theta0.dtype)

        key, k_stage = jax.random.split(key)
        z, chi, rsq, aic, lp, acc = _stage_impl(
            spec, obs, times, y0_base, z, chi, rsq, aic, lp, k_stage,
            jnp.asarray(new_beta, theta0.dtype), jnp.asarray(lw, theta0.dtype),
            chol, walk_mask, n_moves=int(n_moves),
            prior_logpdf=prior_logpdf, **ikw)
        betas.append(float(new_beta))
        accs.append(float(acc))
        beta = new_beta
        if beta >= 1.0:
            break
    else:
        import warnings
        warnings.warn(f"SMC hit max_stages={max_stages} at beta={beta:.4f} "
                      "< 1; evidence estimate is for the tempered target")

    return SMCOutput(theta=jnp.exp(z), chi=chi, rsquared=rsq, aic=aic,
                     log_evidence=float(log_Z), betas=betas,
                     acceptance=accs)
