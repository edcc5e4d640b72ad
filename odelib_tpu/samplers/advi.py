"""Automatic Differentiation Variational Inference (ADVI) through the
ODE solve.

A fast, deterministic alternative to MCMC for the posterior the samplers
target: fit a Gaussian ``q(z)`` (mean-field diagonal or full-rank
Cholesky) to the log-parameter posterior by maximizing the
reparameterized ELBO with Adam — the Monte-Carlo expectation vmapped
over draws, gradients flowing through the fixed-step solve, one jitted
XLA program (Kucukelbir et al. 2017, "Automatic Differentiation
Variational Inference", JMLR 18).

Convention: matches the MH samplers exactly. Chains walk ``z = log
theta`` with a symmetric proposal and accept on ``exp(-chi) [*
prior_theta(theta)]`` (samplers/mh.py, mirroring the reference's
lognormal rwalk, ``/root/reference/ODElib/Framework.py:107-122`` +
``Statistics/Samplers.py:124-127``), so their stationary density over z
is ``pi(z) ∝ exp(-chi(e^z)) [* prior_theta(e^z)]`` — ADVI optimizes
``q(z)`` against that same log-density, and its posterior is directly
comparable to the MCMC posterior in log-parameter space.

Static parameters and zero-template entries of array parameters are
pinned (excluded from the variational family), like the samplers' walk
mask. Non-finite ELBO gradients (a diverged solve in one MC draw) zero
the step — the framework's NaN-tolerant failure model — and the best
iterate seen is tracked so a late divergence cannot lose the fit.

No reference counterpart: the reference's only inference engine is
random-walk MH (``Statistics/Samplers.py:53-174``).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..model import ModelSpec, ObsData, fit_metrics, integrate_theta


class ADVIResult(NamedTuple):
    mu: Any          # (F,) variational mean over the FREE z dims
    L: Any           # (F, F) Cholesky factor of q's covariance
    elbo: Any        # (steps,) per-step MC ELBO estimate
    theta: Any       # (draws, P) posterior draws, linear space, full layout
    chi: Any         # (draws,) chi of each draw
    rsquared: Any    # (draws,)
    aic: Any         # (draws,)
    free_idx: Any    # (F,) flat-theta indices of the free dims
    converged: Any   # bool: best ELBO finite and tail-stable
    logw: Any        # (draws,) unnormalized log importance weights
                     # log p(z) - log q(z): PSIS-smooth to diagnose
                     # (khat) and correct the Gaussian approximation


@partial(jax.jit, static_argnames=(
    "spec", "F", "steps", "learning_rate", "n_mc", "full_rank",
    "use_priors", "prior_logpdf", "num_params", "method", "substeps",
    "draws"))
def _advi_impl(spec, obs, times, y0_base, z0_full, free_idx, key, *,
               F, steps, learning_rate, n_mc, full_rank, use_priors,
               prior_logpdf, num_params, method, substeps, draws):
    ikw = dict(method=method, substeps=substeps)

    def metrics_of(theta):
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, **ikw)
        return fit_metrics(spec, obs, ys, num_params)

    def logp_of(theta):
        lp = -metrics_of(theta)[0]
        if use_priors:
            lp = lp + prior_logpdf(theta)
        return lp

    prior_of = prior_logpdf if use_priors else None
    return _advi_core(logp_of, metrics_of, prior_of, z0_full, free_idx,
                      key, F=F, steps=steps, learning_rate=learning_rate,
                      n_mc=n_mc, full_rank=full_rank, draws=draws)


@partial(jax.jit, static_argnames=(
    "chi_fn", "F", "steps", "learning_rate", "n_mc", "full_rank",
    "use_priors", "prior_logpdf", "draws"))
def _advi_custom_impl(chi_fn, z0_full, free_idx, key, *, F, steps,
                      learning_rate, n_mc, full_rank, use_priors,
                      prior_logpdf, draws):
    """ADVI against an arbitrary chi(theta) closure (hashed by identity —
    cache the closure, e.g. on the JointFit instance, to reuse the jit).
    rsquared/aic are reported as NaN (no single-experiment metrics)."""
    nan = jnp.full((), jnp.nan, z0_full.dtype)

    def metrics_of(theta):
        return chi_fn(theta), nan, nan

    def logp_of(theta):
        lp = -chi_fn(theta)
        if use_priors:
            lp = lp + prior_logpdf(theta)
        return lp

    prior_of = prior_logpdf if use_priors else None
    return _advi_core(logp_of, metrics_of, prior_of, z0_full, free_idx,
                      key, F=F, steps=steps, learning_rate=learning_rate,
                      n_mc=n_mc, full_rank=full_rank, draws=draws)


def _advi_core(logp_of, metrics_of, prior_of, z0_full, free_idx, key, *,
               F, steps, learning_rate, n_mc, full_rank, draws):
    """Shared ELBO-ascent core (runs inside an enclosing jit).
    ``logp_of``/``metrics_of``/``prior_of`` take theta in LINEAR space
    (``prior_of`` may be None)."""
    dtype = z0_full.dtype

    def logp_free(z_free):
        return logp_of(jnp.exp(z0_full.at[free_idx].set(z_free)))

    # variational parameters lam:
    #   mean-field: [mu (F), log_sigma (F)]
    #   full-rank:  [mu (F), tril entries (F*(F+1)//2), diag stored as log]
    tril_r, tril_c = jnp.tril_indices(F)

    def unpack(lam):
        mu = lam[:F]
        if full_rank:
            L = jnp.zeros((F, F), dtype).at[tril_r, tril_c].set(lam[F:])
            raw_diag = jnp.diagonal(L)
            L = L.at[jnp.diag_indices(F)].set(jnp.exp(raw_diag))
            return mu, L, jnp.sum(raw_diag)
        log_sig = lam[F:]
        return mu, jnp.diag(jnp.exp(log_sig)), jnp.sum(log_sig)

    half_log_2pie = 0.5 * (1.0 + jnp.log(2.0 * jnp.pi))

    def elbo_of(lam, k, n):
        mu, L, logdet = unpack(lam)
        eps = jax.random.normal(k, (n, F), dtype)
        zs = mu[None, :] + eps @ L.T
        lps = jax.vmap(logp_free)(zs)
        entropy = F * half_log_2pie + logdet
        return jnp.mean(lps) + entropy

    elbo_grad = jax.value_and_grad(lambda lam, k: elbo_of(lam, k, n_mc))

    # Adam (ascent); non-finite gradients zero the step (diverged solve)
    b1, b2, eps_a = 0.9, 0.999, 1e-8
    n_lam = F + (F * (F + 1) // 2 if full_rank else F)
    lam0 = jnp.zeros((n_lam,), dtype)
    lam0 = lam0.at[:F].set(z0_full[free_idx])
    # init scale sigma = 0.1 in z-space: log(0.1) on the (raw) diagonal
    if full_rank:
        diag_pos = F + jnp.cumsum(jnp.arange(1, F + 1)) - 1
        lam0 = lam0.at[diag_pos].set(jnp.log(0.1))
    else:
        lam0 = lam0.at[F:].set(jnp.log(0.1))

    # cosine learning-rate decay (1 -> 0.1) shrinks the stationary Adam
    # jitter; tail iterate-averaging (last quarter) removes the MC noise
    # a single final iterate would carry (standard ADVI practice —
    # argmax over NOISY per-step ELBOs is biased toward high-entropy
    # iterates, so best-iterate is only the divergence fallback)
    tail_start = (3 * steps) // 4
    n_tail = max(1, steps - tail_start)

    def body(carry, i):
        lam, m, v, best_lam, best_e, lam_sum = carry
        e, g = elbo_grad(lam, jax.random.fold_in(key, i))
        # best-iterate tracking: e belongs to the PRE-step lam
        better = jnp.isfinite(e) & (e > best_e)
        best_lam = jnp.where(better, lam, best_lam)
        best_e = jnp.where(better, e, best_e)
        ok = jnp.all(jnp.isfinite(g))
        g = jnp.where(ok, g, 0.0)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1))
        vh = v / (1 - b2 ** (i + 1))
        lr = learning_rate * (
            0.1 + 0.45 * (1.0 + jnp.cos(jnp.pi * i / steps)))
        lam = lam + lr * mh / (jnp.sqrt(vh) + eps_a)
        lam_sum = lam_sum + jnp.where(i >= tail_start, 1.0, 0.0) * lam
        return (lam, m, v, best_lam, best_e, lam_sum), e

    init = (lam0, jnp.zeros_like(lam0), jnp.zeros_like(lam0), lam0,
            jnp.asarray(-jnp.inf, dtype), jnp.zeros_like(lam0))
    (lam, _, _, best_lam, best_e, lam_sum), elbos = jax.lax.scan(
        body, init, jnp.arange(steps))
    lam_avg = lam_sum / n_tail
    # pick tail-average vs best-iterate on a fresh, larger common batch
    n_eval = max(64, 4 * n_mc)
    k_eval = jax.random.fold_in(key, steps + 2)
    e_avg = elbo_of(lam_avg, k_eval, n_eval)
    e_best = elbo_of(best_lam, k_eval, n_eval)
    use_avg = jnp.isfinite(e_avg) & ((e_avg >= e_best)
                                     | ~jnp.isfinite(e_best))
    lam_star = jnp.where(use_avg, lam_avg, best_lam)
    best_e = jnp.where(use_avg, e_avg, e_best)
    mu, L, logdet_star = unpack(lam_star)

    # posterior draws from the fitted q + per-draw fit metrics and log
    # importance weights log p(z) - log q(z): since z = mu + L eps,
    # log q(z) = -||eps||^2/2 - logdet - F/2 log 2pi comes free from eps
    eps = jax.random.normal(jax.random.fold_in(key, steps + 1),
                            (draws, F), dtype)
    z_free = mu[None, :] + eps @ L.T

    def one_draw(zf, eps_row):
        theta = jnp.exp(z0_full.at[free_idx].set(zf))
        chi, rsq, aic = metrics_of(theta)
        lp = -chi
        if prior_of is not None:
            lp = lp + prior_of(theta)
        logq = (-0.5 * jnp.sum(eps_row * eps_row) - logdet_star
                - 0.5 * F * jnp.log(2.0 * jnp.pi))
        return theta, chi, rsq, aic, lp - logq

    theta_d, chi_d, rsq_d, aic_d, logw = jax.vmap(one_draw)(z_free, eps)
    # converged = the ELBO stopped climbing: compare the two halves of
    # the tail window against the MC noise floor (a merely *stable* tail
    # std can coexist with a slow steady climb — seen on the demo
    # posterior, where sigma was still mid-transition at 600 steps)
    q = max(2, steps // 8)
    h1, h2 = elbos[-2 * q:-q], elbos[-q:]
    se = jnp.std(elbos[-2 * q:]) / jnp.sqrt(1.0 * q) + 1e-9
    drift = jnp.mean(h2) - jnp.mean(h1)
    converged = jnp.isfinite(best_e) & (drift < 4.0 * se + 0.1)
    return mu, L, elbos, theta_d, chi_d, rsq_d, aic_d, converged, logw


def advi(spec: ModelSpec, obs: ObsData, times, y0_base, theta_init, *,
         steps: int = 800, learning_rate: float = 0.05, n_mc: int = 8,
         full_rank: bool = True, draws: int = 1000, walk_mask=None,
         prior_logpdf=None, use_priors: bool = False, seed: int = 0,
         method: str = "fixed_dopri5", substeps=4) -> ADVIResult:
    """Fit a Gaussian ``q(z)`` to the log-parameter posterior and sample
    ``draws`` posterior draws from it.

    ``theta_init``: (P,) starting point (linear space) — ideally a MAP /
    min-chi point so the ELBO ascent starts in the posterior bulk.
    ``walk_mask`` pins dims exactly like the MH samplers. Requires a
    fixed-step differentiable integrator (``fixed_dopri5``/``rk4``).
    """
    theta_init = jnp.ravel(jnp.asarray(theta_init))
    P = theta_init.shape[0]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta_init.dtype)
    walk_mask = np.asarray(walk_mask)
    free_idx = np.where(walk_mask != 0)[0]
    F = int(free_idx.size)
    if F == 0:
        raise ValueError("advi: every dimension is masked static")
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    if method not in ("fixed_dopri5", "rk4"):
        raise ValueError("advi requires a fixed-step differentiable "
                         "integrator: 'fixed_dopri5' or 'rk4'")
    num_params = int(np.count_nonzero(np.asarray(theta_init)))
    dtype = jnp.result_type(float)
    mu, L, elbos, theta_d, chi_d, rsq_d, aic_d, conv, logw = _advi_impl(
        spec, obs, jnp.asarray(times, dtype), jnp.asarray(y0_base, dtype),
        jnp.log(jnp.asarray(theta_init, dtype)),
        jnp.asarray(free_idx), jax.random.PRNGKey(seed),
        F=F, steps=int(steps), learning_rate=float(learning_rate),
        n_mc=int(n_mc), full_rank=bool(full_rank),
        use_priors=bool(use_priors), prior_logpdf=prior_logpdf,
        num_params=num_params, method=method,
        substeps=substeps if isinstance(substeps, tuple) else int(substeps),
        draws=int(draws))
    return ADVIResult(mu=mu, L=L, elbo=elbos, theta=theta_d, chi=chi_d,
                      rsquared=rsq_d, aic=aic_d,
                      free_idx=jnp.asarray(free_idx), converged=conv,
                      logw=logw)


def psis_weights(logw):
    """Pareto-smooth the draws' raw log importance weights.

    Returns ``(normalized log-weights, khat)`` — the PSIS diagnostic of
    Yao et al. 2018 ("Yes, but did it work?: Evaluating variational
    inference"): khat < 0.7 means the smoothed weights reliably correct
    q toward the true posterior; above it the approximation failed."""
    from ..utils.model_comparison import _psis_smooth_lw

    logw = np.asarray(logw, float)
    finite = np.isfinite(logw)
    if not finite.any():
        return np.full_like(logw, -np.inf), float("inf")
    safe = np.where(finite, logw, logw[finite].min() - 50.0)
    return _psis_smooth_lw(safe)


def attach_advi_diagnostics(df, res, *, seed, resample=False,
                            label="ADVI"):
    """Shared post-processing behind ``fit_advi`` (single-model and
    joint): PSIS-smooth the draws' importance weights, attach the
    ``df.attrs['advi']`` info dict, optionally importance-RESAMPLE the
    rows, and emit the convergence/khat warnings. Returns
    ``(df, khat)``."""
    import warnings

    lw, khat = psis_weights(np.asarray(res.logw, float))
    info = {
        "elbo": np.asarray(res.elbo),
        "mu": np.asarray(res.mu),
        "L": np.asarray(res.L),
        "free_idx": np.asarray(res.free_idx),
        "converged": bool(res.converged),
        "khat": khat,
        "psis_logw": lw,
    }
    if resample:
        df = df.iloc[resample_indices(lw, int(seed))]
        df = df.reset_index(drop=True)
    df.attrs["advi"] = info
    if not bool(res.converged):
        warnings.warn(f"{label} did not converge (non-finite or unstable "
                      "ELBO tail); inspect df.attrs['advi']['elbo'], "
                      "lower learning_rate or raise steps")
    if khat > 0.7:
        warnings.warn(
            f"{label} khat = {khat:.2f} > 0.7: the Gaussian approximation "
            "is unreliable for this posterior even after importance "
            "correction — use MCMC")
    return df, khat


def resample_indices(logw_norm, seed: int = 0):
    """Systematic resampling indices by normalized log-weights —
    turns weighted q-draws into unweighted draws from the corrected
    posterior."""
    w = np.exp(logw_norm - np.max(logw_norm))
    w = w / w.sum()
    n = len(w)
    rng = np.random.default_rng(seed)
    positions = (np.arange(n) + rng.uniform()) / n
    # cumsum(w)[-1] can land a float ulp below the largest position;
    # clip so the returned indices are always valid row positions.
    return np.minimum(np.searchsorted(np.cumsum(w), positions), n - 1)


def advi_custom(chi_fn, theta_init, *, steps: int = 800,
                learning_rate: float = 0.05, n_mc: int = 8,
                full_rank: bool = True, draws: int = 1000, walk_mask=None,
                prior_logpdf=None, use_priors: bool = False,
                seed: int = 0) -> ADVIResult:
    """ADVI against an arbitrary differentiable ``chi_fn(theta)`` (e.g.
    the summed multi-experiment chi of a :class:`~odelib_tpu.joint.
    JointFit`). Same conventions as :func:`advi`; ``chi_fn`` is a static
    jit argument hashed by IDENTITY — cache the closure to reuse the
    compiled program. rsquared/aic columns come back NaN."""
    theta_init = jnp.ravel(jnp.asarray(theta_init))
    P = theta_init.shape[0]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta_init.dtype)
    walk_mask = np.asarray(walk_mask)
    free_idx = np.where(walk_mask != 0)[0]
    F = int(free_idx.size)
    if F == 0:
        raise ValueError("advi: every dimension is masked static")
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    dtype = jnp.result_type(float)
    (mu, L, elbos, theta_d, chi_d, rsq_d, aic_d, conv,
     logw) = _advi_custom_impl(
        chi_fn, jnp.log(jnp.asarray(theta_init, dtype)),
        jnp.asarray(free_idx), jax.random.PRNGKey(seed),
        F=F, steps=int(steps), learning_rate=float(learning_rate),
        n_mc=int(n_mc), full_rank=bool(full_rank),
        use_priors=bool(use_priors), prior_logpdf=prior_logpdf,
        draws=int(draws))
    return ADVIResult(mu=mu, L=L, elbo=elbos, theta=theta_d, chi=chi_d,
                      rsquared=rsq_d, aic=aic_d,
                      free_idx=jnp.asarray(free_idx), converged=conv,
                      logw=logw)
