"""Adaptive Metropolis: per-chain proposal-covariance adaptation (Haario).

The reference's random walk proposes isotropically with a fixed 0.05
lognormal std on every parameter (``/root/reference/ODElib/Framework.py:
107-122``) — on correlated posteriors (the demo's phi-beta ridge) that
wastes almost every proposal across the ridge. Adaptive Metropolis learns
the posterior covariance DURING burn-in from the chain's own history
(Welford running moments in the scan carry) and proposes from
``N(0, 2.38^2/d * Sigma)`` — the Roberts-Rosenthal optimal scaling.
Adaptation freezes at the end of burn-in, so the recorded phase is a
genuine fixed-kernel Markov chain and the stationary distribution is
exact (no diminishing-adaptation argument needed).

TPU-native shape: identical to samplers/mh.py — ``lax.scan`` over
iterations, ``vmap`` over chains — with a (P, P) covariance and its
per-iteration Cholesky riding in the carry (P is tiny; the factorization
is noise next to the ODE solve). Sampling space/target conventions match
mh.py exactly.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..model import ModelSpec, ObsData, fit_metrics, integrate_theta
from .mh import MHOutput


class _Carry(NamedTuple):
    log_theta: Any    # (P,)
    chi: Any
    rsq: Any
    aic: Any
    acc_count: Any
    key: Any
    mean: Any         # (P,) running mean of log_theta
    M2: Any           # (P, P) running sum of outer deviations (Welford)
    n: Any            # scalar sample count


@partial(jax.jit, static_argnames=(
    "spec", "nits", "burnin", "rwalk_std", "prior_logpdf", "use_priors",
    "num_params", "n_walked", "adapt_start", "method", "rtol", "atol",
    "max_steps", "substeps"))
def _amh_impl(spec, obs, times, y0_base, theta0, keys, walk_mask, *,
              nits, burnin, rwalk_std, prior_logpdf, use_priors,
              num_params, n_walked, adapt_start, method, rtol, atol,
              max_steps, substeps):
    ikw = dict(method=method, rtol=rtol, atol=atol, max_steps=max_steps,
               substeps=substeps)
    P = theta0.shape[-1]
    s_d = 2.38 ** 2 / max(n_walked, 1)
    eye = jnp.eye(P, dtype=theta0.dtype)

    def proposal_chol(carry):
        """Cholesky of the scaled adapted covariance, falling back to the
        isotropic rwalk_std walk until enough history has accumulated.

        The regularization floor is (0.1 * rwalk_std)^2 I, not a token
        epsilon: a chain that rejects every warm-up proposal has M2 == 0,
        and with a tiny epsilon the adapted walk would collapse to
        ~sqrt(eps) steps it can never grow back from (micro-moves feed
        only micro-variance into M2). A floor proportional to the
        isotropic scale keeps collapse recoverable (Haario's eps*I)."""
        cov = carry.M2 / jnp.maximum(carry.n - 1.0, 1.0)
        cov = s_d * cov + (0.1 * rwalk_std) ** 2 * eye
        use_adapt = carry.n > adapt_start
        safe = jnp.where(use_adapt, cov, eye)
        L = jnp.linalg.cholesky(safe)
        ok = use_adapt & jnp.all(jnp.isfinite(L))
        return jnp.where(ok, L, rwalk_std * eye)

    def step_fn(adapting):
        def step(carry: _Carry, it):
            key, k_eps, k_u = jax.random.split(carry.key, 3)
            L = proposal_chol(carry)
            eps = L @ jax.random.normal(k_eps, (P,), carry.log_theta.dtype)
            prop = carry.log_theta + eps * walk_mask
            theta = jnp.exp(prop)
            y0 = spec.override_inits(y0_base, theta)
            ys = integrate_theta(spec, theta, y0, times, **ikw)
            chi_n, rsq_n, aic_n = fit_metrics(spec, obs, ys, num_params)
            log_ratio = carry.chi - chi_n
            if use_priors:
                log_ratio = log_ratio + (
                    prior_logpdf(theta)
                    - prior_logpdf(jnp.exp(carry.log_theta)))
            u = jax.random.uniform(k_u, dtype=carry.chi.dtype)
            accept = jnp.exp(log_ratio) > u     # NaN -> False
            z = jnp.where(accept, prop, carry.log_theta)
            if adapting:
                n = carry.n + 1.0
                # masked dims (static params; zero-template entries of
                # array params sit at log(0) = -inf) are excluded from the
                # covariance history — -inf would NaN-poison M2
                zm = jnp.where(walk_mask > 0, z, 0.0)
                d = zm - carry.mean
                mean = carry.mean + d / n
                M2 = carry.M2 + jnp.outer(d, zm - mean)
            else:
                n, mean, M2 = carry.n, carry.mean, carry.M2
            new = _Carry(
                log_theta=z,
                chi=jnp.where(accept, chi_n, carry.chi),
                rsq=jnp.where(accept, rsq_n, carry.rsq),
                aic=jnp.where(accept, aic_n, carry.aic),
                acc_count=carry.acc_count
                + accept.astype(carry.acc_count.dtype),
                key=key, mean=mean, M2=M2, n=n)
            record = (jnp.exp(new.log_theta), new.chi, new.rsq, new.aic,
                      new.acc_count / it.astype(new.chi.dtype))
            return new, record
        return step

    def one_chain(th0, key):
        y0 = spec.override_inits(y0_base, th0)
        ys = integrate_theta(spec, th0, y0, times, **ikw)
        chi0, rsq0, aic0 = fit_metrics(spec, obs, ys, num_params)
        z0 = jnp.log(th0)
        carry = _Carry(log_theta=z0, chi=chi0, rsq=rsq0, aic=aic0,
                       acc_count=jnp.asarray(0.0, th0.dtype), key=key,
                       mean=jnp.where(walk_mask > 0, z0, 0.0),
                       M2=jnp.zeros((P, P), th0.dtype),
                       n=jnp.asarray(0.0, th0.dtype))
        its = jnp.arange(1, nits, dtype=jnp.int32)
        # adaptation runs only during burn-in; the recorded phase uses the
        # frozen covariance (exact Markov kernel)
        carry, _ = jax.lax.scan(
            lambda c, it: (step_fn(True)(c, it)[0], None),
            carry, its[:burnin])
        carry, recs = jax.lax.scan(step_fn(False), carry, its[burnin:])
        return recs

    return jax.vmap(one_chain)(theta0, keys)


def adaptive_metropolis(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, keys, *,
        nits: int = 1000, burnin: Optional[int] = None,
        walk_mask=None, rwalk_std: float = 0.05, adapt_start: int = 50,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
        max_steps: int = 4096, substeps=4) -> MHOutput:
    """Run C independent adaptive-Metropolis chains (one jitted program).

    Same conventions as :func:`~odelib_tpu.samplers.mh.metropolis_hastings`
    plus ``adapt_start``: iterations of isotropic warm-up before the
    adapted covariance takes over (it needs history to be positive
    definite). ``burnin`` should comfortably exceed ``adapt_start``.
    """
    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    num_params = int(jnp.count_nonzero(theta0[0]))
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    theta_s, chi_s, rsq_s, aic_s, ar_s = _amh_impl(
        spec, obs, times, y0_base, theta0, keys, walk_mask,
        nits=int(nits), burnin=int(burnin), rwalk_std=float(rwalk_std),
        prior_logpdf=prior_logpdf, use_priors=bool(use_priors),
        num_params=num_params,
        n_walked=int(jnp.count_nonzero(walk_mask)),
        adapt_start=int(adapt_start),
        method=method, rtol=float(rtol), atol=float(atol),
        max_steps=int(max_steps),
        substeps=substeps if isinstance(substeps, tuple) else int(substeps))
    iterations = jnp.arange(1, nits)[burnin:]
    return MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                    acceptance_ratio=ar_s, iteration=iterations)
