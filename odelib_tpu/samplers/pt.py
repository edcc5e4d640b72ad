"""Replica-exchange (parallel tempering) Metropolis-Hastings.

ODE posteriors are frequently multimodal — the two-infected-class demo
model has a near label-swap symmetry between its transition and lysis
rates, and random-walk chains started in one mode essentially never cross
(the reference's only mitigation is starting many independent chains,
``Framework.py:946-1061``). Parallel tempering runs a ladder of K replicas
per chain at increasing temperatures — replica k targets
``exp(-E(z)/T_k)`` with E = chi (or chi - log prior) — and periodically
proposes swaps between adjacent temperatures. Hot replicas roam between
modes; swap moves carry their discoveries down to the T=1 replica, whose
samples are the posterior.

TPU-native shape: the ladder is just one more vectorized axis. The carry
is (K, P) per chain, every replica steps in the same fused ops, and the
swap phase is a parity-alternating disjoint-pair permutation (a gather, no
control flow). ``vmap`` over chains, ``lax.scan`` over iterations — the
whole ensemble (C x K replicas) is one XLA program, sharing the jit cache
conventions of samplers/mh.py.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..model import ModelSpec, ObsData, fit_metrics, integrate_theta
from .mh import MHOutput


class _Carry(NamedTuple):
    log_theta: Any    # (K, P)
    chi: Any          # (K,)
    rsq: Any
    aic: Any
    lp: Any           # (K,) log prior (zeros when unused)
    acc_count: Any    # scalar: T=1 walk acceptances
    swap_count: Any   # scalar: accepted swaps involving T=1
    key: Any


@partial(jax.jit, static_argnames=(
    "spec", "nits", "burnin", "temperatures", "rwalk_std", "prior_logpdf",
    "use_priors", "num_params", "method", "rtol", "atol", "max_steps",
    "substeps", "swap_every"))
def _pt_impl(spec, obs, times, y0_base, theta0, keys, walk_mask, *,
             nits, burnin, temperatures, rwalk_std, prior_logpdf,
             use_priors, num_params, method, rtol, atol, max_steps,
             substeps, swap_every):
    ikw = dict(method=method, rtol=rtol, atol=atol, max_steps=max_steps,
               substeps=substeps)
    temps = jnp.asarray(temperatures, theta0.dtype)
    betas = 1.0 / temps                      # (K,), descending
    K = len(temperatures)
    # wider walks at higher temperature (the flattened target is wider)
    stds = rwalk_std * jnp.sqrt(temps)[:, None]   # (K, 1)

    def metrics(z):
        theta = jnp.exp(z)
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, **ikw)
        return fit_metrics(spec, obs, ys, num_params)

    def energy_terms(z):
        chi, rsq, aic = metrics(z)
        lp = prior_logpdf(jnp.exp(z)) if use_priors else \
            jnp.zeros((), z.dtype)
        return chi, rsq, aic, lp

    batch_metrics = jax.vmap(energy_terms)   # over the K ladder axis

    def step(carry: _Carry, it):
        key, k_eps, k_u, k_s = jax.random.split(carry.key, 4)
        K_, P = carry.log_theta.shape
        eps = jax.random.normal(k_eps, carry.log_theta.shape,
                                carry.log_theta.dtype)
        prop = carry.log_theta + stds * eps * walk_mask[None, :]
        chi_n, rsq_n, aic_n, lp_n = batch_metrics(prop)
        # tempered MH accept per replica: E = chi - lp, target exp(-E/T)
        dE = (carry.chi - chi_n) + (lp_n - carry.lp)
        u = jax.random.uniform(k_u, (K_,), dtype=carry.chi.dtype)
        accept = jnp.exp(dE * betas) > u      # NaN -> False
        log_theta = jnp.where(accept[:, None], prop, carry.log_theta)
        chi = jnp.where(accept, chi_n, carry.chi)
        rsq = jnp.where(accept, rsq_n, carry.rsq)
        aic = jnp.where(accept, aic_n, carry.aic)
        lp = jnp.where(accept, lp_n, carry.lp)

        # swap phase: disjoint adjacent pairs, parity alternates per round
        do_swap = (it % swap_every) == 0
        parity = (it // swap_every) % 2
        E = chi - lp
        k_idx = jnp.arange(K_ - 1)
        pair_on = ((k_idx % 2) == parity) & do_swap
        delta = (betas[:-1] - betas[1:]) * (E[:-1] - E[1:])
        us = jax.random.uniform(k_s, (K_ - 1,), dtype=chi.dtype)
        sflag = (jnp.exp(delta) > us) & pair_on & jnp.isfinite(delta)
        lo = jnp.concatenate([jnp.zeros((1,), bool), sflag])  # swapped down
        hi = jnp.concatenate([sflag, jnp.zeros((1,), bool)])  # swapped up
        perm = jnp.arange(K_) + hi.astype(jnp.int32) - lo.astype(jnp.int32)
        log_theta = log_theta[perm]
        chi, rsq, aic, lp = chi[perm], rsq[perm], aic[perm], lp[perm]

        new = _Carry(
            log_theta=log_theta, chi=chi, rsq=rsq, aic=aic, lp=lp,
            acc_count=carry.acc_count + accept[0].astype(chi.dtype),
            swap_count=carry.swap_count + sflag[0].astype(chi.dtype),
            key=key)
        record = (jnp.exp(log_theta[0]), chi[0], rsq[0], aic[0],
                  new.acc_count / it.astype(new.chi.dtype))
        return new, record

    def one_chain(th0, key):
        z0 = jnp.tile(jnp.log(th0)[None, :], (K, 1))
        chi0, rsq0, aic0, lp0 = batch_metrics(z0)
        carry = _Carry(log_theta=z0, chi=chi0, rsq=rsq0, aic=aic0, lp=lp0,
                       acc_count=jnp.asarray(0.0, th0.dtype),
                       swap_count=jnp.asarray(0.0, th0.dtype), key=key)
        its = jnp.arange(1, nits, dtype=jnp.int32)
        carry, _ = jax.lax.scan(
            lambda c, it: (step(c, it)[0], None), carry, its[:burnin])
        carry, recs = jax.lax.scan(step, carry, its[burnin:])
        swap_rate = carry.swap_count / ((nits - 1) // swap_every + 1e-9)
        return recs, swap_rate

    return jax.vmap(one_chain)(theta0, keys)


def parallel_tempering(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, keys, *,
        temperatures: Tuple[float, ...] = (1.0, 2.0, 4.0, 8.0),
        nits: int = 1000, burnin: Optional[int] = None, swap_every: int = 1,
        walk_mask=None, rwalk_std: float = 0.05,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
        max_steps: int = 4096, substeps=4):
    """Run C tempered ensembles; returns (MHOutput for the T=1 replica,
    per-chain cold-swap acceptance rate (C,)).

    ``temperatures`` must start at 1.0 and increase; each of the C chains
    carries the full ladder (total device work = C * K * solve per
    iteration). Walk std scales with sqrt(T) per rung. Same input/output
    conventions as :func:`~odelib_tpu.samplers.mh.metropolis_hastings`.
    """
    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    temperatures = tuple(float(t) for t in temperatures)
    if len(temperatures) < 2:
        raise ValueError("parallel tempering needs >= 2 temperatures")
    if temperatures[0] != 1.0:
        raise ValueError("temperatures[0] must be 1.0 (the posterior rung)")
    if any(b >= a for b, a in zip(temperatures, temperatures[1:])):
        raise ValueError("temperatures must be strictly increasing")
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    num_params = int(jnp.count_nonzero(theta0[0]))
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")

    recs, swap_rate = _pt_impl(
        spec, obs, times, y0_base, theta0, keys, walk_mask,
        nits=int(nits), burnin=int(burnin), temperatures=temperatures,
        rwalk_std=float(rwalk_std), prior_logpdf=prior_logpdf,
        use_priors=bool(use_priors), num_params=num_params,
        method=method, rtol=float(rtol), atol=float(atol),
        max_steps=int(max_steps),
        substeps=substeps if isinstance(substeps, tuple) else int(substeps),
        swap_every=int(swap_every))
    theta_s, chi_s, rsq_s, aic_s, ar_s = recs
    iterations = jnp.arange(1, nits)[burnin:]
    out = MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                   acceptance_ratio=ar_s, iteration=iterations)
    return out, swap_rate
