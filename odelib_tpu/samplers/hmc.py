"""Hamiltonian Monte Carlo over vmapped chains — gradient-based sampling
the reference cannot offer.

The reference's only sampler is a random-walk Metropolis-Hastings over
scipy ``odeint`` solves (``/root/reference/ODElib/Statistics/
Samplers.py:53-174``); its RHS lives behind a Fortran callback, so
likelihood gradients are unavailable and every proposal is an isotropic
lognormal step. Here the ODE solve is differentiable JAX code
(fixed-step Dopri5 / Kvaerno3, ops/integrate.odeint_fixed — reverse-mode
AD flows through ``lax.scan``), so chains can follow
``-grad chi`` through parameter space: HMC explores the same posterior
with far fewer likelihood evaluations per effective sample, especially as
parameter count grows.

Design notes (all vmap/shard_map-safe, one XLA program per ensemble):

* Sampling happens in z = log(theta): the reference's multiplicative walk
  is symmetric in z, so MH's stationary density is exp(-chi(z)) *in z
  space* — HMC targets the identical density (U(z) = chi(exp(z)), plus
  ``-log prior`` when ``use_priors``), making MH and HMC posteriors
  directly comparable (tests/test_hmc.py).
* Leapfrog with identity mass in z space (log-scaling already normalizes
  parameter magnitudes); static parameters get zero momentum and zero
  gradient through ``walk_mask``.
* Per-chain dual-averaging step-size adaptation (Nesterov 2009, as in
  Stan/NUTS) toward a target acceptance during burn-in; frozen afterward.
* Failures follow the framework's NaN-not-exception model: a non-finite
  Hamiltonian rejects the trajectory and the chain continues.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..model import ModelSpec, ObsData, fit_metrics, integrate_theta
from .mh import MHOutput


class _DualAvg(NamedTuple):
    log_eps: Any      # current log step size
    log_eps_bar: Any  # averaged (reported) log step size
    h_bar: Any        # running acceptance-statistic average
    mu: Any           # shrinkage target (log(10 * eps0))


class _Carry(NamedTuple):
    z: Any            # (P,) log-theta
    u_pot: Any        # potential at z
    chi: Any
    rsq: Any
    aic: Any
    acc_count: Any
    da: _DualAvg
    key: Any


def _leapfrog(grad_u, z, p, eps, n_steps, walk_mask):
    """n_steps leapfrog steps of H = U(z) + |p|^2/2 (identity mass)."""
    def body(_, zp):
        z, p = zp
        p = p - 0.5 * eps * grad_u(z) * walk_mask
        z = z + eps * p * walk_mask
        p = p - 0.5 * eps * grad_u(z) * walk_mask
        return z, p

    return jax.lax.fori_loop(0, n_steps, body, (z, p))


@partial(jax.jit, static_argnames=(
    "spec", "nits", "burnin", "n_leapfrog", "target_accept", "use_priors",
    "prior_logpdf", "num_params", "method", "substeps", "init_step_size"))
def _hmc_impl(spec, obs, times, y0_base, theta0, keys, walk_mask, *,
              nits, burnin, n_leapfrog, target_accept, use_priors,
              prior_logpdf, num_params, method, substeps, init_step_size):
    ikw = dict(method=method, substeps=substeps)
    dtype = theta0.dtype

    def metrics(z):
        theta = jnp.exp(z)
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, **ikw)
        return fit_metrics(spec, obs, ys, num_params)

    def potential(z):
        chi = metrics(z)[0]
        if use_priors:
            chi = chi - prior_logpdf(jnp.exp(z))
        return chi

    grad_u = jax.grad(potential)

    # dual-averaging constants (Stan defaults)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def step(carry: _Carry, it):
        key, k_mom, k_u, k_jit = jax.random.split(carry.key, 4)
        eps = jnp.exp(carry.da.log_eps)
        # jitter trajectory length +-50% to break periodicity
        eps_j = eps * (0.5 + jax.random.uniform(k_jit, dtype=dtype))
        p0 = jax.random.normal(k_mom, carry.z.shape, dtype) * walk_mask
        z1, p1 = _leapfrog(grad_u, carry.z, p0, eps_j, n_leapfrog, walk_mask)

        u1 = potential(z1)
        h0 = carry.u_pot + 0.5 * jnp.sum(p0 * p0)
        h1 = u1 + 0.5 * jnp.sum(p1 * p1)
        log_ratio = h0 - h1
        # NaN Hamiltonian -> alpha 0 -> rejected (failure model 5.3)
        alpha = jnp.where(jnp.isfinite(log_ratio),
                          jnp.minimum(1.0, jnp.exp(log_ratio)), 0.0)
        accept = alpha > jax.random.uniform(k_u, dtype=dtype)

        chi1, rsq1, aic1 = metrics(z1)
        z = jnp.where(accept, z1, carry.z)
        u_pot = jnp.where(accept, u1, carry.u_pot)
        chi = jnp.where(accept, chi1, carry.chi)
        rsq = jnp.where(accept, rsq1, carry.rsq)
        aic = jnp.where(accept, aic1, carry.aic)

        # dual averaging (adapt during burn-in, freeze after)
        da = carry.da
        m = it  # 1-based adaptation step
        eta = 1.0 / (m + t0)
        h_bar = (1.0 - eta) * da.h_bar + eta * (target_accept - alpha)
        log_eps = da.mu - jnp.sqrt(m) / gamma * h_bar
        w = m ** (-kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * da.log_eps_bar
        adapting = it <= burnin
        da = _DualAvg(
            log_eps=jnp.where(adapting, log_eps, da.log_eps),
            log_eps_bar=jnp.where(adapting, log_eps_bar, da.log_eps_bar),
            h_bar=jnp.where(adapting, h_bar, da.h_bar),
            mu=da.mu)
        # at the end of warmup, switch to the averaged step size
        switch = it == burnin
        da = da._replace(log_eps=jnp.where(switch, da.log_eps_bar,
                                           da.log_eps))

        new = _Carry(z=z, u_pot=u_pot, chi=chi, rsq=rsq, aic=aic,
                     acc_count=carry.acc_count + accept.astype(dtype),
                     da=da, key=key)
        record = (jnp.exp(z), chi, rsq, aic, new.acc_count / it)
        return new, record

    def one_chain(th0, key):
        z0 = jnp.log(th0)
        chi0, rsq0, aic0 = metrics(z0)
        u0 = potential(z0)
        le0 = jnp.log(jnp.asarray(init_step_size, dtype))
        da0 = _DualAvg(log_eps=le0, log_eps_bar=le0,
                       h_bar=jnp.asarray(0.0, dtype),
                       mu=jnp.log(10.0 * jnp.asarray(init_step_size, dtype)))
        carry = _Carry(z=z0, u_pot=u0, chi=chi0, rsq=rsq0, aic=aic0,
                       acc_count=jnp.asarray(0.0, dtype), da=da0, key=key)
        its = jnp.arange(1, nits, dtype=dtype)
        carry, _ = jax.lax.scan(
            lambda c, it: (step(c, it)[0], None), carry, its[:burnin])
        carry, recs = jax.lax.scan(step, carry, its[burnin:])
        return recs

    return jax.vmap(one_chain)(theta0, keys)


def hamiltonian_mc(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, keys, *,
        nits: int = 1000, burnin: Optional[int] = None,
        n_leapfrog: int = 8, step_size: float = 0.02,
        target_accept: float = 0.8, walk_mask=None,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "fixed_dopri5", substeps=4) -> MHOutput:
    """Run C independent HMC chains as one jitted device program.

    Same input/output contract as :func:`~odelib_tpu.samplers.mh.
    metropolis_hastings` (theta0 (C, P), per-chain keys; returns
    :class:`MHOutput`), so posteriors drop into the same DataFrame
    pipeline. The integrator must be a fixed-step method — reverse-mode AD
    does not support the adaptive ``while_loop`` — which is exactly what
    the calibrated schedules from :mod:`odelib_tpu.ops.schedule` are for.

    ``burnin`` doubles as the step-size adaptation window (dual averaging
    toward ``target_accept``), mirroring Stan's warmup convention.
    """
    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    if method not in ("fixed_dopri5", "rk4"):
        raise ValueError(
            "HMC requires a fixed-step differentiable integrator: "
            "method='fixed_dopri5' or 'rk4' (adaptive while_loop solvers "
            "are not reverse-mode differentiable)")
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    num_params = int(jnp.count_nonzero(theta0[0]))
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")

    theta_s, chi_s, rsq_s, aic_s, ar_s = _hmc_impl(
        spec, obs, times, y0_base, theta0, keys, walk_mask,
        nits=int(nits), burnin=int(burnin), n_leapfrog=int(n_leapfrog),
        target_accept=float(target_accept), use_priors=bool(use_priors),
        prior_logpdf=prior_logpdf, num_params=num_params, method=method,
        substeps=substeps if isinstance(substeps, tuple) else int(substeps),
        init_step_size=float(step_size))
    iterations = jnp.arange(1, nits)[burnin:]
    return MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                    acceptance_ratio=ar_s, iteration=iterations)
