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
* CROSS-CHAIN warmup adaptation (the ensemble IS the metric estimator —
  the accelerator-native recipe of Hoffman et al.'s ChEES/MEADS line):
  the diagonal mass matrix is the variance of z ACROSS the C vmapped
  chains, refreshed every warmup iteration, and the step size is one
  shared scalar dual-averaged against the MEAN acceptance statistic.
  Per-chain history adaptation (the Stan recipe) needs long windows
  before its variance estimate is usable and deadlocks when the chain
  starts stuck — short moves -> tiny variance estimate -> shorter
  moves. The cross-chain estimate is informative from iteration one
  (chains are seeded overdispersed from the fit survey, so it starts as
  an over-estimate and anneals down — the safe direction). Both mass and
  step size freeze at the end of burn-in, so the recorded phase is exact
  MCMC.
* Leapfrog uses the diagonal metric: p ~ N(0, M), kinetic p^T M^-1 p / 2,
  z += eps * M^-1 * p; trajectory lengths are jittered per chain +-50%
  to break periodicity. Static parameters get zero momentum and zero
  gradient through ``walk_mask``.
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
    log_eps: Any      # current log step size (scalar, shared)
    log_eps_bar: Any  # averaged (reported) log step size
    h_bar: Any        # running acceptance-statistic average
    mu: Any           # shrinkage target (log(10 * eps0))


class _Carry(NamedTuple):
    z: Any            # (C, P) log-theta
    u_pot: Any        # (C,) potential at z
    chi: Any          # (C,)
    rsq: Any
    aic: Any
    g: Any            # (C, P) cached grad U at z (reused next iteration)
    acc_count: Any    # (C,)
    da: _DualAvg
    mass_inv: Any     # (P,) shared diagonal inverse mass (= var_chains(z))
    key: Any


def _leapfrog(vag_u, z, p, g, eps, n_steps, walk_mask, mass_inv):
    """n_steps leapfrog steps of H = U(z) + p^T M^-1 p / 2 (diag M).

    z, p, g: (C, P); eps: (C, 1) per-chain jittered step; mass_inv: (P,).
    ``vag_u`` is value_and_grad WITH AUX, so the single gradient solve per
    step also yields the endpoint's potential and fit metrics — the
    textbook n+1-gradient-evaluations leapfrog (the incoming gradient ``g``
    is cached from the previous iteration's endpoint), with NO separate
    scoring solve anywhere in the sampler. A naive two-kicks-per-step
    implementation costs 2n gradient solves plus a scoring solve: ~2.3x
    this one (measured on the 7-parameter bench workload).

    where() not *mask on the gradient: masked dims of array params sit at
    log(0) = -inf where grad can be NaN, and NaN*0 = NaN.
    """
    def masked(v):
        return jnp.where(walk_mask > 0, v, 0.0)

    def body(_, zpg):
        z, p, g, _u, _aux = zpg
        p = p - masked(0.5 * eps * g)
        z = z + masked(eps * mass_inv * p)
        (u, aux), g = vag_u(z)
        p = p - masked(0.5 * eps * g)
        return z, p, g, u, aux

    dtype = z.dtype
    C = z.shape[0]
    zero = jnp.zeros((C,), dtype)
    return jax.lax.fori_loop(0, n_steps, body,
                             (z, p, g, zero, (zero, zero, zero)))


@partial(jax.jit, static_argnames=(
    "spec", "nits", "burnin", "n_leapfrog", "target_accept", "use_priors",
    "prior_logpdf", "num_params", "method", "substeps", "init_step_size",
    "mass_adapt"))
def _hmc_impl(spec, obs, times, y0_base, theta0, keys, walk_mask, *,
              nits, burnin, n_leapfrog, target_accept, use_priors,
              prior_logpdf, num_params, method, substeps, init_step_size,
              mass_adapt):
    ikw = dict(method=method, substeps=substeps)
    dtype = theta0.dtype
    C = theta0.shape[0]

    def potential1(z):
        """U(z) with the fit metrics as aux — one solve serves gradient,
        Hamiltonian and posterior record alike."""
        theta = jnp.exp(z)
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, **ikw)
        chi, rsq, aic = fit_metrics(spec, obs, ys, num_params)
        u = chi
        if use_priors:
            u = u - prior_logpdf(theta)
        return u, (chi, rsq, aic)

    vag_u = jax.vmap(jax.value_and_grad(potential1, has_aux=True))

    # dual-averaging constants (Stan defaults)
    gamma, t0, kappa = 0.05, 10.0, 0.75
    warm0 = min(10, max(burnin // 4, 1))  # mass refresh starts here

    def cross_chain_mass(z, mass_inv):
        var = jnp.var(z, axis=0)          # (P,) across the chain batch
        ok = (var > 1e-10) & jnp.isfinite(var) & (walk_mask > 0)
        return jnp.where(ok, var, mass_inv)

    def step(carry: _Carry, it):
        key, k_mom, k_u, k_jit = jax.random.split(carry.key, 4)
        eps = jnp.exp(carry.da.log_eps)
        # jitter trajectory length per chain +-50% to break periodicity
        eps_j = eps * (0.5 + jax.random.uniform(k_jit, (C, 1), dtype))
        sigma_p = jax.lax.rsqrt(carry.mass_inv)
        p0 = jax.random.normal(k_mom, carry.z.shape, dtype) \
            * sigma_p * walk_mask
        z1, p1, g1, u1, (chi1, rsq1, aic1) = _leapfrog(
            vag_u, carry.z, p0, carry.g, eps_j, n_leapfrog,
            walk_mask, carry.mass_inv)

        kin = lambda p: 0.5 * jnp.sum(p * p * carry.mass_inv, axis=-1)
        log_ratio = (carry.u_pot + kin(p0)) - (u1 + kin(p1))
        # NaN Hamiltonian -> alpha 0 -> rejected (failure model 5.3)
        alpha = jnp.where(jnp.isfinite(log_ratio),
                          jnp.minimum(1.0, jnp.exp(log_ratio)), 0.0)
        accept = alpha > jax.random.uniform(k_u, (C,), dtype)

        acc_col = accept[:, None]
        z = jnp.where(acc_col, z1, carry.z)
        # a NaN endpoint gradient must not leak into the cached g of a
        # REJECTED move (the next trajectory starts from the old z)
        g = jnp.where(acc_col, jnp.where(jnp.isfinite(g1), g1, 0.0),
                      carry.g)
        u_pot = jnp.where(accept, u1, carry.u_pot)
        chi = jnp.where(accept, chi1, carry.chi)
        rsq = jnp.where(accept, rsq1, carry.rsq)
        aic = jnp.where(accept, aic1, carry.aic)

        adapting = it <= burnin
        # shared mass matrix from the chain batch, refreshed every warmup
        # iteration (frozen outside warmup)
        mass_inv = carry.mass_inv
        if mass_adapt:
            mass_inv = jnp.where(adapting & (it >= warm0),
                                 cross_chain_mass(z, mass_inv), mass_inv)

        # shared dual averaging on the mean acceptance statistic
        da = carry.da
        m = it
        eta = 1.0 / (m + t0)
        h_bar = (1.0 - eta) * da.h_bar \
            + eta * (target_accept - jnp.mean(alpha))
        log_eps = da.mu - jnp.sqrt(m) / gamma * h_bar
        w = m ** (-kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * da.log_eps_bar
        da = _DualAvg(
            log_eps=jnp.where(adapting, log_eps, da.log_eps),
            log_eps_bar=jnp.where(adapting, log_eps_bar, da.log_eps_bar),
            h_bar=jnp.where(adapting, h_bar, da.h_bar),
            mu=da.mu)
        # at the end of warmup, switch to the averaged step size
        switch = it == burnin
        da = da._replace(log_eps=jnp.where(switch, da.log_eps_bar,
                                           da.log_eps))

        new = _Carry(z=z, u_pot=u_pot, chi=chi, rsq=rsq, aic=aic, g=g,
                     acc_count=carry.acc_count + accept.astype(dtype),
                     da=da, mass_inv=mass_inv, key=key)
        record = (jnp.exp(z), chi, rsq, aic, new.acc_count / it)
        return new, record

    z0 = jnp.log(theta0)
    (u0, (chi0, rsq0, aic0)), g0 = vag_u(z0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
    le0 = jnp.log(jnp.asarray(init_step_size, dtype))
    da0 = _DualAvg(log_eps=le0, log_eps_bar=le0,
                   h_bar=jnp.asarray(0.0, dtype),
                   mu=jnp.log(10.0 * jnp.asarray(init_step_size, dtype)))
    mass0 = jnp.ones((theta0.shape[-1],), dtype)
    if mass_adapt:
        mass0 = cross_chain_mass(z0, mass0)
    carry = _Carry(z=z0, u_pot=u0, chi=chi0, rsq=rsq0, aic=aic0, g=g0,
                   acc_count=jnp.zeros((C,), dtype), da=da0,
                   mass_inv=mass0, key=keys[0])
    its = jnp.arange(1, nits, dtype=dtype)
    carry, _ = jax.lax.scan(
        lambda c, it: (step(c, it)[0], None), carry, its[:burnin])
    carry, recs = jax.lax.scan(step, carry, its[burnin:])
    # scan stacks on the leading (record) axis: (R, C, ...) -> (C, R, ...)
    th_s, chi_s, rsq_s, aic_s, ar_s = recs
    return (jnp.swapaxes(th_s, 0, 1), jnp.swapaxes(chi_s, 0, 1),
            jnp.swapaxes(rsq_s, 0, 1), jnp.swapaxes(aic_s, 0, 1),
            jnp.swapaxes(ar_s, 0, 1))


def hamiltonian_mc(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, keys, *,
        nits: int = 1000, burnin: Optional[int] = None,
        n_leapfrog: int = 4, step_size: float = 0.02,
        target_accept: float = 0.65, walk_mask=None,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "fixed_dopri5", substeps=4,
        mass_adapt: bool = True) -> MHOutput:
    """Run C interacting-warmup HMC chains as one jitted device program.

    Same input/output contract as :func:`~odelib_tpu.samplers.mh.
    metropolis_hastings` (theta0 (C, P), per-chain keys; returns
    :class:`MHOutput`), so posteriors drop into the same DataFrame
    pipeline. The integrator must be a fixed-step method — reverse-mode AD
    does not support the adaptive ``while_loop`` — which is exactly what
    the calibrated schedules from :mod:`odelib_tpu.ops.schedule` are for.

    ``burnin`` is the warmup window: the shared diagonal mass matrix is
    refreshed every warmup iteration from the CROSS-CHAIN variance of z
    (``mass_adapt=True``, default) while the shared step size is
    dual-averaged toward ``target_accept`` on the mean acceptance; both
    freeze at the end of burn-in, so recorded samples are exact MCMC.
    Seed the chains overdispersed (the MCMC() fit-survey seeding does)
    for a sound initial variance estimate.

    When to prefer HMC over the random-walk backends: several
    correlated, jointly-identified parameters where MH's isotropic 5%
    steps stall. Measured on the demo's own hardest shape (`one_i` +
    summation + three `<sname>0` init-parameters = 7 correlated dims,
    BENCH_SUITE.json config 7b): ~30x MH's ESS/sec at the defaults
    (n_leapfrog=4, target_accept=0.65 — the fixed-length-HMC optimum,
    Neal 2011 — with burnin=nits//4). On the tiny 2-4 parameter
    posteriors the fused MH kernel's raw iteration rate still wins
    (config 7) — use MH there.
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
        init_step_size=float(step_size), mass_adapt=bool(mass_adapt))
    iterations = jnp.arange(1, nits)[burnin:]
    return MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                    acceptance_ratio=ar_s, iteration=iterations)
