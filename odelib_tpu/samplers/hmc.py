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
* ``path_adapt=True`` additionally learns the TRAJECTORY LENGTH during
  warmup — the ChEES-HMC recipe (Hoffman, Radul & Sountsov, AISTATS
  2021), which is the accelerator-native answer to NUTS: instead of
  NUTS's per-chain recursive tree doubling (data-dependent control flow
  that diverges across vmapped lanes and defeats batching), ONE shared
  maximum length tau is adapted by Adam on the Change-in-Estimator-of-
  Expected-Square criterion, and each iteration runs a SINGLE
  Halton-jittered length h_m * tau shared by every chain — all lanes
  always execute the same leapfrog count, so the batch stays dense on
  the VPU. tau freezes (to its iterate average) at the end of warmup;
  the recorded phase is exact MCMC with jittered-but-state-independent
  trajectory lengths.
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


class _Chees(NamedTuple):
    """Shared trajectory-length state for ChEES adaptation."""
    log_tau: Any      # current log max trajectory length (scalar, shared)
    log_tau_bar: Any  # iterate-averaged (frozen at end of warmup)
    m1: Any           # Adam first moment
    m2: Any           # Adam second moment


class _Carry(NamedTuple):
    z: Any            # (C, P) log-theta
    u_pot: Any        # (C,) potential at z
    chi: Any          # (C,)
    rsq: Any
    aic: Any
    g: Any            # (C, P) cached grad U at z (reused next iteration)
    acc_count: Any    # (C,)
    da: _DualAvg
    chees: _Chees
    mass_inv: Any     # (P,) shared diagonal inverse mass (= var_chains(z))
    key: Any


def _halton2(n: int):
    """Radical-inverse base-2 (van der Corput) sequence for m = 1..n:
    the deterministic low-discrepancy jitter stream of ChEES-HMC."""
    import numpy as np
    out = np.zeros(n)
    for i in range(n):
        m, f, r = i + 1, 0.5, 0.0
        while m:
            r += f * (m & 1)
            m >>= 1
            f *= 0.5
        out[i] = r
    return out


def _leapfrog(vag_u, z, p, g, eps, n_steps, walk_mask, drift):
    """n_steps leapfrog steps of H = U(z) + p^T M^-1 p / 2.

    z, p, g: (C, P); eps: (C, 1) per-chain jittered step; ``drift(p)``
    applies the inverse mass M^-1 (diagonal vector product, or
    Sigma p = L (L^T p) for the dense metric).
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
        z = z + masked(eps * drift(p))
        (u, aux), g = vag_u(z)
        p = p - masked(0.5 * eps * g)
        return z, p, g, u, aux

    dtype = z.dtype
    C = z.shape[0]
    zero = jnp.zeros((C,), dtype)
    return jax.lax.fori_loop(0, n_steps, body,
                             (z, p, g, zero, (zero, zero, zero)))


def _make_vag_u(spec, obs, times, y0_base, *, use_priors, prior_logpdf,
                num_params, ikw):
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

    return jax.vmap(jax.value_and_grad(potential1, has_aux=True))


def _make_vag_u_custom(chi_fn, *, use_priors, prior_logpdf):
    """vag_u against an arbitrary differentiable ``chi_fn(theta)`` (e.g.
    the summed multi-experiment chi of a JointFit — hashed by identity,
    cache the closure). rsq/aic aux come back NaN."""
    def potential1(z):
        theta = jnp.exp(z)
        chi = chi_fn(theta)
        u = chi
        if use_priors:
            u = u - prior_logpdf(theta)
        nan = jnp.full_like(chi, jnp.nan)
        return u, (chi, nan, nan)

    return jax.vmap(jax.value_and_grad(potential1, has_aux=True))


def _make_step(vag_u, walk_mask, C, dtype, *, burnin, n_leapfrog,
               target_accept, mass_adapt, path_adapt, max_leapfrog,
               adam_lr, dense_mass=False):
    """Build the per-iteration transition shared by every dispatch
    strategy. All state (including the PRNG key and every adaptation
    statistic) lives in the ``_Carry``, so running the scan in chunks
    from the host — the fix for runtimes that kill very long single
    dispatches, and the hook for periodic checkpointing — is bitwise
    identical to one uninterrupted scan."""
    # dual-averaging constants (Stan defaults)
    gamma, t0, kappa = 0.05, 10.0, 0.75
    warm0 = min(10, max(burnin // 4, 1))  # mass refresh starts here
    wm_free = walk_mask > 0

    if dense_mass:
        # DENSE metric: carry.mass_inv holds L = chol(Sigma_reg) where
        # Sigma is the CROSS-CHAIN covariance of z (C chains >> P dims,
        # so the estimate is informative from iteration one, like the
        # diagonal recipe). Everything the sampler needs comes from L
        # alone: momentum p = L^-T xi ~ N(0, Sigma^-1), kinetic
        # p^T Sigma p / 2 = |L^T p|^2 / 2, drift M^-1 p = L (L^T p).
        def cross_chain_mass(z, mass_L):
            keep = wm_free.astype(z.dtype)
            zm = jnp.where(wm_free, z - jnp.mean(z, axis=0), 0.0)
            cov = zm.T @ zm / max(C - 1, 1)
            # shrink toward the diagonal: well-conditioned during the
            # first refreshes, vanishing bias once the batch spreads
            cov = 0.9 * cov + 0.1 * jnp.diag(jnp.diagonal(cov))
            cov = cov * keep[:, None] * keep[None, :]
            var = jnp.diagonal(cov)
            # masked dims get a unit diagonal (identity block — their
            # momentum is zeroed by walk_mask anyway); free dims a
            # relative jitter so chol never sees an exact zero pivot
            cov = cov + jnp.diag(jnp.where(wm_free, 1e-8 * var + 1e-12,
                                           1.0))
            L = jnp.linalg.cholesky(cov)
            ok = (jnp.all(jnp.where(wm_free,
                                    (var > 1e-10) & jnp.isfinite(var),
                                    True))
                  & jnp.all(jnp.isfinite(L)))
            return jnp.where(ok, L, mass_L)

        def draw_momentum(k, mass_L):
            xi = jax.random.normal(k, (C, walk_mask.shape[0]), dtype)
            return jax.scipy.linalg.solve_triangular(
                mass_L.T, xi.T, lower=False).T * walk_mask

        def make_kin(mass_L):
            return lambda p: 0.5 * jnp.sum((p @ mass_L) ** 2, axis=-1)

        def make_drift(mass_L):
            return lambda p: (p @ mass_L) @ mass_L.T
    else:
        def cross_chain_mass(z, mass_inv):
            var = jnp.var(z, axis=0)      # (P,) across the chain batch
            ok = (var > 1e-10) & jnp.isfinite(var) & wm_free
            return jnp.where(ok, var, mass_inv)

        def draw_momentum(k, mass_inv):
            xi = jax.random.normal(k, (C, walk_mask.shape[0]), dtype)
            return xi * jax.lax.rsqrt(mass_inv) * walk_mask

        def make_kin(mass_inv):
            return lambda p: 0.5 * jnp.sum(p * p * mass_inv, axis=-1)

        def make_drift(mass_inv):
            return lambda p: mass_inv * p

    def step(carry: _Carry, it_h):
        it, h_m = it_h
        key, k_mom, k_u, k_jit, k_rej = jax.random.split(carry.key, 5)
        eps = jnp.exp(carry.da.log_eps)
        if path_adapt:
            # ChEES: ONE Halton-jittered trajectory length shared by all
            # chains — lanes never diverge in leapfrog count. The step
            # itself keeps the per-chain +-50% jitter: all lanes run the
            # same n_steps but at eps * u_c, so realized trajectory TIMES
            # spread 0.5-1.5x across the batch. Without it every chain
            # lands on the identical length and a tau that drifts onto a
            # resonant (near-periodic) orbit collapses the WHOLE batch's
            # mixing at once (measured on the 7-dim bench posterior:
            # min-ESS 776 shared-eps vs 6-figure with jitter), and a lane
            # whose region needs a smaller step than the shared eps is
            # stuck at zero acceptance with no escape.
            tau_m = h_m * jnp.exp(carry.chees.log_tau)
            n_steps = jnp.clip(jnp.ceil(tau_m / eps), 1,
                               max_leapfrog).astype(jnp.int32)
            u_j = 0.5 + jax.random.uniform(k_jit, (C, 1), dtype)
            eps_j = eps * u_j
        else:
            # fixed count; jitter the step per chain +-50% instead
            n_steps = n_leapfrog
            eps_j = eps * (0.5 + jax.random.uniform(k_jit, (C, 1), dtype))
        drift = make_drift(carry.mass_inv)
        p0 = draw_momentum(k_mom, carry.mass_inv)
        z1, p1, g1, u1, (chi1, rsq1, aic1) = _leapfrog(
            vag_u, carry.z, p0, carry.g, eps_j, n_steps,
            walk_mask, drift)

        kin = make_kin(carry.mass_inv)
        log_ratio = (carry.u_pot + kin(p0)) - (u1 + kin(p1))
        # NaN Hamiltonian -> alpha 0 -> rejected (failure model 5.3).
        # A non-finite endpoint GRADIENT on a free dim also rejects: the
        # cached g seeds the next trajectory's first half-kick, and
        # accepting such a move while substituting g=0 would silently
        # break leapfrog reversibility (detailed balance) for every
        # later sample of that chain. Masked dims are exempt — array
        # params pinned at log(0) legitimately carry NaN gradients there
        # and the leapfrog masks them out.
        g1 = jnp.where(walk_mask > 0, g1, 0.0)
        grad_ok = jnp.all(jnp.isfinite(g1), axis=-1)
        alpha = jnp.where(jnp.isfinite(log_ratio) & grad_ok,
                          jnp.minimum(1.0, jnp.exp(log_ratio)), 0.0)
        accept = alpha > jax.random.uniform(k_u, (C,), dtype)

        acc_col = accept[:, None]
        z = jnp.where(acc_col, z1, carry.z)
        g = jnp.where(acc_col, g1, carry.g)
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

        # stuck-chain rejuvenation at the warmup boundary: a lane whose
        # warmup acceptance stayed ~0 (seeded on a ridge where every
        # trajectory under the SHARED metric/step diverges) would record
        # its seed for the whole run — the classic few-stuck-lanes
        # failure that craters min-ESS and R-hat (seen with dense_mass
        # on the 7-dim bench posterior: 2/512 chains at acceptance
        # 0.001). Before the metric freezes and recording starts, such
        # lanes restart from a random OTHER chain's current state —
        # resampling within the warm ensemble, exact because no sample
        # has been recorded yet.
        new_acc = carry.acc_count + accept.astype(dtype)
        if burnin > 0:
            stuck = new_acc < 0.02 * burnin
            perm = jax.random.permutation(k_rej, C)
            rej = switch & stuck
            rej_col = rej[:, None]
            z = jnp.where(rej_col, z[perm], z)
            g = jnp.where(rej_col, g[perm], g)
            u_pot = jnp.where(rej, u_pot[perm], u_pot)
            chi = jnp.where(rej, chi[perm], chi)
            rsq = jnp.where(rej, rsq[perm], rsq)
            aic = jnp.where(rej, aic[perm], aic)

        ch = carry.chees
        if path_adapt:
            # stochastic gradient of the ChEES criterion
            # E[(|z'-zbar'|^2 - |z-zbar|^2)^2]/4 w.r.t. tau, through the
            # halton jitter (Hoffman et al. 2021 eq. 6): the end velocity
            # is d(proposal)/d(trajectory time)
            wm = walk_mask > 0
            dz0 = jnp.where(wm, carry.z - jnp.mean(carry.z, 0), 0.0)
            dz1 = jnp.where(wm, z1 - jnp.mean(z1, 0), 0.0)
            v1 = jnp.where(wm, drift(p1), 0.0)
            r_diff = jnp.sum(dz1 * dz1, -1) - jnp.sum(dz0 * dz0, -1)
            proj = jnp.sum(dz1 * v1, -1)
            # chain c ran trajectory time ~ h_m * u_c * tau, so its
            # d(time)/d(tau) carries the chain's own jitter factor
            contrib = alpha * h_m * u_j[:, 0] * r_diff * proj
            contrib = jnp.where(jnp.isfinite(contrib), contrib, 0.0)
            g_tau = jnp.sum(contrib) / jnp.maximum(jnp.sum(alpha), 1e-6)
            # Adam ascent on log tau (d/dlog = tau * d/dtau)
            glt = g_tau * jnp.exp(ch.log_tau)
            glt = jnp.where(jnp.isfinite(glt), glt, 0.0)
            b1, b2 = 0.9, 0.999
            m1 = b1 * ch.m1 + (1.0 - b1) * glt
            m2 = b2 * ch.m2 + (1.0 - b2) * glt * glt
            mh_ = m1 / (1.0 - b1 ** m)
            vh_ = m2 / (1.0 - b2 ** m)
            log_tau = ch.log_tau + adam_lr * mh_ / (jnp.sqrt(vh_) + 1e-8)
            # keep tau inside what max_leapfrog can realize at current eps
            log_tau = jnp.clip(log_tau, da.log_eps,
                               da.log_eps + jnp.log(float(max_leapfrog)))
            log_tau_bar = w * log_tau + (1.0 - w) * ch.log_tau_bar
            ch = _Chees(
                log_tau=jnp.where(adapting, log_tau, ch.log_tau),
                log_tau_bar=jnp.where(adapting, log_tau_bar,
                                      ch.log_tau_bar),
                m1=jnp.where(adapting, m1, ch.m1),
                m2=jnp.where(adapting, m2, ch.m2))
            ch = ch._replace(log_tau=jnp.where(switch, ch.log_tau_bar,
                                               ch.log_tau))

        new = _Carry(z=z, u_pot=u_pot, chi=chi, rsq=rsq, aic=aic, g=g,
                     acc_count=new_acc,
                     da=da, chees=ch, mass_inv=mass_inv, key=key)
        record = (jnp.exp(z), chi, rsq, aic, new.acc_count / it)
        return new, record

    return step, cross_chain_mass


_HMC_STATICS = ("spec", "burnin", "n_leapfrog", "target_accept",
                "use_priors", "prior_logpdf", "num_params", "method",
                "substeps", "init_step_size", "mass_adapt", "path_adapt",
                "max_leapfrog", "adam_lr", "dense_mass")


def _init_core(vag_u, theta0, keys, walk_mask, *, burnin, n_leapfrog,
               target_accept, init_step_size, mass_adapt, path_adapt,
               max_leapfrog, adam_lr, dense_mass=False):
    dtype = theta0.dtype
    C = theta0.shape[0]
    _, cross_chain_mass = _make_step(
        vag_u, walk_mask, C, dtype, burnin=burnin, n_leapfrog=n_leapfrog,
        target_accept=target_accept, mass_adapt=mass_adapt,
        path_adapt=path_adapt, max_leapfrog=max_leapfrog, adam_lr=adam_lr,
        dense_mass=dense_mass)
    z0 = jnp.log(theta0)
    (u0, (chi0, rsq0, aic0)), g0 = vag_u(z0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
    le0 = jnp.log(jnp.asarray(init_step_size, dtype))
    da0 = _DualAvg(log_eps=le0, log_eps_bar=le0,
                   h_bar=jnp.asarray(0.0, dtype),
                   mu=jnp.log(10.0 * jnp.asarray(init_step_size, dtype)))
    P = theta0.shape[-1]
    mass0 = jnp.eye(P, dtype=dtype) if dense_mass else jnp.ones((P,), dtype)
    if mass_adapt:
        mass0 = cross_chain_mass(z0, mass0)
    lt0 = jnp.log(jnp.asarray(n_leapfrog * init_step_size, dtype))
    zero0 = jnp.asarray(0.0, dtype)
    ch0 = _Chees(log_tau=lt0, log_tau_bar=lt0, m1=zero0, m2=zero0)
    return _Carry(z=z0, u_pot=u0, chi=chi0, rsq=rsq0, aic=aic0, g=g0,
                  acc_count=jnp.zeros((C,), dtype), da=da0, chees=ch0,
                  mass_inv=mass0, key=keys[0])


def _chunk_core(vag_u, carry, its, halton, walk_mask, *, burnin,
                n_leapfrog, target_accept, mass_adapt, path_adapt,
                max_leapfrog, adam_lr, record, dense_mass=False):
    C = carry.z.shape[0]
    step, _ = _make_step(
        vag_u, walk_mask, C, carry.z.dtype, burnin=burnin,
        n_leapfrog=n_leapfrog, target_accept=target_accept,
        mass_adapt=mass_adapt, path_adapt=path_adapt,
        max_leapfrog=max_leapfrog, adam_lr=adam_lr, dense_mass=dense_mass)
    if record:
        carry, recs = jax.lax.scan(step, carry, (its, halton))
        # scan stacks on the leading axis: (R, C, ...) -> (C, R, ...)
        return carry, tuple(jnp.swapaxes(r, 0, 1) for r in recs)
    carry, _ = jax.lax.scan(lambda c, xs: (step(c, xs)[0], None),
                            carry, (its, halton))
    return carry, None


@partial(jax.jit, static_argnames=_HMC_STATICS)
def _hmc_init(spec, obs, times, y0_base, theta0, keys, walk_mask, *,
              burnin, n_leapfrog, target_accept, use_priors, prior_logpdf,
              num_params, method, substeps, init_step_size, mass_adapt,
              path_adapt, max_leapfrog, adam_lr, dense_mass=False):
    vag_u = _make_vag_u(spec, obs, times, y0_base, use_priors=use_priors,
                        prior_logpdf=prior_logpdf, num_params=num_params,
                        ikw=dict(method=method, substeps=substeps))
    return _init_core(vag_u, theta0, keys, walk_mask, burnin=burnin,
                      n_leapfrog=n_leapfrog, target_accept=target_accept,
                      init_step_size=init_step_size, mass_adapt=mass_adapt,
                      path_adapt=path_adapt, max_leapfrog=max_leapfrog,
                      adam_lr=adam_lr, dense_mass=dense_mass)


@partial(jax.jit, static_argnames=_HMC_STATICS + ("record",))
def _hmc_chunk(spec, obs, times, y0_base, carry, its, halton, walk_mask, *,
               burnin, n_leapfrog, target_accept, use_priors, prior_logpdf,
               num_params, method, substeps, init_step_size, mass_adapt,
               path_adapt, max_leapfrog, adam_lr, record,
               dense_mass=False):
    """One bounded device dispatch: scan ``its.shape[0]`` iterations and
    hand the carry back to the host. Chunking bounds per-dispatch
    wall-clock (long ChEES trajectories at large ``nits`` otherwise
    exceed what remote-tunnel TPU runtimes tolerate in a single
    execution) and is the unit of periodic checkpointing."""
    vag_u = _make_vag_u(spec, obs, times, y0_base, use_priors=use_priors,
                        prior_logpdf=prior_logpdf, num_params=num_params,
                        ikw=dict(method=method, substeps=substeps))
    return _chunk_core(vag_u, carry, its, halton, walk_mask, burnin=burnin,
                       n_leapfrog=n_leapfrog, target_accept=target_accept,
                       mass_adapt=mass_adapt, path_adapt=path_adapt,
                       max_leapfrog=max_leapfrog, adam_lr=adam_lr,
                       record=record, dense_mass=dense_mass)


_HMC_CUSTOM_STATICS = ("chi_fn", "burnin", "n_leapfrog", "target_accept",
                       "use_priors", "prior_logpdf", "init_step_size",
                       "mass_adapt", "path_adapt", "max_leapfrog",
                       "adam_lr", "dense_mass")


@partial(jax.jit, static_argnames=_HMC_CUSTOM_STATICS)
def _hmc_init_custom(chi_fn, theta0, keys, walk_mask, *, burnin,
                     n_leapfrog, target_accept, use_priors, prior_logpdf,
                     init_step_size, mass_adapt, path_adapt, max_leapfrog,
                     adam_lr, dense_mass=False):
    vag_u = _make_vag_u_custom(chi_fn, use_priors=use_priors,
                               prior_logpdf=prior_logpdf)
    return _init_core(vag_u, theta0, keys, walk_mask, burnin=burnin,
                      n_leapfrog=n_leapfrog, target_accept=target_accept,
                      init_step_size=init_step_size, mass_adapt=mass_adapt,
                      path_adapt=path_adapt, max_leapfrog=max_leapfrog,
                      adam_lr=adam_lr, dense_mass=dense_mass)


@partial(jax.jit, static_argnames=_HMC_CUSTOM_STATICS + ("record",))
def _hmc_chunk_custom(chi_fn, carry, its, halton, walk_mask, *, burnin,
                      n_leapfrog, target_accept, use_priors, prior_logpdf,
                      init_step_size, mass_adapt, path_adapt, max_leapfrog,
                      adam_lr, record, dense_mass=False):
    vag_u = _make_vag_u_custom(chi_fn, use_priors=use_priors,
                               prior_logpdf=prior_logpdf)
    return _chunk_core(vag_u, carry, its, halton, walk_mask, burnin=burnin,
                       n_leapfrog=n_leapfrog, target_accept=target_accept,
                       mass_adapt=mass_adapt, path_adapt=path_adapt,
                       max_leapfrog=max_leapfrog, adam_lr=adam_lr,
                       record=record, dense_mass=dense_mass)


def hamiltonian_mc_custom(
        chi_fn, theta0, keys, *, nits: int = 1000,
        burnin: Optional[int] = None, n_leapfrog: int = 4,
        step_size: float = 0.02, target_accept: float = 0.65,
        walk_mask=None, prior_logpdf=None, use_priors: bool = False,
        mass_adapt: bool = True, path_adapt: bool = False,
        max_leapfrog: int = 256, adam_lr: float = 0.025,
        dense_mass: bool = False,
        chunk_iters: Optional[int] = None) -> MHOutput:
    """Cross-chain-adapted HMC against an arbitrary differentiable
    ``chi_fn(theta)`` — e.g. a JointFit's summed multi-experiment chi,
    whose hierarchical pooling posteriors are funnel-shaped, exactly
    where gradient-based proposals beat the random walk. Conventions of
    :func:`hamiltonian_mc` (potential ``U(z) = chi(e^z) [- log
    prior(e^z)]``, shared mass/step/ChEES warmup adaptation); ``chi_fn``
    must be differentiable (fixed-step solves) and is hashed by IDENTITY
    — cache the closure to reuse the compiled program. rsquared/aic
    records come back NaN (no single-experiment metrics)."""
    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    theta0 = jnp.atleast_2d(theta0)
    D = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((D,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    dtype = theta0.dtype
    skw = dict(burnin=int(burnin), n_leapfrog=int(n_leapfrog),
               target_accept=float(target_accept),
               use_priors=bool(use_priors), prior_logpdf=prior_logpdf,
               init_step_size=float(step_size),
               mass_adapt=bool(mass_adapt), path_adapt=bool(path_adapt),
               max_leapfrog=int(max_leapfrog), adam_lr=float(adam_lr),
               dense_mass=bool(dense_mass))
    halton = jnp.asarray(_halton2(int(nits) - 1), dtype)
    carry = _hmc_init_custom(chi_fn, theta0, keys, walk_mask, **skw)
    its = jnp.arange(1, int(nits), dtype=dtype)
    E = chunk_iters or (int(nits) - 1)
    recs = []
    for lo in range(0, int(nits) - 1, E):
        hi = min(lo + E, int(nits) - 1)
        for a, b in ((lo, min(hi, int(burnin))), (max(lo, int(burnin)), hi)):
            if a >= b:
                continue
            carry, rec = _hmc_chunk_custom(
                chi_fn, carry, its[a:b], halton[a:b], walk_mask,
                record=(a >= int(burnin)), **skw)
            if rec is not None:
                recs.append(rec)
    theta_s, chi_s, rsq_s, aic_s, ar_s = (
        jnp.concatenate(parts, axis=1) for parts in zip(*recs))
    iterations = jnp.arange(1, int(nits))[int(burnin):]
    return MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                    acceptance_ratio=ar_s, iteration=iterations)


def _hmc_impl(spec, obs, times, y0_base, theta0, keys, walk_mask, halton, *,
              nits, burnin, n_leapfrog, target_accept, use_priors,
              prior_logpdf, num_params, method, substeps, init_step_size,
              mass_adapt, path_adapt, max_leapfrog, adam_lr,
              dense_mass=False, chunk_iters=None):
    dtype = theta0.dtype
    skw = dict(burnin=burnin, n_leapfrog=n_leapfrog,
               target_accept=target_accept, use_priors=use_priors,
               prior_logpdf=prior_logpdf, num_params=num_params,
               method=method, substeps=substeps,
               init_step_size=init_step_size, mass_adapt=mass_adapt,
               path_adapt=path_adapt, max_leapfrog=max_leapfrog,
               adam_lr=adam_lr, dense_mass=dense_mass)
    carry = _hmc_init(spec, obs, times, y0_base, theta0, keys, walk_mask,
                      **skw)
    its = jnp.arange(1, nits, dtype=dtype)
    E = chunk_iters or (nits - 1)
    recs = []
    for lo in range(0, nits - 1, E):
        hi = min(lo + E, nits - 1)
        # a chunk straddling the burnin boundary is split so the no-record
        # program serves the warmup part and the record program the rest
        for a, b in ((lo, min(hi, burnin)), (max(lo, burnin), hi)):
            if a >= b:
                continue
            carry, rec = _hmc_chunk(
                spec, obs, times, y0_base, carry, its[a:b], halton[a:b],
                walk_mask, record=(a >= burnin), **skw)
            if rec is not None:
                recs.append(rec)
    return tuple(jnp.concatenate(parts, axis=1)
                 for parts in zip(*recs))


def hamiltonian_mc(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, keys, *,
        nits: int = 1000, burnin: Optional[int] = None,
        n_leapfrog: int = 4, step_size: float = 0.02,
        target_accept: float = 0.65, walk_mask=None,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "fixed_dopri5", substeps=4,
        mass_adapt: bool = True, path_adapt: bool = False,
        max_leapfrog: int = 256, adam_lr: float = 0.025,
        dense_mass: bool = False,
        chunk_iters: Optional[int] = None) -> MHOutput:
    """Run C interacting-warmup HMC chains as one jitted device program.

    Same input/output contract as :func:`~odelib_tpu.samplers.mh.
    metropolis_hastings` (theta0 (C, P), a ``keys`` array; returns
    :class:`MHOutput`), so posteriors drop into the same DataFrame
    pipeline. RNG caveat: the chains interact through warmup (shared
    mass/step size), so the sampler runs ONE device program with ONE
    stream seeded from ``keys[0]`` — per-chain draws are (C,)-shaped
    splits of that stream. ``keys[1:]`` are accepted for signature
    compatibility but do not enter; vary ``keys[0]`` to replicate. The integrator must be a fixed-step method — reverse-mode AD
    does not support the adaptive ``while_loop`` — which is exactly what
    the calibrated schedules from :mod:`odelib_tpu.ops.schedule` are for.

    ``burnin`` is the warmup window: the shared diagonal mass matrix is
    refreshed every warmup iteration from the CROSS-CHAIN variance of z
    (``mass_adapt=True``, default) while the shared step size is
    dual-averaged toward ``target_accept`` on the mean acceptance; both
    freeze at the end of burn-in, so recorded samples are exact MCMC.
    Seed the chains overdispersed (the MCMC() fit-survey seeding does)
    for a sound initial variance estimate.

    At the warmup boundary, chains whose warmup acceptance stayed below
    2% are restarted from a random other chain's current state (stuck-
    chain rejuvenation — resampling within the warm ensemble, exact
    because recording starts after). A lane seeded where every
    trajectory under the shared metric diverges would otherwise record
    its seed forever and crater min-ESS/R-hat; measured on the 7-dim
    bench posterior with ``dense_mass``: 2/512 stuck lanes held min-ESS
    at 446 (R-hat 1.53) — with rejuvenation the same run reaches
    min-ESS 272k (R-hat 1.002).

    ``dense_mass=True`` upgrades the metric from diagonal to FULL-RANK:
    the inverse mass becomes the cross-chain COVARIANCE of z (shrunk 10%
    toward its diagonal, Cholesky-factored once per warmup refresh — P
    is tiny, so the O(P^3) factor and O(C P^2) products are noise next
    to the ODE solves). A dense metric rotates the posterior's
    correlation structure away: on correlated posteriors the diagonal
    recipe must step along axis-aligned directions and pays for it in
    trajectory length. Prefer it whenever parameters are strongly
    correlated (e.g. jointly-identified rate constants); for nearly
    independent posteriors the diagonal metric estimates faster and
    wastes nothing.

    ``path_adapt=True`` (ChEES, Hoffman et al. 2021) additionally adapts
    the trajectory LENGTH during warmup: Adam ascends the ChEES criterion
    on one shared max length tau, each iteration runs a Halton-jittered
    ``h_m * tau`` (one shared leapfrog count per iteration — vmapped
    lanes never diverge, the reason this recipe beats a NUTS port on
    batch hardware), and tau freezes to its iterate average at the end
    of warmup. ``n_leapfrog * step_size`` seeds tau; ``max_leapfrog``
    caps the realized step count per trajectory.

    ``chunk_iters`` bounds the iterations per device dispatch: the scan
    runs in host-driven chunks with the full sampler state (PRNG key and
    every adaptation statistic) threaded through the carry, so chunked ==
    unchunked bitwise. Use it when a single dispatch would run for
    minutes (e.g. ``path_adapt`` with large ``nits`` — long-lived single
    executions can exceed what remote-tunnel TPU runtimes tolerate).

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

    halton = jnp.asarray(_halton2(int(nits) - 1), theta0.dtype)
    theta_s, chi_s, rsq_s, aic_s, ar_s = _hmc_impl(
        spec, obs, times, y0_base, theta0, keys, walk_mask, halton,
        nits=int(nits), burnin=int(burnin), n_leapfrog=int(n_leapfrog),
        target_accept=float(target_accept), use_priors=bool(use_priors),
        prior_logpdf=prior_logpdf, num_params=num_params, method=method,
        substeps=substeps if isinstance(substeps, tuple) else int(substeps),
        init_step_size=float(step_size), mass_adapt=bool(mass_adapt),
        path_adapt=bool(path_adapt), max_leapfrog=int(max_leapfrog),
        adam_lr=float(adam_lr), dense_mass=bool(dense_mass),
        chunk_iters=int(chunk_iters) if chunk_iters else None)
    iterations = jnp.arange(1, nits)[burnin:]
    return MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                    acceptance_ratio=ar_s, iteration=iterations)


def hamiltonian_mc_checkpointed(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, keys, *,
        nits: int = 1000, burnin: Optional[int] = None,
        n_leapfrog: int = 4, step_size: float = 0.02,
        target_accept: float = 0.65, walk_mask=None,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "fixed_dopri5", substeps=4,
        mass_adapt: bool = True, path_adapt: bool = False,
        max_leapfrog: int = 256, adam_lr: float = 0.025,
        dense_mass: bool = False, config_token: str = "",
        checkpoint_every: int = 100, checkpoint_path: Optional[str] = None,
        resume_from: Optional[str] = None,
        _stop_after_chunks: Optional[int] = None) -> MHOutput:
    """Periodically-checkpointed HMC/ChEES: the scan runs in chunks of
    ``checkpoint_every`` iterations (burn-in unrecorded, exactly like the
    plain driver) and after each chunk the FULL sampler state —
    positions, cached gradients, PRNG key, dual-averaging, ChEES and
    mass-matrix statistics — plus the records so far are persisted (npz,
    atomic rename). A killed run resumes via ``resume_from`` and is
    BITWISE identical to :func:`hamiltonian_mc` with the same arguments:
    every source of randomness lives in the carry, so chunk boundaries
    are invisible. The same chunking also bounds per-dispatch wall-clock
    (see ``chunk_iters``); checkpointing is that mechanism plus
    persistence.

    ``_stop_after_chunks``: test hook simulating a mid-run kill.
    """
    import numpy as np

    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    if method not in ("fixed_dopri5", "rk4"):
        raise ValueError(
            "HMC requires a fixed-step differentiable integrator: "
            "method='fixed_dopri5' or 'rk4'")
    E = int(checkpoint_every)
    if E < 1:
        raise ValueError("checkpoint_every must be >= 1")
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    dtype = theta0.dtype
    if walk_mask is None:
        walk_mask = jnp.ones((P,), dtype)
    walk_mask = jnp.asarray(walk_mask, dtype)
    num_params = int(jnp.count_nonzero(theta0[0]))
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")

    burnin = int(burnin)
    nits = int(nits)
    skw = dict(burnin=burnin, n_leapfrog=int(n_leapfrog),
               target_accept=float(target_accept),
               use_priors=bool(use_priors), prior_logpdf=prior_logpdf,
               num_params=num_params, method=method,
               substeps=substeps if isinstance(substeps, tuple)
               else int(substeps),
               init_step_size=float(step_size),
               mass_adapt=bool(mass_adapt), path_adapt=bool(path_adapt),
               max_leapfrog=int(max_leapfrog), adam_lr=float(adam_lr),
               dense_mass=bool(dense_mass))

    # checkpoint_every is part of the signature: next_chunk is
    # denominated in chunks of E, so a different E on resume would
    # silently skip or replay iterations
    sig = repr(("hmc", spec.pnames, spec.pshapes, P, int(theta0.shape[0]),
                nits, burnin, int(checkpoint_every),
                skw["n_leapfrog"], skw["target_accept"],
                skw["init_step_size"], skw["mass_adapt"],
                skw["path_adapt"], skw["max_leapfrog"], skw["adam_lr"],
                tuple(float(w) for w in np.asarray(walk_mask)),
                bool(use_priors), method, skw["substeps"],
                skw["dense_mass"], str(config_token)))

    def init_fn():
        return _hmc_init(spec, obs, times, y0_base, theta0, keys,
                         walk_mask, **skw)

    def chunk_fn(carry, its_ab, halton_ab, record):
        return _hmc_chunk(spec, obs, times, y0_base, carry, its_ab,
                          halton_ab, walk_mask, record=record, **skw)

    return _checkpointed_driver(
        init_fn, chunk_fn, C=int(theta0.shape[0]), P=P, dtype=dtype,
        nits=nits, burnin=burnin, E=E, sig=sig,
        checkpoint_path=checkpoint_path, resume_from=resume_from,
        _stop_after_chunks=_stop_after_chunks,
        dense=bool(dense_mass))


def hamiltonian_mc_custom_checkpointed(
        chi_fn, theta0, keys, *, nits: int = 1000,
        burnin: Optional[int] = None, n_leapfrog: int = 4,
        step_size: float = 0.02, target_accept: float = 0.65,
        walk_mask=None, prior_logpdf=None, use_priors: bool = False,
        mass_adapt: bool = True, path_adapt: bool = False,
        max_leapfrog: int = 256, adam_lr: float = 0.025,
        dense_mass: bool = False,
        config_token: str = "", checkpoint_every: int = 100,
        checkpoint_path: Optional[str] = None,
        resume_from: Optional[str] = None,
        _stop_after_chunks: Optional[int] = None) -> MHOutput:
    """Periodically-checkpointed :func:`hamiltonian_mc_custom` — HMC over
    an arbitrary differentiable ``chi_fn`` (e.g. a JointFit's summed
    multi-experiment chi) with the persist/kill/resume semantics of
    :func:`hamiltonian_mc_checkpointed` (bitwise identical to the
    uninterrupted run).

    The chi closure cannot be fingerprinted by the sampler, so callers
    pass ``config_token`` — a PROCESS-STABLE string identifying the
    model/data configuration behind ``chi_fn`` (use content digests, not
    ``hash()``, whose str/bytes salt changes per process) — which is
    baked into the resume signature alongside the sampler knobs.
    """
    import numpy as np

    if burnin is None:
        burnin = int(nits / 2)
    nits, burnin = int(nits), int(burnin)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    E = int(checkpoint_every)
    if E < 1:
        raise ValueError("checkpoint_every must be >= 1")
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    dtype = theta0.dtype
    if walk_mask is None:
        walk_mask = jnp.ones((P,), dtype)
    walk_mask = jnp.asarray(walk_mask, dtype)
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    skw = dict(burnin=burnin, n_leapfrog=int(n_leapfrog),
               target_accept=float(target_accept),
               use_priors=bool(use_priors), prior_logpdf=prior_logpdf,
               init_step_size=float(step_size),
               mass_adapt=bool(mass_adapt), path_adapt=bool(path_adapt),
               max_leapfrog=int(max_leapfrog), adam_lr=float(adam_lr),
               dense_mass=bool(dense_mass))
    sig = repr(("hmc-custom", str(config_token), P, int(theta0.shape[0]),
                nits, burnin, E, skw["n_leapfrog"], skw["target_accept"],
                skw["init_step_size"], skw["mass_adapt"],
                skw["path_adapt"], skw["max_leapfrog"], skw["adam_lr"],
                tuple(float(w) for w in np.asarray(walk_mask)),
                bool(use_priors), skw["dense_mass"]))

    def init_fn():
        return _hmc_init_custom(chi_fn, theta0, keys, walk_mask, **skw)

    def chunk_fn(carry, its_ab, halton_ab, record):
        return _hmc_chunk_custom(chi_fn, carry, its_ab, halton_ab,
                                 walk_mask, record=record, **skw)

    return _checkpointed_driver(
        init_fn, chunk_fn, C=int(theta0.shape[0]), P=P, dtype=dtype,
        nits=nits, burnin=burnin, E=E, sig=sig,
        checkpoint_path=checkpoint_path, resume_from=resume_from,
        _stop_after_chunks=_stop_after_chunks,
        dense=bool(dense_mass))


def _checkpointed_driver(init_fn, chunk_fn, *, C, P, dtype, nits, burnin,
                         E, sig, checkpoint_path, resume_from,
                         _stop_after_chunks, dense=False):
    """Shared chunk/persist/resume loop behind the checkpointed HMC
    variants. ``init_fn()`` builds the initial carry; ``chunk_fn(carry,
    its, halton, record)`` advances one jitted sub-chunk. State persists
    as flattened _Carry leaves (npz, atomic rename) and is restored
    against the treedef of :func:`_carry_skeleton`."""
    import os

    import numpy as np

    halton = jnp.asarray(_halton2(nits - 1), dtype)
    its = jnp.arange(1, nits, dtype=dtype)
    R = nits - 1
    n_chunks = -(-R // E)

    k0, carry, recs = 0, None, []
    if resume_from:
        with np.load(resume_from, allow_pickle=False) as z:
            saved_sig = bytes(z["sig"]).decode()
            if saved_sig != sig:
                raise ValueError(
                    "checkpoint was written by a different HMC "
                    f"configuration:\n  saved: {saved_sig}\n  this:  {sig}")
            k0 = int(z["next_chunk"])
            n_leaves = int(z["n_leaves"])
            leaves = [jnp.asarray(z[f"leaf{i}"]) for i in range(n_leaves)]
            _, treedef = jax.tree_util.tree_flatten(
                _carry_skeleton(C, P, dtype, dense))
            carry = jax.tree_util.tree_unflatten(treedef, leaves)
            carry = carry._replace(
                key=jax.random.wrap_key_data(jnp.asarray(z["key_data"])))
            if "rec0" in z:
                recs = [tuple(z[f"rec{i}"] for i in range(5))]
    if carry is None:
        carry = init_fn()

    for k in range(k0, n_chunks):
        lo, hi = k * E, min((k + 1) * E, R)
        # identical program variants to the plain driver (no-record
        # during burnin): the record flag changes XLA's reduction order
        # for the cross-chain mass/step statistics at the last ulp on
        # some platforms, which would break bitwise resume parity
        for a, b in ((lo, min(hi, burnin)), (max(lo, burnin), hi)):
            if a >= b:
                continue
            carry, rec = chunk_fn(carry, its[a:b], halton[a:b],
                                  record=(a >= burnin))
            if rec is not None:
                recs.append(tuple(np.asarray(r) for r in rec))
        if checkpoint_path:
            rec_payload = {}
            if recs:
                merged = tuple(np.concatenate([r[i] for r in recs], axis=1)
                               for i in range(5))
                recs = [merged]
                rec_payload = {f"rec{i}": merged[i] for i in range(5)}
            leaves, _ = jax.tree_util.tree_flatten(
                carry._replace(key=None))
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez_compressed(
                    f, sig=np.frombuffer(sig.encode(), np.uint8),
                    next_chunk=np.asarray(k + 1),
                    n_leaves=np.asarray(len(leaves)),
                    key_data=np.asarray(
                        jax.random.key_data(carry.key)),
                    **{f"leaf{i}": np.asarray(v)
                       for i, v in enumerate(leaves)},
                    **rec_payload)
            os.replace(tmp, checkpoint_path)
        if (_stop_after_chunks is not None
                and k + 1 - k0 >= _stop_after_chunks and k + 1 < n_chunks):
            return None

    th, chi, rsq, aic, ar = (np.concatenate([r[i] for r in recs], axis=1)
                             for i in range(5))
    iterations = jnp.arange(1, nits)[burnin:]
    return MHOutput(theta=jnp.asarray(th), chi=jnp.asarray(chi),
                    rsquared=jnp.asarray(rsq), aic=jnp.asarray(aic),
                    acceptance_ratio=jnp.asarray(ar),
                    iteration=iterations)


def _carry_skeleton(C, P, dtype, dense=False):
    """A _Carry with key=None and zero leaves, used only for its treedef
    when restoring a checkpoint (tree_unflatten needs the structure)."""
    z = jnp.zeros((C, P), dtype)
    v = jnp.zeros((C,), dtype)
    s = jnp.asarray(0.0, dtype)
    da = _DualAvg(log_eps=s, log_eps_bar=s, h_bar=s, mu=s)
    ch = _Chees(log_tau=s, log_tau_bar=s, m1=s, m2=s)
    mass = jnp.zeros((P, P) if dense else (P,), dtype)
    return _Carry(z=z, u_pot=v, chi=v, rsq=v, aic=v, g=z, acc_count=v,
                  da=da, chees=ch, mass_inv=mass, key=None)
