"""Simulation-based calibration (SBC): statistical validation of the
whole inference pipeline.

Talts et al. 2018 ("Validating Bayesian Inference Algorithms with
Simulation-Based Calibration"): draw ``theta*`` from the prior, simulate
a dataset from the model's own observation process (the spec's
``obs_model``: lognormal/Student-t noise at the template's per-point
``log_sigma``, or Poisson/negative-binomial count draws at the predicted
intensity), sample the posterior for that
synthetic dataset, and record the rank of ``theta*`` among M thinned
posterior draws. When (solver, likelihood, proposal symmetry, RNG) are
all correct the ranks are uniform on {0..M}; a U shape flags an
underdispersed posterior, a ∩ shape overdispersion, a slope flags bias.
The reference has no analog — it ships zero tests of its inference loop
(SURVEY.md §4).

TPU-native shape: the chain scores its ObsData as traced arrays, so a
batch of synthetic datasets is just a leading axis — all ``reps``
replications (simulate → run a full MH chain → rank) execute as ONE
vmapped jitted program.

Measure note: SBC requires the chain to target the exact Bayesian
posterior for the prior ``theta*`` is drawn from. The framework's
``use_priors=True`` convention (the reference's *intended* semantics,
``Statistics/Samplers.py:118-127``) walks ``z = log theta`` and applies
the prior as a theta-density WITHOUT the ``e^z`` Jacobian — equivalent
to a Bayesian posterior under the tilted prior ``p(theta)/theta``. SBC
therefore adds the Jacobian internally (``log prior_z = log
p_theta(e^z) + z``) so that uniform ranks certify the mechanics under
the stated prior; the convention difference itself is documented, not a
bug (it shifts a LogNormal(s) prior's effective median by e^{-s^2}).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model import (ModelSpec, ObsData, chi_of_theta, integrate_theta,
                     observe)

__all__ = ["SBCResult", "sbc_ranks", "rank_uniformity_pvalue"]


class SBCResult(NamedTuple):
    ranks: Any        # (reps, P) int32; -1 for slots without a prior
    valid: Any        # (reps,) bool: simulated data and chain chi finite
    acceptance: Any   # (reps,) final running acceptance ratio
    theta_star: Any   # (reps, P) the prior draws
    n_draws: Any      # M: thinned posterior draws each rank is out of


@partial(jax.jit, static_argnames=(
    "spec", "slot_dists", "nits", "burnin", "thin", "rwalk_std",
    "method", "substeps"))
def _sbc_impl(spec, obs_t, times, y0_base, theta_star, walk_mask, key, *,
              slot_dists, nits, burnin, thin, rwalk_std, method, substeps):
    ikw = dict(method=method, substeps=substeps)
    P = theta_star.shape[-1]

    def prior_z(z):
        # Bayesian measure over z: log p_theta(e^z) + z per prior slot
        tot = jnp.zeros((), z.dtype)
        for j, d in enumerate(slot_dists):
            if d is not None:
                tot = tot + d.logpdf(jnp.exp(z[j])) + z[j]
        return tot

    def one_rep(th_star, rep_key):
        # simulate data from the model's own observation process —
        # whichever obs_model the spec scores with (spec is static, so
        # exactly one branch compiles)
        y0s = spec.override_inits(y0_base, th_star)
        ys = integrate_theta(spec, th_star, y0s, times, **ikw)
        pred = observe(spec, obs_t, ys)
        k_sim = jax.random.fold_in(rep_key, 0)
        if spec.obs_model in ("poisson", "negbinom"):
            # jax.random.poisson needs a bounded finite rate; prior draws
            # beyond the cap are flagged invalid, like a failed solve
            lam_cap = 1e9
            lam_ok = jnp.isfinite(pred) & (pred >= 0) & (pred < lam_cap)
            lam = jnp.where(lam_ok, pred, 0.0)
            if spec.obs_model == "negbinom":
                kg, kp = jax.random.split(k_sim)
                lam = jax.random.gamma(
                    kg, spec.obs_param, pred.shape, times.dtype) \
                    * (lam / spec.obs_param)
                k_sim = kp
            counts = jax.random.poisson(
                k_sim, lam, pred.shape).astype(times.dtype)
            la = jnp.log(counts)
            obs_r = obs_t._replace(log_abundance=la, abundance=counts)
            sim_ok = jnp.all(lam_ok)
        else:
            if spec.obs_model == "student_t":
                eps = jax.random.t(k_sim, spec.obs_param, pred.shape,
                                   times.dtype)
            else:
                eps = jax.random.normal(k_sim, pred.shape, times.dtype)
            la = jnp.log(pred) + obs_t.log_sigma * eps
            obs_r = obs_t._replace(log_abundance=la, abundance=jnp.exp(la))
            sim_ok = jnp.all(jnp.isfinite(la))

        def chi_of(z):
            th = jnp.exp(z)
            y0 = spec.override_inits(y0_base, th)
            return chi_of_theta(spec, obs_r, th, y0, times, **ikw)

        z0 = jnp.log(th_star)

        def step(carry, it):
            z, chi, lp, acc = carry
            k_eps = jax.random.fold_in(rep_key, 2 * it + 1)
            k_u = jax.random.fold_in(rep_key, 2 * it + 2)
            prop = z + rwalk_std * walk_mask * jax.random.normal(
                k_eps, z.shape, z.dtype)
            chi_n = chi_of(prop)
            lp_n = prior_z(prop)
            log_ratio = (chi - chi_n) + (lp_n - lp)
            u = jax.random.uniform(k_u, dtype=z.dtype)
            accept = jnp.exp(log_ratio) > u        # NaN -> rejected
            z = jnp.where(accept, prop, z)
            chi = jnp.where(accept, chi_n, chi)
            lp = jnp.where(accept, lp_n, lp)
            acc = acc + accept.astype(z.dtype)
            return (z, chi, lp, acc), z

        chi0 = chi_of(z0)
        carry = (z0, chi0, prior_z(z0), jnp.zeros((), z0.dtype))
        its = jnp.arange(1, nits)
        carry, _ = jax.lax.scan(
            lambda c, it: (step(c, it)[0], None), carry, its[:burnin])
        carry, recs = jax.lax.scan(step, carry, its[burnin:])
        recs = recs[::thin]                        # (M, P) thinned draws
        # rank of theta* among the draws, per slot (z is monotone in theta)
        ranks = jnp.sum(recs < z0[None, :], axis=0).astype(jnp.int32)
        valid = sim_ok & jnp.isfinite(carry[1]) & jnp.isfinite(chi0)
        acc_ratio = carry[3] / (nits - 1)
        return ranks, valid, acc_ratio

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(theta_star.shape[0]))
    return jax.vmap(one_rep)(theta_star, keys)


def sbc_ranks(spec: ModelSpec, obs_template: ObsData, times, y0_base,
              slot_dists, theta_base, *, reps: int = 128,
              nits: int = 2000, burnin=None, thin: int = 10,
              rwalk_std: float = 0.05, walk_mask=None, seed: int = 0,
              method: str = "fixed_dopri5", substeps=4) -> SBCResult:
    """Run ``reps`` SBC replications as one vmapped device program.

    ``slot_dists``: one prior (or None) per FLAT theta slot — slots
    without a prior keep their ``theta_base`` value, never walk, and get
    rank -1. ``obs_template`` supplies the observation design (grid
    indices, states, per-point log_sigma); its abundances are replaced by
    simulated draws per replication. Invalid replications (a prior draw
    whose solve blows up) are flagged in ``valid`` — drop them from the
    histogram (and worry if there are many: the prior mass is escaping
    the solver's stable region).
    """
    slot_dists = tuple(slot_dists)
    theta_base = np.ravel(np.asarray(theta_base, float))
    P = theta_base.size
    if len(slot_dists) != P:
        raise ValueError(f"slot_dists must have {P} entries, got "
                         f"{len(slot_dists)}")
    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations "
                         f"after burnin={burnin}")
    dtype = jnp.result_type(float)
    if walk_mask is None:
        walk_mask = np.array([1.0 if d is not None else 0.0
                              for d in slot_dists])
    walk_mask = np.asarray(walk_mask, float)
    key = jax.random.PRNGKey(seed)
    # theta*: prior draws on prior slots, theta_base elsewhere (host side
    # once — heterogeneous families don't vmap across slots)
    theta_star = np.tile(theta_base, (int(reps), 1))
    for j, d in enumerate(slot_dists):
        if d is not None and walk_mask[j] != 0:
            draws = np.asarray(d.rvs(jax.random.fold_in(key, 7919 + j),
                                     (int(reps),)))
            theta_star[:, j] = draws
    ranks, valid, acc = _sbc_impl(
        spec, obs_template, jnp.asarray(times, dtype),
        jnp.asarray(y0_base, dtype), jnp.asarray(theta_star, dtype),
        jnp.asarray(walk_mask, dtype), key, slot_dists=slot_dists,
        nits=int(nits), burnin=int(burnin), thin=int(thin),
        rwalk_std=float(rwalk_std), method=method,
        substeps=substeps if isinstance(substeps, tuple) else int(substeps))
    M = (nits - 1 - int(burnin) + int(thin) - 1) // int(thin)
    # np.array, not asarray: the jitted output's buffer is read-only and
    # the -1 sentinel assignment below must not crash on no-prior slots
    ranks = np.array(ranks)
    for j, d in enumerate(slot_dists):
        if d is None or walk_mask[j] == 0:
            ranks[:, j] = -1
    return SBCResult(ranks=ranks, valid=np.asarray(valid),
                     acceptance=np.asarray(acc), theta_star=theta_star,
                     n_draws=M)


def rank_uniformity_pvalue(ranks, n_draws: int, bins: int = 16) -> float:
    """Chi-square uniformity p-value for one slot's SBC ranks
    (ranks take values 0..n_draws inclusive)."""
    from scipy.stats import chi2

    ranks = np.asarray(ranks)
    ranks = ranks[ranks >= 0]
    if ranks.size == 0:
        return float("nan")
    bins = int(min(bins, n_draws + 1))
    edges = np.linspace(0, n_draws + 1, bins + 1)
    counts, _ = np.histogram(ranks, bins=edges)
    # expected counts follow each bin's INTEGER support: ranks live on
    # {0..n_draws}, and when bins does not divide n_draws+1 the linspace
    # edges put one more integer in some bins than others — a uniform
    # ranks.size/bins expectation would inflate the statistic linearly
    # in the sample count and flag perfectly calibrated pipelines
    ints = np.arange(n_draws + 1)
    idx = np.clip(np.digitize(ints, edges) - 1, 0, bins - 1)
    support = np.bincount(idx, minlength=bins)
    expected = ranks.size * support / (n_draws + 1)
    stat = float(np.sum((counts - expected) ** 2 / expected))
    return float(chi2.sf(stat, bins - 1))
