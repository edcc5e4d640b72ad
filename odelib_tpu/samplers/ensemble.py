"""Affine-invariant ensemble sampler (Goodman & Weare stretch moves).

The de-facto standard MCMC method of the reference's target audience
(emcee's algorithm) — absent from the reference, which only ships the
single-chain random-walk sampler (``/root/reference/ODElib/Statistics/
Samplers.py:53-174``). Stretch moves are affine-invariant: performance is
unchanged under any linear reparameterization, so strongly correlated ODE
posteriors (e.g. the demo's phi-beta ridge, correlation ~ -0.93) mix
without hand-tuning a proposal covariance.

TPU-native shape: the ensemble IS the batch axis. Walkers split into two
half-ensembles; each half updates in one fused vmapped step (ODE solve +
chi + accept for W/2 walkers at once) using partners gathered from the
other half. ``lax.scan`` over iterations, no Python control flow — the
whole W-walker ensemble, both half-updates per iteration, is a single XLA
program. Per-iteration device work equals W independent MH chains; the
coupling is one gather.

Sampling space and target match samplers/mh.py: walks live in log-theta,
the target is ``exp(-(chi - log prior))`` over log-theta (likelihood-only
by default, prior-aware with ``use_priors=True``), and a failed
integration yields NaN chi which is always rejected (the reference's
NaN-tolerant failure model, SURVEY.md section 5.3).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..model import ModelSpec, ObsData, fit_metrics, integrate_theta
from .mh import MHOutput


class _Carry(NamedTuple):
    log_theta: Any    # (W, P)
    chi: Any          # (W,)
    rsq: Any
    aic: Any
    lp: Any           # (W,) log prior (zeros when unused)
    acc_count: Any    # (W,)
    key: Any


def _stretch_z(key, shape, a, dtype):
    """Draw z ~ g(z) proportional to 1/sqrt(z) on [1/a, a]: the inverse-CDF
    is z = ((1 + (a-1) u)^2) / a for u ~ U(0,1)."""
    u = jax.random.uniform(key, shape, dtype)
    return ((1.0 + (a - 1.0) * u) ** 2) / a


@partial(jax.jit, static_argnames=(
    "spec", "nits", "burnin", "a", "n_walked", "prior_logpdf", "use_priors",
    "num_params", "method", "rtol", "atol", "max_steps", "substeps"))
def _ensemble_impl(spec, obs, times, y0_base, theta0, key, walk_mask, *,
                   nits, burnin, a, n_walked, prior_logpdf, use_priors,
                   num_params, method, rtol, atol, max_steps, substeps):
    ikw = dict(method=method, rtol=rtol, atol=atol, max_steps=max_steps,
               substeps=substeps)
    W, P = theta0.shape
    H = W // 2

    def energy_terms(z):
        theta = jnp.exp(z)
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, **ikw)
        chi, rsq, aic = fit_metrics(spec, obs, ys, num_params)
        lp = prior_logpdf(theta) if use_priors else jnp.zeros((), z.dtype)
        return chi, rsq, aic, lp

    batch_metrics = jax.vmap(energy_terms)

    def half_update(carry: _Carry, key, lo):
        """Stretch-move update of walkers [lo, lo+H) with partners drawn
        from the complementary half [W-lo-H, W-lo)."""
        k_j, k_z, k_u = jax.random.split(key, 3)
        cur = jax.lax.dynamic_slice_in_dim(carry.log_theta, lo, H)
        comp_lo = H - lo  # 0 <-> H
        comp = jax.lax.dynamic_slice_in_dim(carry.log_theta, comp_lo, H)
        j = jax.random.randint(k_j, (H,), 0, H)
        partner = comp[j]                         # (H, P) gather
        z = _stretch_z(k_z, (H,), a, cur.dtype)   # (H,)
        # Y = X + (1 - z)(partner - X), restricted to walked dims
        # where() not *mask: masked dims of array params sit at
        # log(0) = -inf and (partner - cur) there is NaN; NaN*0 = NaN
        prop = jnp.where(walk_mask[None] > 0,
                         cur + (1.0 - z)[:, None] * (partner - cur),
                         cur)
        chi_n, rsq_n, aic_n, lp_n = batch_metrics(prop)

        cur_chi = jax.lax.dynamic_slice_in_dim(carry.chi, lo, H)
        cur_lp = jax.lax.dynamic_slice_in_dim(carry.lp, lo, H)
        # accept prob: z^(d-1) * exp(E_cur - E_prop), E = chi - log prior
        log_r = (n_walked - 1) * jnp.log(z) + (cur_chi - chi_n) \
            + (lp_n - cur_lp)
        u = jax.random.uniform(k_u, (H,), dtype=cur_chi.dtype)
        accept = jnp.exp(log_r) > u               # NaN -> False

        def upd(full, lo_, new, old):
            merged = jnp.where(
                accept.reshape((H,) + (1,) * (new.ndim - 1)), new, old)
            return jax.lax.dynamic_update_slice_in_dim(full, merged, lo_, 0)

        return carry._replace(
            log_theta=upd(carry.log_theta, lo, prop, cur),
            chi=upd(carry.chi, lo, chi_n, cur_chi),
            rsq=upd(carry.rsq, lo, rsq_n,
                    jax.lax.dynamic_slice_in_dim(carry.rsq, lo, H)),
            aic=upd(carry.aic, lo, aic_n,
                    jax.lax.dynamic_slice_in_dim(carry.aic, lo, H)),
            lp=upd(carry.lp, lo, lp_n, cur_lp),
            acc_count=jax.lax.dynamic_update_slice_in_dim(
                carry.acc_count,
                jax.lax.dynamic_slice_in_dim(carry.acc_count, lo, H)
                + accept.astype(carry.acc_count.dtype), lo, 0))

    def step(carry: _Carry, it):
        key, k_a, k_b = jax.random.split(carry.key, 3)
        carry = half_update(carry, k_a, 0)
        carry = half_update(carry, k_b, H)
        carry = carry._replace(key=key)
        record = (jnp.exp(carry.log_theta), carry.chi, carry.rsq,
                  carry.aic, carry.acc_count / it.astype(carry.chi.dtype))
        return carry, record

    z0 = jnp.log(theta0)
    chi0, rsq0, aic0, lp0 = batch_metrics(z0)
    carry = _Carry(log_theta=z0, chi=chi0, rsq=rsq0, aic=aic0, lp=lp0,
                   acc_count=jnp.zeros((W,), theta0.dtype), key=key)
    its = jnp.arange(1, nits, dtype=jnp.int32)
    carry, _ = jax.lax.scan(
        lambda c, it: (step(c, it)[0], None), carry, its[:burnin])
    _, recs = jax.lax.scan(step, carry, its[burnin:])
    return recs


def ensemble_mh(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, key, *,
        nits: int = 1000, burnin: Optional[int] = None, a: float = 2.0,
        walk_mask=None, init_jitter: float = 0.01,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
        max_steps: int = 4096, substeps=4, mesh=None) -> MHOutput:
    """Run one W-walker affine-invariant ensemble; returns MHOutput with
    the walker axis in the chains slot — drop-in for the posterior
    DataFrame machinery.

    Parameters
    ----------
    theta0 : (W, P) positive walker starts. W must be even and should be
        at least twice the number of walked parameters (the half-ensemble
        must span the walked subspace for the moves to be ergodic).
    key : single PRNG key for the whole ensemble (walkers are coupled, so
        per-walker streams do not apply).
    a : stretch scale (> 1). 2.0 is the standard choice; reduce toward 1
        to raise acceptance on hard targets.
    init_jitter : lognormal std applied to walked dims of ``theta0`` —
        seeding with replacement can duplicate rows, and an ensemble whose
        starts are collinear in some walked direction can never leave that
        subspace (moves are affine combinations of walker positions).
        Set 0.0 to disable.
    mesh : optional 1-D chain :class:`jax.sharding.Mesh`. Stretch moves
        couple walkers, so cross-device partner gathers would put a
        collective in the hot loop; instead each device runs an
        INDEPENDENT ensemble over its walker shard (zero collectives —
        the same layout as the fused kernel's per-tile ensembles,
        ops/pallas_mh.ensemble_fused). Walkers pad up so every device
        hosts an even ensemble of >= 4; padding rows are dropped from the
        output.
    """
    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    if a <= 1.0:
        raise ValueError(f"stretch scale a must exceed 1, got {a}")
    theta0 = jnp.atleast_2d(theta0)
    W, P = theta0.shape
    if W < 4 or W % 2:
        raise ValueError(f"ensemble needs an even number of walkers >= 4, "
                         f"got {W}")
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    n_walked = int(jnp.count_nonzero(walk_mask))
    if W < 2 * n_walked:
        import warnings
        warnings.warn(
            f"{W} walkers for {n_walked} walked parameters; use at least "
            f"{2 * n_walked} for reliable ensemble mixing")
    num_params = int(jnp.count_nonzero(theta0[0]))
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    if init_jitter:
        key, k_init = jax.random.split(key)
        theta0 = theta0 * jnp.exp(
            init_jitter * walk_mask[None, :]
            * jax.random.normal(k_init, theta0.shape, theta0.dtype))

    ikw = dict(nits=int(nits), burnin=int(burnin), a=float(a),
               n_walked=n_walked, prior_logpdf=prior_logpdf,
               use_priors=bool(use_priors), num_params=num_params,
               method=method, rtol=float(rtol), atol=float(atol),
               max_steps=int(max_steps),
               substeps=substeps if isinstance(substeps, tuple)
               else int(substeps))

    n_dev = 1 if mesh is None else int(mesh.devices.size)
    if n_dev > 1:
        from jax.sharding import PartitionSpec as PS

        W0 = W
        # every device hosts an even, >= 4-walker independent ensemble
        per_dev = max(4, -(-W0 // n_dev))
        per_dev += per_dev % 2
        W = per_dev * n_dev
        if W > W0:
            key, k_pad = jax.random.split(key)
            idx = jax.random.randint(k_pad, (W - W0,), 0, W0)
            reps = theta0[idx] * jnp.exp(
                0.05 * walk_mask[None, :] * jax.random.normal(
                    jax.random.fold_in(k_pad, 1), (W - W0, P),
                    theta0.dtype))
            theta0 = jnp.concatenate([theta0, reps], axis=0)
        axis = mesh.axis_names[0]

        def body(th_local, key_arr, obs_, times_, y0_):
            k = jax.random.fold_in(key_arr, jax.lax.axis_index(axis))
            return _ensemble_impl(spec, obs_, times_, y0_, th_local, k,
                                  walk_mask, **ikw)

        rec_specs = (PS(None, axis, None),) + (PS(None, axis),) * 4
        smap = jax.shard_map(
            body, mesh=mesh,
            in_specs=(PS(axis), PS(), PS(), PS(), PS()),
            out_specs=rec_specs, check_vma=False)
        outs = jax.jit(smap)(theta0, key, obs, times,
                             jnp.asarray(y0_base))
        theta_s, chi_s, rsq_s, aic_s, ar_s = [o[:, :W0] for o in outs]
    else:
        theta_s, chi_s, rsq_s, aic_s, ar_s = _ensemble_impl(
            spec, obs, times, y0_base, theta0, key, walk_mask, **ikw)
    # records carry the walker axis second: (R, W, ...) -> (W, R, ...)
    iterations = jnp.arange(1, nits)[burnin:]
    return MHOutput(theta=jnp.swapaxes(theta_s, 0, 1),
                    chi=jnp.swapaxes(chi_s, 0, 1),
                    rsquared=jnp.swapaxes(rsq_s, 0, 1),
                    aic=jnp.swapaxes(aic_s, 0, 1),
                    acceptance_ratio=jnp.swapaxes(ar_s, 0, 1),
                    iteration=iterations)
