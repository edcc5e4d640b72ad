"""Batched Metropolis-Hastings: lax.scan over iterations, vmap over chains.

TPU-native re-design of the reference single-chain sampler
(``/root/reference/ODElib/Statistics/Samplers.py:53-174``). Where the
reference runs one Python chain per OS process (``Framework.py:779-781``),
here every chain is a lane of a single XLA program: the whole ensemble —
proposal walk, ODE solve, chi-square, accept/reject — is one fused device
computation, scaling to 10k+ chains on a chip and sharding over a mesh via
data-parallel ``jax.sharding`` (see odelib_tpu.parallel).

Reference semantics preserved (SURVEY.md C15):

* multiplicative lognormal random walk with std 0.05 on every non-static
  parameter each iteration (``parameter.rwalk``, ``Framework.py:107-122``);
* initial conditions re-synced from ``<sname>0``-named parameters
  (``Samplers.py:111-114``);
* acceptance ratio ``exp(chi_old - chi_new)`` vs a uniform draw — priors are
  computed but UNUSED in the reference (``Samplers.py:118-127``, dead code);
  we default to the same likelihood-only rule and expose the corrected
  prior-aware acceptance as ``use_priors=True``;
* ``iterations = arange(1, nits)`` (nits-1 proposals), samples recorded
  strictly after ``burnin`` with running acceptance ratio
  (``Samplers.py:104,147-153``);
* a failed integration gives NaN chi, which compares False and is rejected —
  the NaN-tolerant failure model of the reference (SURVEY.md section 5.3).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import stats as jstats
from ..model import (ModelSpec, ObsData, fit_metrics, integrate_theta,
                     observe, score_pred)


class MHOutput(NamedTuple):
    """Post-burnin samples. Leading axes: (chains, records)."""
    theta: Any        # (C, R, P)
    chi: Any          # (C, R)
    rsquared: Any     # (C, R)
    aic: Any          # (C, R)
    acceptance_ratio: Any  # (C, R)
    iteration: Any    # (R,)


class _Carry(NamedTuple):
    log_theta: Any
    chi: Any
    rsq: Any
    aic: Any
    acc_count: Any
    key: Any


def _chain_step(spec: ModelSpec, obs: ObsData, times, y0_base, walk_mask,
                num_params, rwalk_std, prior_logpdf, use_priors, ikw,
                carry: _Carry, it):
    # counter-based streams: the chain key is CONSTANT and each iteration
    # folds in its global index, so any chunking of the scan (periodic
    # checkpointing) reproduces the exact same draws — a resumed run is
    # bitwise identical to an uninterrupted one (SURVEY.md section 5.4)
    key = carry.key
    k_eps, k_u = jax.random.split(
        jax.random.fold_in(carry.key, it.astype(jnp.int32)))
    eps = rwalk_std * jax.random.normal(
        k_eps, carry.log_theta.shape, carry.log_theta.dtype)
    prop_log = carry.log_theta + eps * walk_mask
    theta = jnp.exp(prop_log)

    y0 = spec.override_inits(y0_base, theta)
    ys = integrate_theta(spec, theta, y0, times, **ikw)
    chi_new, rsq_new, aic_new = fit_metrics(spec, obs, ys, num_params)

    log_ratio = carry.chi - chi_new
    if use_priors:
        log_ratio = log_ratio + (prior_logpdf(jnp.exp(prop_log))
                                 - prior_logpdf(jnp.exp(carry.log_theta)))
    u = jax.random.uniform(k_u, dtype=carry.chi.dtype)
    # NaN chi_new -> log_ratio NaN -> comparison False -> rejected.
    accept = jnp.exp(log_ratio) > u

    new = _Carry(
        log_theta=jnp.where(accept, prop_log, carry.log_theta),
        chi=jnp.where(accept, chi_new, carry.chi),
        rsq=jnp.where(accept, rsq_new, carry.rsq),
        aic=jnp.where(accept, aic_new, carry.aic),
        acc_count=carry.acc_count + accept.astype(carry.acc_count.dtype),
        key=key,
    )
    record = (jnp.exp(new.log_theta), new.chi, new.rsq, new.aic,
              new.acc_count / it.astype(new.chi.dtype))
    return new, record


@partial(jax.jit, static_argnames=(
    "spec", "nits", "burnin", "rwalk_std", "prior_logpdf", "use_priors",
    "num_params", "method", "rtol", "atol", "max_steps", "substeps"))
def _mh_impl(spec, obs, times, y0_base, theta0, keys, walk_mask, *,
             nits, burnin, rwalk_std, prior_logpdf, use_priors, num_params,
             method, rtol, atol, max_steps, substeps):
    ikw = dict(method=method, rtol=rtol, atol=atol, max_steps=max_steps,
               substeps=substeps)
    step = partial(_chain_step, spec, obs, times, y0_base, walk_mask,
                   num_params, rwalk_std, prior_logpdf, use_priors, ikw)

    def one_chain(th0, key):
        y0 = spec.override_inits(y0_base, th0)
        ys = integrate_theta(spec, th0, y0, times, **ikw)
        chi0, rsq0, aic0 = fit_metrics(spec, obs, ys, num_params)
        carry = _Carry(log_theta=jnp.log(th0), chi=chi0, rsq=rsq0, aic=aic0,
                       acc_count=jnp.asarray(0.0, th0.dtype), key=key)
        its = jnp.arange(1, nits, dtype=jnp.int32)
        # burn phase: no recording -> half the output memory
        carry, _ = jax.lax.scan(
            lambda c, it: (step(c, it)[0], None), carry, its[:burnin])
        carry, recs = jax.lax.scan(step, carry, its[burnin:])
        return recs

    return jax.vmap(one_chain)(theta0, keys)


def metropolis_hastings(
        spec: ModelSpec, obs: ObsData, times, y0_base,
        theta0, keys, *, nits: int = 1000, burnin: Optional[int] = None,
        walk_mask=None, rwalk_std: float = 0.05,
        prior_logpdf: Optional[Callable] = None, use_priors: bool = False,
        method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
        max_steps: int = 4096, substeps: int = 4) -> MHOutput:
    """Run C independent MH chains as one jitted device program.

    Parameters
    ----------
    theta0 : (C, P) initial flat parameter vectors (positive).
    keys : (C,) per-chain PRNG keys (the reference's
        ``np.random.seed(chain_i)`` becomes folded JAX keys; SURVEY.md section
        7 "RNG discipline" — posterior parity is statistical, never bitwise).
    walk_mask : (P,) 1.0 for walked parameters, 0.0 for static ones.
    prior_logpdf : theta -> scalar log prior (required if use_priors).

    The jit cache is keyed on (spec, solver settings): repeated calls with
    the same model — including via ``ModelFramework.copy()`` — do not
    recompile.
    """
    if burnin is None:
        burnin = int(nits / 2)
    # Match the fused backend's error for the degenerate configuration
    # (burnin consumes every proposal) instead of silently returning
    # zero-record outputs.
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    num_params = int(jnp.count_nonzero(theta0[0]))  # Framework.py:261-263
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")

    theta_s, chi_s, rsq_s, aic_s, ar_s = _mh_impl(
        spec, obs, times, y0_base, theta0, keys, walk_mask,
        nits=int(nits), burnin=int(burnin), rwalk_std=float(rwalk_std),
        prior_logpdf=prior_logpdf, use_priors=bool(use_priors),
        num_params=num_params, method=method, rtol=float(rtol),
        atol=float(atol), max_steps=int(max_steps),
        substeps=substeps if isinstance(substeps, tuple) else int(substeps))
    iterations = jnp.arange(1, nits)[burnin:]
    return MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                    acceptance_ratio=ar_s, iteration=iterations)


@partial(jax.jit, static_argnames=(
    "spec", "num_params", "method", "rtol", "atol", "max_steps",
    "substeps"))
def _mh_init_state(spec, obs, times, y0_base, theta0, *, num_params,
                   method, rtol, atol, max_steps, substeps):
    ikw = dict(method=method, rtol=rtol, atol=atol, max_steps=max_steps,
               substeps=substeps)

    def one(th0):
        y0 = spec.override_inits(y0_base, th0)
        ys = integrate_theta(spec, th0, y0, times, **ikw)
        chi0, rsq0, aic0 = fit_metrics(spec, obs, ys, num_params)
        return (jnp.log(th0), chi0, rsq0, aic0,
                jnp.asarray(0.0, th0.dtype))

    return jax.vmap(one)(theta0)


@partial(jax.jit, static_argnames=(
    "spec", "rwalk_std", "prior_logpdf", "use_priors", "num_params",
    "method", "rtol", "atol", "max_steps", "substeps", "record"))
def _mh_chunk_impl(spec, obs, times, y0_base, state, keys, its,
                   walk_mask, *, rwalk_std, prior_logpdf, use_priors,
                   num_params, method, rtol, atol, max_steps, substeps,
                   record=True):
    """One checkpoint chunk of the XLA MH scan over the traced iteration
    numbers ``its`` (traced, not static — every equal-length chunk
    reuses one compiled program instead of recompiling per offset).
    Because draws are counter-based on the global iteration (see
    _chain_step), the chunk boundaries are bitwise-invisible.
    ``record=False`` runs the burn-in program: no record outputs, so
    nothing is transferred to host or persisted for iterations the final
    slice would discard anyway."""
    ikw = dict(method=method, rtol=rtol, atol=atol, max_steps=max_steps,
               substeps=substeps)
    step = partial(_chain_step, spec, obs, times, y0_base, walk_mask,
                   num_params, rwalk_std, prior_logpdf, use_priors, ikw)

    def one_chain(st, key):
        lt, chi, rsq, aic, acc = st
        carry = _Carry(log_theta=lt, chi=chi, rsq=rsq, aic=aic,
                       acc_count=acc, key=key)
        if record:
            carry, recs = jax.lax.scan(step, carry, its)
        else:
            carry, recs = jax.lax.scan(
                lambda c, it: (step(c, it)[0], None), carry, its)
        return (carry.log_theta, carry.chi, carry.rsq, carry.aic,
                carry.acc_count), recs

    return jax.vmap(one_chain)(state, keys)


def metropolis_hastings_checkpointed(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, keys, *,
        nits: int = 1000, burnin: Optional[int] = None,
        walk_mask=None, rwalk_std: float = 0.05,
        prior_logpdf: Optional[Callable] = None, use_priors: bool = False,
        method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
        max_steps: int = 4096, substeps: int = 4,
        config_token: str = "",
        checkpoint_every: int = 100, checkpoint_path: Optional[str] = None,
        resume_from: Optional[str] = None,
        _stop_after_chunks: Optional[int] = None) -> MHOutput:
    """Periodically-checkpointed XLA MH (VERDICT r2 weak 4): the scan is
    split into chunks of ``checkpoint_every`` proposals; after each chunk
    the chain state and records so far are persisted (npz) so a killed
    run resumes via ``resume_from``. The per-iteration draws are
    counter-based on the global iteration, so a chunked / killed /
    resumed run is BITWISE identical to :func:`metropolis_hastings` with
    the same arguments — any integrator, including the stiff adaptive
    methods the fused kernel cannot run.

    ``_stop_after_chunks``: test hook simulating a mid-run kill.
    """
    import os

    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    E = int(checkpoint_every)
    if E < 1:
        raise ValueError("checkpoint_every must be >= 1")
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    num_params = int(jnp.count_nonzero(theta0[0]))
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    skw = dict(method=method, rtol=float(rtol), atol=float(atol),
               max_steps=int(max_steps),
               substeps=substeps if isinstance(substeps, tuple)
               else int(substeps))

    R = nits - 1
    n_chunks = -(-R // E)
    # E is part of the signature: next_chunk is denominated in chunks of
    # E, so a different checkpoint_every on resume would silently skip or
    # replay iterations
    # config_token: caller-supplied PROCESS-STABLE digest of the target
    # density's data/prior configuration (obs arrays, time grid, inits,
    # prior hyperparameters) — shape/knob checks alone cannot catch a
    # same-shaped edit, which would silently stitch samples from two
    # different posteriors on resume
    sig = repr(("xla-mh", spec.pnames, spec.pshapes, P,
                int(theta0.shape[0]), nits, int(burnin), E,
                float(rwalk_std),
                tuple(float(w) for w in np.asarray(walk_mask)),
                bool(use_priors), skw["method"], skw["rtol"], skw["atol"],
                skw["max_steps"], skw["substeps"], str(config_token)))

    k0, state, recs = 0, None, []
    if resume_from:
        with np.load(resume_from, allow_pickle=False) as z:
            saved_sig = bytes(z["sig"]).decode()
            if saved_sig != sig:
                raise ValueError(
                    "checkpoint was written by a different MCMC "
                    f"configuration:\n  saved: {saved_sig}\n  this:  {sig}")
            k0 = int(z["next_chunk"])
            state = tuple(jnp.asarray(z[f"state{i}"]) for i in range(5))
            keys = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
            if "rec0" in z:
                recs = [tuple(z[f"rec{i}"] for i in range(5))]
    if state is None:
        state = _mh_init_state(spec, obs, times, y0_base, theta0,
                               num_params=num_params, **skw)

    dtype = theta0.dtype
    for k in range(k0, n_chunks):
        lo, hi = 1 + k * E, 1 + min((k + 1) * E, R)
        # a chunk straddling the burnin boundary is split: the warmup
        # part runs the no-record program (its records would be sliced
        # away anyway — persisting them is pure wasted I/O)
        for a, b in ((lo, min(hi, burnin + 1)), (max(lo, burnin + 1), hi)):
            if a >= b:
                continue
            its = jnp.arange(a, b, dtype=jnp.int32)
            state, out = _mh_chunk_impl(
                spec, obs, times, y0_base, state, keys, its, walk_mask,
                rwalk_std=float(rwalk_std),
                prior_logpdf=prior_logpdf, use_priors=bool(use_priors),
                num_params=num_params, record=(a > burnin), **skw)
            if out is not None:
                recs.append(tuple(np.asarray(o) for o in out))
        if checkpoint_path:
            save = dict(sig=np.frombuffer(sig.encode(), np.uint8),
                        next_chunk=np.asarray(k + 1),
                        key_data=np.asarray(jax.random.key_data(keys)),
                        **{f"state{i}": np.asarray(state[i])
                           for i in range(5)})
            if recs:
                merged = tuple(
                    np.concatenate([r[i] for r in recs], axis=1)
                    for i in range(5))
                recs = [merged]
                save.update({f"rec{i}": merged[i] for i in range(5)})
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez_compressed(f, **save)
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


def survey(spec: ModelSpec, obs: ObsData, times, y0_base, thetas, *,
           method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
           max_steps: int = 4096, substeps: int = 4):
    """Batched fit survey: chi for every parameter draw — the vmapped
    equivalent of ``_Fit_worker`` (``Framework.py:41-48``)."""
    def one(theta):
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, method=method,
                             rtol=rtol, atol=atol, max_steps=max_steps,
                             substeps=substeps)
        pred = observe(spec, obs, ys)
        return score_pred(spec, obs, pred)

    return jax.vmap(one)(thetas)


def equilibriums(spec: ModelSpec, times, y0_base, thetas, *,
                 method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
                 max_steps: int = 4096, substeps: int = 4,
                 return_residual: bool = False, newton_steps: int = 0):
    """Final integration state per draw, raw states (no summations) — the
    vmapped ``_Equilibrium_worker`` (``Framework.py:24-38``).

    The reference performs no convergence check (its own comment,
    ``Framework.py:26-27``); by default this matches. With
    ``return_residual=True`` it also returns the relative RHS norm at the
    final state, ``|f(t_end, y_end)| / (1 + |y_end|)`` per draw — a cheap,
    vmapped measure of how much the state was still moving, so callers can
    flag draws that never settled.

    ``newton_steps > 0`` polishes each endpoint to the nearby fixed point
    by damped Newton on ``f(t_end, y) = 0`` (Jacobian via ``jacfwd``,
    dense solve — states are tiny vectors). A step is kept only where it
    reduces the residual norm, so a non-equilibrium endpoint (e.g. on a
    limit cycle) stays put rather than being flung; use the residual
    column to tell the cases apart."""
    def one(theta):
        ps = spec.unpack_theta(theta)
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, method=method,
                             rtol=rtol, atol=atol, max_steps=max_steps,
                             substeps=substeps)
        y_end = ys[-1]

        def f(y):
            return spec.rhs(times[-1], y, ps)

        def newton(y, _):
            fy = f(y)
            J = jax.jacfwd(f)(y)
            # guarded dense solve + backtracking line search: evaluate a
            # few damped candidates and keep whichever (including the
            # current point) has the smallest finite residual
            step = jnp.linalg.solve(
                J + 1e-12 * jnp.eye(y.shape[0], dtype=y.dtype), fy)
            alphas = jnp.asarray([1.0, 0.5, 0.25, 0.0625], y.dtype)
            cands = y[None, :] - alphas[:, None] * step[None, :]
            cands = jnp.concatenate([cands, y[None, :]], axis=0)
            norms = jax.vmap(lambda c: jnp.linalg.norm(f(c)))(cands)
            norms = jnp.where(
                jnp.all(jnp.isfinite(cands), axis=1)
                & jnp.isfinite(norms), norms, jnp.inf)
            return cands[jnp.argmin(norms)], None

        if newton_steps:
            y_end, _ = jax.lax.scan(newton, y_end, None,
                                    length=newton_steps)
        if not return_residual:
            return y_end
        f_end = f(y_end)
        res = jnp.sqrt(jnp.mean((f_end / (1.0 + jnp.abs(y_end))) ** 2))
        return y_end, res

    return jax.vmap(one)(thetas)
