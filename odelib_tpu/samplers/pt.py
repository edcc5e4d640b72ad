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

Swap-rate convention: reported rates are accepted swaps / PROPOSED swaps
for that pair. Parity alternation only proposes each adjacent pair every
other swap round, so the denominator is the pair's attempt count
(:func:`swap_attempts`), not the total round count — dividing by all
rounds (the r3 convention) understated the per-proposal rate by ~2x.

:func:`tune_ladder` adapts a geometric ladder's ratio toward a target
mean swap acceptance (~0.3) with short pilot runs — the standard
round-trip-friendly operating point — so users need not hand-guess
``temperatures``.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model import ModelSpec, ObsData, fit_metrics, integrate_theta
from .mh import MHOutput


class _Carry(NamedTuple):
    log_theta: Any    # (K, P)
    chi: Any          # (K,)
    rsq: Any
    aic: Any
    lp: Any           # (K,) log prior (zeros when unused)
    acc_count: Any    # scalar: T=1 walk acceptances
    swap_count: Any   # (K-1,): accepted swaps per adjacent pair
    key: Any


def swap_attempts(nits: int, swap_every: int, n_pairs: int) -> np.ndarray:
    """Per-pair PROPOSAL counts over iterations 1..nits-1: pair k is
    proposed on swap rounds whose parity matches k % 2."""
    its = np.arange(1, int(nits))
    rounds = its[its % int(swap_every) == 0]
    parity = (rounds // int(swap_every)) % 2
    return np.array([(parity == (k % 2)).sum() for k in range(n_pairs)],
                    dtype=float)


def _make_pt_step(spec, obs, times, y0_base, walk_mask, *, temperatures,
                  rwalk_std, prior_logpdf, use_priors, num_params, method,
                  rtol, atol, max_steps, substeps, swap_every, dtype):
    """Shared iteration body for the straight-through and checkpointed
    drivers. The PRNG key rides the carry (split per step), so chunked
    runs are bitwise-identical as long as the carry round-trips exactly."""
    ikw = dict(method=method, rtol=rtol, atol=atol, max_steps=max_steps,
               substeps=substeps)
    temps = jnp.asarray(temperatures, dtype)
    betas = 1.0 / temps                      # (K,), descending
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
            swap_count=carry.swap_count + sflag.astype(chi.dtype),
            key=key)
        record = (jnp.exp(log_theta[0]), chi[0], rsq[0], aic[0],
                  new.acc_count / it.astype(new.chi.dtype))
        return new, record

    def init_carry(th0, key):
        K = len(temperatures)
        z0 = jnp.tile(jnp.log(th0)[None, :], (K, 1))
        chi0, rsq0, aic0, lp0 = batch_metrics(z0)
        return _Carry(log_theta=z0, chi=chi0, rsq=rsq0, aic=aic0, lp=lp0,
                      acc_count=jnp.asarray(0.0, th0.dtype),
                      swap_count=jnp.zeros((K - 1,), th0.dtype), key=key)

    return step, init_carry


@partial(jax.jit, static_argnames=(
    "spec", "nits", "burnin", "temperatures", "rwalk_std", "prior_logpdf",
    "use_priors", "num_params", "method", "rtol", "atol", "max_steps",
    "substeps", "swap_every"))
def _pt_impl(spec, obs, times, y0_base, theta0, keys, walk_mask, *,
             nits, burnin, temperatures, rwalk_std, prior_logpdf,
             use_priors, num_params, method, rtol, atol, max_steps,
             substeps, swap_every):
    step, init_carry = _make_pt_step(
        spec, obs, times, y0_base, walk_mask, temperatures=temperatures,
        rwalk_std=rwalk_std, prior_logpdf=prior_logpdf,
        use_priors=use_priors, num_params=num_params, method=method,
        rtol=rtol, atol=atol, max_steps=max_steps, substeps=substeps,
        swap_every=swap_every, dtype=theta0.dtype)

    def one_chain(th0, key):
        carry = init_carry(th0, key)
        its = jnp.arange(1, nits, dtype=jnp.int32)
        carry, _ = jax.lax.scan(
            lambda c, it: (step(c, it)[0], None), carry, its[:burnin])
        carry, recs = jax.lax.scan(step, carry, its[burnin:])
        return recs, carry.swap_count

    return jax.vmap(one_chain)(theta0, keys)


def _validate_ladder(temperatures):
    temperatures = tuple(float(t) for t in temperatures)
    if len(temperatures) < 2:
        raise ValueError("parallel tempering needs >= 2 temperatures")
    if temperatures[0] != 1.0:
        raise ValueError("temperatures[0] must be 1.0 (the posterior rung)")
    if any(b >= a for b, a in zip(temperatures, temperatures[1:])):
        raise ValueError("temperatures must be strictly increasing")
    return temperatures


def parallel_tempering(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, keys, *,
        temperatures: Tuple[float, ...] = (1.0, 2.0, 4.0, 8.0),
        nits: int = 1000, burnin: Optional[int] = None, swap_every: int = 1,
        walk_mask=None, rwalk_std: float = 0.05,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
        max_steps: int = 4096, substeps=4):
    """Run C tempered ensembles; returns ``(MHOutput for the T=1 replica,
    per-chain per-pair swap acceptance (C, K-1))``.

    ``temperatures`` must start at 1.0 and increase; each of the C chains
    carries the full ladder (total device work = C * K * solve per
    iteration). Walk std scales with sqrt(T) per rung. Swap rates are
    normalized per PROPOSAL (see :func:`swap_attempts`); column 0 is the
    cold (1, 2) pair. Same input/output conventions as
    :func:`~odelib_tpu.samplers.mh.metropolis_hastings`.
    """
    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    temperatures = _validate_ladder(temperatures)
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    num_params = int(jnp.count_nonzero(theta0[0]))
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")

    recs, swap_counts = _pt_impl(
        spec, obs, times, y0_base, theta0, keys, walk_mask,
        nits=int(nits), burnin=int(burnin), temperatures=temperatures,
        rwalk_std=float(rwalk_std), prior_logpdf=prior_logpdf,
        use_priors=bool(use_priors), num_params=num_params,
        method=method, rtol=float(rtol), atol=float(atol),
        max_steps=int(max_steps),
        substeps=substeps if isinstance(substeps, tuple) else int(substeps),
        swap_every=int(swap_every))
    theta_s, chi_s, rsq_s, aic_s, ar_s = recs
    att = swap_attempts(nits, swap_every, len(temperatures) - 1)
    swap_rate = np.asarray(swap_counts) / np.maximum(att, 1.0)[None, :]
    iterations = jnp.arange(1, nits)[burnin:]
    out = MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                   acceptance_ratio=ar_s, iteration=iterations)
    return out, jnp.asarray(swap_rate)


@partial(jax.jit, static_argnames=(
    "spec", "temperatures", "rwalk_std", "prior_logpdf", "use_priors",
    "num_params", "method", "rtol", "atol", "max_steps", "substeps",
    "swap_every", "record"))
def _pt_chunk_impl(spec, obs, times, y0_base, state, its, walk_mask, *,
                   temperatures, rwalk_std, prior_logpdf, use_priors,
                   num_params, method, rtol, atol, max_steps, substeps,
                   swap_every, record=True):
    """One checkpoint chunk of the PT scan over traced GLOBAL iteration
    numbers ``its``. The PRNG key is part of the persisted carry, so a
    chunked run is bitwise-identical to an uninterrupted one."""
    step, _ = _make_pt_step(
        spec, obs, times, y0_base, walk_mask, temperatures=temperatures,
        rwalk_std=rwalk_std, prior_logpdf=prior_logpdf,
        use_priors=use_priors, num_params=num_params, method=method,
        rtol=rtol, atol=atol, max_steps=max_steps, substeps=substeps,
        swap_every=swap_every, dtype=state[0].dtype)

    def one_chain(st):
        carry = _Carry(*st)
        if record:
            carry, recs = jax.lax.scan(step, carry, its)
        else:
            carry, recs = jax.lax.scan(
                lambda c, it: (step(c, it)[0], None), carry, its)
        return tuple(carry), recs

    return jax.vmap(one_chain)(state)


@partial(jax.jit, static_argnames=("spec", "temperatures", "prior_logpdf",
                                   "use_priors", "num_params", "method",
                                   "rtol", "atol", "max_steps", "substeps"))
def _pt_init_state(spec, obs, times, y0_base, theta0, keys, *,
                   temperatures, prior_logpdf, use_priors, num_params,
                   method, rtol, atol, max_steps, substeps):
    _, init_carry = _make_pt_step(
        spec, obs, times, y0_base, jnp.ones_like(theta0[0]),
        temperatures=temperatures, rwalk_std=0.0,
        prior_logpdf=prior_logpdf, use_priors=use_priors,
        num_params=num_params, method=method, rtol=rtol, atol=atol,
        max_steps=max_steps, substeps=substeps, swap_every=1,
        dtype=theta0.dtype)
    return jax.vmap(lambda t, k: tuple(init_carry(t, k)))(theta0, keys)


def parallel_tempering_checkpointed(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, keys, *,
        temperatures: Tuple[float, ...] = (1.0, 2.0, 4.0, 8.0),
        nits: int = 1000, burnin: Optional[int] = None, swap_every: int = 1,
        walk_mask=None, rwalk_std: float = 0.05,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "dopri5", rtol: float = 1e-6, atol: float = 1e-4,
        max_steps: int = 4096, substeps=4,
        config_token: str = "", checkpoint_every: int = 100,
        checkpoint_path: Optional[str] = None,
        resume_from: Optional[str] = None,
        _stop_after_chunks: Optional[int] = None):
    """Periodically-checkpointed :func:`parallel_tempering` — the r3
    verdict's one missing sampler checkpoint (api warned it off). The
    per-chain scan splits into ``checkpoint_every``-proposal chunks;
    after each chunk the FULL ladder state (all K rungs' log-theta/chi/
    R^2/AIC/log-prior, walk + per-pair swap counters, PRNG key) and the
    records so far persist to ``checkpoint_path`` (npz, atomic rename).
    A killed run resumes via ``resume_from`` BITWISE identical to an
    uninterrupted one (the key rides the carry and the carry
    round-trips exactly). The persisted signature fingerprints the
    sampler configuration + ``config_token`` so resuming against a
    different posterior fails loudly. Same returns as
    :func:`parallel_tempering`; ``None`` if stopped early (test hook).
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
    temperatures = _validate_ladder(temperatures)
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    num_params = int(jnp.count_nonzero(theta0[0]))
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    skw = dict(temperatures=temperatures, rwalk_std=float(rwalk_std),
               prior_logpdf=prior_logpdf, use_priors=bool(use_priors),
               num_params=num_params, method=method, rtol=float(rtol),
               atol=float(atol), max_steps=int(max_steps),
               substeps=substeps if isinstance(substeps, tuple)
               else int(substeps), swap_every=int(swap_every))
    ikw = {k: skw[k] for k in ("temperatures", "prior_logpdf",
                               "use_priors", "num_params", "method",
                               "rtol", "atol", "max_steps", "substeps")}

    R = nits - 1
    n_chunks = -(-R // E)
    sig = repr(("pt", spec.pnames, spec.pshapes, P, int(theta0.shape[0]),
                nits, int(burnin), E, float(rwalk_std), temperatures,
                int(swap_every),
                tuple(float(w) for w in np.asarray(walk_mask)),
                bool(use_priors), method,
                skw["substeps"], str(config_token)))

    N_STATE = 8   # _Carry fields
    k0, state, recs = 0, None, []
    if resume_from:
        with np.load(resume_from, allow_pickle=False) as z:
            saved_sig = bytes(z["sig"]).decode()
            if saved_sig != sig:
                raise ValueError(
                    "checkpoint was written by a different PT "
                    f"configuration:\n  saved: {saved_sig}\n  this:  {sig}")
            k0 = int(z["next_chunk"])
            state = []
            for i in range(N_STATE):
                a = jnp.asarray(z[f"state{i}"])
                if i == N_STATE - 1:   # key leaf persisted as key data
                    a = jax.random.wrap_key_data(a)
                state.append(a)
            state = tuple(state)
            if "rec0" in z:
                recs = [tuple(z[f"rec{i}"] for i in range(5))]
    if state is None:
        state = _pt_init_state(spec, obs, times, y0_base, theta0, keys,
                               **ikw)

    for k in range(k0, n_chunks):
        lo, hi = 1 + k * E, 1 + min((k + 1) * E, R)
        for a, b in ((lo, min(hi, burnin + 1)), (max(lo, burnin + 1), hi)):
            if a >= b:
                continue
            its = jnp.arange(a, b, dtype=jnp.int32)
            state, out = _pt_chunk_impl(
                spec, obs, times, y0_base, state, its, walk_mask,
                record=(a > burnin), **skw)
            if out is not None:
                recs.append(tuple(np.asarray(o) for o in out))
        if checkpoint_path:
            save = dict(sig=np.frombuffer(sig.encode(), np.uint8),
                        next_chunk=np.asarray(k + 1))
            for i, s in enumerate(state):
                save[f"state{i}"] = np.asarray(
                    jax.random.key_data(s) if i == N_STATE - 1 else s)
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
    att = swap_attempts(nits, swap_every, len(temperatures) - 1)
    swap_rate = np.asarray(state[6]) / np.maximum(att, 1.0)[None, :]
    iterations = jnp.arange(1, nits)[burnin:]
    out = MHOutput(theta=jnp.asarray(th), chi=jnp.asarray(chi),
                   rsquared=jnp.asarray(rsq), aic=jnp.asarray(aic),
                   acceptance_ratio=jnp.asarray(ar), iteration=iterations)
    return out, jnp.asarray(swap_rate)


def tune_ladder(spec: ModelSpec, obs: ObsData, times, y0_base, theta0,
                keys, *, n_temps: int = 4, target_swap: float = 0.3,
                pilot_iters: int = 150, max_rounds: int = 6,
                r_init: float = 2.0, walk_mask=None,
                rwalk_std: float = 0.05, prior_logpdf=None,
                use_priors: bool = False, swap_every: int = 1,
                method: str = "dopri5", rtol: float = 1e-6,
                atol: float = 1e-4, max_steps: int = 4096, substeps=4,
                verbose: bool = False):
    """Adapt a geometric temperature ladder ``T_k = r^k`` toward a mean
    adjacent-pair swap acceptance of ``target_swap`` (~0.3, the standard
    round-trip operating point; e.g. Rathore et al. 2005, Kone & Kofke
    2005 suggest ~0.23-0.4).

    Short pilot :func:`parallel_tempering` runs measure the mean
    per-proposal swap acceptance at the current ratio; ``r`` is then
    updated by bisection on ``log r`` (acceptance decreases monotonically
    in ``r``). Returns ``(temperatures, mean_swap_acceptance)`` — feed
    the tuned ladder to the production run on either backend (the fused
    kernel bakes temperatures in as static constants, so adaptation has
    to happen in this pre-phase rather than mid-kernel).
    """
    if n_temps < 2:
        raise ValueError("n_temps must be >= 2")
    lo, hi = np.log(1.0 + 1e-3), np.log(64.0)
    lr = np.log(float(r_init))
    pilot_kw = dict(nits=int(pilot_iters),
                    burnin=max(1, int(pilot_iters) // 3),
                    swap_every=swap_every, walk_mask=walk_mask,
                    rwalk_std=rwalk_std, prior_logpdf=prior_logpdf,
                    use_priors=use_priors, method=method, rtol=rtol,
                    atol=atol, max_steps=max_steps, substeps=substeps)
    acc = float("nan")
    temps = (1.0,) + tuple(float(np.exp(lr) ** k)
                           for k in range(n_temps))[1:]
    for rd in range(int(max_rounds)):
        # evaluate the CURRENT ladder; `temps` always holds the ladder
        # the returned `acc` was measured at — when the loop exits by
        # max_rounds we return this evaluated pair, never a
        # bisected-but-unmeasured ladder (the (temps, acc) pair must be
        # consistent).
        temps = (1.0,) + tuple(float(np.exp(lr) ** k)
                               for k in range(n_temps))[1:]
        _, swap_rate = parallel_tempering(
            spec, obs, times, y0_base, theta0, keys,
            temperatures=temps, **pilot_kw)
        acc = float(np.mean(np.asarray(swap_rate)))
        if verbose:
            print(f"tune_ladder round {rd}: r={np.exp(lr):.3f} "
                  f"mean swap acc={acc:.3f}")
        if abs(acc - target_swap) < 0.05:
            break
        # acceptance too HIGH -> rungs too close -> grow r
        if acc > target_swap:
            lo = lr
        else:
            hi = lr
        lr = 0.5 * (lo + hi)
    return temps, acc
