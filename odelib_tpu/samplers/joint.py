"""Joint multi-experiment fitting with shared parameters.

Biologists rarely have one dataset: the same mechanism is measured across
replicate experiments/conditions, and the scientifically right fit ties
the mechanistic constants across experiments while letting per-condition
parameters (initial states, condition-specific rates) float. The
reference's ``ModelFramework`` binds exactly one DataFrame
(``/root/reference/ODElib/Framework.py:168-263``); the closest it offers
is folding replicate *columns* into log-moments (``Framework.py:287-
298``) — there is no shared-parameter structure at all.

TPU-native shape: the joint log-likelihood is a SUM of per-experiment
chi terms, each an independent fused integrate+score on its own
(spec, obs, times, y0) — all K experiments evaluated inside one jitted
chain step (XLA fuses them side by side; no host loop), ``lax.scan``
over iterations, ``vmap`` over chains, exactly the conventions of
samplers/mh.py. The joint parameter vector is
``[shared..., exp1-free..., exp2-free..., ...]`` with static gather
indices per experiment, so the packing compiles to plain ``jnp.take``.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model import chi_of_theta


class JointOutput(NamedTuple):
    theta: Any             # (C, R, D) joint parameter records
    chi: Any               # (C, R) total chi
    chi_parts: Any         # (C, R, K) per-experiment chi
    acceptance_ratio: Any  # (C, R)
    iteration: Any         # (R,)


class _Carry(NamedTuple):
    log_theta: Any
    chi: Any        # scalar total
    parts: Any      # (K,)
    acc: Any
    key: Any


def _total_chi_fn(specs, idx_maps, obs_list, times_list, y0_list,
                  method, substeps_list):
    K = len(specs)

    def total_chi(theta_joint):
        parts = []
        for k in range(K):
            th_k = jnp.take(theta_joint, jnp.asarray(idx_maps[k]))
            parts.append(chi_of_theta(
                specs[k], obs_list[k], th_k, y0_list[k], times_list[k],
                method=method, substeps=substeps_list[k]))
        parts = jnp.stack(parts)
        return jnp.sum(parts), parts

    return total_chi


def _joint_step_fn(total_chi, walk_mask, rwalk_std, prior_logpdf,
                   use_priors):
    """The shared per-iteration MH step over the joint theta (used by the
    one-shot and the checkpointed drivers)."""
    def step(carry: _Carry, it):
        key, k_eps, k_u = jax.random.split(carry.key, 3)
        eps = rwalk_std * jax.random.normal(
            k_eps, carry.log_theta.shape, carry.log_theta.dtype)
        prop = carry.log_theta + eps * walk_mask
        chi_n, parts_n = total_chi(jnp.exp(prop))
        log_ratio = carry.chi - chi_n
        if use_priors:
            log_ratio = log_ratio + (prior_logpdf(jnp.exp(prop))
                                     - prior_logpdf(jnp.exp(carry.log_theta)))
        u = jax.random.uniform(k_u, dtype=carry.chi.dtype)
        accept = jnp.exp(log_ratio) > u     # NaN -> rejected
        new = _Carry(
            log_theta=jnp.where(accept, prop, carry.log_theta),
            chi=jnp.where(accept, chi_n, carry.chi),
            parts=jnp.where(accept, parts_n, carry.parts),
            acc=carry.acc + accept.astype(carry.chi.dtype),
            key=key)
        rec = (jnp.exp(new.log_theta), new.chi, new.parts,
               new.acc / it.astype(new.chi.dtype))
        return new, rec

    return step


@partial(jax.jit, static_argnames=(
    "specs", "idx_maps", "nits", "burnin", "rwalk_std", "prior_logpdf",
    "use_priors", "method", "substeps_list"))
def _joint_impl(specs, idx_maps, obs_list, times_list, y0_list, theta0,
                keys, walk_mask, *, nits, burnin, rwalk_std, prior_logpdf,
                use_priors, method, substeps_list):
    total_chi = _total_chi_fn(specs, idx_maps, obs_list, times_list,
                              y0_list, method, substeps_list)
    step = _joint_step_fn(total_chi, walk_mask, rwalk_std, prior_logpdf,
                          use_priors)

    def one_chain(th0, key):
        chi0, parts0 = total_chi(th0)
        carry = _Carry(log_theta=jnp.log(th0), chi=chi0, parts=parts0,
                       acc=jnp.asarray(0.0, th0.dtype), key=key)
        its = jnp.arange(1, nits, dtype=jnp.int32)
        carry, _ = jax.lax.scan(
            lambda c, it: (step(c, it)[0], None), carry, its[:burnin])
        _, recs = jax.lax.scan(step, carry, its[burnin:])
        return recs

    return jax.vmap(one_chain)(theta0, keys)


@partial(jax.jit, static_argnames=(
    "specs", "idx_maps", "method", "substeps_list"))
def _joint_init_state(specs, idx_maps, obs_list, times_list, y0_list,
                      theta0, *, method, substeps_list):
    total_chi = _total_chi_fn(specs, idx_maps, obs_list, times_list,
                              y0_list, method, substeps_list)

    def one(th0):
        chi0, parts0 = total_chi(th0)
        return (jnp.log(th0), chi0, parts0,
                jnp.asarray(0.0, th0.dtype))

    return jax.vmap(one)(theta0)


@partial(jax.jit, static_argnames=(
    "specs", "idx_maps", "rwalk_std", "prior_logpdf", "use_priors",
    "method", "substeps_list", "record"))
def _joint_chunk_impl(specs, idx_maps, obs_list, times_list, y0_list,
                      state, keys, its, walk_mask, *, rwalk_std,
                      prior_logpdf, use_priors, method, substeps_list,
                      record):
    """One checkpoint chunk of the joint XLA scan over the traced
    iteration numbers ``its`` (traced, not static — distinct chunk
    offsets reuse the same compiled program; at most the record/
    no-record variants and a short final chunk compile). The carry
    (incl. the per-chain PRNG key) rides the checkpoint, so chunk
    boundaries are bitwise-invisible."""
    total_chi = _total_chi_fn(specs, idx_maps, obs_list, times_list,
                              y0_list, method, substeps_list)
    step = _joint_step_fn(total_chi, walk_mask, rwalk_std, prior_logpdf,
                          use_priors)

    def one_chain(st, key):
        lt, chi, parts, acc = st
        carry = _Carry(log_theta=lt, chi=chi, parts=parts, acc=acc,
                       key=key)
        if record:
            carry, recs = jax.lax.scan(step, carry, its)
        else:
            carry, recs = jax.lax.scan(
                lambda c, it: (step(c, it)[0], None), carry, its)
        return ((carry.log_theta, carry.chi, carry.parts, carry.acc),
                carry.key, recs)

    return jax.vmap(one_chain)(state, keys)


def joint_metropolis_hastings_checkpointed(
        specs, idx_maps, obs_list, times_list, y0_list, theta0, keys, *,
        nits: int = 1000, burnin: Optional[int] = None, walk_mask=None,
        rwalk_std: float = 0.05, prior_logpdf=None,
        use_priors: bool = False, method: str = "fixed_dopri5",
        substeps=4, substeps_list=None, config_token: str = "",
        checkpoint_every: int = 100,
        checkpoint_path: Optional[str] = None,
        resume_from: Optional[str] = None,
        _stop_after_chunks: Optional[int] = None) -> Optional[JointOutput]:
    """Periodically-checkpointed joint XLA MH: the scan splits into
    chunks of ``checkpoint_every`` proposals, persisting chain state +
    records (npz) after each so a killed run resumes via ``resume_from``
    BITWISE identically to :func:`joint_metropolis_hastings` — this is
    the checkpointing path for posteriors the fused kernel cannot score
    (hierarchical pooling densities, exotic priors).

    ``_stop_after_chunks``: test hook simulating a mid-run kill."""
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
    D = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((D,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    specs = tuple(specs)
    idx_maps = _normalize_idx_maps(specs, idx_maps, D)
    substeps_list = _normalize_substeps_list(substeps, substeps_list,
                                             len(specs))
    obs_list, times_list, y0_list = (tuple(obs_list), tuple(times_list),
                                     tuple(y0_list))
    skw = dict(method=method, substeps_list=substeps_list)

    R = nits - 1
    n_chunks = -(-R // E)
    # E is part of the signature: next_chunk is denominated in chunks of
    # E, so resuming under a different checkpoint_every would silently
    # skip or replay iterations
    # config_token: process-stable digest of the joint data/prior config
    # (the caller's _stable_config_token) — resuming against edited
    # observation data or priors must fail, not mix posteriors
    sig = repr(("xla-joint", tuple(s.pnames for s in specs),
                idx_maps, D, int(theta0.shape[0]), nits, int(burnin), E,
                float(rwalk_std),
                tuple(float(w) for w in np.asarray(walk_mask)),
                bool(use_priors), method, substeps_list,
                str(config_token)))

    k0, state, recs = 0, None, []
    if resume_from:
        with np.load(resume_from, allow_pickle=False) as z:
            saved_sig = bytes(z["sig"]).decode()
            if saved_sig != sig:
                raise ValueError(
                    "checkpoint was written by a different joint MCMC "
                    f"configuration:\n  saved: {saved_sig}\n  this:  {sig}")
            k0 = int(z["next_chunk"])
            state = tuple(jnp.asarray(z[f"state{i}"]) for i in range(4))
            keys = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
            if "rec0" in z:
                recs = [tuple(z[f"rec{i}"] for i in range(4))]
    if state is None:
        state = _joint_init_state(specs, idx_maps, obs_list, times_list,
                                  y0_list, theta0, **skw)

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
            state, keys, out = _joint_chunk_impl(
                specs, idx_maps, obs_list, times_list, y0_list, state,
                keys, its, walk_mask, rwalk_std=float(rwalk_std),
                prior_logpdf=prior_logpdf, use_priors=bool(use_priors),
                record=(a > burnin), **skw)
            if out is not None:
                recs.append(tuple(np.asarray(o) for o in out))
        if checkpoint_path:
            save = dict(sig=np.frombuffer(sig.encode(), np.uint8),
                        next_chunk=np.asarray(k + 1),
                        key_data=np.asarray(jax.random.key_data(keys)),
                        **{f"state{i}": np.asarray(state[i])
                           for i in range(4)})
            if recs:
                merged = tuple(
                    np.concatenate([r[i] for r in recs], axis=1)
                    for i in range(4))
                recs = [merged]
                save.update({f"rec{i}": merged[i] for i in range(4)})
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez_compressed(f, **save)
            os.replace(tmp, checkpoint_path)
        if (_stop_after_chunks is not None
                and k + 1 - k0 >= _stop_after_chunks and k + 1 < n_chunks):
            return None

    th, chi, parts, ar = (np.concatenate([r[i] for r in recs], axis=1)
                          for i in range(4))
    iterations = jnp.arange(1, nits)[burnin:]
    return JointOutput(theta=jnp.asarray(th),
                       chi=jnp.asarray(chi),
                       chi_parts=jnp.asarray(parts),
                       acceptance_ratio=jnp.asarray(ar),
                       iteration=iterations)


def _normalize_idx_maps(specs, idx_maps, D):
    """Hashable, range-checked per-experiment gather maps."""
    idx_maps = tuple(tuple(int(i) for i in m) for m in idx_maps)
    for s, m in zip(specs, idx_maps):
        if len(m) != s.theta_size:
            raise ValueError(f"idx map length {len(m)} != spec theta size "
                             f"{s.theta_size}")
        if any(i < 0 or i >= D for i in m):
            raise ValueError(f"idx map {m} out of range for joint size {D}")
    return idx_maps


def _normalize_substeps_list(substeps, substeps_list, K):
    """Static per-experiment substeps: ``substeps_list`` (length K, one
    int or per-interval schedule per experiment) wins; else the shared
    ``substeps`` is broadcast."""
    if substeps_list is not None:
        if len(substeps_list) != K:
            raise ValueError(f"substeps_list must have {K} entries, got "
                             f"{len(substeps_list)}")
        return tuple(s if isinstance(s, int) else tuple(int(v) for v in s)
                     for s in substeps_list)
    one = substeps if isinstance(substeps, (int, tuple)) \
        else tuple(int(v) for v in substeps)
    return tuple([one] * K)


@partial(jax.jit, static_argnames=("specs", "idx_maps", "method",
                                   "substeps_list"))
def _joint_survey_impl(specs, idx_maps, obs_list, times_list, y0_list,
                       thetas, *, method, substeps_list):
    K = len(specs)

    def one(theta_joint):
        tot = 0.0
        for k in range(K):
            th_k = jnp.take(theta_joint, jnp.asarray(idx_maps[k]))
            tot = tot + chi_of_theta(
                specs[k], obs_list[k], th_k, y0_list[k], times_list[k],
                method=method, substeps=substeps_list[k])
        return tot

    return jax.vmap(one)(thetas)


def joint_survey(specs, idx_maps, obs_list, times_list, y0_list,
                 thetas, *, method: str = "fixed_dopri5", substeps=4,
                 substeps_list=None):
    """Batched joint chi for (N, D) joint draws -> (N,) total chi.
    ``substeps`` is shared across experiments; ``substeps_list`` gives
    one entry per experiment (int or per-interval schedule) and wins."""
    specs = tuple(specs)
    thetas = jnp.atleast_2d(thetas)
    idx_maps = _normalize_idx_maps(specs, idx_maps, thetas.shape[-1])
    return _joint_survey_impl(
        specs, idx_maps, tuple(obs_list), tuple(times_list),
        tuple(y0_list), thetas, method=method,
        substeps_list=_normalize_substeps_list(substeps, substeps_list,
                                               len(specs)))


class _PMCarry(NamedTuple):
    log_theta: Any
    chi: Any        # FROZEN pseudo-marginal total estimate
    parts: Any      # (K,) per-experiment chi at the last acceptance
    acc: Any
    key: Any
    log_scale: Any  # log proposal-scale multiplier (Robbins-Monro)


@partial(jax.jit, static_argnames=(
    "specs", "idx_maps", "stoch_blocks", "nits", "burnin", "rwalk_std",
    "prior_logpdf", "use_priors", "method", "substeps_list",
    "n_particles", "sde_substeps", "sde_method", "use_adapt",
    "target_accept", "adapt_rate"))
def _joint_pmmh_impl(specs, idx_maps, obs_list, times_list, y0_list,
                     theta0, keys, walk_mask, *, nits, burnin, rwalk_std,
                     prior_logpdf, use_priors, method, substeps_list,
                     stoch_blocks, n_particles, sde_substeps, sde_method,
                     use_adapt, target_accept, adapt_rate):
    from .pf import particle_filter_chi

    K = len(specs)

    def total_chi(theta_joint, key):
        """Summed chi: exact for deterministic experiments, a fresh
        K-particle bootstrap-filter estimate for stochastic ones
        (``stoch_blocks[k]`` is the static observation plan, or None)."""
        parts = []
        for k in range(K):
            th_k = jnp.take(theta_joint, jnp.asarray(idx_maps[k]))
            if stoch_blocks[k] is not None:
                y0k = specs[k].override_inits(y0_list[k], th_k)
                parts.append(particle_filter_chi(
                    specs[k], stoch_blocks[k], times_list[k], y0k, th_k,
                    jax.random.fold_in(key, k),
                    n_particles=n_particles, substeps=sde_substeps,
                    sde_method=sde_method))
            else:
                parts.append(chi_of_theta(
                    specs[k], obs_list[k], th_k, y0_list[k],
                    times_list[k], method=method,
                    substeps=substeps_list[k]))
        parts = jnp.stack(parts)
        return jnp.sum(parts), parts

    def step_fn(adapting):
        def step(carry: _PMCarry, it):
            key, k_eps, k_u, k_pf = jax.random.split(carry.key, 4)
            std = rwalk_std * (jnp.exp(carry.log_scale)
                               if use_adapt else 1.0)
            eps = std * jax.random.normal(
                k_eps, carry.log_theta.shape, carry.log_theta.dtype)
            prop = carry.log_theta + eps * walk_mask
            chi_n, parts_n = total_chi(jnp.exp(prop), k_pf)
            # pseudo-marginal: the incumbent's estimate stays FROZEN in
            # the carry between acceptances (PMMH exactness argument)
            log_ratio = carry.chi - chi_n
            if use_priors:
                log_ratio = log_ratio + (
                    prior_logpdf(jnp.exp(prop))
                    - prior_logpdf(jnp.exp(carry.log_theta)))
            u = jax.random.uniform(k_u, dtype=carry.chi.dtype)
            accept = jnp.exp(log_ratio) > u     # NaN -> rejected
            a = accept.astype(carry.chi.dtype)
            ls = carry.log_scale
            if adapting and use_adapt:
                ls = ls + adapt_rate * (a - target_accept)
            new = _PMCarry(
                log_theta=jnp.where(accept, prop, carry.log_theta),
                chi=jnp.where(accept, chi_n, carry.chi),
                parts=jnp.where(accept, parts_n, carry.parts),
                acc=carry.acc + a, key=key, log_scale=ls)
            rec = (jnp.exp(new.log_theta), new.chi, new.parts,
                   new.acc / it.astype(new.chi.dtype))
            return new, rec

        return step

    def one_chain(th0, key):
        key, k0 = jax.random.split(key)
        chi0, parts0 = total_chi(th0, k0)
        carry = _PMCarry(log_theta=jnp.log(th0), chi=chi0, parts=parts0,
                         acc=jnp.asarray(0.0, th0.dtype), key=key,
                         log_scale=jnp.asarray(0.0, th0.dtype))
        its = jnp.arange(1, nits, dtype=jnp.int32)
        carry, _ = jax.lax.scan(
            lambda c, it: (step_fn(True)(c, it)[0], None),
            carry, its[:burnin])
        # recording phase runs the frozen kernel (valid MH kernel; no
        # diminishing-adaptation argument needed — samplers/pf.py)
        _, recs = jax.lax.scan(step_fn(False), carry, its[burnin:])
        return recs

    return jax.vmap(one_chain)(theta0, keys)


def joint_pmmh(specs: Tuple, idx_maps: Tuple[Tuple[int, ...], ...],
               obs_list, times_list, y0_list, theta0, keys, *,
               stoch_blocks, nits: int = 1000,
               burnin: Optional[int] = None, walk_mask=None,
               rwalk_std: float = 0.05, prior_logpdf=None,
               use_priors: bool = False, method: str = "fixed_dopri5",
               substeps=4, substeps_list=None, n_particles: int = 128,
               sde_substeps: int = 4, sde_method: str = "euler",
               adapt_proposal: bool = False, target_accept: float = 0.3,
               adapt_rate: float = 0.05) -> JointOutput:
    """Joint particle-marginal MH over K experiments, any mix of
    deterministic and stochastic (``diffusion=``) models.

    The joint acceptance ratio sums exact chi terms for deterministic
    experiments with unbiased bootstrap-particle-filter estimates for
    stochastic ones — the product of an exact likelihood and unbiased
    estimates is an unbiased estimate of the joint likelihood, so the
    pseudo-marginal argument (Andrieu-Doucet-Holenstein 2010) applies
    unchanged: the chain targets the exact joint posterior.
    ``stoch_blocks[k]`` is :func:`~odelib_tpu.samplers.pf.obs_blocks` of
    experiment k's HOST ObsData for stochastic experiments, None for
    deterministic ones (which score through ``obs_list[k]`` as usual).
    ``adapt_proposal`` Robbins-Monro-adapts a per-chain proposal-scale
    multiplier toward ``target_accept`` during burn-in only.
    Reference: has no stochastic models and no cross-experiment
    structure at all (/root/reference/ODElib/Framework.py:946-1061 runs
    each dataset through its own framework).
    """
    if burnin is None:
        burnin = int(nits / 2)
    if nits - 1 <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations "
                         f"after burnin={burnin}")
    theta0 = jnp.atleast_2d(theta0)
    D = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((D,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    specs = tuple(specs)
    idx_maps = _normalize_idx_maps(specs, idx_maps, D)
    stoch_blocks = tuple(stoch_blocks)
    if len(stoch_blocks) != len(specs):
        raise ValueError("stoch_blocks needs one entry per experiment")
    for s, b in zip(specs, stoch_blocks):
        if (b is not None) != (s.diffusion is not None):
            raise ValueError("stoch_blocks entries must be observation "
                             "plans exactly for the diffusion= specs")
    if not any(b is not None for b in stoch_blocks):
        raise ValueError("no stochastic experiment; use "
                         "joint_metropolis_hastings")

    theta_s, chi_s, parts_s, ar_s = _joint_pmmh_impl(
        specs, idx_maps, tuple(obs_list), tuple(times_list),
        tuple(y0_list), theta0, keys, walk_mask,
        nits=int(nits), burnin=int(burnin), rwalk_std=float(rwalk_std),
        prior_logpdf=prior_logpdf, use_priors=bool(use_priors),
        method=method,
        substeps_list=_normalize_substeps_list(substeps, substeps_list,
                                               len(specs)),
        stoch_blocks=stoch_blocks, n_particles=int(n_particles),
        sde_substeps=int(sde_substeps), sde_method=str(sde_method),
        use_adapt=bool(adapt_proposal),
        target_accept=float(target_accept),
        adapt_rate=float(adapt_rate))
    iterations = jnp.arange(1, nits)[burnin:]
    return JointOutput(theta=theta_s, chi=chi_s, chi_parts=parts_s,
                       acceptance_ratio=ar_s, iteration=iterations)


def joint_metropolis_hastings(
        specs: Tuple, idx_maps: Tuple[Tuple[int, ...], ...],
        obs_list, times_list, y0_list, theta0, keys, *,
        nits: int = 1000, burnin: Optional[int] = None,
        walk_mask=None, rwalk_std: float = 0.05,
        prior_logpdf=None, use_priors: bool = False,
        method: str = "fixed_dopri5", substeps=4,
        substeps_list=None) -> JointOutput:
    """Run C joint chains over K experiments as one device program.

    ``idx_maps[k]``: for experiment k, the joint-theta index of each of
    its parameters (static tuple). ``obs_list``/``times_list``/``y0_list``
    are per-experiment device arrays; ``theta0`` is (C, D) in the JOINT
    layout. Other conventions match
    :func:`~odelib_tpu.samplers.mh.metropolis_hastings`.
    """
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
    specs = tuple(specs)
    idx_maps = _normalize_idx_maps(specs, idx_maps, D)

    theta_s, chi_s, parts_s, ar_s = _joint_impl(
        specs, idx_maps, tuple(obs_list), tuple(times_list),
        tuple(y0_list), theta0, keys, walk_mask,
        nits=int(nits), burnin=int(burnin), rwalk_std=float(rwalk_std),
        prior_logpdf=prior_logpdf, use_priors=bool(use_priors),
        method=method,
        substeps_list=_normalize_substeps_list(substeps, substeps_list,
                                               len(specs)))
    iterations = jnp.arange(1, nits)[burnin:]
    return JointOutput(theta=theta_s, chi=chi_s, chi_parts=parts_s,
                       acceptance_ratio=ar_s, iteration=iterations)
