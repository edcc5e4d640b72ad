"""Adaptive ODE integration on a fixed output grid — vmap/shard_map safe.

TPU-native replacement for ``scipy.integrate.odeint(func, y0, t, args)`` as
used by the reference at ``/root/reference/ODElib/Framework.py:656``. Design
constraints (SURVEY.md section 7):

* **Fixed shapes everywhere**: the control flow is a ``lax.scan`` over the
  requested output times with an inner bounded ``lax.while_loop`` of adaptive
  steps, so the whole solve jits once and vmaps over arbitrarily many
  chains/parameter draws.
* **Failure = NaN, never an exception** (the reference tolerates NaN solutions
  and drops them downstream, ``Framework.py:997``): a lane that exhausts
  ``max_steps`` or underflows its step size gets NaN from that time onward and
  a ``False`` ok-flag, while sibling lanes keep integrating.
* **Dense output**: each accepted step carries interpolation coefficients, so
  output times are filled by polynomial evaluation, not by clipping steps to
  the grid (matching how LSODA serves ``odeint``'s ``t`` argument).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .runge_kutta import STEPPERS, Dopri5, kvaerno3_fixed_step

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0


class ODESolution(NamedTuple):
    ys: Any          # (T, state_dim) solution values at requested times
    ok: Any          # scalar bool: False if the solve failed anywhere
    num_steps: Any   # scalar int32: accepted+rejected step attempts
    # (T,) int32 cumulative ACCEPTED steps at each output time (adaptive
    # solvers only; None for fixed-step). Feeds the static step-schedule
    # calibration (ops/schedule.py): diff(accepted_at) is the per-interval
    # work the adaptive controller actually needed.
    accepted_at: Any = None
    # (K,) end times of the first K accepted steps (only when
    # ``record_step_times=K`` was passed — entries past the accepted
    # count are garbage; slice with num accepted from ``accepted_at[-1]``).
    # Feeds ops/schedule.auto_stiff_grid: the adaptive controller's own
    # step placement becomes the static grid of the batched fixed-step
    # fast path.
    step_times: Any = None


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(x * x))


def _error_ratio(err, rtol, atol, y0, y1):
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    return _rms_norm(err / scale)


def _initial_step(func, t0, y0, f0, args, rtol, atol, direction):
    """Hairer-style automatic initial step selection (HNW vol.1, p.169)."""
    scale = atol + rtol * jnp.abs(y0)
    d0 = _rms_norm(y0 / scale)
    d1 = _rms_norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * direction * f0
    f1 = func(t0 + h0 * direction, y1, args)
    d2 = _rms_norm((f1 - f0) / scale) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(dmax <= 1e-15,
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / dmax) ** 0.2)
    return jnp.minimum(100.0 * h0, h1)


def odeint_grid(func, y0, ts, args=(), *, rtol=1e-7, atol=1e-9,
                max_steps=4096, method="dopri5", h0=None, dose=None,
                record_step_times=0):
    """Integrate dy/dt = func(t, y, args) and report y at every time in ts.

    Parameters mirror ``scipy.integrate.odeint`` semantics where they overlap:
    ``ts`` must be increasing with ``ts[0]`` the initial time; ``y0`` is shape
    (state_dim,). Returns :class:`ODESolution`.

    ``method='auto'`` covers LSODA's stiff/non-stiff switching
    (``/root/reference/ODElib/Framework.py:4,656``) the XLA-friendly way:
    solve with Dopri5 and, only if that lane fails (step-size underflow or
    ``max_steps`` exhaustion — the signature of stiffness), re-solve with the
    L-stable Kvaerno5 ESDIRK. For an unbatched call ``lax.cond`` skips the
    stiff solve entirely on the fast path; under ``vmap`` the cond lowers to
    a select, so batched 'auto' pays for both solves — prefer an explicit
    method inside MCMC hot loops.

    ``dose`` (optional, shape (len(ts), state_dim)): impulse additions to
    the state — ``dose[i]`` is added when integration LEAVES grid point
    ``ts[i]``, so every reported ``ys[i]`` is the PRE-dose left limit (the
    trough in PK terms) and ``dose[-1]`` affects nothing. When doses are
    present the solver steps exactly TO each output point (an impulse
    invalidates any dense polynomial spanning it) and re-evaluates the RHS
    after each addition.

    ``record_step_times=K`` (static int) additionally records the end
    times of the first K accepted steps into ``ODESolution.step_times``
    — the input to :func:`odelib_tpu.ops.schedule.auto_stiff_grid`.
    """
    if method == "auto":
        kw = dict(args=args, rtol=rtol, atol=atol, max_steps=max_steps,
                  dose=dose, record_step_times=record_step_times)
        sol_d = odeint_grid(func, y0, ts, method="dopri5", h0=h0, **kw)
        return jax.lax.cond(
            sol_d.ok, lambda: sol_d,
            lambda: odeint_grid(func, y0, ts, method="kvaerno5", **kw))
    stepper = STEPPERS[method] if isinstance(method, str) else method
    dtype = jnp.result_type(jnp.asarray(y0).dtype, float)
    y0 = jnp.asarray(y0, dtype)
    ts = jnp.asarray(ts, dtype)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)

    f0 = stepper.first_stage(func, ts[0], y0, args)
    if h0 is None:
        h_init = _initial_step(func, ts[0], y0, f0, args, rtol, atol, 1.0)
    else:
        h_init = jnp.asarray(h0, dtype)
    h_init = jnp.maximum(h_init, tiny)

    err_exp = jnp.asarray(-1.0 / stepper.ERROR_ORDER, dtype)

    # Carry: position of the integrator plus the dense polynomial of the most
    # recent accepted step [t_prev, t_prev + h_prev].
    class Carry(NamedTuple):
        t: Any
        y: Any
        f: Any
        h: Any
        t_prev: Any
        h_prev: Any
        dense: Any
        nsteps: Any
        nacc: Any
        ok: Any
        step_ts: Any   # (K,) accepted-step end times, or (0,) when off

    K_rec = int(record_step_times)
    carry0 = Carry(
        t=ts[0], y=y0, f=f0, h=h_init,
        t_prev=ts[0], h_prev=jnp.asarray(1.0, dtype),
        dense=stepper.dense_zero(y0),
        nsteps=jnp.asarray(0, jnp.int32),
        nacc=jnp.asarray(0, jnp.int32),
        ok=jnp.asarray(True),
        step_ts=jnp.full((K_rec,), jnp.nan, dtype),
    )

    # Implicit (stiff) steppers take steps spanning many output intervals,
    # and their cubic-Hermite dense output cannot hold method-order accuracy
    # over such spans — so they STEP TO the output points (truncate h at the
    # target; the controller's preferred h survives truncations). Explicit
    # Dopri5 keeps free stepping + its matched 4th-order interpolant.
    # Dose impulses land exactly at grid points, so a dosed solve must also
    # stop there.
    step_to_output = bool(getattr(stepper, "IMPLICIT", False)) \
        or dose is not None

    def attempt_step(c: Carry, t_target) -> Carry:
        if step_to_output:
            h_try = jnp.minimum(c.h, t_target - c.t)
        else:
            h_try = c.h
        y_new, f_new, err, dense = stepper.step(func, c.t, c.y, c.f, h_try,
                                                args)
        ratio = _error_ratio(err, rtol, atol, c.y, y_new)
        # NaN anywhere -> treat as a rejected step so h shrinks.
        bad = ~jnp.isfinite(ratio) | ~jnp.all(jnp.isfinite(y_new))
        ratio = jnp.where(bad, jnp.asarray(jnp.inf, dtype), ratio)
        accept = ratio <= 1.0

        factor = jnp.where(
            ratio == 0.0, _MAX_FACTOR,
            jnp.clip(_SAFETY * ratio ** err_exp, _MIN_FACTOR, _MAX_FACTOR))
        factor = jnp.where(accept, factor, jnp.minimum(factor, 1.0))
        # an accepted truncated step keeps the controller's preferred h
        h_next = jnp.where(accept & (h_try < c.h), c.h, h_try * factor)

        # Step-size underflow => the lane is stuck (stiff blow-up): fail it.
        still_ok = c.ok & (h_next > tiny) & jnp.isfinite(h_next)

        if K_rec:
            step_ts = jnp.where(
                accept,
                c.step_ts.at[jnp.minimum(c.nacc, K_rec - 1)].set(
                    c.t + h_try),
                c.step_ts)
        else:
            step_ts = c.step_ts

        return Carry(
            step_ts=step_ts,
            t=jnp.where(accept, c.t + h_try, c.t),
            y=jnp.where(accept, y_new, c.y),
            f=jnp.where(accept, f_new, c.f),
            h=h_next,
            t_prev=jnp.where(accept, c.t, c.t_prev),
            h_prev=jnp.where(accept, h_try, c.h_prev),
            dense=jnp.where(accept, dense, c.dense),
            nsteps=c.nsteps + 1,
            nacc=c.nacc + accept.astype(jnp.int32),
            ok=still_ok,
        )

    def advance_to(carry: Carry, xs):
        if dose is None:
            t_target = xs
            c = carry
        else:
            t_target, dose_i = xs
            # the impulse invalidates the cached derivative; re-evaluate
            y_d = carry.y + dose_i
            c = carry._replace(
                y=y_d, f=stepper.first_stage(func, carry.t, y_d, args))

        def cond(cc):
            return cc.ok & (cc.t < t_target) & (cc.nsteps < max_steps)

        c = jax.lax.while_loop(cond, lambda cc: attempt_step(cc, t_target),
                               c)
        reached = c.t >= t_target
        theta = (t_target - c.t_prev) / c.h_prev
        y_t = stepper.interp(c.dense, jnp.clip(theta, 0.0, 1.0))
        y_t = jnp.where(reached, y_t, jnp.full_like(y_t, jnp.nan))
        # A lane that ran out of steps before its target is dead from here on.
        c = c._replace(ok=c.ok & reached)
        return c, (y_t, c.nacc)

    xs = ts[1:] if dose is None else (ts[1:], jnp.asarray(dose, dtype)[:-1])
    carry, (ys_tail, acc_tail) = jax.lax.scan(advance_to, carry0, xs)
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    accepted_at = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), acc_tail], axis=0)
    return ODESolution(ys=ys, ok=carry.ok, num_steps=carry.nsteps,
                       accepted_at=accepted_at,
                       step_times=carry.step_ts if K_rec else None)


def odeint_fixed(func, y0, ts, args=(), *, substeps=1, method="rk4",
                 dose=None):
    """Fixed-step integration on the grid (optionally subdividing intervals).

    Deterministic step count -> fastest batched path on TPU (no per-lane
    adaptive while_loop). ``method`` is 'rk4', 'dopri5' (error estimates
    ignored) or 'kvaerno3' (implicit ESDIRK with chord-Newton stage solves —
    the batched STIFF fast path: on a geomspace output grid the fixed
    substeps track the problem's time scales, delivering ~1e-5 final-state
    accuracy on Robertson at substeps=8 while running two orders of
    magnitude faster than the adaptive batch, which is serialized by its
    worst lane). Used by the high-throughput MCMC path; accuracy is
    validated against the adaptive solver in tests.

    ``substeps`` is a uniform int, or a per-interval STATIC schedule
    (len(ts)-1 ints, e.g. from :func:`odelib_tpu.ops.schedule.
    calibrate_substeps`): the compiled-in analog of adaptive step-size
    control — intervals that need more work get more substeps, without any
    per-lane control flow.

    ``dose``: impulse additions with the :func:`odeint_grid` convention —
    ``dose[i]`` joins the state when integration leaves ``ts[i]``, reported
    ``ys`` are pre-dose left limits.
    """
    dtype = jnp.result_type(jnp.asarray(y0).dtype, float)
    y0 = jnp.asarray(y0, dtype)
    ts = jnp.asarray(ts, dtype)

    if method == "rk4":
        def substep(t, y, h):
            k1 = func(t, y, args)
            k2 = func(t + 0.5 * h, y + 0.5 * h * k1, args)
            k3 = func(t + 0.5 * h, y + 0.5 * h * k2, args)
            k4 = func(t + h, y + h * k3, args)
            return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    elif method == "dopri5":
        def substep(t, y, h):
            f0 = Dopri5.first_stage(func, t, y, args)
            y_new, _, _, _ = Dopri5.step(func, t, y, f0, h, args)
            return y_new
    elif method == "kvaerno3":
        def substep(t, y, h):
            return kvaerno3_fixed_step(func, t, y, h, args)
    else:
        raise ValueError(f"unknown fixed method {method!r}")

    if not isinstance(substeps, int):
        import numpy as np

        sched = np.asarray(substeps, np.int64)
        n_int = ts.shape[0] - 1
        if sched.shape != (n_int,):
            raise ValueError(
                f"substeps schedule must have len(ts)-1 = {n_int} entries, "
                f"got shape {sched.shape}")
        if (sched < 1).any():
            raise ValueError("substeps schedule entries must be >= 1")
        # Flatten the non-uniform schedule into one scan over all substeps;
        # interval boundaries are STATIC indices, so the output gather
        # compiles to a plain slice.
        ii = np.repeat(np.arange(n_int), sched)            # interval index
        kk = np.concatenate([np.arange(s) for s in sched])  # substep index
        ends = np.cumsum(sched) - 1                         # flat end rows
        h_all = (ts[ii + 1] - ts[ii]) / jnp.asarray(sched[ii], dtype)
        t_starts = ts[ii] + jnp.asarray(kk, dtype) * h_all

        if dose is None:
            def flat_step(y, th):
                t, h = th
                y1 = substep(t, y, h)
                return y1, y1

            _, y_flat = jax.lax.scan(flat_step, y0, (t_starts, h_all))
        else:
            # dose[i] joins at the first substep of interval i
            dose_flat = jnp.asarray(dose, dtype)[ii] \
                * jnp.asarray(kk == 0, dtype)[:, None]

            def flat_step(y, thd):
                t, h, d = thd
                y1 = substep(t, y + d, h)
                return y1, y1

            _, y_flat = jax.lax.scan(flat_step, y0,
                                     (t_starts, h_all, dose_flat))
        ys = jnp.concatenate([y0[None], y_flat[ends]], axis=0)
        ok = jnp.all(jnp.isfinite(ys))
        return ODESolution(ys=ys, ok=ok,
                           num_steps=jnp.asarray(int(sched.sum()), jnp.int32))

    def interval(y, xs):
        if dose is None:
            t0, t1 = xs
        else:
            (t0, t1), d = xs
            y = y + d
        h = (t1 - t0) / substeps

        def inner(i, yy):
            return substep(t0 + i * h, yy, h)

        y1 = jax.lax.fori_loop(0, substeps, inner, y)
        return y1, y1

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    xs = t_pairs if dose is None \
        else (t_pairs, jnp.asarray(dose, dtype)[:-1])
    _, ys_tail = jax.lax.scan(interval, y0, xs)
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    ok = jnp.all(jnp.isfinite(ys))
    return ODESolution(ys=ys, ok=ok, num_steps=jnp.asarray(
        substeps * (ts.shape[0] - 1), jnp.int32))


import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=256)
def _batch_solver(func, method, rtol, atol, max_steps, y0_batched):
    """Jitted vmapped single-method solver, cached per (func, config) so
    repeated odeint_grid_batch calls don't re-trace."""
    in_axes = (0 if y0_batched else None, None, 0)

    def solve(y0, ts, args):
        return odeint_grid(func, y0, ts, args, rtol=rtol, atol=atol,
                           max_steps=max_steps, method=method)

    return jax.jit(jax.vmap(solve, in_axes=in_axes))


def odeint_grid_batch(func, y0, ts, args_batch, *, rtol=1e-7, atol=1e-9,
                      max_steps=4096, method="auto", probe_max_steps=None,
                      stiff_method="kvaerno5"):
    """Batched adaptive solve with TWO-PASS partitioned stiff fallback.

    ``method='auto'`` under plain ``vmap`` pays for BOTH the explicit and
    the implicit solve on every lane (the ``lax.cond`` lowers to a
    select — :func:`odeint_grid` docstring). This host-side driver keeps
    auto semantics at near-oracle cost for standalone batch sweeps:

    1. solve every lane with explicit Dopri5, with a bounded probe
       budget (``probe_max_steps``, default ``min(max_steps, 512)`` step
       ATTEMPTS — stiffness shows up as step-size collapse long before a
       non-stiff lane needs that many);
    2. read back the per-lane ok flags (one device->host sync — this is
       a standalone batch API, not an inner jit region);
    3. re-batch ONLY the failed lanes — compacted and padded to the next
       power of two so at most log2(N) shapes ever compile — through the
       L-stable ``stiff_method``, and scatter the results back.

    A genuinely non-stiff lane that merely exceeds the probe budget is
    still solved correctly (the implicit pass is adaptive too — only its
    cost differs). ``args_batch`` is a pytree whose leaves carry a
    leading batch axis; ``y0`` is ``(S,)`` shared or ``(N, S)``
    per-lane. Returns a batched :class:`ODESolution` (leading axis N).
    LSODA auto-switching counterpart:
    ``/root/reference/ODElib/Framework.py:4,656``.
    """
    ts = jnp.asarray(ts)
    y0 = jnp.asarray(y0)
    y0_b = y0.ndim == 2
    leaves = jax.tree_util.tree_leaves(args_batch)
    if not leaves:
        raise ValueError("args_batch must have at least one batched leaf")
    N = leaves[0].shape[0]
    if method != "auto":
        sol = _batch_solver(func, method, float(rtol), float(atol),
                            int(max_steps), y0_b)(y0, ts, args_batch)
        return sol._replace(accepted_at=None, step_times=None)

    probe = int(min(max_steps, 512) if probe_max_steps is None
                else probe_max_steps)
    fast = _batch_solver(func, "dopri5", float(rtol), float(atol),
                         probe, y0_b)(y0, ts, args_batch)
    ok = _np.asarray(fast.ok)
    if ok.all():
        return fast._replace(accepted_at=None, step_times=None)

    idx = _np.where(~ok)[0]
    n_f = len(idx)
    pad = 1 << int(_np.ceil(_np.log2(max(n_f, 1))))
    idx_p = _np.concatenate([idx, _np.full(pad - n_f, idx[-1], idx.dtype)])
    take = lambda a: jnp.asarray(a)[jnp.asarray(idx_p)]
    stiff = _batch_solver(func, stiff_method, float(rtol), float(atol),
                          int(max_steps), True)(
        y0[jnp.asarray(idx_p)] if y0_b
        else jnp.broadcast_to(y0, (pad,) + y0.shape),
        ts, jax.tree_util.tree_map(take, args_batch))

    sel = jnp.asarray(idx)
    ys = jnp.asarray(fast.ys).at[sel].set(jnp.asarray(stiff.ys)[:n_f])
    okj = jnp.asarray(fast.ok).at[sel].set(jnp.asarray(stiff.ok)[:n_f])
    ns = jnp.asarray(fast.num_steps).at[sel].add(
        jnp.asarray(stiff.num_steps)[:n_f])
    return ODESolution(ys=ys, ok=okj, num_steps=ns)
