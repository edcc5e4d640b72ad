"""Static step-schedule calibration: compile adaptive step control away.

The fused Pallas MH kernel (ops/pallas_mh.py) integrates with a FIXED step
schedule — the structure Mosaic pipelines best (no per-lane adaptivity, no
dynamic control flow). The reference gets robustness from LSODA's runtime
step control (``/root/reference/ODElib/Framework.py:656``); the TPU-native
equivalent moves that control to COMPILE TIME:

1. run the real adaptive solver (ops/integrate.odeint_grid) once over a
   batch of representative parameter draws (e.g. the MCMC chain seeds);
2. read how many accepted steps the controller spent inside each output
   interval (``ODESolution.accepted_at``);
3. bake a per-interval substep count — a robust upper quantile over the
   batch — into the kernel as its static schedule.

Intervals where the dynamics are fast get more substeps, quiet intervals get
fewer, and the hot loop stays branch-free. Exposed to users as
``MCMC(substeps="auto")`` / ``ModelFramework(substeps="auto")``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .integrate import odeint_grid


def calibrate_substeps(spec, y0, times, thetas, *, rtol: float = 1e-6,
                       atol: float = 1e-4, method: str = "dopri5",
                       quantile: float = 0.9, safety: float = 1.0,
                       min_substeps: int = 1, max_substeps: int = 64,
                       max_draws: int = 256,
                       max_steps: int = 16384) -> Tuple[int, ...]:
    """Per-interval substep schedule from an adaptive calibration pass.

    Parameters
    ----------
    spec: :class:`~odelib_tpu.model.ModelSpec`.
    y0: base initial state (the '<sname>0' overrides in each theta apply).
    times: the output grid the fixed-step kernel will run on.
    thetas: (N, P) parameter draws spanning the region the chains will
        explore — the MCMC seeding draws are ideal. Capped at ``max_draws``
        (evenly strided) to bound calibration cost.
    rtol/atol/method: adaptive-solver settings defining the accuracy the
        schedule should reproduce (defaults match the framework's solver
        defaults, api.py ModelFramework.__init__).
    quantile: per-interval upper quantile of accepted-step counts across
        draws (0.9 ignores the most extreme 10% of lanes, which the MH
        accept test rejects anyway when their chi degrades).
    safety: multiplier applied on top of the quantile.
    min_substeps/max_substeps: clamp for the schedule entries.

    Returns a tuple of ``len(times)-1`` ints, hashable and ready to pass as
    ``substeps=`` to the fused kernel, ``odeint_fixed`` or ``MCMC``.
    """
    times = jnp.asarray(times)
    thetas = np.asarray(thetas)
    if thetas.ndim == 1:
        thetas = thetas[None]
    if len(thetas) > max_draws:
        idx = np.linspace(0, len(thetas) - 1, max_draws).round().astype(int)
        thetas = thetas[np.unique(idx)]

    def solve(theta):
        th = spec.unpack_theta(theta)

        def f(t, y, args):
            return spec.rhs(t, y, args)

        y0_i = spec.override_inits(jnp.asarray(y0, jnp.result_type(float)),
                                   theta)
        from ..model import dose_matrix
        sol = odeint_grid(f, y0_i, times, th, rtol=rtol, atol=atol,
                          max_steps=max_steps, method=method,
                          dose=dose_matrix(spec, times))
        return sol.accepted_at, sol.ok

    acc, ok = jax.jit(jax.vmap(solve))(jnp.asarray(thetas))
    acc = np.asarray(acc)
    ok = np.asarray(ok)
    if not ok.any():
        # nothing integrates under the adaptive oracle: fall back to a
        # uniform mid-range schedule rather than erroring (NaN-tolerant
        # failure model, SURVEY.md section 5.3)
        import warnings
        warnings.warn("substep calibration: no draw integrated cleanly; "
                      "falling back to a uniform schedule of 4")
        return tuple([max(min_substeps, min(4, max_substeps))]
                     * (len(np.asarray(times)) - 1))
    per_interval = np.diff(acc[ok], axis=1)  # (N_ok, T-1) accepted steps
    q = np.quantile(per_interval, quantile, axis=0)
    sched = np.ceil(q * float(safety)).astype(int)
    sched = np.clip(sched, min_substeps, max_substeps)
    return tuple(int(s) for s in sched)


def schedule_cost(schedule) -> int:
    """Total RHS-step count of a schedule (what the kernel will pay)."""
    return int(np.sum(np.asarray(schedule, np.int64)))


def calibrate_substeps_fn(func, y0, times, args_batch, *,
                          rtol: float = 1e-6, atol: float = 1e-9,
                          method: str = "kvaerno5",
                          quantile: float = 0.9, safety: float = 1.0,
                          min_substeps: int = 1, max_substeps: int = 64,
                          max_steps: int = 16384) -> Tuple[int, ...]:
    """Generic-RHS version of :func:`calibrate_substeps` for standalone
    batch solves (no ModelSpec): one adaptive pass over ``args_batch``
    (pytree, leading batch axis) yields the per-interval substep
    schedule. ``y0`` is shared across the pilot lanes."""
    times = jnp.asarray(times)

    def solve(args):
        sol = odeint_grid(func, jnp.asarray(y0), times, args, rtol=rtol,
                          atol=atol, max_steps=max_steps, method=method)
        return sol.accepted_at, sol.ok

    acc, ok = jax.jit(jax.vmap(solve))(args_batch)
    acc, ok = np.asarray(acc), np.asarray(ok)
    if not ok.any():
        import warnings
        warnings.warn("substep calibration: no pilot lane integrated "
                      "cleanly; falling back to a uniform schedule of 4")
        return tuple([max(min_substeps, min(4, max_substeps))]
                     * (len(np.asarray(times)) - 1))
    per_interval = np.diff(acc[ok], axis=1)
    q = np.quantile(per_interval, quantile, axis=0)
    sched = np.clip(np.ceil(q * float(safety)).astype(int),
                    min_substeps, max_substeps)
    return tuple(int(s) for s in sched)


def auto_stiff_grid(func, y0, times, pilot_args, *, rtol: float = 1e-6,
                    atol: float = 1e-9, method: str = "kvaerno5",
                    max_steps: int = 4096, max_nodes: int = 256,
                    quantile: float = 0.9, safety: float = 1.0,
                    max_substeps: int = 64):
    """Auto-generate (grid, schedule, out_index) for BATCHED fixed-step
    stiff solves — no hand-chosen geomspace grid.

    The config-6 discipline applied to standalone stiff sweeps (VERDICT
    r4 push item 2): run ONE adaptive ``method`` pilot over a few
    representative draws; the controller's own accepted-step times
    become the internal grid nodes (the adaptive solver has already
    found where the problem needs resolution — e.g. log-spaced steps
    through a Robertson-style transient), thinned to ``max_nodes`` and
    merged with the caller's requested output ``times`` (which survive
    as exact grid points). A second calibration pass then sets a
    per-interval substep schedule at ``quantile`` coverage over the
    pilot draws.

    Returns ``(grid, schedule, out_index)``: run
    ``odeint_fixed(func, y0, grid, args, substeps=schedule,
    method='kvaerno3')`` over the full batch and read the requested
    outputs at ``ys[out_index]``. Replaces LSODA's runtime step control
    (``/root/reference/ODElib/Framework.py:656``) with compile-time
    control for arbitrary user stiff sweeps.

    ``pilot_args``: pytree with a small leading batch axis (a handful of
    draws spanning the sweep — 4-16 is plenty; cost is one adaptive
    batch of that size).
    """
    times = np.asarray(times, np.float64)
    if times.ndim != 1 or len(times) < 2:
        raise ValueError("times must be a 1-D grid with >= 2 points")

    def solve(args):
        sol = odeint_grid(func, jnp.asarray(y0), jnp.asarray(times), args,
                          rtol=rtol, atol=atol, max_steps=max_steps,
                          method=method, record_step_times=max_steps)
        return sol.step_times, sol.accepted_at, sol.ok

    st, acc, ok = jax.jit(jax.vmap(solve))(pilot_args)
    st, acc, ok = np.asarray(st), np.asarray(acc), np.asarray(ok)
    if not ok.any():
        import warnings
        warnings.warn("auto_stiff_grid: no pilot lane integrated cleanly "
                      "under the adaptive oracle; returning the caller's "
                      "grid with a uniform schedule of 8")
        grid = times
        return (grid, tuple([8] * (len(grid) - 1)),
                np.arange(len(grid), dtype=np.int64))

    # most-demanding clean pilot lane -> conservative node profile
    counts = np.where(ok, acc[:, -1], -1)
    lane = int(np.argmax(counts))
    nodes = np.sort(st[lane][:counts[lane]])
    nodes = nodes[np.isfinite(nodes)]
    if len(nodes) > max_nodes:
        keep = np.unique(np.linspace(0, len(nodes) - 1,
                                     max_nodes).round().astype(int))
        nodes = nodes[keep]
    # Merge with the requested outputs. The merge tolerance is RELATIVE
    # to the node position (1e-5 ~ 100 f32 ulps): a pilot node an ulp
    # away from a user time would otherwise survive the f64 union and
    # collapse to a ZERO-width interval after the f32 device cast —
    # h = 0 makes the implicit stage solve singular (NaN from there on).
    # Relative (not span-based) tolerance keeps the sub-1e-3-scale
    # transient nodes near t = 0 that are the whole point of the grid.
    nodes = nodes[(nodes > times[0]) & (nodes < times[-1])]
    grid = np.concatenate([times, nodes])
    user_mask = np.zeros(len(grid), bool)
    user_mask[:len(times)] = True
    order = np.argsort(grid, kind="stable")
    grid, user_mask = grid[order], user_mask[order]
    keep = np.ones(len(grid), bool)
    last = 0
    for i in range(1, len(grid)):
        tol = 1e-5 * max(abs(grid[i]), abs(grid[last]), 1e-300)
        if grid[i] - grid[last] < tol:
            if user_mask[i] and not user_mask[last]:
                keep[last] = False       # user time wins the merge
                last = i
            else:
                keep[i] = False
        else:
            last = i
    grid = grid[keep]
    out_index = np.clip(np.searchsorted(grid, times), 0, len(grid) - 1)
    # snap: each requested time must map to a grid node within tolerance
    near = np.abs(grid[np.maximum(out_index - 1, 0)] - times) \
        < np.abs(grid[out_index] - times)
    out_index = np.where(near, np.maximum(out_index - 1, 0), out_index)
    assert np.allclose(grid[out_index], times,
                       rtol=1e-4, atol=1e-12 + 0 * times)

    sched = calibrate_substeps_fn(
        func, y0, grid, pilot_args, rtol=rtol, atol=atol, method=method,
        quantile=quantile, safety=safety, max_substeps=max_substeps,
        max_steps=max_steps)
    return grid, sched, out_index
