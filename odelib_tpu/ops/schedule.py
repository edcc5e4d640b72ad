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
