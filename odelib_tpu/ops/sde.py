"""Fixed-grid SDE integration (diagonal noise) — vmap/shard_map safe.

The reference is strictly deterministic: ``scipy.integrate.odeint`` at
``/root/reference/ODElib/Framework.py:656`` has no notion of process
noise, so demographic stochasticity or environmental fluctuations in the
biological systems it targets can only be folded into the *observation*
error, biasing fits whenever the true dynamics jitter. This module adds
the TPU-native stochastic counterpart of :func:`odeint_fixed`:

* **fixed step count** — the whole path is one ``lax.scan`` with static
  shapes, so thousands of trajectories (chains x particles) batch onto
  the VPU/MXU with zero per-lane control flow;
* **counter-based noise** — the Brownian increment of global substep
  ``j`` is ``normal(fold_in(key, j))``, a pure function of (key, j).
  Any chunking of the scan (periodic checkpointing, segment-wise
  particle filtering) reproduces the exact same path, and vmapping over
  a key batch gives independent trajectories;
* **NaN-not-exception** — a diverged path turns to NaNs and reports
  ``ok=False``, matching the framework-wide failure model
  (SURVEY.md section 5.3).

Used by the bootstrap particle filter / PMMH sampler
(:mod:`odelib_tpu.samplers.pf`) and posterior-predictive simulation.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SDESolution", "sdeint_fixed"]


class SDESolution(NamedTuple):
    ys: Any   # (T, S) states at the output grid (ys[0] == y0)
    ok: Any   # scalar bool: every output value finite


def sdeint_fixed(drift, diffusion, y0, ts, key, args=(), *, substeps=4,
                 method="euler", dose=None):
    """Integrate ``dy = f(t,y) dt + g(t,y) dW`` on the output grid ``ts``.

    Parameters
    ----------
    drift : ``f(t, y, args) -> (S,)`` — the ODE right-hand side.
    diffusion : ``g(t, y, args) -> (S,)`` — DIAGONAL noise intensities:
        state ``i`` receives ``g_i dW_i`` with independent Brownian
        motions per state. (Diagonal noise covers multiplicative
        environmental noise ``sigma*y`` and demographic noise
        ``sigma*sqrt(y)`` — the standard biological cases.)
    y0 : (S,) initial state.
    ts : (T,) output grid (strictly increasing; need not be uniform).
    key : PRNG key. The increment at global substep ``j`` is drawn from
        ``fold_in(key, j)``, so equal keys give bitwise-equal paths and a
        scan split at any boundary resumes exactly.
    substeps : int — uniform subdivisions of every grid interval. The
        Euler-Maruyama step is ``h = (ts[i+1]-ts[i]) / substeps``.
    method : ``'euler'`` (strong order 0.5) or ``'milstein'`` (adds the
        diagonal correction ``0.5 * g_i * d(g_i)/d(y_i) * (xi^2-1) * h``,
        strong order 1.0 for diagonal noise whose ``g_i`` may depend on
        the full state — the derivative is the Jacobian diagonal via
        ``jacfwd``, exact for the scalar-per-state case).
    dose : optional (T, S) impulse matrix with the :func:`odeint_fixed`
        convention — ``dose[i]`` joins the state when integration leaves
        ``ts[i]``; reported rows are pre-dose left limits.

    Returns ``SDESolution(ys=(T, S), ok=bool)``.
    """
    if method not in ("euler", "milstein"):
        raise ValueError(f"method must be 'euler' or 'milstein', "
                         f"got {method!r}")
    substeps = int(substeps)
    if substeps < 1:
        raise ValueError("substeps must be >= 1")
    dtype = jnp.result_type(jnp.asarray(y0).dtype, float)
    y0 = jnp.asarray(y0, dtype)
    ts = jnp.asarray(ts, dtype)
    S = y0.shape[0]
    n_int = ts.shape[0] - 1

    milstein = method == "milstein"

    def substep(j, t, y, h):
        xi = jax.random.normal(jax.random.fold_in(key, j), (S,), dtype)
        f = drift(t, y, args)
        g = diffusion(t, y, args)
        y1 = y + h * f + jnp.sqrt(h) * g * xi
        if milstein:
            gdiag = jnp.diagonal(
                jax.jacfwd(lambda yy: diffusion(t, yy, args))(y))
            y1 = y1 + 0.5 * g * gdiag * (xi * xi - 1.0) * h
        return y1

    # flatten intervals x substeps into one scan (static index arrays, so
    # the output gather compiles to a plain slice — same layout as
    # odeint_fixed's non-uniform-schedule path, ops/integrate.py:275-306)
    ii = np.repeat(np.arange(n_int), substeps)
    kk = np.tile(np.arange(substeps), n_int)
    ends = np.arange(1, n_int + 1) * substeps - 1
    h_all = (ts[1:] - ts[:-1])[ii] / dtype.type(substeps)
    t_starts = ts[ii] + jnp.asarray(kk, dtype) * h_all
    j_all = jnp.arange(n_int * substeps, dtype=jnp.int32)

    if dose is None:
        def flat_step(y, xs):
            j, t, h = xs
            y1 = substep(j, t, y, h)
            return y1, y1

        _, y_flat = jax.lax.scan(flat_step, y0, (j_all, t_starts, h_all))
    else:
        dose_flat = jnp.asarray(dose, dtype)[ii] \
            * jnp.asarray(kk == 0, dtype)[:, None]

        def flat_step(y, xs):
            j, t, h, d = xs
            y1 = substep(j, t, y + d, h)
            return y1, y1

        _, y_flat = jax.lax.scan(flat_step, y0,
                                 (j_all, t_starts, h_all, dose_flat))
    if n_int == 0:
        ys = y0[None]
    else:
        ys = jnp.concatenate([y0[None], y_flat[ends]], axis=0)
    return SDESolution(ys=ys, ok=jnp.all(jnp.isfinite(ys)))
