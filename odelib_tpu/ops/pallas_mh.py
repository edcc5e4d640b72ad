"""Fully-fused Metropolis-Hastings chains as a single Pallas TPU kernel.

The XLA path (samplers/mh.py) is a scan of ~50-100 small fused ops per
iteration over (C,) arrays — latency-bound on TPU because each op touches a
tiny tile. This kernel is the speed-of-light version (SURVEY.md section 7,
"Pallas kernel pass"): the ENTIRE chain loop — lognormal proposal (Box-Muller
on the in-core PRNG), fixed-step Dopri5 integration of the user RHS over the
compact observation grid, chi/R^2/AIC scoring, accept/reject, posterior
recording — runs inside one kernel per chain tile, with every intermediate in
VMEM/registers and zero HBM traffic except the recorded posterior rows.

TPU-native specializations:
  * chains are tiled (SUB x 128) lanes; each state variable and parameter is
    its own 2-D tile, so the VPU sees full (8,128) vectors at every op;
  * the observation metadata (grid times, per-observation state index,
    log-abundance, log-sigma, summation membership) is STATIC per model, so
    chi contributions compile to inline fused multiply-adds — no gathers, no
    index math at runtime;
  * the time grid is baked in as constants; the integrator is a fully
    unrolled fixed-step Dopri5 (substeps per observation interval — a
    uniform count or a per-interval calibrated schedule from
    ops/schedule.py), which is both uniform across lanes (no worst-lane
    adaptivity) and exactly the structure the Mosaic scheduler pipelines
    best.

Use via ``ModelFramework.MCMC(backend='pallas')`` (the default on TPU) or
directly through :func:`metropolis_hastings_fused`. Validated against the
XLA path in tests (chi parity in eval mode; statistical parity for full
chains).
"""
from __future__ import annotations

import dataclasses
import os
from functools import lru_cache
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model import ModelSpec, ObsData

_LANES = 128
_DEF_SUB = 8  # sublanes per tile (f32 min tile is (8, 128))


# --- Dopri5 stage coefficients (same tableau as runge_kutta.py) -----------
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0)


def _dopri5_fixed_step(rhs, t, y, h, ps):
    """One fixed-size Dopri5 step; y is (S, sub, 128)."""
    ks = [rhs(t, y, ps)]
    for i in range(1, 6):
        yi = y + h * sum(a * k for a, k in zip(_A[i], ks) if a != 0.0)
        ks.append(rhs(t + _C[i] * h, yi, ps))
    return y + h * sum(a * k for a, k in zip(_A[6], ks) if a != 0.0)


def _rk4_fixed_step(rhs, t, y, h, ps):
    k1 = rhs(t, y, ps)
    k2 = rhs(t + 0.5 * h, y + 0.5 * h * k1, ps)
    k3 = rhs(t + 0.5 * h, y + 0.5 * h * k2, ps)
    k4 = rhs(t + h, y + h * k3, ps)
    return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


# The fused STIFF stepper — fixed-step Kvaerno3 ESDIRK with chord-Newton
# stage solves, Mosaic-lowerable by construction (shared with
# odeint_fixed(method='kvaerno3'); implementation + rationale in
# ops/runge_kutta.py). Covers LSODA's stiff half inside the fused MH kernel
# (the reference reaches it through scipy odeint, Framework.py:4,656).
from .runge_kutta import kvaerno3_fixed_step as _kvaerno3_fixed_step  # noqa: E402

_FIXED_STEPPERS = {
    "dopri5": _dopri5_fixed_step,
    "rk4": _rk4_fixed_step,
    "kvaerno3": _kvaerno3_fixed_step,
}


def _mix(x):
    """SplitMix32 finalizer on uint32 lanes (wrapping arithmetic)."""
    x = x + jnp.uint32(0x9E3779B9)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


class _Rng:
    """Counter-based per-lane PRNG in pure jnp ops.

    Backend-independent (runs identically compiled on TPU and in Pallas
    interpret mode on CPU) — each draw hashes (lane_id, stream_counter) with
    a double SplitMix32 round. The stream counter is `iteration * n_slots +
    static_slot`, so every (chain, iteration, draw-site) gets an independent
    word.
    """

    def __init__(self, shape, seed, program_id, tile):
        row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        lane = row * jnp.uint32(shape[1]) + col
        base = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
                + program_id.astype(jnp.uint32) * jnp.uint32(tile))
        self._lane = _mix(base + lane)
        self._slot = 0

    def bits(self, it):
        # Static slot budget: streams are spaced 1024 words per iteration, so
        # more than 1024 draw-sites per iteration would silently overlap the
        # next iteration's stream. Each walked parameter costs 2 slots
        # (Box-Muller) + 1 for the accept draw -> fires at ~511 walked
        # parameters, far beyond any ODE-fitting workload. Trace-time check
        # (self._slot is a Python int during tracing).
        if self._slot >= 1024:
            raise ValueError(
                "per-iteration RNG slot budget (1024) exhausted — too many "
                "draw sites (walked parameters) for the fused kernel; use "
                "the XLA backend")
        ctr = (it.astype(jnp.uint32) * jnp.uint32(1024)
               + jnp.uint32(self._slot))
        self._slot += 1
        return _mix(self._lane ^ _mix(ctr))

    def uniform(self, it):
        """(0,1) uniform. (24-bit mantissa path; uint32->int32 first since
        Mosaic has no direct uint32->f32 cast.)"""
        b24 = (self.bits(it) >> 8).astype(jnp.int32)
        u = b24.astype(jnp.float32) * (1.0 / (1 << 24))
        return u + (0.5 / (1 << 24))

    def normal(self, it):
        """Standard normal via Box-Muller."""
        u1 = self.uniform(it)
        u2 = self.uniform(it)
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


def _kernel_logpdf(d):
    """Mosaic-safe static logpdf closure for a prior Distribution, or None.

    All normalization constants are pre-computed on host with stdlib math
    (no jsp.special calls inside the kernel); the returned closure uses only
    elementwise jnp ops on the (sub, 128) theta tile.
    """
    import math

    from .. import distributions as D

    if d is None:
        return None
    # Vector-valued hyperparameters (array parameters) can't be baked into
    # the kernel as scalar constants — report unsupported so the caller
    # routes to the XLA sampler instead of crashing on float().
    try:
        for f in dataclasses.fields(d):
            float(getattr(d, f.name))
    except (TypeError, ValueError):
        return None
    if isinstance(d, D.LogNormal):
        s, loc, scale = float(d.s), float(d.loc), float(d.scale)
        const = -math.log(s) - math.log(scale) - 0.5 * math.log(2 * math.pi)

        def lp(x):
            y = (x - loc) / scale
            ly = jnp.log(jnp.maximum(y, 1e-37))
            return jnp.where(y > 0, -0.5 * (ly / s) ** 2 - ly + const,
                             -jnp.inf)
        return lp
    if isinstance(d, D.Normal):
        loc, scale = float(d.loc), float(d.scale)
        const = -math.log(scale) - 0.5 * math.log(2 * math.pi)

        def lp(x):
            z = (x - loc) / scale
            return -0.5 * z * z + const
        return lp
    if isinstance(d, D.Uniform):
        lo, scale = float(d.loc), float(d.scale)
        const = -math.log(scale)

        def lp(x):
            return jnp.where((x >= lo) & (x <= lo + scale), const, -jnp.inf)
        return lp
    if isinstance(d, D.Gamma):
        a, loc, scale = float(d.a), float(d.loc), float(d.scale)
        const = -math.lgamma(a) - math.log(scale)

        def lp(x):
            y = (x - loc) / scale
            ly = jnp.log(jnp.maximum(y, 1e-37))
            return jnp.where(y > 0, (a - 1.0) * ly - y + const, -jnp.inf)
        return lp
    if isinstance(d, D.TruncNormal):
        a, b = float(d.a), float(d.b)
        loc, scale = float(d.loc), float(d.scale)
        ndtr = lambda z: (0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
                          if math.isfinite(z) else (1.0 if z > 0 else 0.0))
        const = (-math.log(ndtr(b) - ndtr(a)) - math.log(scale)
                 - 0.5 * math.log(2 * math.pi))

        def lp(x):
            z = (x - loc) / scale
            return jnp.where((z >= a) & (z <= b), -0.5 * z * z + const,
                             -jnp.inf)
        return lp
    if isinstance(d, D.Exponential):
        loc, scale = float(d.loc), float(d.scale)
        const = -math.log(scale)

        def lp(x):
            y = (x - loc) / scale
            return jnp.where(y >= 0, -y + const, -jnp.inf)
        return lp
    if isinstance(d, D.Cauchy):
        loc, scale = float(d.loc), float(d.scale)
        const = -math.log(math.pi * scale)

        def lp(x):
            z = (x - loc) / scale
            return -jnp.log1p(z * z) + const
        return lp
    if isinstance(d, D.HalfNormal):
        loc, scale = float(d.loc), float(d.scale)
        const = 0.5 * math.log(2.0 / math.pi) - math.log(scale)

        def lp(x):
            z = (x - loc) / scale
            return jnp.where(z >= 0, -0.5 * z * z + const, -jnp.inf)
        return lp
    if isinstance(d, D.Weibull):
        c, loc, scale = float(d.c), float(d.loc), float(d.scale)
        const = math.log(c) - math.log(scale)

        def lp(x):
            y = (x - loc) / scale
            ly = jnp.log(jnp.maximum(y, 1e-37))
            return jnp.where(y > 0,
                             (c - 1.0) * ly - jnp.exp(c * ly) + const,
                             -jnp.inf)
        return lp
    if isinstance(d, D.Beta):
        a, b = float(d.a), float(d.b)
        loc, scale = float(d.loc), float(d.scale)
        const = -(math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)) \
            - math.log(scale)

        def lp(x):
            y = (x - loc) / scale
            inside = (y > 0) & (y < 1)
            ys = jnp.where(inside, y, 0.5)
            return jnp.where(inside,
                             (a - 1.0) * jnp.log(ys)
                             + (b - 1.0) * jnp.log1p(-ys) + const,
                             -jnp.inf)
        return lp
    return None


def kernel_priors_supported(priors) -> bool:
    """True when every prior can run inside the fused kernel."""
    return all(d is None or _kernel_logpdf(d) is not None for d in priors)


@lru_cache(maxsize=1)
def mosaic_supported() -> bool:
    """True when the default jax backend can compile AND run a trivial
    Pallas kernel. ``ModelFramework.MCMC(backend='auto')`` probes this
    (once; cached) instead of denylisting platform names, so an unknown
    PJRT plugin without Mosaic support falls back to the XLA sampler
    rather than crashing inside ``pallas_call``.
    """
    try:
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0

        x = jnp.zeros((_DEF_SUB, _LANES), jnp.float32)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
        return bool(np.asarray(out)[0, 0] == 1.0)
    except Exception:
        return False


def _static_prior(d):
    """Rebuild a prior with plain-float fields.

    Distribution dataclasses may carry jnp-scalar hyperparameters (e.g. built
    by ``from_scipy`` before it coerced scalars, or constructed by a user
    with device values); those are unhashable and would crash the
    ``lru_cache`` keyed on the priors tuple. ``_kernel_logpdf`` only ever
    reads ``float(field)``, so a float-field twin is semantically identical.
    """
    kw = {f.name: float(getattr(d, f.name)) for f in dataclasses.fields(d)}
    return type(d)(**kw)


class _StaticPlan(NamedTuple):
    """Everything the kernel bakes in at trace time."""
    step_ts: tuple          # (t, h, gi) per integration sub-step; gi is the
    #                         grid index whose observations are scored after
    #                         this step, or -1 (mid-interval step)
    obs_after: tuple        # per grid index: ((members, log_ab, log_sig,
    #                         abundance, censor_flag), ...) contributions
    #                         recorded there; censor_flag 0 exact / 1 left
    #                         / 2 right (Tobit scoring, lognormal only)
    sstot: float
    n_grid: int
    # per grid index: ((raw_state_idx, amount), ...) bolus impulses added
    # when integration LEAVES that grid point (after its observations are
    # scored — outputs/contribs are pre-dose left limits, model.dose_matrix)
    dose_after: tuple = ()


def _normalize_substeps(substeps, n_intervals: int):
    """int -> uniform; sequence -> validated per-interval static schedule
    (hashable tuple, usable as an lru_cache key component)."""
    if isinstance(substeps, (int, np.integer)):
        s = int(substeps)
        if s < 1:
            raise ValueError("substeps must be >= 1")
        return s
    sched = tuple(int(v) for v in np.asarray(substeps).ravel())
    if len(sched) != n_intervals:
        raise ValueError(
            f"substeps schedule must have {n_intervals} entries "
            f"(len(times)-1), got {len(sched)}")
    if any(v < 1 for v in sched):
        raise ValueError("substeps schedule entries must be >= 1")
    return sched


def _build_plan(spec: ModelSpec, obs: ObsData, times, substeps):
    times = np.asarray(times, np.float64)
    t_index = np.asarray(obs.t_index)
    state_index = np.asarray(obs.state_index)
    log_ab = np.asarray(obs.log_abundance, np.float64)
    log_sig = np.asarray(obs.log_sigma, np.float64)
    abund = np.asarray(obs.abundance, np.float64)
    censor = (np.zeros(len(log_ab), np.int32) if obs.censor is None
              else np.asarray(obs.censor, np.int32))
    if censor.any() and spec.obs_model not in ("lognormal", "student_t"):
        # -log CDF of the DISCRETE count models needs the regularized
        # incomplete gamma at a data-dependent integer order; unlike the
        # t-CDF's incomplete beta (static nu -> fixed-iteration Lentz CF,
        # _t_logcdf_kernel) there is no Mosaic-safe fixed-shape form, so
        # the framework routes censored counts to the XLA sampler
        # (api.MCMC backend='auto' mirrors this check)
        raise ValueError(
            "the fused kernel scores censored observations for "
            "obs_model='lognormal' and 'student_t' only; use the XLA "
            f"backend for censored {spec.obs_model!r} data")

    # post-summation state j -> tuple of raw-state member indices
    if spec.sum_matrix is not None:
        m = np.asarray(spec.sum_matrix)
        members = tuple(tuple(int(i) for i in np.where(m[:, j])[0])
                        for j in range(m.shape[1]))
    else:
        members = tuple((j,) for j in range(len(spec.snames)))

    # statically drop observations the XLA path masks out (stats.
    # obs_negloglik): invalid log-abundance for the log-space models,
    # invalid linear abundance for the count models (where O=0, i.e.
    # log_O=-inf, is a VALID observation)
    if spec.obs_model in ("poisson", "negbinom"):
        keep = np.isfinite(abund)
    else:
        keep = np.isfinite(log_ab)
    obs_after = [[] for _ in range(len(times))]
    for o in range(len(log_ab)):
        if not keep[o]:
            continue
        obs_after[int(t_index[o])].append(
            (members[int(state_index[o])], float(log_ab[o]),
             float(log_sig[o]), float(abund[o]), int(censor[o])))

    dose_after = [[] for _ in range(len(times))]
    if spec.dose_events:
        for t, s, amt in spec.dose_events:
            gi = int(np.argmin(np.abs(times - t)))
            dose_after[gi].append((int(s), float(amt)))

    substeps = _normalize_substeps(substeps, len(times) - 1)
    step_ts = []
    for i in range(len(times) - 1):
        n_sub = substeps if isinstance(substeps, int) else substeps[i]
        h = (times[i + 1] - times[i]) / n_sub
        for s in range(n_sub):
            gi = (i + 1) if s == n_sub - 1 else -1
            step_ts.append((float(times[i] + s * h), float(h), gi))
    return _StaticPlan(step_ts=tuple(step_ts),
                       obs_after=tuple(tuple(x) for x in obs_after),
                       sstot=float(np.asarray(obs.sstot)),
                       n_grid=len(times),
                       dose_after=tuple(tuple(x) for x in dose_after))


def _assemble_params(spec: ModelSpec, theta_list):
    """Per-parameter values for the RHS from flat per-slot tiles: scalars
    pass through; array parameters are stacked to ``shp + tile_shape`` so
    elementwise indexing works exactly like on the stacked state vector."""
    ps = []
    for off, shp in zip(spec.theta_offsets, spec.pshapes):
        if shp:
            n = int(np.prod(shp))
            tiles = jnp.stack(theta_list[off:off + n])
            ps.append(tiles.reshape(shp + tiles.shape[1:]))
        else:
            ps.append(theta_list[off])
    return ps


@lru_cache(maxsize=256)
def rhs_supports_tiles(spec: ModelSpec) -> bool:
    """True when the model RHS traces in the kernel's tiled layout.

    Scalar-parameter RHSs always do (each parameter/state is a (sub, 128)
    tile and the RHS is elementwise in them). An ARRAY parameter is handed
    to the RHS as a ``shp + tile_shape`` stack, which supports elementwise
    indexing (``ps[2][0] * y[1]``) but not linear algebra on the parameter
    (``ps[2] @ y``); this probe abstract-traces the RHS once (cached per
    spec) so ``backend='auto'`` can route such models to the XLA sampler
    instead of failing inside kernel tracing."""
    if not any(s for s in spec.pshapes):
        return True
    try:
        shape = (1, 2)
        theta_list = [jnp.zeros(shape, jnp.float32)
                      for _ in range(spec.theta_size)]

        def f(y, *tl):
            return jnp.stack(list(spec.rhs(
                0.0, y, _assemble_params(spec, list(tl)))))

        y = jnp.zeros((len(spec.snames),) + shape, jnp.float32)
        out = jax.eval_shape(f, y, *theta_list)
        return tuple(out.shape) == (len(spec.snames),) + shape
    except Exception:
        return False


def _as_erfc(x):
    """Abramowitz & Stegun 7.1.26 erfc for x >= 0 (abs err <= 1.5e-7),
    built from mul/div/exp only — Mosaic lowers neither ``erf`` nor
    ``erfc``, so the kernel carries its own."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def _log_ndtr_kernel(z):
    """Mosaic-safe log Phi(z) (Tobit censored-observation scoring).

    Three elementwise branches (exp/log/div only — no special-function
    primitives, which Mosaic cannot lower):

    * ``z > 0``:      ``log1p(-erfc(z/sqrt2)/2)`` (A&S 7.1.26 erfc)
    * ``-4 < z <= 0``: ``log(erfc(-z/sqrt2)/2)``
    * ``z <= -4``:    Mills-ratio asymptotic
      ``Phi(z) = phi(z)/|z| * (1 - 1/z^2 + 3/z^4 - 15/z^6 + 105/z^8)``

    Worst absolute error ~5e-3 nats near the z = -4 seam (the A&S bound
    is absolute, so its RELATIVE error grows as Phi shrinks), <= ~1e-4
    elsewhere; the XLA path keeps jax.scipy's exact ``log_ndtr``. A Tobit
    penalty term is insensitive at this scale — the seam error is far
    below one nat and both branches are smooth and monotone.
    """
    # center branch, z in (-4, 0] (arg clamped so other lanes stay sane)
    xc = jnp.clip(-z * 0.7071067811865476, 0.0, 3.0)
    log_center = jnp.log(0.5 * _as_erfc(xc))
    # right branch, z > 0
    xp = jnp.clip(z * 0.7071067811865476, 0.0, 12.0)
    log_right = jnp.log1p(-0.5 * _as_erfc(xp))
    # deep-tail branch, z <= -4
    zc = jnp.minimum(z, -4.0)
    z2 = zc * zc
    series = (1.0 - 1.0 / z2 + 3.0 / (z2 * z2) - 15.0 / (z2 * z2 * z2)
              + 105.0 / (z2 * z2 * z2 * z2))
    log_tail = (-0.5 * z2 - jnp.log(-zc) - 0.9189385332046727
                + jnp.log(series))           # log(sqrt(2*pi))
    # NaN z picks the (NaN) tail branch: blow-ups stay non-finite
    return jnp.where(z > 0.0, log_right,
                     jnp.where(z > -4.0, log_center, log_tail))


def _betacf_kernel(a, b, x, n_iter=40):
    """Numerical-Recipes continued fraction for the regularized
    incomplete beta, with FIXED iteration count (no early exit — the
    loop unrolls at trace time) and only mul/div/where — Mosaic-safe.
    ``a``/``b`` are static Python floats; valid for
    ``x < (a+1)/(a+b+2)`` (callers apply the symmetry switch)."""
    FPMIN = 1e-30
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = jnp.ones_like(x)
    d = 1.0 - qab * x / qap
    d = 1.0 / jnp.where(jnp.abs(d) < FPMIN, FPMIN, d)
    h = d
    for m in range(1, int(n_iter) + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = 1.0 / jnp.where(jnp.abs(d) < FPMIN, FPMIN, d)
        c = 1.0 + aa / c
        c = jnp.where(jnp.abs(c) < FPMIN, FPMIN, c)
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = 1.0 / jnp.where(jnp.abs(d) < FPMIN, FPMIN, d)
        c = 1.0 + aa / c
        c = jnp.where(jnp.abs(c) < FPMIN, FPMIN, c)
        h = h * d * c
    return h


def _t_logcdf_kernel(z, nu):
    """Mosaic-safe log CDF of the Student-t with STATIC ``nu`` dof —
    the fused Tobit branch for censored student-t data (r5, VERDICT r4
    push item 5). Same identity as the XLA path (stats._t_logcdf):
    ``T(z) = I_x(nu/2, 1/2)/2`` for ``z < 0`` with ``x = nu/(nu+z^2)``,
    ``1 - I_x/2`` otherwise. The incomplete beta runs as a fixed
    40-iteration Lentz continued fraction (elementwise only); all
    beta-function constants fold on host via ``math.lgamma``. Agreement
    with ``jax.scipy.betainc`` is ~1e-6 relative in f32 across
    ``nu in [1, 100]`` (tests/test_censored.py). NaN ``z`` (blown-up
    prediction) propagates through every branch."""
    import math as _math

    a, b = 0.5 * float(nu), 0.5
    lbeta = (_math.lgamma(a) + _math.lgamma(b) - _math.lgamma(a + b))
    thresh = (a + 1.0) / (a + b + 2.0)
    x = float(nu) / (float(nu) + z * z)          # in (0, 1]
    # branch A (|z| large, x below the CF threshold): direct series
    xa = jnp.clip(x, 1e-30, thresh)
    log_half_A = (a * jnp.log(xa) + b * jnp.log1p(-xa) - _math.log(a)
                  - lbeta + jnp.log(_betacf_kernel(a, b, xa))
                  - _math.log(2.0))
    # branch B (x >= thresh): I_x = 1 - I_{1-x}(b, a)
    xb = jnp.clip(1.0 - x, 1e-30, 1.0 - thresh * 0.5)
    J = jnp.exp(b * jnp.log(xb) + a * jnp.log1p(-xb) - _math.log(b)
                - lbeta) * _betacf_kernel(b, a, xb)
    log_half_B = jnp.log(0.5 * (1.0 - J))
    log_half = jnp.where(x < thresh, log_half_A, log_half_B)
    # NaN z -> x NaN -> picks branch B with NaN: stays non-finite
    log_half = jnp.where(z == z, log_half, jnp.full_like(z, jnp.nan))
    return jnp.where(z < 0.0, log_half,
                     jnp.log1p(-jnp.exp(log_half)))


def _make_scorer(spec: ModelSpec, plan: _StaticPlan, y0_base, stepper):
    """Returns score(theta_list) -> (chi, rsq): integrate + score, fully
    unrolled with static obs contributions (the plan's step list already
    encodes the — possibly non-uniform — substep schedule).

    ``theta_list`` holds one (sub, 128) tile per FLAT theta slot
    (``spec.theta_size`` entries). Array-valued parameters are reassembled
    for the RHS by stacking their slot tiles to shape ``shp + tile_shape``
    — the user RHS indexes them elementwise exactly as it indexes the
    stacked state vector, so any reference-style RHS works unchanged."""
    y0_base = tuple(float(v) for v in np.asarray(y0_base))
    S = len(spec.snames)
    init_pidx = spec.init_pidx

    def rhs(t, y, theta_list):
        return jnp.stack(list(spec.rhs(t, y,
                                       _assemble_params(spec, theta_list))))

    obs_model, obs_param = spec.obs_model, spec.obs_param

    def contrib(y, gi, chi, ssres):
        for mem, lab, lsig, ab, cen in plan.obs_after[gi]:
            pred = sum(y[m] for m in mem) if len(mem) > 1 else y[mem[0]]
            # NO floor on pred: log(0) = -inf and log(<0) = NaN make chi
            # non-finite, so a blown-up trajectory is rejected outright —
            # the same semantics as the XLA path and the reference
            # (a clamp would instead hand the chain a huge-but-finite chi
            # that hides the blow-up; VERDICT r2 weak 8)
            # obs_model is static per spec: exactly one branch compiles
            # (formulas = stats.obs_negloglik with per-obs constants
            # lab/lsig/ab inlined)
            if cen and obs_model == "student_t":
                # Tobit at a detection limit under the t model (r5):
                # -log T_nu(z) via the Mosaic-safe incomplete-beta CF
                z = (lab - jnp.log(pred)) / lsig
                if cen == 2:
                    z = -z
                chi = chi - _t_logcdf_kernel(z, obs_param)
            elif obs_model == "student_t":
                t = (lab - jnp.log(pred)) / lsig
                chi = chi + (0.5 * (obs_param + 1.0)
                             * jnp.log1p(t * t / obs_param))
            elif obs_model == "poisson":
                term = pred - (ab * jnp.log(pred) if ab > 0 else 0.0)
                chi = chi + jnp.where(pred >= 0, term, jnp.nan)
            elif obs_model == "negbinom":
                # log1p forms match stats.obs_negloglik (f32 cancellation
                # when pred >> r)
                r = obs_param
                term = r * jnp.log1p(pred / r)
                if ab > 0:
                    term = term + ab * jnp.log1p(r / pred)
                chi = chi + jnp.where(pred >= 0, term, jnp.nan)
            elif cen:
                # Tobit point at a detection limit (_build_plan guarantees
                # obs_model == 'lognormal' here): -log Phi(z) for left-
                # censored, -log Phi(-z) for right (_log_ndtr_kernel)
                z = (lab - jnp.log(pred)) / lsig
                if cen == 2:
                    z = -z
                chi = chi - _log_ndtr_kernel(z)
            else:
                c = jnp.log(pred)
                chi = chi + (lab - c) ** 2 / (2.0 * lsig * lsig)
            if not cen:
                ssres = ssres + (pred - ab) ** 2
        return chi, ssres

    def apply_dose(y, gi):
        """Bolus impulses leaving grid point gi (static adds; contribs at
        gi have already been scored, so records stay pre-dose)."""
        if not plan.dose_after or not plan.dose_after[gi]:
            return y
        adds = [0.0] * S
        for s_idx, amt in plan.dose_after[gi]:
            adds[s_idx] += amt
        return jnp.stack([y[s] + adds[s] if adds[s] != 0.0 else y[s]
                          for s in range(S)])

    def score(theta_list, shape):
        y = jnp.stack([
            theta_list[init_pidx[s]] if init_pidx[s] >= 0
            else jnp.full(shape, y0_base[s], jnp.float32)
            for s in range(S)])
        chi = jnp.zeros(shape, jnp.float32)
        ssres = jnp.zeros(shape, jnp.float32)
        chi, ssres = contrib(y, 0, chi, ssres)
        y = apply_dose(y, 0)
        for t, h, gi in plan.step_ts:
            y = stepper(rhs, t, y, h, theta_list)
            if gi >= 0:
                chi, ssres = contrib(y, gi, chi, ssres)
                y = apply_dose(y, gi)
        rsq = 1.0 - ssres / plan.sstot
        return chi, rsq

    return score


def _make_scorer_from_key(spec, plan, y0_key, step_fn):
    """Hashable-argument wrapper over _make_scorer for the lru_caches."""
    return _make_scorer(spec, plan, np.asarray(y0_key), step_fn)


def pick_tile_chains(C: int, n_dev: int = 1) -> int:
    """Auto tile size: biggest measured win after padding waste.

    Measured on v5e (10k chains x 1000 iters, zero_i demo): kernel rate
    grows with tile — ~125M chain-steps/s at 1024, ~150M at 2048, ~192M
    at 4096 (more sublanes per dispatch amortize the grid/pipeline
    overhead) — but C pads up to a tile multiple, so small batches waste
    lanes. Pick argmax of rate * C / padded_C over the measured tiles.
    """
    per_dev = max(1, C // max(n_dev, 1))
    best_t, best_score = 1024, 0.0
    for t, rate in ((4096, 192.0), (2048, 150.0), (1024, 125.0)):
        padded = -(-per_dev // t) * t
        score = rate * per_dev / padded
        if score > best_score:
            best_t, best_score = t, score
    return best_t


def metropolis_hastings_fused(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, seed: int, *,
        nits: int = 1000, burnin: Optional[int] = None,
        walk_mask: Optional[Sequence[float]] = None, rwalk_std: float = 0.05,
        substeps: int = 4, stepper: str = "dopri5",
        tile_chains: Optional[int] = None, interpret: bool = False,
        mesh=None, priors=None, checkpoint_every: Optional[int] = None,
        checkpoint_path: Optional[str] = None,
        resume_from: Optional[str] = None, config_token: str = "",
        _stop_after_chunks: Optional[int] = None,
        _rec_cap: Optional[int] = None):
    """Run C chains of reference-semantics MH fully inside a Pallas kernel.

    theta0: (C, P) float32, P = ``spec.theta_size`` FLAT slots — array
    parameters contribute one slot per entry and are reassembled inside
    the kernel (C padded to a multiple of tile_chains internally).
    Returns the same record structure as the XLA sampler:
    (theta (C, R, P), chi, rsq, aic, acc_ratio (C, R), iteration (R,)).
    ``priors``/``walk_mask`` are per-SLOT (the caller expands
    per-parameter priors; zero-template entries of array parameters must
    get prior None — they pin at 0 under the log-space walk and a
    positive-support logpdf there would poison the acceptance ratio).

    ``mesh``: optional 1-D chain :class:`jax.sharding.Mesh` — the kernel is
    wrapped in ``shard_map`` with the chain axis sharded, each device running
    its own tile grid (pure data parallelism, zero collectives). RNG streams
    are keyed on the GLOBAL tile index, so a sharded run is bitwise-identical
    to the single-device run of the same total chain batch.
    """
    if burnin is None:
        burnin = int(nits / 2)
    P = spec.theta_size
    theta0 = np.asarray(theta0, np.float32)
    C0 = theta0.shape[0]
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    if tile_chains is None:
        tile_chains = pick_tile_chains(C0, n_dev)
    tile = int(tile_chains)
    # compiled path needs full (8,128) f32 tiles; interpret mode (CPU tests)
    # may use a single-sublane tile to keep emulation cheap
    min_tile = _LANES if interpret else _DEF_SUB * _LANES
    assert tile % min_tile == 0, \
        f"tile_chains must be a multiple of {min_tile}"
    if n_dev == 1:
        mesh = None
    C = int(-(-C0 // (tile * n_dev)) * (tile * n_dev))
    if C > C0:
        theta0 = np.concatenate(
            [theta0, np.tile(theta0[-1:], (C - C0, 1))], axis=0)
    num = int(np.count_nonzero(theta0[0]))
    if walk_mask is None:
        walk_mask = [1.0] * P
    walk = tuple(float(w) for w in walk_mask)

    substeps = _normalize_substeps(substeps,
                                   len(np.asarray(times)) - 1)
    plan = _build_plan(spec, obs, times, substeps)
    y0_key = tuple(float(v) for v in np.asarray(y0_base))

    # ONE kernel dispatch for the whole run: grid = (chain_tiles,
    # segments), both axes sequential (row-major, segment minor), so per
    # chain tile the segments run back-to-back with chain state (log-theta,
    # chi, R^2, accept count) carried in VMEM scratch. Each grid step writes
    # one L_SEG-iteration record block, which the Mosaic pipeline DMAs to
    # HBM overlapped with the next segment's compute. L_SEG only sets the
    # pipeline granularity / VMEM record footprint (double-buffered) —
    # segment boundaries are bitwise-invisible to the chains (counter-based
    # RNG on the global iteration; state never leaves VMEM). Burn-in rows
    # are recorded too and sliced off on the host: writing them costs ~free
    # bandwidth and keeps the program a single dispatch (the multi-call
    # predecessor of this design spent ~80% of wall time in per-segment
    # dispatch latency).
    R = nits - 1                       # total proposals (it in [1, nits-1])
    if R <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    L_SEG = max(1, min(64, R, (2 * 1024 * 1024) // ((P + 4) * tile * 4)))
    if _rec_cap is not None:  # test hook: force specific segmentation
        L_SEG = min(L_SEG, int(_rec_cap))
    n_segs = -(-R // L_SEG)

    if priors is not None:
        priors = tuple(priors)
        if len(priors) != P:
            raise ValueError(f"priors must have one entry per theta slot "
                             f"({P}), got {len(priors)}")
        if not kernel_priors_supported(priors):
            raise ValueError(
                "unsupported prior family for the fused kernel (supported: "
                "Normal, LogNormal, Uniform, Gamma, TruncNormal, "
                "Exponential, Cauchy, HalfNormal, Weibull, Beta); use the "
                "XLA backend")
        if not any(d is not None for d in priors):
            priors = None
        else:
            priors = tuple(None if d is None else _static_prior(d)
                           for d in priors)
    # feed in the kernel's native (P, C//128, 128) layout so every in-kernel
    # store/load is a plain (sub, 128) tile op (a flat (tile,) row would
    # cost a cross-lane relayout per store)
    theta_tiles = jnp.asarray(theta0.T.reshape(P, C // _LANES, _LANES))

    if checkpoint_every is not None or resume_from is not None:
        return _mh_fused_chunked(
            spec, plan, y0_key, P, tile, C, nits, burnin, walk,
            float(rwalk_std), num, stepper, substeps, bool(interpret), C0,
            mesh, priors, theta_tiles, int(seed),
            checkpoint_every if checkpoint_every is not None else nits,
            checkpoint_path, resume_from, _stop_after_chunks,
            config_token=config_token)

    run = _cached_mh_run(spec, plan, y0_key, P, tile, C, L_SEG, n_segs,
                         nits, walk, float(rwalk_std), num, stepper,
                         substeps, bool(interpret), C0, burnin, mesh,
                         priors)
    theta_s, chi_s, rsq_s, aic_s, ar_s = run(
        jnp.asarray([seed], jnp.int32), theta_tiles)
    iterations = jnp.arange(1, nits)[burnin:]
    from ..samplers.mh import MHOutput
    return MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                    acceptance_ratio=ar_s, iteration=iterations)


@lru_cache(maxsize=64)
def _cached_mh_run(spec, plan, y0_key, P, tile, C, L_SEG, n_segs, nits,
                   walk, rwalk_std, num, stepper, substeps, interpret,
                   C0, burnin, mesh, priors=None):
    """One jitted program = pallas kernel + record reshape/transpose/slice.

    Fusing the postprocess into the kernel's program matters on remote
    runtimes where every dispatch costs a tunnel round-trip: the whole MCMC
    run (kernel + (C, R, P) record layout) is a single XLA executable. With
    a ``mesh``, the same local program runs per device under ``shard_map``
    (chain axis sharded; the device's global tile offset feeds the RNG).
    """
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    C_local = C // n_dev
    inner = _cached_mh_grid(spec, plan, y0_key, P, tile, C_local, L_SEG,
                            n_segs, nits, walk, rwalk_std, num, stepper,
                            substeps, interpret, priors)
    padded_R = n_segs * L_SEG
    lo, hi = burnin, nits - 1      # keep rows with it in (burnin, nits-1]

    def local_run(seed_arr, off_arr, theta_tiles):
        outs = inner(seed_arr, off_arr, theta_tiles)
        th_r, chi_r, rsq_r, aic_r, ar_r = [
            o.reshape(padded_R, -1, C_local) for o in outs]
        theta_s = jnp.transpose(th_r, (2, 0, 1))[:, lo:hi]  # (C_l, R, P)
        sq = lambda a: jnp.transpose(a[:, 0, :], (1, 0))[:, lo:hi]
        return theta_s, sq(chi_r), sq(rsq_r), sq(aic_r), sq(ar_r)

    if mesh is None:
        def run(seed_arr, theta_tiles):
            outs = local_run(seed_arr, jnp.zeros((1,), jnp.int32),
                             theta_tiles)
            return tuple(o[:C0] for o in outs)
    else:
        from jax.sharding import PartitionSpec as PS
        axis = mesh.axis_names[0]
        tiles_local = C_local // tile

        def shard_body(seed_arr, theta_tiles):
            off = (jax.lax.axis_index(axis) * tiles_local)[None].astype(
                jnp.int32)
            return local_run(seed_arr, off, theta_tiles)

        smap = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(PS(), PS(None, axis, None)),
            out_specs=tuple([PS(axis)] * 5), check_vma=False)

        def run(seed_arr, theta_tiles):
            return tuple(o[:C0] for o in smap(seed_arr, theta_tiles))

    return jax.jit(run)


@lru_cache(maxsize=128)
def _cached_mh_run_chunk(spec, plan, y0_key, P, tile, C, L_SEG, n_segs,
                         nits, walk, rwalk_std, num, stepper, substeps,
                         interpret, C0, mesh, priors, R_chunk, resume):
    """Jitted program for ONE checkpoint chunk: kernel + record postprocess.

    Returns (theta (C0,R_chunk,P), chi, rsq, aic, ar (C0,R_chunk),
    state (P+4, C//128, 128)) — burnin slicing happens on the host across
    chunks. See :func:`_cached_mh_grid` (R_chunk mode) for bitwise-equality
    guarantees with the single-dispatch kernel.
    """
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    C_local = C // n_dev
    inner = _cached_mh_grid(spec, plan, y0_key, P, tile, C_local, L_SEG,
                            n_segs, nits, walk, rwalk_std, num, stepper,
                            substeps, interpret, priors,
                            R_chunk=R_chunk, resume=resume)
    padded_R = n_segs * L_SEG

    def local_run(seed_arr, off_arr, itb_arr, theta_tiles, state_in):
        ins = (seed_arr, off_arr, itb_arr)
        if resume:
            ins = ins + (state_in,)
        *recs, state = inner(*ins, theta_tiles)
        th_r, chi_r, rsq_r, aic_r, ar_r = [
            o.reshape(padded_R, -1, C_local) for o in recs]
        theta_s = jnp.transpose(th_r, (2, 0, 1))[:, :R_chunk]
        sq = lambda a: jnp.transpose(a[:, 0, :], (1, 0))[:, :R_chunk]
        return theta_s, sq(chi_r), sq(rsq_r), sq(aic_r), sq(ar_r), state

    if mesh is None:
        def run(seed_arr, itb_arr, theta_tiles, state_in=None):
            outs = local_run(seed_arr, jnp.zeros((1,), jnp.int32), itb_arr,
                             theta_tiles, state_in)
            return tuple(o[:C0] for o in outs[:5]) + (outs[5],)
    else:
        from jax.sharding import PartitionSpec as PS
        axis = mesh.axis_names[0]
        tiles_local = C_local // tile
        state_spec = PS(None, axis, None)

        def shard_body(seed_arr, itb_arr, theta_tiles, state_in):
            off = (jax.lax.axis_index(axis) * tiles_local)[None].astype(
                jnp.int32)
            return local_run(seed_arr, off, itb_arr, theta_tiles, state_in)

        in_specs = (PS(), PS(), PS(None, axis, None),
                    state_spec if resume else PS())
        smap = jax.shard_map(
            shard_body, mesh=mesh, in_specs=in_specs,
            out_specs=tuple([PS(axis)] * 5) + (state_spec,),
            check_vma=False)

        def run(seed_arr, itb_arr, theta_tiles, state_in=None):
            if state_in is None:   # dummy replicated placeholder
                state_in = jnp.zeros((0,), jnp.float32)
            outs = smap(seed_arr, itb_arr, theta_tiles, state_in)
            return tuple(o[:C0] for o in outs[:5]) + (outs[5],)

    return jax.jit(run)


def _mh_fused_chunked(spec, plan, y0_key, P, tile, C, nits, burnin, walk,
                      rwalk_std, num, stepper, substeps, interpret, C0,
                      mesh, priors, theta_tiles, seed, checkpoint_every,
                      checkpoint_path, resume_from, _stop_after_chunks=None,
                      config_token=""):
    """Checkpointed fused MH: the run is split into chunks of
    ``checkpoint_every`` proposals; after each chunk the chain state and the
    records so far are persisted (npz) so a killed run resumes bit-exact
    (SURVEY.md section 5.4 gap; VERDICT r1 task 6).

    ``_stop_after_chunks``: test hook simulating a mid-run kill — the
    function persists that many chunks and returns None.
    """
    import json as _json

    R = nits - 1
    E = int(checkpoint_every)
    if E < 1:
        raise ValueError("checkpoint_every must be >= 1")
    n_chunks = -(-R // E)
    # config_token: process-stable digest of the observation data/prior
    # hyperparameters from the caller — a same-shaped data or prior edit
    # must fail the resume, not stitch two posteriors
    sig = repr((spec.pnames, P, tile, C, nits, E, walk, rwalk_std, num,
                stepper, substeps, C0, int(seed), priors,
                None if mesh is None else int(mesh.devices.size),
                str(config_token)))
    seed_arr = jnp.asarray([seed], jnp.int32)

    k0, state, recs = 0, None, []
    if resume_from:
        with np.load(resume_from, allow_pickle=False) as z:
            saved_sig = bytes(z["sig"]).decode()
            if saved_sig != sig:
                raise ValueError(
                    "checkpoint was written by a different MCMC "
                    f"configuration:\n  saved: {saved_sig}\n  this:  {sig}")
            k0 = int(z["next_chunk"])
            state = z["state"]
            if k0 > 0:
                recs = [tuple(z[f"rec{i}"] for i in range(5))]

    for k in range(k0, n_chunks):
        R_chunk = min(E, R - k * E)
        L_SEG = max(1, min(64, R_chunk,
                           (2 * 1024 * 1024) // ((P + 4) * tile * 4)))
        n_segs = -(-R_chunk // L_SEG)
        run = _cached_mh_run_chunk(spec, plan, y0_key, P, tile, C, L_SEG,
                                   n_segs, nits, walk, rwalk_std, num,
                                   stepper, substeps, interpret, C0, mesh,
                                   priors, R_chunk, resume=(k > 0))
        itb = jnp.asarray([k * E], jnp.int32)
        if k == 0:
            outs = run(seed_arr, itb, theta_tiles)
        else:
            outs = run(seed_arr, itb, theta_tiles, jnp.asarray(state))
        # d2h pull: inherent to checkpointing (this is the persistence point)
        rec = tuple(np.asarray(o) for o in outs[:5])
        state = np.asarray(outs[5])
        recs.append(rec)
        if checkpoint_path:
            merged = tuple(np.concatenate([r[i] for r in recs], axis=1)
                           for i in range(5))
            recs = [merged]
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez_compressed(
                    f, sig=np.frombuffer(sig.encode(), np.uint8),
                    next_chunk=np.asarray(k + 1), state=state,
                    **{f"rec{i}": merged[i] for i in range(5)})
            os.replace(tmp, checkpoint_path)
        if (_stop_after_chunks is not None
                and k + 1 - k0 >= _stop_after_chunks and k + 1 < n_chunks):
            return None

    th, chi, rsq, aic, ar = (np.concatenate([r[i] for r in recs], axis=1)
                             for i in range(5))
    from ..samplers.mh import MHOutput
    iterations = jnp.arange(1, nits)[burnin:]
    return MHOutput(theta=jnp.asarray(th[:, burnin:]),
                    chi=jnp.asarray(chi[:, burnin:]),
                    rsquared=jnp.asarray(rsq[:, burnin:]),
                    aic=jnp.asarray(aic[:, burnin:]),
                    acceptance_ratio=jnp.asarray(ar[:, burnin:]),
                    iteration=iterations)


@lru_cache(maxsize=64)
def _cached_mh_grid(spec, plan, y0_key, P, tile, C, L_SEG, n_segs, nits,
                    walk, rwalk_std, num, stepper, substeps, interpret,
                    priors=None, R_chunk=None, resume=False):
    """Build (once per static config) the whole-run MH pallas_call.

    pallas_call tracing of the fully-unrolled kernel costs seconds of host
    time; caching on the hashable static config makes repeat invocations
    dispatch-only. Inputs: seed (SMEM), global tile offset (SMEM),
    theta0 (P, C//128, 128). Outputs: per-iteration
    theta/chi/rsq/aic/acceptance-ratio record arrays of n_segs*L_SEG rows
    (rows past nits-2 are padding). Chain state lives in VMEM scratch across
    the sequential segment grid axis; iterations beyond the last real one
    are masked out of the accept decision so padding never perturbs state.

    ``R_chunk``: checkpointed-chunk mode — the call covers only R_chunk
    proposals starting at global iteration ``it_base+1`` (it_base is an
    extra SMEM input), emits the final chain state as an extra output, and
    with ``resume=True`` loads the incoming chain state from an extra input
    instead of scoring theta0. Because the RNG is counter-based on the
    GLOBAL iteration and chain state round-trips exactly (f32 in, f32 out),
    a chunked run is bitwise identical to the single-dispatch run.
    """
    stateful = R_chunk is not None
    sub = tile // _LANES
    shape = (sub, _LANES)
    step_fn = _FIXED_STEPPERS[stepper]
    score = _make_scorer_from_key(spec, plan, y0_key, step_fn)
    # static prior evaluators: prior-aware acceptance fully in-kernel
    lps = [None] * P if priors is None else [_kernel_logpdf(d)
                                             for d in priors]
    use_priors = any(f is not None for f in lps)

    def logprior(theta_list):
        tot = jnp.zeros(shape, jnp.float32)
        for f, th in zip(lps, theta_list):
            if f is not None:
                tot = tot + f(th)
        return tot

    def kernel(*refs):
        if stateful and resume:
            (seed_ref, off_ref, itb_ref, state_in, theta_in, theta_out,
             chi_out, rsq_out, aic_out, ar_out, state_out,
             lt_s, chi_s, rsq_s, acc_s, lp_s) = refs
        elif stateful:
            (seed_ref, off_ref, itb_ref, theta_in, theta_out,
             chi_out, rsq_out, aic_out, ar_out, state_out,
             lt_s, chi_s, rsq_s, acc_s, lp_s) = refs
            state_in = None
        else:
            (seed_ref, off_ref, theta_in, theta_out,
             chi_out, rsq_out, aic_out, ar_out,
             lt_s, chi_s, rsq_s, acc_s, lp_s) = refs
            itb_ref = state_in = state_out = None
        # off = this device's global tile offset (shard_map), so RNG streams
        # stay unique and sharding-invariant across the whole chain batch
        rng = _Rng(shape, seed_ref[0], pl.program_id(0) + off_ref[0], tile)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            if stateful and resume:
                for p in range(P):
                    lt_s[p] = state_in[p]
                chi_s[...] = state_in[P]
                rsq_s[...] = state_in[P + 1]
                acc_s[...] = state_in[P + 2]
                lp_s[...] = state_in[P + 3]
                return
            theta = [theta_in[p] for p in range(P)]
            chi0, rsq0 = score(theta, shape)
            for p in range(P):
                lt_s[p] = jnp.log(theta[p])
            chi_s[...] = chi0
            rsq_s[...] = rsq0
            acc_s[...] = jnp.zeros(shape, jnp.float32)
            lp_s[...] = (logprior(theta) if use_priors
                         else jnp.zeros(shape, jnp.float32))

        it0 = 1 + j * L_SEG
        if stateful:
            it0 = it0 + itb_ref[0]

        def body(i, carry):
            logtheta, chi, rsq, acc_count, lp = carry
            it = it0 + i
            active = it < nits      # padding rows past the last proposal
            if stateful:
                # rows past this CHUNK's range belong to the next chunk —
                # advancing state through them would double-apply them
                active = active & (j * L_SEG + i < R_chunk)
            prop = [lt + (rwalk_std * walk[p]) * rng.normal(it)
                    if walk[p] != 0.0 else lt
                    for p, lt in enumerate(logtheta)]
            theta_p = [jnp.exp(lt) for lt in prop]
            chi_new, rsq_new = score(theta_p, shape)
            u = rng.uniform(it)
            log_ratio = chi - chi_new
            if use_priors:
                lp_new = logprior(theta_p)
                log_ratio = log_ratio + (lp_new - lp)
            # NaN/-inf ratios compare False -> rejected
            accept = (jnp.exp(log_ratio) > u) & active
            logtheta = [jnp.where(accept, pn, lo)
                        for pn, lo in zip(prop, logtheta)]
            chi = jnp.where(accept, chi_new, chi)
            rsq = jnp.where(accept, rsq_new, rsq)
            if use_priors:
                lp = jnp.where(accept, lp_new, lp)
            acc_count = acc_count + accept.astype(jnp.float32)

            for p in range(P):
                theta_out[i, p] = jnp.exp(logtheta[p])
            chi_out[i, 0] = chi
            rsq_out[i, 0] = rsq
            aic_out[i, 0] = 2.0 * chi + 2.0 * num
            ar_out[i, 0] = acc_count / it.astype(jnp.float32)
            return logtheta, chi, rsq, acc_count, lp

        carry0 = ([lt_s[p] for p in range(P)], chi_s[...], rsq_s[...],
                  acc_s[...], lp_s[...])
        logtheta, chi, rsq, acc_count, lp = jax.lax.fori_loop(
            0, L_SEG, body, carry0)
        for p in range(P):
            lt_s[p] = logtheta[p]
        chi_s[...] = chi
        rsq_s[...] = rsq
        acc_s[...] = acc_count
        lp_s[...] = lp
        if stateful:
            # the state block's index map ignores j, so the block stays
            # resident across the segment axis; the last write wins
            for p in range(P):
                state_out[p] = logtheta[p]
            state_out[P] = chi
            state_out[P + 1] = rsq
            state_out[P + 2] = acc_count
            state_out[P + 3] = lp

    n_rows = C // _LANES   # chain axis as (rows of 128 lanes); tile = sub rows

    def spec_in(k):
        return pl.BlockSpec((k, sub, _LANES), lambda i, j: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def spec_rec(k):
        return pl.BlockSpec((L_SEG, k, sub, _LANES),
                            lambda i, j: (j, 0, i, 0),
                            memory_space=pltpu.VMEM)

    padded_R = n_segs * L_SEG
    out_shapes = \
        [jax.ShapeDtypeStruct((padded_R, P, n_rows, _LANES), jnp.float32)] + \
        [jax.ShapeDtypeStruct((padded_R, 1, n_rows, _LANES), jnp.float32)] * 4
    out_specs = [spec_rec(P)] + [spec_rec(1)] * 4

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),          # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),          # tile offset
    ]
    if stateful:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # it_base
        if resume:
            in_specs.append(spec_in(P + 4))             # incoming state
        out_shapes = out_shapes + [
            jax.ShapeDtypeStruct((P + 4, n_rows, _LANES), jnp.float32)]
        out_specs = out_specs + [spec_in(P + 4)]
    in_specs.append(spec_in(P))                          # theta0

    return pl.pallas_call(
        kernel,
        grid=(C // tile, n_segs),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((P, sub, _LANES), jnp.float32),      # log-theta
            pltpu.VMEM(shape, jnp.float32),                 # chi
            pltpu.VMEM(shape, jnp.float32),                 # rsq
            pltpu.VMEM(shape, jnp.float32),                 # accept count
            pltpu.VMEM(shape, jnp.float32),                 # prior logpdf
        ],
        # both grid axes 'arbitrary': strict row-major order is what lets
        # scratch carry chain state across the (minor) segment axis
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.ARBITRARY, pltpu.ARBITRARY)),
        interpret=interpret,
    )


def ensemble_fused(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, seed: int, *,
        nits: int = 1000, burnin: Optional[int] = None, a: float = 2.0,
        walk_mask: Optional[Sequence[float]] = None,
        substeps: int = 4, stepper: str = "dopri5",
        tile_chains: Optional[int] = None, interpret: bool = False,
        mesh=None, priors=None, init_jitter: float = 0.01,
        checkpoint_every: Optional[int] = None,
        checkpoint_path: Optional[str] = None,
        resume_from: Optional[str] = None, config_token: str = "",
        _stop_after_chunks: Optional[int] = None):
    """Affine-invariant ensemble sampler (Goodman-Weare stretch moves)
    fully inside one Pallas kernel — the fused counterpart of
    ``samplers/ensemble.py`` at the MH kernel's throughput.

    Layout: each chain tile IS one independent ensemble of ``tile_chains``
    walkers ((sub, 128) lanes); a larger walker batch becomes several
    independent ensembles side by side on the tile grid axis. Per
    iteration both sublane halves update in turn: half A proposes
    ``Y = X + (1 - z)(partner - X)`` with partners taken from half B
    *rolled by a shared random (sublane, lane) offset* — a per-walker
    random partner would need a cross-lane dynamic gather, which the VPU
    cannot do, while the stretch move is pi-invariant for ANY partner
    assignment drawn independently of the walker's own state (the partner
    only fixes the affine ray; the z^(d-1) Jacobian does the rest), so a
    shared offset keeps exactness and costs one vector roll.

    Cost per iteration per walker equals the fused MH kernel (two
    half-tile solves = one full-tile solve). Same record layout/returns
    as :func:`metropolis_hastings_fused` (flat per-slot theta layout;
    array parameters supported the same way).
    """
    if burnin is None:
        burnin = int(nits / 2)
    P = spec.theta_size
    if a <= 1.0:
        raise ValueError(f"stretch scale a must exceed 1, got {a}")
    theta0 = np.asarray(theta0, np.float32)
    W0 = theta0.shape[0]
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    if tile_chains is None:
        tile_chains = pick_tile_chains(W0, n_dev)
    tile = int(tile_chains)
    min_tile = _LANES if interpret else _DEF_SUB * _LANES
    assert tile % min_tile == 0, \
        f"tile_chains must be a multiple of {min_tile}"
    if (tile // _LANES) % 2:
        raise ValueError("tile_chains must give an even sublane count "
                         "(the ensemble splits into sublane halves)")
    if n_dev == 1:
        mesh = None
    num = int(np.count_nonzero(theta0[0]))
    if walk_mask is None:
        walk_mask = [1.0] * P
    walk = tuple(float(w) for w in walk_mask)
    n_walked = sum(1 for w in walk if w != 0.0)
    W = int(-(-W0 // (tile * n_dev)) * (tile * n_dev))
    mask_row = np.asarray([1.0 if w != 0.0 else 0.0 for w in walk],
                          np.float32)
    rng = np.random.default_rng(seed)
    if init_jitter:
        # jitter EVERY walker's walked dims (not just padding): seeding
        # with replacement duplicates rows, and stretch moves can never
        # leave the affine span of the distinct start points (same guard
        # as samplers/ensemble.py init_jitter)
        theta0 = theta0 * np.exp(
            float(init_jitter) * mask_row[None, :]
            * rng.normal(size=theta0.shape)).astype(np.float32)
    if W > W0:
        # pad with jittered clones for the same degeneracy reason
        reps = theta0[rng.integers(0, W0, W - W0)]
        reps = reps * np.exp(0.05 * mask_row[None, :]
                             * rng.normal(size=reps.shape)
                             ).astype(np.float32)
        theta0 = np.concatenate([theta0, reps], axis=0)

    substeps = _normalize_substeps(substeps, len(np.asarray(times)) - 1)
    plan = _build_plan(spec, obs, times, substeps)
    y0_key = tuple(float(v) for v in np.asarray(y0_base))

    R = nits - 1
    if R <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations after "
                         f"burnin={burnin}")
    L_SEG = max(1, min(64, R, (2 * 1024 * 1024) // ((P + 4) * tile * 4)))
    n_segs = -(-R // L_SEG)

    if priors is not None:
        priors = tuple(priors)
        if len(priors) != P:
            raise ValueError(f"priors must have one entry per theta slot "
                             f"({P}), got {len(priors)}")
        if not kernel_priors_supported(priors):
            raise ValueError(
                "unsupported prior family for the fused kernel; use the "
                "XLA backend")
        if not any(d is not None for d in priors):
            priors = None
        else:
            priors = tuple(None if d is None else _static_prior(d)
                           for d in priors)
    theta_tiles = jnp.asarray(theta0.T.reshape(P, W // _LANES, _LANES))

    if checkpoint_every is not None or resume_from is not None:
        return _ens_fused_chunked(
            spec, plan, y0_key, P, tile, W, nits, burnin, walk, n_walked,
            float(a), num, stepper, substeps, bool(interpret), W0, mesh,
            priors, theta_tiles, int(seed),
            checkpoint_every if checkpoint_every is not None else nits,
            checkpoint_path, resume_from, _stop_after_chunks,
            config_token=config_token)

    run = _cached_ens_run(spec, plan, y0_key, P, tile, W, L_SEG, n_segs,
                          nits, walk, n_walked, float(a), num, stepper,
                          substeps, bool(interpret), W0, burnin, mesh,
                          priors)
    theta_s, chi_s, rsq_s, aic_s, ar_s = run(
        jnp.asarray([seed], jnp.int32), theta_tiles)
    iterations = jnp.arange(1, nits)[burnin:]
    from ..samplers.mh import MHOutput
    return MHOutput(theta=theta_s, chi=chi_s, rsquared=rsq_s, aic=aic_s,
                    acceptance_ratio=ar_s, iteration=iterations)


@lru_cache(maxsize=64)
def _cached_ens_run(spec, plan, y0_key, P, tile, W, L_SEG, n_segs, nits,
                    walk, n_walked, a, num, stepper, substeps, interpret,
                    W0, burnin, mesh, priors=None):
    """Jitted program: ensemble pallas kernel + record postprocess
    (same single-dispatch structure as :func:`_cached_mh_run`)."""
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    W_local = W // n_dev
    inner = _cached_ens_grid(spec, plan, y0_key, P, tile, W_local, L_SEG,
                             n_segs, nits, walk, n_walked, a, num, stepper,
                             substeps, interpret, priors)
    padded_R = n_segs * L_SEG
    lo, hi = burnin, nits - 1

    def local_run(seed_arr, off_arr, theta_tiles):
        outs = inner(seed_arr, off_arr, theta_tiles)
        th_r, chi_r, rsq_r, aic_r, ar_r = [
            o.reshape(padded_R, -1, W_local) for o in outs]
        theta_s = jnp.transpose(th_r, (2, 0, 1))[:, lo:hi]
        sq = lambda x: jnp.transpose(x[:, 0, :], (1, 0))[:, lo:hi]
        return theta_s, sq(chi_r), sq(rsq_r), sq(aic_r), sq(ar_r)

    if mesh is None:
        def run(seed_arr, theta_tiles):
            outs = local_run(seed_arr, jnp.zeros((1,), jnp.int32),
                             theta_tiles)
            return tuple(o[:W0] for o in outs)
    else:
        from jax.sharding import PartitionSpec as PS
        axis = mesh.axis_names[0]
        tiles_local = W_local // tile

        def shard_body(seed_arr, theta_tiles):
            off = (jax.lax.axis_index(axis) * tiles_local)[None].astype(
                jnp.int32)
            return local_run(seed_arr, off, theta_tiles)

        smap = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(PS(), PS(None, axis, None)),
            out_specs=tuple([PS(axis)] * 5), check_vma=False)

        def run(seed_arr, theta_tiles):
            return tuple(o[:W0] for o in smap(seed_arr, theta_tiles))

    return jax.jit(run)


@lru_cache(maxsize=128)
def _cached_ens_run_chunk(spec, plan, y0_key, P, tile, W, L_SEG, n_segs,
                          nits, walk, n_walked, a, num, stepper, substeps,
                          interpret, W0, mesh, priors, R_chunk, resume):
    """Jitted program for ONE ensemble checkpoint chunk (mirror of
    :func:`_cached_mh_run_chunk`)."""
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    W_local = W // n_dev
    inner = _cached_ens_grid(spec, plan, y0_key, P, tile, W_local, L_SEG,
                             n_segs, nits, walk, n_walked, a, num, stepper,
                             substeps, interpret, priors,
                             R_chunk=R_chunk, resume=resume)
    padded_R = n_segs * L_SEG

    def local_run(seed_arr, off_arr, itb_arr, theta_tiles, state_in):
        ins = (seed_arr, off_arr, itb_arr)
        if resume:
            ins = ins + (state_in,)
        *recs, state = inner(*ins, theta_tiles)
        th_r, chi_r, rsq_r, aic_r, ar_r = [
            o.reshape(padded_R, -1, W_local) for o in recs]
        theta_s = jnp.transpose(th_r, (2, 0, 1))[:, :R_chunk]
        sq = lambda x: jnp.transpose(x[:, 0, :], (1, 0))[:, :R_chunk]
        return theta_s, sq(chi_r), sq(rsq_r), sq(aic_r), sq(ar_r), state

    if mesh is None:
        def run(seed_arr, itb_arr, theta_tiles, state_in=None):
            outs = local_run(seed_arr, jnp.zeros((1,), jnp.int32), itb_arr,
                             theta_tiles, state_in)
            return tuple(o[:W0] for o in outs[:5]) + (outs[5],)
    else:
        from jax.sharding import PartitionSpec as PS
        axis = mesh.axis_names[0]
        tiles_local = W_local // tile
        state_spec = PS(None, axis, None)

        def shard_body(seed_arr, itb_arr, theta_tiles, state_in):
            off = (jax.lax.axis_index(axis) * tiles_local)[None].astype(
                jnp.int32)
            return local_run(seed_arr, off, itb_arr, theta_tiles, state_in)

        in_specs = (PS(), PS(), PS(None, axis, None),
                    state_spec if resume else PS())
        smap = jax.shard_map(
            shard_body, mesh=mesh, in_specs=in_specs,
            out_specs=tuple([PS(axis)] * 5) + (state_spec,),
            check_vma=False)

        def run(seed_arr, itb_arr, theta_tiles, state_in=None):
            if state_in is None:
                state_in = jnp.zeros((0,), jnp.float32)
            outs = smap(seed_arr, itb_arr, theta_tiles, state_in)
            return tuple(o[:W0] for o in outs[:5]) + (outs[5],)

    return jax.jit(run)


def _ens_fused_chunked(spec, plan, y0_key, P, tile, W, nits, burnin, walk,
                       n_walked, a, num, stepper, substeps, interpret, W0,
                       mesh, priors, theta_tiles, seed, checkpoint_every,
                       checkpoint_path, resume_from,
                       _stop_after_chunks=None, config_token=""):
    """Checkpointed fused ensemble run (mirror of
    :func:`_mh_fused_chunked`): counter-based RNG on the global iteration
    + f32-exact state round-trip make a chunked/killed/resumed run
    bitwise identical to the single dispatch."""
    R = nits - 1
    E = int(checkpoint_every)
    if E < 1:
        raise ValueError("checkpoint_every must be >= 1")
    n_chunks = -(-R // E)
    sig = repr(("ens", spec.pnames, P, tile, W, nits, E, walk, n_walked,
                a, num, stepper, substeps, W0, int(seed), priors,
                None if mesh is None else int(mesh.devices.size),
                str(config_token)))
    seed_arr = jnp.asarray([seed], jnp.int32)

    k0, state, recs = 0, None, []
    if resume_from:
        with np.load(resume_from, allow_pickle=False) as z:
            saved_sig = bytes(z["sig"]).decode()
            if saved_sig != sig:
                raise ValueError(
                    "checkpoint was written by a different ensemble "
                    f"configuration:\n  saved: {saved_sig}\n  this:  {sig}")
            k0 = int(z["next_chunk"])
            state = z["state"]
            if k0 > 0:
                recs = [tuple(z[f"rec{i}"] for i in range(5))]

    for k in range(k0, n_chunks):
        R_chunk = min(E, R - k * E)
        L_SEG = max(1, min(64, R_chunk,
                           (2 * 1024 * 1024) // ((P + 4) * tile * 4)))
        n_segs = -(-R_chunk // L_SEG)
        run = _cached_ens_run_chunk(spec, plan, y0_key, P, tile, W, L_SEG,
                                    n_segs, nits, walk, n_walked, a, num,
                                    stepper, substeps, interpret, W0, mesh,
                                    priors, R_chunk, resume=(k > 0))
        itb = jnp.asarray([k * E], jnp.int32)
        if k == 0:
            outs = run(seed_arr, itb, theta_tiles)
        else:
            outs = run(seed_arr, itb, theta_tiles, jnp.asarray(state))
        rec = tuple(np.asarray(o) for o in outs[:5])
        state = np.asarray(outs[5])
        recs.append(rec)
        if checkpoint_path:
            merged = tuple(np.concatenate([r[i] for r in recs], axis=1)
                           for i in range(5))
            recs = [merged]
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez_compressed(
                    f, sig=np.frombuffer(sig.encode(), np.uint8),
                    next_chunk=np.asarray(k + 1), state=state,
                    **{f"rec{i}": merged[i] for i in range(5)})
            os.replace(tmp, checkpoint_path)
        if (_stop_after_chunks is not None
                and k + 1 - k0 >= _stop_after_chunks and k + 1 < n_chunks):
            return None

    th, chi, rsq, aic, ar = (np.concatenate([r[i] for r in recs], axis=1)
                             for i in range(5))
    from ..samplers.mh import MHOutput
    iterations = jnp.arange(1, nits)[burnin:]
    return MHOutput(theta=jnp.asarray(th[:, burnin:]),
                    chi=jnp.asarray(chi[:, burnin:]),
                    rsquared=jnp.asarray(rsq[:, burnin:]),
                    aic=jnp.asarray(aic[:, burnin:]),
                    acceptance_ratio=jnp.asarray(ar[:, burnin:]),
                    iteration=iterations)


@lru_cache(maxsize=64)
def _cached_ens_grid(spec, plan, y0_key, P, tile, W, L_SEG, n_segs, nits,
                     walk, n_walked, a, num, stepper, substeps, interpret,
                     priors=None, R_chunk=None, resume=False):
    """Build the whole-run ensemble pallas_call (once per static config).

    Grid/record/scratch structure matches :func:`_cached_mh_grid`; the
    chain-state scratch holds all walkers, and each iteration performs two
    sublane-half stretch updates with shared-offset partner rolls.

    ``R_chunk``/``resume``: checkpointed-chunk mode with the same bitwise
    guarantees as the MH kernel — both RNG streams (the per-lane draws
    and the scalar partner-offset stream) are counter-based on the GLOBAL
    iteration, and the chain state round-trips f32-exact."""
    stateful = R_chunk is not None
    sub = tile // _LANES
    half = sub // 2
    shape = (sub, _LANES)
    hshape = (half, _LANES)
    step_fn = _FIXED_STEPPERS[stepper]
    score = _make_scorer_from_key(spec, plan, y0_key, step_fn)
    lps = [None] * P if priors is None else [_kernel_logpdf(d)
                                             for d in priors]
    use_priors = any(f is not None for f in lps)

    def roll2(x, r_sub, r_lane):
        """Dynamic 2-D rotate of a (half, 128) tile. Lanes: Mosaic's
        native dynamic roll (jnp.roll would lower to dynamic_slice, which
        Mosaic lacks). Sublanes: dynamic rotate of an unaligned half tile
        is unsupported, so select among the `half` STATIC sublane rolls —
        a handful of cheap vector shuffles + selects."""
        if interpret:
            return jnp.roll(jnp.roll(x, r_sub, axis=0), r_lane, axis=1)
        out = x
        for k in range(1, half):
            out = jnp.where(r_sub == k, jnp.roll(x, k, axis=0), out)
        return pltpu.roll(out, r_lane, 1)

    def logprior(theta_list):
        tot = jnp.zeros_like(theta_list[0])
        for f, th in zip(lps, theta_list):
            if f is not None:
                tot = tot + f(th)
        return tot

    def kernel(*refs):
        if stateful and resume:
            (seed_ref, off_ref, itb_ref, state_in, theta_in, theta_out,
             chi_out, rsq_out, aic_out, ar_out, state_out,
             lt_s, chi_s, rsq_s, acc_s, lp_s) = refs
        elif stateful:
            (seed_ref, off_ref, itb_ref, theta_in, theta_out,
             chi_out, rsq_out, aic_out, ar_out, state_out,
             lt_s, chi_s, rsq_s, acc_s, lp_s) = refs
            state_in = None
        else:
            (seed_ref, off_ref, theta_in, theta_out,
             chi_out, rsq_out, aic_out, ar_out,
             lt_s, chi_s, rsq_s, acc_s, lp_s) = refs
            itb_ref = state_in = state_out = None
        rng = _Rng(shape, seed_ref[0], pl.program_id(0) + off_ref[0], tile)
        # independent scalar stream for the shared partner offsets
        seed_u = seed_ref[0].astype(jnp.uint32)
        pid_u = (pl.program_id(0) + off_ref[0]).astype(jnp.uint32)
        scal_base = _mix(seed_u * jnp.uint32(0x7FEB352D)
                         + pid_u * jnp.uint32(tile) + jnp.uint32(0xE75))
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            if stateful and resume:
                for p in range(P):
                    lt_s[p] = state_in[p]
                chi_s[...] = state_in[P]
                rsq_s[...] = state_in[P + 1]
                acc_s[...] = state_in[P + 2]
                lp_s[...] = state_in[P + 3]
                return
            theta = [theta_in[p] for p in range(P)]
            chi0, rsq0 = score(theta, shape)
            for p in range(P):
                lt_s[p] = jnp.log(theta[p])
            chi_s[...] = chi0
            rsq_s[...] = rsq0
            acc_s[...] = jnp.zeros(shape, jnp.float32)
            lp_s[...] = (logprior(theta) if use_priors
                         else jnp.zeros(shape, jnp.float32))

        it0 = 1 + j * L_SEG
        if stateful:
            it0 = it0 + itb_ref[0]

        def half_update(it, lo, carry):
            """Stretch-update sublane rows [lo, lo+half) against the
            complementary rows, all (half, 128) jnp values."""
            logtheta, chi, rsq, acc, lp, active = carry
            comp_lo = half - lo          # 0 <-> half
            cur = [lt[lo:lo + half] for lt in logtheta]
            comp = [lt[comp_lo:comp_lo + half] for lt in logtheta]
            # shared partner offset (scalar core): any fixed assignment is
            # valid — roll B by (r_sub, r_lane)
            sbits = _mix(scal_base ^ _mix(
                it.astype(jnp.uint32) * jnp.uint32(2) + jnp.uint32(lo != 0)))
            r_sub = (sbits % jnp.uint32(max(half, 1))).astype(jnp.int32)
            r_lane = ((sbits >> jnp.uint32(8))
                      % jnp.uint32(_LANES)).astype(jnp.int32)
            partner = [roll2(c, r_sub, r_lane) for c in comp]
            # z ~ g(z) on [1/a, a] via inverse CDF, one draw per walker;
            # rng yields full (sub,128) tiles — use the top half rows
            u = rng.uniform(it)[lo:lo + half]
            z = ((1.0 + (a - 1.0) * u) ** 2) / a
            prop = [c + (1.0 - z) * (pt - c) * walk[p] if walk[p] != 0.0
                    else c
                    for p, (c, pt) in enumerate(zip(cur, partner))]
            theta_p = [jnp.exp(v) for v in prop]
            chi_new, rsq_new = score(theta_p, hshape)
            log_ratio = ((n_walked - 1) * jnp.log(z)
                         + chi[lo:lo + half] - chi_new)
            if use_priors:
                lp_new = logprior(theta_p)
                log_ratio = log_ratio + (lp_new - lp[lo:lo + half])
            uacc = rng.uniform(it)[lo:lo + half]
            accept = (jnp.exp(log_ratio) > uacc) & active

            def merge(full, new, old):
                upd = jnp.where(accept, new, old)
                return jnp.concatenate(
                    [upd, full[half:]] if lo == 0 else [full[:half], upd],
                    axis=0)

            logtheta = [merge(lt, pn, c)
                        for lt, pn, c in zip(logtheta, prop, cur)]
            chi = merge(chi, chi_new, chi[lo:lo + half])
            rsq = merge(rsq, rsq_new, rsq[lo:lo + half])
            if use_priors:
                lp = merge(lp, lp_new, lp[lo:lo + half])
            acc = merge(acc, acc[lo:lo + half] + accept.astype(jnp.float32),
                        acc[lo:lo + half])
            return logtheta, chi, rsq, acc, lp, active

        def body(i, carry):
            logtheta, chi, rsq, acc_count, lp = carry
            it = it0 + i
            active = jnp.full(hshape, True) & (it < nits)
            if stateful:
                # rows past this CHUNK belong to the next chunk
                active = active & (j * L_SEG + i < R_chunk)
            c = (logtheta, chi, rsq, acc_count, lp, active)
            c = half_update(it, 0, c)
            c = half_update(it, half, c)
            logtheta, chi, rsq, acc_count, lp, _ = c
            for p in range(P):
                theta_out[i, p] = jnp.exp(logtheta[p])
            chi_out[i, 0] = chi
            rsq_out[i, 0] = rsq
            aic_out[i, 0] = 2.0 * chi + 2.0 * num
            ar_out[i, 0] = acc_count / it.astype(jnp.float32)
            return logtheta, chi, rsq, acc_count, lp

        carry0 = ([lt_s[p] for p in range(P)], chi_s[...], rsq_s[...],
                  acc_s[...], lp_s[...])
        logtheta, chi, rsq, acc_count, lp = jax.lax.fori_loop(
            0, L_SEG, body, carry0)
        for p in range(P):
            lt_s[p] = logtheta[p]
        chi_s[...] = chi
        rsq_s[...] = rsq
        acc_s[...] = acc_count
        lp_s[...] = lp
        if stateful:
            for p in range(P):
                state_out[p] = logtheta[p]
            state_out[P] = chi
            state_out[P + 1] = rsq
            state_out[P + 2] = acc_count
            state_out[P + 3] = lp

    n_rows = W // _LANES

    def spec_in(k):
        return pl.BlockSpec((k, sub, _LANES), lambda i, j: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def spec_rec(k):
        return pl.BlockSpec((L_SEG, k, sub, _LANES),
                            lambda i, j: (j, 0, i, 0),
                            memory_space=pltpu.VMEM)

    padded_R = n_segs * L_SEG
    out_shapes = \
        [jax.ShapeDtypeStruct((padded_R, P, n_rows, _LANES), jnp.float32)] + \
        [jax.ShapeDtypeStruct((padded_R, 1, n_rows, _LANES), jnp.float32)] * 4
    out_specs = [spec_rec(P)] + [spec_rec(1)] * 4

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),          # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),          # tile offset
    ]
    if stateful:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # it_base
        if resume:
            in_specs.append(spec_in(P + 4))             # incoming state
        out_shapes = out_shapes + [
            jax.ShapeDtypeStruct((P + 4, n_rows, _LANES), jnp.float32)]
        out_specs = out_specs + [spec_in(P + 4)]
    in_specs.append(spec_in(P))                          # theta0

    return pl.pallas_call(
        kernel,
        grid=(W // tile, n_segs),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((P, sub, _LANES), jnp.float32),
            pltpu.VMEM(shape, jnp.float32),
            pltpu.VMEM(shape, jnp.float32),
            pltpu.VMEM(shape, jnp.float32),
            pltpu.VMEM(shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.ARBITRARY, pltpu.ARBITRARY)),
        interpret=interpret,
    )


def survey_fused(spec: ModelSpec, obs: ObsData, times, y0_base, thetas, *,
                 substeps: int = 4, stepper: str = "dopri5",
                 tile_chains: Optional[int] = None, interpret: bool = False):
    """Batched chi evaluation in one kernel (fused fit_survey) — also the
    parity oracle for the MH kernel's in-loop scorer. ``thetas`` is
    (N, spec.theta_size) flat slots (array parameters raveled)."""
    P = spec.theta_size
    thetas = np.asarray(thetas, np.float32)
    N0 = thetas.shape[0]
    if tile_chains is None:
        tile_chains = pick_tile_chains(N0)
    tile = int(tile_chains)
    N = int(-(-N0 // tile) * tile)
    if N > N0:
        thetas = np.concatenate(
            [thetas, np.tile(thetas[-1:], (N - N0, 1))], axis=0)
    substeps = _normalize_substeps(substeps,
                                   len(np.asarray(times)) - 1)
    plan = _build_plan(spec, obs, times, substeps)
    y0_key = tuple(float(v) for v in np.asarray(y0_base))
    fn = _cached_survey_call(spec, plan, y0_key, P, tile, N, stepper,
                             substeps, bool(interpret))
    return fn(jnp.asarray(thetas.T))[0, :N0]


@lru_cache(maxsize=64)
def _cached_survey_call(spec, plan, y0_key, P, tile, N, stepper, substeps,
                        interpret):
    sub = tile // _LANES
    shape = (sub, _LANES)
    step_fn = _FIXED_STEPPERS[stepper]
    score = _make_scorer_from_key(spec, plan, y0_key, step_fn)

    def kernel(theta_in, chi_out):
        theta = [theta_in[p].reshape(shape) for p in range(P)]
        chi, _ = score(theta, shape)
        chi_out[0] = chi.reshape(tile)

    return pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((P, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        interpret=interpret,
    )
