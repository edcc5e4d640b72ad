"""Functional model core: static ODE spec + device-resident observation data.

The reference keeps everything in a mutable ``ModelFramework`` object
(``/root/reference/ODElib/Framework.py:166-263``). The TPU-native design
splits that into:

* :class:`ModelSpec` — a *static*, hashable description of the problem (RHS
  function, parameter/state names and shapes, state-summation indices as in
  ``Framework.py:332-381``, init-override wiring for the ``<sname>0``
  convention of ``Samplers.py:111-114``). It is captured by closure in jitted
  programs and never crosses the device boundary.
* :class:`ObsData` — a pytree of flat device arrays: per-observation
  log-abundance, log-sigma, grid-time index and state index (the TPU analog
  of the dict caches built by ``Framework.py:309-329``), so the chi-square of
  a trajectory is one gather + one fused reduction.

Everything here is pure and vmap/shard_map-safe.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import stats as jstats
from .ops import odeint_fixed, odeint_grid


class ObsData(NamedTuple):
    """Flat per-observation arrays (states concatenated, like the reference's
    ``get_chi`` concatenation at ``Framework.py:694-696``)."""
    log_abundance: Any   # (N,)
    log_sigma: Any       # (N,)
    abundance: Any       # (N,) linear-space observations (for R^2)
    t_index: Any         # (N,) int32 index into the integration grid
    state_index: Any     # (N,) int32 index into post-summation states
    sstot: Any           # scalar: sum_s n_s * var(O_s) (R^2 denominator;
    #                      censored points excluded)
    censor: Any = None   # (N,) int32 censoring flag (0 exact, 1 left/LOD,
    #                      2 right) or None when nothing is censored
    #                      (stats.obs_negloglik Tobit scoring)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static problem description.

    ``rhs`` has TPU-native signature ``f(t, y, ps)`` where ``ps`` is the
    list of parameter values in ``pnames`` order (scalars, or arrays for
    array-valued parameters). Use :func:`odelib_tpu.api.jaxify_rhs` to adapt
    reference-style ``f(y, t, ps)`` numpy functions.
    """
    rhs: Callable
    pnames: Tuple[str, ...]
    snames: Tuple[str, ...]
    pshapes: Tuple[Tuple[int, ...], ...] = None  # () == scalar
    # state summations (Framework.py:332-381): matrix (S_raw, S_post) of 0/1
    sum_matrix: Optional[tuple] = None           # tuple-of-tuples, hashable
    post_snames: Tuple[str, ...] = None
    # per raw state: flat index into theta of the '<sname>0' parameter, or -1
    init_pidx: Tuple[int, ...] = None
    # observation model: how trajectories are scored against the data
    # (stats.obs_negloglik). 'lognormal' is the reference's only model;
    # 'student_t' (obs_param = dof), 'poisson', 'negbinom' (obs_param =
    # dispersion r) extend it. Static + hashable, so every jitted sampler
    # and both Pallas kernels specialize on it at compile time.
    obs_model: str = "lognormal"
    obs_param: float = 0.0
    # bolus dose events: ((time, raw_state_index, amount), ...) sorted by
    # time. Each amount is added to its raw state when integration leaves
    # the nearest grid point to `time`; reported trajectories are pre-dose
    # left limits (troughs). Static + hashable: every integrator and both
    # Pallas kernels bake the impulses in at compile time.
    dose_events: Optional[Tuple[Tuple[float, int, float], ...]] = None
    # time-varying forcing signals (covariates): ((name, times, values,
    # mode), ...) with mode 'linear' (piecewise-linear interpolation),
    # 'hold' (zero-order hold / previous value) or 'cubic'
    # (shape-preserving PCHIP spline). When present, the USER
    # RHS takes a 4th argument — a dict name -> signal value at the query
    # time — and make_spec wraps it back to the internal 3-arg form via
    # eval_forcings. Static + hashable: on traced time the XLA paths emit
    # one interp/searchsorted; in the fused Pallas kernels every step time
    # is a Python float, so the lookup CONSTANT-FOLDS at trace time and
    # forcings cost the kernel nothing.
    forcings: Optional[Tuple[Tuple[str, tuple, tuple, str], ...]] = None
    # diagonal process-noise intensities ``g(t, y, ps) -> (S_raw,)`` (same
    # signature family as rhs, forcings-wrapped the same way). When set the
    # model is a stochastic differential equation: simulate with
    # sdeint_theta, fit with MCMC(sampler='pmmh') (samplers/pf.py). None =
    # deterministic ODE (the reference's only case).
    diffusion: Optional[Callable] = None

    def __post_init__(self):
        if self.pshapes is None:
            object.__setattr__(self, "pshapes", tuple(() for _ in self.pnames))
        if self.post_snames is None:
            object.__setattr__(self, "post_snames", tuple(self.snames))
        if self.init_pidx is None:
            offs = self.theta_offsets
            idx = []
            for s in self.snames:
                name = s + "0"
                idx.append(offs[self.pnames.index(name)]
                           if name in self.pnames else -1)
            object.__setattr__(self, "init_pidx", tuple(idx))

    # ---- theta (flat parameter vector) layout ---------------------------
    @property
    def theta_offsets(self) -> Tuple[int, ...]:
        offs, o = [], 0
        for shp in self.pshapes:
            offs.append(o)
            o += int(np.prod(shp)) if shp else 1
        return tuple(offs)

    @property
    def theta_size(self) -> int:
        return sum(int(np.prod(s)) if s else 1 for s in self.pshapes)

    def pack_theta(self, values: Sequence) -> jnp.ndarray:
        """Flatten per-parameter values (pnames order) into a theta vector."""
        parts = []
        for v, shp in zip(values, self.pshapes):
            parts.append(jnp.ravel(jnp.asarray(v, jnp.result_type(float))))
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    def unpack_theta(self, theta):
        """Split a flat theta into the per-parameter list the RHS receives."""
        ps = []
        for off, shp in zip(self.theta_offsets, self.pshapes):
            if shp:
                n = int(np.prod(shp))
                ps.append(jnp.reshape(theta[off:off + n], shp))
            else:
                ps.append(theta[off])
        return ps

    # ---- summations -----------------------------------------------------
    def apply_summations(self, ys):
        """(..., S_raw) -> (..., S_post); one tiny matmul (MXU-friendly when
        batched) replacing the reference's in-place column sums
        (Framework.py:659-664)."""
        if self.sum_matrix is None:
            return ys
        m = jnp.asarray(self.sum_matrix, ys.dtype)
        return ys @ m

    # ---- initial-state override (the '<sname>0' parameter convention) ---
    def override_inits(self, y0, theta):
        if all(i < 0 for i in self.init_pidx):
            return y0
        idx = jnp.asarray(self.init_pidx)
        gathered = theta[jnp.clip(idx, 0, None)]
        return jnp.where(idx >= 0, gathered, y0)


OBS_MODELS = ("lognormal", "student_t", "poisson", "negbinom")

FORCING_MODES = ("linear", "hold", "cubic")


@functools.lru_cache(maxsize=256)
def _pchip_slopes(ft: tuple, fv: tuple) -> np.ndarray:
    """Knot derivatives for shape-preserving (PCHIP / Fritsch-Carlson)
    cubic interpolation of a forcing table. Monotone data never
    overshoots between knots — the property that matters for physical
    covariates (temperatures, light, flow rates), where a natural cubic
    spline's ringing can push e.g. an irradiance signal negative.

    Cached per table (the spec stores tables as hashable tuples), so the
    host-side constant-folding path in :func:`eval_forcings` computes
    slopes once per table, not once per RHS call."""
    t = np.asarray(ft, np.float64)
    v = np.asarray(fv, np.float64)
    n = t.size
    if n == 1:
        return np.zeros(1)
    h = np.diff(t)
    delta = np.diff(v) / h
    if n == 2:
        return np.array([delta[0], delta[0]])
    d = np.zeros(n)
    # interior: weighted harmonic mean where the secants agree in sign
    d0, d1 = delta[:-1], delta[1:]
    h0, h1 = h[:-1], h[1:]
    w1 = 2.0 * h1 + h0
    w2 = h1 + 2.0 * h0
    with np.errstate(divide="ignore", invalid="ignore"):
        hm = (w1 + w2) / (w1 / d0 + w2 / d1)
    d[1:-1] = np.where((d0 * d1) > 0.0, hm, 0.0)

    def edge(h_a, h_b, del_a, del_b):
        # one-sided three-point estimate, clamped for shape preservation
        s = ((2.0 * h_a + h_b) * del_a - h_a * del_b) / (h_a + h_b)
        if np.sign(s) != np.sign(del_a):
            return 0.0
        if np.sign(del_a) != np.sign(del_b) and abs(s) > 3.0 * abs(del_a):
            return 3.0 * del_a
        return s

    d[0] = edge(h[0], h[1], delta[0], delta[1])
    d[-1] = edge(h[-1], h[-2], delta[-1], delta[-2])
    return d


def _hermite_eval(tq, ft, fv, d, xp):
    """Evaluate the cubic Hermite interpolant (knots ft/fv, slopes d) at
    tq, clamped to the table's span (outside queries hold the endpoint
    values, matching the 'linear'/'hold' out-of-range convention).
    ``xp`` is numpy (host constant-folding) or jnp (traced)."""
    tq = xp.clip(tq, ft[0], ft[-1])
    i = xp.clip(xp.searchsorted(ft, tq, side="right") - 1, 0, len(ft) - 2)
    t0, t1 = ft[i], ft[i + 1]
    hseg = t1 - t0
    s = tq - t0
    dl = (fv[i + 1] - fv[i]) / hseg
    c2 = (3.0 * dl - 2.0 * d[i] - d[i + 1]) / hseg
    c3 = (d[i] + d[i + 1] - 2.0 * dl) / (hseg * hseg)
    return fv[i] + s * (d[i] + s * (c2 + s * c3))


def normalize_forcings(forcings):
    """Normalize a user forcings mapping into the spec's static tuple form.

    Accepts ``{name: (times, values)}``, ``{name: (times, values, mode)}``
    or ``{name: {'t': ..., 'v': ..., 'mode': ...}}`` (and the
    already-normalized tuple, passed through). Times must be strictly
    increasing and match values in length; queries outside the table clamp
    to the endpoint values. Modes: ``'linear'`` interpolation (default),
    ``'hold'`` (piecewise-constant, left-continuous — step protocols like
    dilutions or light on/off), ``'cubic'`` (shape-preserving PCHIP — smooth
    covariates like temperature, C1-continuous so adaptive steppers don't
    stall on slope kinks at the knots; :func:`_pchip_slopes`)."""
    if not forcings:
        return None
    if isinstance(forcings, tuple) and forcings and \
            isinstance(forcings[0], tuple) and len(forcings[0]) == 4:
        return forcings  # already normalized (spec rebuilds)
    out = []
    for name, table in dict(forcings).items():
        if isinstance(table, dict):
            ft, fv = table["t"], table["v"]
            mode = table.get("mode", "linear")
        else:
            if len(table) == 3:
                ft, fv, mode = table
            else:
                ft, fv = table
                mode = "linear"
        if mode not in FORCING_MODES:
            raise ValueError(f"forcing {name!r}: mode must be one of "
                             f"{FORCING_MODES}, got {mode!r}")
        ft = np.asarray(ft, np.float64).ravel()
        fv = np.asarray(fv, np.float64).ravel()
        if ft.size == 0 or ft.size != fv.size:
            raise ValueError(
                f"forcing {name!r}: times and values must be equal-length "
                f"and non-empty (got {ft.size} times, {fv.size} values)")
        if not np.all(np.isfinite(ft)) or not np.all(np.isfinite(fv)):
            raise ValueError(f"forcing {name!r}: times/values must be finite")
        if ft.size > 1 and not np.all(np.diff(ft) > 0):
            raise ValueError(
                f"forcing {name!r}: times must be strictly increasing")
        out.append((str(name), tuple(float(t) for t in ft),
                    tuple(float(v) for v in fv), str(mode)))
    return tuple(out)


def eval_forcings(forcings, t):
    """Evaluate every forcing signal at time ``t`` -> ``{name: value}``.

    Concrete ``t`` (a Python/numpy float — the fused Pallas kernels' static
    step times) folds to plain float constants at trace time; traced ``t``
    (the XLA integrators inside scan/while_loop) emits ``jnp.interp`` /
    ``searchsorted`` gathers on the static tables."""
    import jax as _jax
    out = {}
    concrete = not isinstance(t, _jax.core.Tracer)
    for name, ft, fv, mode in forcings:
        if concrete:
            tc = float(t)
            if mode == "hold":
                i = int(np.clip(np.searchsorted(ft, tc, side="right") - 1,
                                0, len(fv) - 1))
                out[name] = float(fv[i])
            elif mode == "cubic" and len(ft) > 1:
                out[name] = float(_hermite_eval(
                    tc, np.asarray(ft), np.asarray(fv),
                    _pchip_slopes(ft, fv), np))
            else:
                out[name] = float(np.interp(tc, ft, fv))
        else:
            # tables adopt t's dtype so a float32 integration never gets a
            # float64 forcing value promoted into its scan carry
            dt = jnp.result_type(t)
            fvj = jnp.asarray(fv, dt)
            if mode == "hold":
                i = jnp.clip(jnp.searchsorted(jnp.asarray(ft, dt), t,
                                              side="right") - 1,
                             0, len(fv) - 1)
                out[name] = fvj[i]
            elif mode == "cubic" and len(ft) > 1:
                # slopes are host-precomputed constants baked into the trace
                out[name] = _hermite_eval(
                    t, jnp.asarray(ft, dt), fvj,
                    jnp.asarray(_pchip_slopes(ft, fv), dt), jnp)
            else:
                out[name] = jnp.interp(t, jnp.asarray(ft, dt), fvj)
    return out


def make_spec(rhs, pnames, snames, state_summations=None,
              pshapes=None, obs_model="lognormal",
              obs_param=None, dose_events=None, forcings=None,
              diffusion=None) -> ModelSpec:
    """Build a ModelSpec, validating summations exactly like
    ``Framework.py:349-364`` (duplicate state / unknown state errors).

    ``obs_model`` selects the likelihood the data is scored with
    (:func:`odelib_tpu.stats.obs_negloglik`); ``obs_param`` is its shape
    parameter — Student-t degrees of freedom (default 4.0) or negative-
    binomial dispersion ``r`` (required, > 0).

    ``dose_events``: sequence of ``(time, state_name_or_index, amount)``
    bolus impulses (e.g. repeated drug doses); see
    :attr:`ModelSpec.dose_events` for the timing convention.

    ``forcings``: mapping of time-varying covariate signals,
    ``{name: (times, values[, mode])}`` with mode ``'linear'`` (default),
    ``'hold'`` or ``'cubic'`` — when given, ``rhs`` must accept a 4th
    argument, the dict of signal values at the query time
    (:func:`eval_forcings`; :attr:`ModelSpec.forcings` for the cost model).

    ``diffusion``: optional diagonal process-noise function
    ``g(t, y, ps) -> (S_raw,)`` making the model an SDE
    (:attr:`ModelSpec.diffusion`; same forcings convention as ``rhs``)."""
    if obs_model not in OBS_MODELS:
        raise ValueError(f"obs_model must be one of {OBS_MODELS}, "
                         f"got {obs_model!r}")
    if obs_model == "student_t":
        obs_param = 4.0 if obs_param is None else float(obs_param)
        if obs_param <= 0:
            raise ValueError("student_t obs_param (degrees of freedom) "
                             "must be > 0")
    elif obs_model == "negbinom":
        if obs_param is None or float(obs_param) <= 0:
            raise ValueError("negbinom requires obs_param = dispersion r "
                             "> 0 (variance = mean + mean^2/r)")
        obs_param = float(obs_param)
    else:
        obs_param = 0.0
    pnames = tuple(pnames)
    snames = tuple(snames)
    forcings = normalize_forcings(forcings)
    if forcings and not getattr(rhs, "_odelib_forcings_applied", False):
        # Close the 4-arg user RHS over the static tables so every internal
        # consumer (integrators, samplers, both Pallas kernels, jacfwd in
        # the stiff steppers, HMC grads) keeps calling the 3-arg form.
        base_rhs = rhs

        def rhs(t, y, ps, _f=base_rhs, _u=forcings):
            return _f(t, y, ps, eval_forcings(_u, t))

        rhs._odelib_forcings_applied = True
    if forcings and diffusion is not None and not getattr(
            diffusion, "_odelib_forcings_applied", False):
        # unlike rhs (which MUST take the forcing dict when forcings are
        # present), a noise-intensity function often doesn't care about the
        # covariates — wrap only a 4-arg diffusion
        import inspect
        try:
            takes_u = len(inspect.signature(diffusion).parameters) >= 4
        except (TypeError, ValueError):
            takes_u = False
        if takes_u:
            base_g = diffusion

            def diffusion(t, y, ps, _g=base_g, _u=forcings):
                return _g(t, y, ps, eval_forcings(_u, t))

            diffusion._odelib_forcings_applied = True
    if dose_events:
        evs = []
        for t, s, amt in dose_events:
            if isinstance(s, str):
                if s not in snames:
                    raise ValueError(f"dose_events state {s!r} is not a "
                                     f"valid state name {snames}")
                s = snames.index(s)
            s = int(s)
            if not 0 <= s < len(snames):
                raise ValueError(f"dose_events state index {s} out of "
                                 f"range for {len(snames)} states")
            evs.append((float(t), s, float(amt)))
        dose_events = tuple(sorted(evs))
    else:
        dose_events = None
    sum_matrix = None
    post_snames = tuple(snames)
    if state_summations:
        sname_i = {s: i for i, s in enumerate(snames)}
        summed = set()
        groups = {}  # first-index -> (new_name, sorted indices)
        for newname, members in state_summations.items():
            idxs = []
            for pop in members:
                if pop in summed:
                    raise ValueError(
                        f"{pop} state variable cannot be used in two summations")
                if pop not in sname_i:
                    raise ValueError(
                        f"{pop} state variable is not a valid state name")
                summed.add(pop)
                idxs.append(sname_i[pop])
            if len(idxs) < 2:
                raise ValueError(
                    f"Summation of {newname} needs two or more states")
            idxs.sort()
            groups[idxs[0]] = (newname, tuple(idxs))
        post, cols = [], []
        for i, s in enumerate(snames):
            if i in groups:
                post.append(groups[i][0])
                cols.append(groups[i][1])
            elif s not in summed:
                post.append(s)
                cols.append((i,))
        m = np.zeros((len(snames), len(post)))
        for j, idxs in enumerate(cols):
            for i in idxs:
                m[i, j] = 1.0
        sum_matrix = tuple(tuple(row) for row in m)
        post_snames = tuple(post)
    return ModelSpec(rhs=rhs, pnames=pnames, snames=snames,
                     pshapes=pshapes, sum_matrix=sum_matrix,
                     post_snames=post_snames, obs_model=obs_model,
                     obs_param=obs_param, dose_events=dose_events,
                     forcings=forcings, diffusion=diffusion)


# ---------------------------------------------------------------------------
# Core compute functions (all pure; jit/vmap these)
# ---------------------------------------------------------------------------

def dose_matrix(spec: ModelSpec, times):
    """(T, S_raw) impulse matrix for the spec's dose events on this grid:
    each event snaps to the nearest grid point (the framework's standard
    observation-time rule) and its amount lands in ``D[grid_idx, state]``.
    None when the spec has no events. Traced-safe (argmin, scatter-add),
    so it can be built on whatever grid a jitted sampler carries."""
    if not spec.dose_events:
        return None
    times = jnp.asarray(times)
    D = jnp.zeros((times.shape[0], len(spec.snames)), times.dtype)
    for t, s, amt in spec.dose_events:
        gi = jnp.argmin(jnp.abs(times - t))
        D = D.at[gi, s].add(amt)
    return D


def integrate_theta(spec: ModelSpec, theta, y0, times, *, method="dopri5",
                    rtol=1e-6, atol=1e-4, max_steps=4096, substeps=4):
    """Solve the ODE for one flat parameter vector. Returns raw-state ys
    (T, S_raw) with NaN rows after a failure (never raises). Dose events
    on the spec are applied at their nearest grid points (pre-dose
    outputs; :func:`dose_matrix`)."""
    def f(t, y, th):
        return spec.rhs(t, y, spec.unpack_theta(th))

    dose = dose_matrix(spec, times)
    if method in ("rk4", "fixed_dopri5", "fixed_kvaerno3"):
        fixed = {"rk4": "rk4", "fixed_dopri5": "dopri5",
                 "fixed_kvaerno3": "kvaerno3"}[method]
        sol = odeint_fixed(f, y0, times, theta, substeps=substeps,
                           method=fixed, dose=dose)
    else:
        sol = odeint_grid(f, y0, times, theta, rtol=rtol, atol=atol,
                          max_steps=max_steps, method=method, dose=dose)
    return sol.ys


def sdeint_theta(spec: ModelSpec, theta, y0, times, key, *, substeps=4,
                 method="euler"):
    """Simulate one stochastic path of the spec's SDE for a flat parameter
    vector (requires ``spec.diffusion``). Returns raw-state ys (T, S_raw),
    NaN-tailed after a failure; dose events apply at their nearest grid
    points like :func:`integrate_theta`. vmap over ``key`` for independent
    paths, over ``(theta, key)`` for per-draw simulation."""
    if spec.diffusion is None:
        raise ValueError("spec has no diffusion function — pass "
                         "diffusion= to make_spec for SDE simulation")
    from .ops.sde import sdeint_fixed

    def f(t, y, th):
        return spec.rhs(t, y, spec.unpack_theta(th))

    def g(t, y, th):
        return spec.diffusion(t, y, spec.unpack_theta(th))

    dose = dose_matrix(spec, times)
    sol = sdeint_fixed(f, g, y0, times, key, theta, substeps=substeps,
                       method=method, dose=dose)
    return sol.ys


def observe(spec: ModelSpec, obs: ObsData, ys):
    """Gather model predictions at the observation points.

    Returns linear-space predictions (N,) after summation — the TPU analog of
    ``integrate(predict_obs=True, as_dataframe=False)``
    (``Framework.py:677-682``).
    """
    post = spec.apply_summations(ys)
    return post[obs.t_index, obs.state_index]


def score_pred(spec: ModelSpec, obs: ObsData, pred):
    """Generalized chi of linear-space predictions at the observation
    points — dispatches on the spec's observation model (lognormal =
    the reference's reduced chi-square; student_t / poisson / negbinom
    are the framework's extensions, :func:`odelib_tpu.stats.
    obs_negloglik`)."""
    return jstats.obs_negloglik(
        spec.obs_model, spec.obs_param, obs.log_abundance, jnp.log(pred),
        obs.log_sigma, obs.abundance, pred, censor=obs.censor)


def fit_metrics(spec: ModelSpec, obs: ObsData, ys, num_params):
    """chi, R^2, AIC of a trajectory against the observations — the fused
    equivalent of ``get_chi`` / ``get_Rsqrd`` / ``get_AIC``
    (``Framework.py:685-712``). ``chi`` generalizes to the spec's
    observation model (:func:`score_pred`)."""
    pred = observe(spec, obs, ys)
    chi = score_pred(spec, obs, pred)
    rsq = jstats.rsqrd_flat(pred, obs.abundance, obs.sstot,
                            mask=None if obs.censor is None
                            else obs.censor == 0)
    aic = jstats.AIC(chi, num_params)
    return chi, rsq, aic


def chi_of_theta(spec: ModelSpec, obs: ObsData, theta, y0, times, **ikw):
    """One LHS-survey evaluation: integrate + chi (``_Fit_worker``,
    ``Framework.py:41-48``). vmap over theta for the batched survey."""
    y0 = spec.override_inits(y0, theta)
    ys = integrate_theta(spec, theta, y0, times, **ikw)
    pred = observe(spec, obs, ys)
    return score_pred(spec, obs, pred)
