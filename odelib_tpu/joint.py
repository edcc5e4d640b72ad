"""User-facing joint multi-experiment fitting (see samplers/joint.py).

``JointFit`` ties named parameters across several ``ModelFramework``
instances (same or different models, each with its own data) and samples
the joint posterior with all experiments fused into one device program.
Three pooling modes per parameter: complete pooling (``shared`` — one
value for all experiments), no pooling (the default — independent
per-experiment values), and PARTIAL pooling (``hierarchical`` — each
experiment draws its own value from a lognormal population distribution
whose median and log-spread are themselves sampled). No reference
counterpart: ``ODElib`` binds one DataFrame per framework and its only
cross-dataset tool is averaging replicate columns
(``/root/reference/ODElib/Framework.py:287-298``).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from .samplers.joint import joint_metropolis_hastings, joint_survey
from .stats import rawstats

__all__ = ["JointFit"]


class JointFit:
    """Fit K experiments with tied parameters.

    Parameters
    ----------
    frameworks : dict name -> ModelFramework (or a list; names become
        ``exp0``, ``exp1``, ...). Each must carry its own data.
    shared : parameter names tied across ALL frameworks (each must exist
        in every framework). Remaining parameters are per-experiment.
    hierarchical : scalar parameter names PARTIALLY pooled across
        experiments: experiment ``nm`` keeps its own ``<nm>:<p>`` value,
        and the values are tied through a lognormal population law
        ``log theta_{nm,p} ~ Normal(log <p>:pop_median, <p>:pop_sigma)``
        whose two hyperparameters are sampled alongside everything else
        (columns ``<p>:pop_median``, ``<p>:pop_sigma``). The pooling
        density is exact over ``z = log theta`` (the space the chains
        walk), so small ``pop_sigma`` shrinks the per-experiment values
        toward the population median. Must not overlap ``shared``.
    hyperpriors : optional dict ``p -> (median_dist, sigma_dist)`` of
        hyperprior distributions for a hierarchical parameter's
        population median and log-spread (odelib_tpu ``Distribution``
        objects or scipy frozen distributions). Defaults: the FIRST
        framework's prior for ``p`` on the median, and a weakly
        informative ``LogNormal(s=1, scale=0.3)`` on the spread. The
        sigma hyperprior is always applied (it regularizes the
        ``pop_sigma -> 0`` funnel); ``use_priors`` toggles only the
        ordinary per-slot priors of non-pooled parameters (a pooled
        value's prior IS the population law; its individual prior still
        seeds the LHS survey).

    Joint layout: ``[shared..., <name>:<p> for each experiment's free
    parameters..., hyperparameters...]``; posterior columns use the same
    naming. Priors for shared parameters come from the FIRST framework.

    Stochastic experiments (``diffusion=``) are supported: any mix of
    deterministic and SDE experiments fits jointly through
    particle-marginal MH (:func:`~odelib_tpu.samplers.joint.joint_pmmh`)
    — deterministic experiments keep exact chi terms while stochastic
    ones contribute unbiased bootstrap-particle-filter estimates, so the
    chain targets the exact joint posterior. ``MCMC`` knobs
    ``n_particles`` / ``sde_substeps`` / ``sde_method`` /
    ``adapt_proposal`` mirror ``ModelFramework.MCMC(sampler='pmmh')``;
    gradient surfaces (``fit_map``/``fit_advi``) refuse stochastic
    experiments unless ``drift_only=True``.

    Array-valued parameters are supported throughout: each contributes
    one FLAT joint slot per entry (the joint theta mirrors
    ``ModelSpec.theta_offsets`` packing), posterior/survey columns hold
    the reshaped ndarray per row, zero-template entries never walk (the
    reference convention, ``Framework.py:107-122``), and shared array
    parameters must have the same shape in every experiment.
    """

    def __init__(self, frameworks, shared=(), hierarchical=(),
                 hyperpriors=None, random_seed=0):
        if not isinstance(frameworks, dict):
            frameworks = {f"exp{i}": f for i, f in enumerate(frameworks)}
        if len(frameworks) < 2:
            raise ValueError("JointFit needs at least two experiments")
        self.frameworks = dict(frameworks)
        self.shared = list(shared)
        self.hierarchical = list(hierarchical)
        self.random_seed = random_seed
        names = list(self.frameworks)
        # experiments with process noise (diffusion=) route MCMC through
        # the joint particle-marginal sampler (samplers/joint.joint_pmmh):
        # their chi terms become unbiased bootstrap-PF estimates while
        # deterministic experiments keep exact chi — the sum is a valid
        # pseudo-marginal target. Gradient/optimization surfaces
        # (fit_map/fit_advi) follow the single-framework policy: refuse
        # unless drift_only=True (then warn).
        self._stoch = {nm for nm, fw in self.frameworks.items()
                       if fw._spec.diffusion is not None}
        overlap = set(self.shared) & set(self.hierarchical)
        if overlap:
            raise ValueError(f"parameter(s) {sorted(overlap)} cannot be "
                             f"both shared and hierarchical")
        for nm, fw in self.frameworks.items():
            if fw.df is None:
                raise ValueError(f"experiment {nm!r} has no data")
            missing = [p for p in self.shared + self.hierarchical
                       if p not in fw._pnames]
            if missing:
                raise ValueError(f"experiment {nm!r} lacks tied "
                                 f"parameter(s) {missing}")
        first = next(iter(self.frameworks.values()))

        def pshape(fw, p):
            return fw._spec.pshapes[list(fw._pnames).index(p)]

        for p in self.shared:
            shp0 = pshape(first, p)
            for nm, fw in self.frameworks.items():
                if pshape(fw, p) != shp0:
                    raise ValueError(
                        f"shared parameter {p!r} has shape {shp0} in the "
                        f"first experiment but {pshape(fw, p)} in {nm!r}")

        # joint FLAT layout: one slot per scalar parameter / per array
        # entry. ``columns`` stays one label per PARAMETER (posterior
        # cells hold the reshaped ndarray for array parameters, matching
        # ModelFramework._posterior_to_df).
        self.columns = []        # per-parameter labels, layout order
        self._col_shapes = {}    # label -> () or array shape
        self._col_offsets = {}   # label -> first flat slot
        self._col_params = {}    # label -> (owning framework, pname)
        self.dim = 0             # total flat joint slots

        def add_column(lab, shp, fw, p):
            self.columns.append(lab)
            self._col_shapes[lab] = shp
            self._col_offsets[lab] = self.dim
            self._col_params[lab] = (fw, p)
            self.dim += int(np.prod(shp)) if shp else 1

        for p in self.shared:
            add_column(p, pshape(first, p), first, p)
        self._idx_maps = {}
        for nm in names:
            fw = self.frameworks[nm]
            idx = []
            for i, p in enumerate(fw._pnames):
                shp = fw._spec.pshapes[i]
                n = int(np.prod(shp)) if shp else 1
                if p in self.shared:
                    off = self._col_offsets[p]
                else:
                    lab = f"{nm}:{p}"
                    add_column(lab, shp, fw, p)
                    off = self._col_offsets[lab]
                idx.extend(range(off, off + n))
            self._idx_maps[nm] = tuple(idx)

        # partial pooling: two hyperparameter slots per hierarchical
        # parameter, appended after every experiment slot (they are not
        # in any _idx_maps entry, so they never reach an ODE solve)
        self._hyper_vals = {}      # hyper label -> current value
        self._hyper_priors = {}    # hyper label -> Distribution or None
        self._hyper_cols = {}      # p -> (median label, sigma label)
        from .distributions import LogNormal as _LN
        hyperpriors = dict(hyperpriors or {})
        unknown = set(hyperpriors) - set(self.hierarchical)
        if unknown:
            raise ValueError(f"hyperpriors given for non-hierarchical "
                             f"parameter(s) {sorted(unknown)}")
        for p in self.hierarchical:
            # every experiment's slot must be scalar, not just the
            # first's — a later array-valued slot would otherwise surface
            # as an opaque TypeError at the float() below
            for nm, fw in self.frameworks.items():
                if pshape(fw, p):
                    raise ValueError(
                        f"hierarchical parameter {p!r} must be scalar "
                        f"(shape {pshape(fw, p)} in experiment {nm!r}); "
                        f"array-valued parameters can be tied with "
                        f"shared= instead")
            lab_m, lab_t = f"{p}:pop_median", f"{p}:pop_sigma"
            add_column(lab_m, (), None, p)
            add_column(lab_t, (), None, p)
            self._hyper_cols[p] = (lab_m, lab_t)
            # init: geometric mean / log-spread of the current values
            vals = []
            for fw in self.frameworks.values():
                par = fw.parameters[p]
                if par is not None and np.all(np.asarray(par.val) > 0):
                    vals.append(float(np.asarray(par.val)))
            logs = np.log(vals) if vals else np.zeros(1)
            self._hyper_vals[lab_m] = float(np.exp(logs.mean()))
            self._hyper_vals[lab_t] = float(max(logs.std(), 0.1))
            m_d, t_d = hyperpriors.get(p, (None, None))
            if m_d is None:
                par = first.parameters[p]
                m_d = par.jdist if (par is not None
                                    and par.has_distribution()) else None
            if t_d is None:
                t_d = _LN(s=1.0, loc=0.0, scale=0.3)
            self._hyper_priors[lab_m] = self._as_jdist(m_d)
            self._hyper_priors[lab_t] = self._as_jdist(t_d)

    def _require_deterministic(self, what, drift_only):
        """Stochastic-feature-matrix guard (the single-framework policy,
        api_inference.py): a joint method whose math assumes
        deterministic likelihoods must refuse loudly when any experiment
        carries process noise, unless explicitly opted into the
        drift-only approximation (then warn)."""
        if not self._stoch:
            return
        import warnings
        if not drift_only:
            raise ValueError(
                f"{what} assumes deterministic likelihoods, but "
                f"experiment(s) {sorted(self._stoch)} carry process "
                "noise (diffusion=...): a single drift trajectory's fit "
                "statistic is not the SDE's marginal likelihood. Use "
                "MCMC() (joint particle-marginal MH), or pass "
                "drift_only=True to run on the drift skeletons (the "
                "diffusion terms are IGNORED).")
        warnings.warn(
            f"{what}: drift_only=True with stochastic experiment(s) "
            f"{sorted(self._stoch)} — diffusion terms are ignored; "
            "treat the result as an analysis of the deterministic "
            "skeletons, not of the SDEs.")

    @staticmethod
    def _as_jdist(d):
        """Accept odelib_tpu Distribution objects or scipy frozen/gen
        distributions for hyperpriors."""
        if d is None:
            return None
        from .distributions import from_scipy
        return from_scipy(d)

    def _template(self, lab):
        """Flat current-value template of an array column (None for
        scalars). Zero entries never walk and never draw in LHS —
        the reference convention (``Samplers.py:31-32``)."""
        shp = self._col_shapes[lab]
        if not shp:
            return None
        fw, p = self._col_params[lab]
        par = fw.parameters[p]
        return np.ravel(np.asarray(
            par.val if par is not None else np.zeros(shp), float))

    def _dists(self):
        """Prior distribution (or None) per joint FLAT slot. Array
        parameters repeat their prior per non-zero template entry."""
        out = [None] * self.dim
        for lab in self.columns:
            fw, p = self._col_params[lab]
            if fw is None:                       # hyperparameter slot
                out[self._col_offsets[lab]] = self._hyper_priors[lab]
                continue
            par = fw.parameters[p]
            d = par.jdist if (par is not None
                              and par.has_distribution()) else None
            off = self._col_offsets[lab]
            tmpl = self._template(lab)
            if tmpl is None:
                out[off] = d
            else:
                for i, v in enumerate(tmpl):
                    out[off + i] = d if v != 0 else None
        return out

    def _current_joint_theta(self):
        th = np.zeros(self.dim)
        for lab in self.columns:
            fw, p = self._col_params[lab]
            if fw is None:                       # hyperparameter slot
                th[self._col_offsets[lab]] = self._hyper_vals[lab]
                continue
            par = fw.parameters[p]
            if par is None:
                continue
            off = self._col_offsets[lab]
            v = np.ravel(np.asarray(par.val, float))
            th[off:off + v.size] = v
        return th

    def _df_from_thetas(self, thetas, base=None):
        """(N, dim) flat joint thetas -> DataFrame with one column per
        parameter label (array columns hold reshaped ndarrays)."""
        thetas = np.asarray(thetas, float)
        data = {} if base is None else dict(base)
        for lab in self.columns:
            off = self._col_offsets[lab]
            shp = self._col_shapes[lab]
            if shp:
                n = int(np.prod(shp))
                data[lab] = [thetas[r, off:off + n].reshape(shp)
                             for r in range(len(thetas))]
            else:
                data[lab] = thetas[:, off]
        return pd.DataFrame(data)

    def _thetas_from_df(self, df):
        """Inverse of :meth:`_df_from_thetas`; missing columns fill from
        current framework values."""
        th = np.tile(self._current_joint_theta(), (len(df), 1))
        for lab in self.columns:
            if lab not in df:
                continue
            off = self._col_offsets[lab]
            if self._col_shapes[lab]:
                vals = np.stack([np.ravel(np.asarray(v, float))
                                 for v in df[lab].to_numpy()])
            else:
                vals = np.asarray(df[lab], float)[:, None]
            th[:, off:off + vals.shape[1]] = vals
        return th

    def _device_args(self, solver_kw):
        dtype = jnp.result_type(float)
        specs, idxs, obs, times, y0s, subs = [], [], [], [], [], []
        method = None
        for nm, fw in self.frameworks.items():
            specs.append(fw._spec)
            idxs.append(self._idx_maps[nm])
            obs.append(fw._obsdata_fit)
            times.append(jnp.asarray(fw._times_fit, dtype))
            y0s.append(jnp.asarray(fw.get_inits(), dtype))
            # substeps resolve PER FRAMEWORK: grids (and any calibrated
            # 'auto' schedules) differ between experiments
            m, _, _, _, sub = fw._solver_args(
                solver_kw, len(fw._times_fit) - 1)
            subs.append(sub)
            if method is None:
                method = m
        method = "rk4" if method == "rk4" else "fixed_dopri5"
        return (tuple(specs), tuple(idxs), tuple(obs), tuple(times),
                tuple(y0s), method, tuple(subs))

    def _walk_mask(self, static_parameters=()):
        """Static parameters stay fixed; zero-template entries of array
        parameters never walk (``Framework.py:107-122``)."""
        mask = np.ones(self.dim)
        for p in static_parameters:
            if p not in self.columns:
                raise ValueError(f"unknown static parameter {p!r} "
                                 f"(joint columns: {self.columns})")
            off = self._col_offsets[p]
            shp = self._col_shapes[p]
            mask[off:off + (int(np.prod(shp)) if shp else 1)] = 0.0
        for lab in self.columns:
            tmpl = self._template(lab)
            if tmpl is not None:
                off = self._col_offsets[lab]
                sl = slice(off, off + tmpl.size)
                mask[sl] = np.where(tmpl != 0, mask[sl], 0.0)
        return mask

    def _data_token(self):
        """Hashable fingerprint of the per-experiment data a chi closure
        bakes in (inits, time grid, observation arrays). Cache keys carry
        it so mutating a member framework (``set_inits``,
        ``reset_dataframe``) after a fit invalidates the cached closure
        instead of silently reusing stale state."""
        parts = []
        for nm, fw in self.frameworks.items():
            parts.append((
                nm,
                hash(np.asarray(fw.get_inits(), float).tobytes()),
                hash(np.asarray(fw._times_fit, float).tobytes()),
                tuple(hash(np.asarray(leaf).tobytes()) for leaf in
                      jax.tree_util.tree_leaves(fw._obsdata_fit)),
            ))
        return tuple(parts)

    def _prior_token(self):
        """Hashable fingerprint of the per-slot priors (the distribution
        dataclasses are frozen/eq) — changing a parameter's prior or an
        array template after a fit invalidates the prior closures."""
        return tuple(self._dists())

    def _stable_config_token(self, method, subs, include_priors=False):
        """PROCESS-STABLE digest of the joint configuration a chi closure
        bakes in (experiment order, joint columns, solver method/substeps,
        inits, time grids, observation arrays — plus prior fingerprints
        and the pooling layout when the target is prior-aware). Used in
        persisted checkpoint signatures, where :meth:`_data_token`'s
        ``hash()`` values (salted per process) could never match across a
        resume; a same-shaped data or prior edit must fail the resume
        instead of stitching samples from two different posteriors."""
        import hashlib

        h = hashlib.sha1()
        h.update(repr((tuple(self.frameworks), tuple(self.columns),
                       method, subs,
                       tuple(getattr(self, "hierarchical", ())))).encode())
        for fw in self.frameworks.values():
            h.update(np.asarray(fw.get_inits(), float).tobytes())
            h.update(np.asarray(fw._times_fit, float).tobytes())
            # spec knobs that change the posterior without changing the
            # data arrays: likelihood family/shape and dose impulses
            h.update(repr((fw._spec.obs_model, fw._spec.obs_param,
                           fw._spec.dose_events)).encode())
            for leaf in jax.tree_util.tree_leaves(fw._obsdata_fit):
                h.update(np.asarray(leaf).tobytes())
        if include_priors:
            for fw in self.frameworks.values():
                for name in sorted(fw.parameters):
                    par = fw.parameters[name]
                    d = getattr(par, "dist", None)
                    if d is None:
                        h.update(repr((name, None)).encode())
                        continue
                    fam = getattr(d, "name", None) or type(d).__name__
                    hp = getattr(par, "hp", None) or {}
                    items = tuple(sorted(
                        (str(k), repr(np.asarray(v, float).tolist()))
                        for k, v in hp.items()))
                    h.update(repr((name, str(fam), items)).encode())
            for lab, hyp in sorted(getattr(self, "_hyper_priors",
                                           {}).items()):
                h.update(repr((lab, repr(hyp))).encode())
        return h.hexdigest()

    def _joint_chi_fn(self, solver_kw):
        """Summed multi-experiment chi over the joint FLAT theta, cached
        per (method, substeps, data fingerprint) — the gradient consumers
        (fit_map, fit_advi) pass it as a static jit argument hashed by
        identity, so a fresh closure per call would recompile every
        time."""
        specs, idxs, obs, times, y0s, method, subs = \
            self._device_args(solver_kw)
        key = (method, subs, self._data_token())
        cache = getattr(self, "_chi_fn_cache", None)
        if cache is None:
            cache = self._chi_fn_cache = {}
        if key in cache:
            return cache[key]
        from .model import chi_of_theta
        K = len(specs)

        def chi_fn(theta):
            tot = 0.0
            for k in range(K):
                th_k = jnp.take(theta, jnp.asarray(idxs[k]))
                tot = tot + chi_of_theta(
                    specs[k], obs[k], th_k, y0s[k], times[k],
                    method=method, substeps=subs[k])
            return tot

        cache[key] = chi_fn
        return chi_fn

    def _joint_prior_logpdf(self):
        """Per-slot prior sum over the joint theta (closure cached per
        prior fingerprint)."""
        dists = self._dists()
        key = tuple(dists)
        cached = getattr(self, "_prior_fn", None)
        if cached is not None and cached[0] == key:
            return cached[1]

        def fn(theta):
            tot = 0.0
            for j, d in enumerate(dists):
                if d is not None:
                    tot = tot + d.logpdf(theta[j])
            return tot

        self._prior_fn = (key, fn)
        return fn

    def _seed_hyper_slots(self, theta0):
        """Overwrite each chain's hyperparameter slots from its own
        per-experiment values (log-mean / log-std floored at 0.1): survey
        hyper draws are independent of the per-experiment draws, so
        without this the chains would start far from the pooling term's
        bulk. No-op without hierarchical parameters."""
        for p in self.hierarchical:
            lab_m, lab_t = self._hyper_cols[p]
            exps = [self._col_offsets[f"{nm}:{p}"]
                    for nm in self.frameworks]
            logs = np.log(theta0[:, exps])
            theta0[:, self._col_offsets[lab_m]] = np.exp(logs.mean(axis=1))
            theta0[:, self._col_offsets[lab_t]] = np.maximum(
                logs.std(axis=1), 0.1)
        return theta0

    def _effective_prior(self, use_priors):
        """(prior_logpdf, use_priors) as the samplers should see them.

        Without hierarchical parameters this is the per-slot prior sum
        gated by ``use_priors``. With them, the returned closure is
        always active: the lognormal pooling density ``sum_k N(log
        theta_k | log pop_median, pop_sigma)`` — exact over ``z = log
        theta``, the space the chains walk — plus the hyperpriors on
        ``pop_median``/``pop_sigma`` (the sigma hyperprior regularizes
        the funnel at ``pop_sigma -> 0``, so it cannot be switched off),
        plus — when ``use_priors`` — the ordinary per-slot priors of the
        NON-pooled slots (a pooled slot's prior is the population law;
        its individual prior only seeds the LHS survey). Cached per
        (flag, prior fingerprint): the consumers hash it as a static jit
        argument by identity."""
        use_priors = bool(use_priors)
        if not self.hierarchical:
            return ((self._joint_prior_logpdf(), True) if use_priors
                    else (None, False))
        cache = getattr(self, "_eff_prior_cache", None)
        if cache is None:
            cache = self._eff_prior_cache = {}
        key = (use_priors, self._prior_token())
        if key in cache:
            return cache[key], True
        table = []          # (median slot, sigma slot, experiment slots)
        hyper_slots, pooled_slots = set(), set()
        for p in self.hierarchical:
            lab_m, lab_t = self._hyper_cols[p]
            ms, ts = self._col_offsets[lab_m], self._col_offsets[lab_t]
            hyper_slots.update((ms, ts))
            exps = tuple(self._col_offsets[f"{nm}:{p}"]
                         for nm in self.frameworks)
            pooled_slots.update(exps)
            table.append((ms, ts, exps))
        dists = self._dists()
        # pooled slots' individual priors are REPLACED by the population
        # law (they still seed the LHS survey); hyperpriors always apply
        slot_priors = tuple(
            (j, d) for j, d in enumerate(dists)
            if d is not None
            and (j in hyper_slots
                 or (use_priors and j not in pooled_slots)))
        half_log_2pi = 0.5 * float(np.log(2.0 * np.pi))

        def fn(theta):
            tot = 0.0
            for j, d in slot_priors:
                tot = tot + d.logpdf(theta[j])
            for ms, ts, exps in table:
                mu = jnp.log(theta[ms])
                tau = theta[ts]
                for es in exps:
                    zk = jnp.log(theta[es])
                    tot = tot - 0.5 * ((zk - mu) / tau) ** 2 \
                        - jnp.log(tau) - half_log_2pi
            return tot

        cache[key] = fn
        return fn, True

    def fit_map(self, starts=64, steps=500, learning_rate=0.05,
                use_priors=False, static_parameters=(), set_best=True,
                drift_only=False, **solver_kw) -> pd.DataFrame:
        """Multi-start gradient (Adam) point estimation of the JOINT
        posterior: maximum likelihood over the summed multi-experiment
        chi, or MAP with ``use_priors=True``. Mirrors
        :meth:`ModelFramework.fit_map`; all starts (LHS draws over the
        joint priors + the current values) optimize as one vmapped
        program with gradients flowing through every experiment's solve.
        ``set_best=True`` pushes the winner into every framework."""
        self._require_deterministic("fit_map", drift_only)
        from .samplers import map_fit_custom, sample_lhs

        dists = self._dists()
        key = jax.random.PRNGKey(self.random_seed)
        cur = self._current_joint_theta()
        draw_dims = [j for j, d in enumerate(dists) if d is not None]
        thetas = np.tile(cur, (int(starts), 1))
        if draw_dims:
            lhs = np.asarray(sample_lhs(
                key, [dists[j] for j in draw_dims], int(starts)))
            thetas[:, draw_dims] = lhs
        thetas = np.concatenate([thetas, cur[None]])
        dtype = jnp.result_type(float)
        prior_fn, use_eff = self._effective_prior(use_priors)
        res = map_fit_custom(
            self._joint_chi_fn(solver_kw), jnp.asarray(thetas, dtype),
            steps=int(steps), learning_rate=float(learning_rate),
            walk_mask=jnp.asarray(self._walk_mask(static_parameters),
                                  dtype),
            prior_logpdf=prior_fn, use_priors=use_eff)
        df = self._df_from_thetas(np.asarray(res.theta))
        df["chi"] = np.asarray(res.chi)
        df["loss"] = np.asarray(res.loss)
        df["converged"] = np.asarray(res.converged)
        df = df.sort_values("chi").reset_index(drop=True)
        if set_best and len(df) and np.isfinite(df["chi"].iloc[0]):
            self.set_best_params(df)
        return df

    def fit_advi(self, steps=800, learning_rate=0.05, n_mc=8,
                 rank="full", draws=1000, use_priors=True,
                 static_parameters=(), resample=False, print_report=True,
                 drift_only=False, **solver_kw) -> pd.DataFrame:
        """Variational (ADVI) JOINT posterior: a Gaussian over the joint
        log-parameters fitted by ELBO ascent through all K experiments'
        solves at once. Mirrors :meth:`ModelFramework.fit_advi` (same
        convergence diagnostics in ``df.attrs['advi']``; run
        :meth:`fit_map` first so the ascent starts in the posterior
        bulk). Returns draws as the joint posterior DataFrame (columns
        + total ``chi``)."""
        self._require_deterministic("fit_advi", drift_only)
        from .samplers import advi_custom
        from .stats import rawstats as _rawstats

        if rank not in ("full", "diag"):
            raise ValueError(f"rank must be 'full' or 'diag', got {rank!r}")
        cur = self._current_joint_theta()
        mask = self._walk_mask(static_parameters)
        if np.any((cur <= 0) & (mask != 0)):
            raise ValueError(
                "fit_advi needs positive current values on every free "
                "joint dimension; run fit_map (or set parameters) first")
        prior_fn, use_eff = self._effective_prior(use_priors)
        res = advi_custom(
            self._joint_chi_fn(solver_kw), cur, steps=int(steps),
            learning_rate=float(learning_rate), n_mc=int(n_mc),
            full_rank=(rank == "full"), draws=int(draws),
            walk_mask=mask,
            prior_logpdf=prior_fn, use_priors=use_eff,
            seed=int(self.random_seed))
        from .samplers.advi import attach_advi_diagnostics
        df = self._df_from_thetas(np.asarray(res.theta))
        df["chi"] = np.asarray(res.chi)
        df, khat = attach_advi_diagnostics(
            df, res, seed=self.random_seed, resample=resample,
            label="joint ADVI")
        if print_report:
            report = ["\nJoint ADVI Report (variational posterior)\n"
                      "========================================="]
            for col in self.columns:
                tmpl = self._template(col)
                if tmpl is None:
                    m, s = _rawstats(df[col].to_numpy(float))
                    report.append(f"parameter: {col}\n\tmedian = "
                                  f"{float(m):0.3e}, Standard deviation "
                                  f"= {float(s):0.3e}")
                    continue
                vals = np.stack([np.ravel(np.asarray(v, float))
                                 for v in df[col].to_numpy()])
                for i in range(vals.shape[1]):
                    if tmpl[i] == 0:
                        continue
                    m, s = _rawstats(vals[:, i])
                    report.append(f"parameter: {col}[{i}]\n\tmedian = "
                                  f"{float(m):0.3e}, Standard deviation "
                                  f"= {float(s):0.3e}")
            report.append(f"\nfinal ELBO = {float(res.elbo[-1]):0.4e}, "
                          f"converged = {bool(res.converged)}, "
                          f"khat = {khat:0.3f} "
                          f"({'reliable' if khat < 0.7 else 'UNRELIABLE'})")
            print("\n".join(report))
        return df

    def _extend_until(self, out, run_more, *, n_chains, nits, mask,
                      until_rhat, until_min_ess, max_extensions):
        """Joint mirror of :meth:`ModelFramework._extend_until`: extend
        a finished joint MH run in whole-run increments (chains restart
        from their final states — exact continuation) until the pooled
        posterior meets the split-R-hat / min-ESS targets, stitching
        records (incl. per-experiment chi parts) with exact global
        running acceptance ratios and a continuing iteration column."""
        import warnings

        from .samplers.joint import JointOutput
        from .utils.diagnostics import effective_sample_size, split_rhat
        from .utils.profiling import get_logger

        theta = np.asarray(out.theta)
        chi = np.asarray(out.chi)
        parts = np.asarray(out.chi_parts)
        ar = np.asarray(out.acceptance_ratio)
        iteration = np.asarray(out.iteration)
        total = int(iteration[-1])
        counts = ar[:, -1] * total
        mask_flat = np.ravel(np.asarray(mask, float))
        walked = [j for j in range(theta.shape[-1]) if mask_flat[j] != 0]

        def worst():
            th = theta[:n_chains]
            max_rh, min_ess = 0.0, float("inf")
            for j in walked:
                x = th[:, :, j].astype(float)
                if np.allclose(x, x.flat[0]):
                    continue
                z = np.log(x) if np.all(x > 0) else x
                max_rh = max(max_rh, float(split_rhat(z)))
                min_ess = min(min_ess, float(effective_sample_size(z)))
            return max_rh, min_ess

        for ext in range(max_extensions + 1):
            max_rh, min_ess = worst()
            ok = ((until_rhat is None or max_rh <= until_rhat)
                  and (until_min_ess is None or min_ess >= until_min_ess))
            if ok:
                if ext:
                    get_logger().info(
                        "joint run converged after %d extension(s): max "
                        "split-rhat %.4f, min ESS %.0f", ext, max_rh,
                        min_ess)
                break
            if ext == max_extensions:
                warnings.warn(
                    f"joint run-length extension cap reached "
                    f"(max_extensions={max_extensions}) without meeting "
                    f"the targets: max split-rhat {max_rh:.4f} (target "
                    f"{until_rhat}), min ESS {min_ess:.0f} (target "
                    f"{until_min_ess})")
                break
            get_logger().info(
                "extending joint run (%d/%d): max split-rhat %.4f, min "
                "ESS %.0f", ext + 1, max_extensions, max_rh, min_ess)
            more = run_more(theta[:, -1, :], ext + 1)
            its = np.arange(1, nits)
            m_ar = np.asarray(more.acceptance_ratio)
            m_counts = m_ar * its[None, :]
            ar = np.concatenate(
                [ar, (counts[:, None] + m_counts) / (total + its)[None, :]],
                axis=1)
            theta = np.concatenate([theta, np.asarray(more.theta)], axis=1)
            chi = np.concatenate([chi, np.asarray(more.chi)], axis=1)
            parts = np.concatenate([parts, np.asarray(more.chi_parts)],
                                   axis=1)
            iteration = np.concatenate([iteration, total + its])
            counts = counts + m_counts[:, -1]
            total += nits - 1
        return JointOutput(theta=theta, chi=chi, chi_parts=parts,
                           acceptance_ratio=ar, iteration=iteration)

    def power_scale_sensitivity(self, posterior, alphas=(0.8, 1.25),
                                threshold=0.05, print_report=True):
        """Prior/likelihood power-scaling sensitivity of a fitted JOINT
        posterior (mirror of :meth:`ModelFramework.
        power_scale_sensitivity`; Kallioinen et al. 2023): PSIS-reweight
        the existing draws to per-slot ``prior^a`` and total ``lik^a``
        perturbations — post-hoc, no refitting. Prior-scaling is
        selective per joint slot; hierarchical pooling factors are NOT
        perturbed (only the per-slot priors/hyperpriors are). Expects a
        prior-aware posterior (``use_priors=True``, or hierarchical —
        always prior-aware)."""
        from .utils.sensitivity import power_scale_sensitivity as _ps

        dists = self._dists()
        if all(d is None for d in dists):
            raise ValueError("power_scale_sensitivity needs at least one "
                             "joint slot with a prior distribution")
        finite = posterior[np.isfinite(posterior["chi"].astype(float))]
        thetas = np.asarray(self._thetas_from_df(finite), float)
        chi = finite["chi"].to_numpy(float)
        # per-slot prior factors (host-side: heterogeneous families)
        log_prior = np.zeros_like(thetas)
        for j, d in enumerate(dists):
            if d is not None:
                log_prior[:, j] = np.asarray(
                    d.logpdf(jnp.asarray(thetas[:, j])))
        labels = []
        for lab in self.columns:
            tmpl = self._template(lab)
            if tmpl is None:
                labels.append(lab)
            else:
                labels += [f"{lab}[{i}]" for i in range(tmpl.size)]
        keep = [j for j in range(thetas.shape[1])
                if np.ptp(thetas[:, j]) > 0 and np.all(thetas[:, j] > 0)]
        if not keep:
            raise ValueError("no varying positive slots in the posterior")
        df = _ps(np.log(thetas[:, keep]), -chi, log_prior[:, keep],
                 alphas=tuple(alphas), threshold=float(threshold),
                 labels=[labels[j] for j in keep])
        if print_report:
            lines = ["\nJoint power-scaling sensitivity "
                     "(prior | likelihood)\n"
                     "================================================"]
            for _, r in df.iterrows():
                lines.append(
                    f"\t{r['parameter']}: prior {r['prior_sens']:0.3f}, "
                    f"likelihood {r['lik_sens']:0.3f}  [{r['diagnosis']}]")
            lines.append(f"(threshold {threshold}; khat max "
                         f"{df['khat'].max():0.2f} — reweighting reliable "
                         f"below 0.7)")
            print("\n".join(lines))
        return df

    def fit_survey(self, samples=1000, **solver_kw) -> pd.DataFrame:
        """LHS over the joint priors -> DataFrame[columns..., chi]."""
        from .samplers import sample_lhs

        dists = self._dists()
        key = jax.random.PRNGKey(self.random_seed)
        cur = self._current_joint_theta()
        draw_dims = [j for j, d in enumerate(dists) if d is not None]
        thetas = np.tile(cur, (samples, 1))
        if draw_dims:
            draws = np.asarray(sample_lhs(
                key, [dists[j] for j in draw_dims], samples))
            thetas[:, draw_dims] = draws
        specs, idxs, obs, times, y0s, method, subs = \
            self._device_args(solver_kw)
        chis = np.asarray(joint_survey(
            specs, idxs, obs, times, y0s,
            jnp.asarray(thetas, jnp.result_type(float)),
            method=method, substeps_list=subs))
        df = self._df_from_thetas(thetas)
        df["chi"] = np.where(np.isfinite(chis), chis, np.nan)
        return df

    def MCMC(self, chain_inits=32, iterations_per_chain=1000,
             fitsurvey_samples=1000, use_priors=False, rwalk_std=0.05,
             burnin=None, static_parameters=(), print_report=True,
             backend="auto", sampler="mh", n_leapfrog=4, step_size=0.02,
             path_adapt=False, dense_mass=False,
             until_rhat=None, until_min_ess=None, max_extensions=8,
             checkpoint_every=None, checkpoint_path=None,
             resume_from=None, pallas_tile_chains=None,
             pallas_interpret=False, n_particles=128, sde_substeps=4,
             sde_method="euler", adapt_proposal=True,
             **solver_kw) -> pd.DataFrame:
        """Joint MCMC posterior over all experiments.

        Chains seed from the best ``chain_inits`` of ``fitsurvey_samples``
        LHS prior draws (sampled with replacement, weighted toward low
        chi). Returns a DataFrame with the joint columns plus total
        ``chi``, per-experiment ``chi:<name>``, ``iteration``,
        ``acceptance_ratio``, ``chain#`` and ``all_rejected`` — the
        familiar posterior shape, one row per recorded joint sample.

        Framework-grade execution (same knobs as ``ModelFramework.MCMC``):

        * ``backend='auto'`` runs the K experiments fused back-to-back in
          ONE Pallas kernel per chain tile on TPU (joint throughput within
          ~1/K of the single-experiment fused rate —
          ops/pallas_joint.py); 'xla' forces the scan+vmap sampler (any
          prior family); chains shard over the device mesh on both paths;
        * ``checkpoint_every=N`` + ``checkpoint_path``: periodic
          persistence with bit-exact resume via ``resume_from`` — on
          BOTH backends (the XLA path chunks its scan exactly like the
          single-experiment sampler, so hierarchical runs checkpoint
          too);
        * ``sampler='hmc'``: cross-chain-adapted HMC over the joint
          posterior — gradients of the summed multi-experiment chi flow
          through every experiment's solve; hierarchical pooling
          densities (funnel-shaped, where the random walk stalls) come
          free since the potential is an arbitrary closure. Knobs:
          ``n_leapfrog``, ``step_size``, ``path_adapt`` (ChEES),
          ``dense_mass`` (full-rank cross-chain metric — the natural
          choice here: pooling couples the joint dims). No
          per-experiment ``chi:<name>`` columns on this path.
          ``checkpoint_every`` works here too (the resume signature
          carries a content digest of the joint data/solver config).
        """
        nits = int(iterations_per_chain)
        if burnin is None:
            burnin = int(nits / 2)
        n_chains = int(chain_inits)
        survey = self.fit_survey(fitsurvey_samples, **solver_kw).dropna()
        if survey.empty:
            raise ValueError("joint pre-survey found no finite-chi draws; "
                             "widen priors or check the data")
        top = survey.nsmallest(max(n_chains, 8), "chi")
        rng = np.random.default_rng(self.random_seed)
        rows = top.iloc[rng.integers(0, len(top), n_chains)]
        theta0 = self._seed_hyper_slots(self._thetas_from_df(rows))
        mask = self._walk_mask(static_parameters)

        dists = self._dists()
        prior_logpdf, use_priors_eff = self._effective_prior(use_priors)

        specs, idxs, obs, times, y0s, method, subs = \
            self._device_args(solver_kw)

        if backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"backend must be 'auto', 'pallas' or 'xla', "
                             f"got {backend!r}")
        if sampler not in ("mh", "hmc"):
            raise ValueError(f"sampler must be 'mh' or 'hmc', got "
                             f"{sampler!r}")
        if self._stoch:
            # any diffusion= experiment routes the joint fit through the
            # particle-marginal sampler: exact chi for deterministic
            # experiments + unbiased PF estimates for stochastic ones
            # (samplers/joint.joint_pmmh)
            if sampler == "hmc":
                raise ValueError(
                    "sampler='hmc' needs differentiable likelihoods; "
                    f"stochastic experiment(s) {sorted(self._stoch)} "
                    "score through a (non-differentiable) particle "
                    "filter — use sampler='mh'")
            if backend == "pallas":
                raise ValueError(
                    "backend='pallas' does not support stochastic "
                    "experiments; joint PMMH runs on the XLA backend "
                    "(backend='xla' or 'auto')")
            backend = "xla"
            if checkpoint_every is not None or resume_from is not None:
                raise ValueError(
                    "checkpointing is not supported for joint PMMH; run "
                    "uninterrupted or checkpoint the per-experiment "
                    "fits individually (MCMC(sampler='pmmh', "
                    "checkpoint_every=...))")
        if sampler == "hmc":
            # gradient sampler: arbitrary differentiable potential, so
            # hierarchical pooling comes free; XLA only
            if backend == "pallas":
                raise ValueError("sampler='hmc' runs on the XLA backend")
            backend = "xla"
        if self.hierarchical:
            # the pooling density couples slots; the fused kernel only
            # evaluates independent per-slot priors
            if backend == "pallas":
                raise ValueError(
                    "backend='pallas' does not support hierarchical "
                    "parameters (the pooling prior couples joint slots); "
                    "use backend='xla' or 'auto'")
            backend = "xla"
        if backend == "auto":
            from .ops.pallas_mh import (kernel_priors_supported,
                                        mosaic_supported,
                                        rhs_supports_tiles)
            backend = "pallas" if (
                jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
                and mosaic_supported()
                and (not use_priors or kernel_priors_supported(dists))
                # array parameters run fused when every experiment's RHS
                # traces in the tiled layout (elementwise indexing)
                and all(rhs_supports_tiles(fw._spec)
                        for fw in self.frameworks.values())
                # censored observations compile in-kernel for the
                # lognormal and student-t models (pallas_mh._build_plan)
                and all(fw._obsdata_fit_host.censor is None
                        or fw._spec.obs_model in ("lognormal",
                                                  "student_t")
                        for fw in self.frameworks.values())
            ) else "xla"
        if checkpoint_every is not None and checkpoint_path is None:
            # resume_from alone is not enough: without a path the resumed
            # run would silently stop persisting
            raise ValueError(
                "checkpoint_every requires checkpoint_path (chain state "
                "is persisted to <checkpoint_path>.progress)")
        if resume_from is not None and checkpoint_every is None:
            raise ValueError(
                "resume_from requires checkpoint_every (and "
                "checkpoint_path) — restate the checkpointing "
                "configuration the run was started with")
        config_token = ""
        if checkpoint_every is not None:
            # data (+prior, when prior-aware) fingerprint baked into the
            # persisted resume signature — see _stable_config_token
            config_token = self._stable_config_token(
                method, subs, include_priors=use_priors_eff)

        if backend == "pallas":
            from .parallel import chain_mesh
            from .ops.pallas_joint import joint_metropolis_hastings_fused
            progress_path = (checkpoint_path + ".progress"
                             if checkpoint_every is not None else None)
            priors = None
            if use_priors:
                priors = tuple(dists)
            out = joint_metropolis_hastings_fused(
                specs, idxs,
                tuple(self.frameworks[nm]._obsdata_fit_host
                      for nm in self.frameworks),
                tuple(np.asarray(self.frameworks[nm]._times_fit)
                      for nm in self.frameworks),
                tuple(np.asarray(fw.get_inits())
                      for fw in self.frameworks.values()),
                np.asarray(theta0, np.float32), seed=int(self.random_seed),
                nits=nits, burnin=int(burnin), walk_mask=mask,
                rwalk_std=float(rwalk_std),
                stepper="rk4" if method == "rk4" else "dopri5",
                substeps_list=subs, priors=priors,
                tile_chains=(None if pallas_tile_chains is None
                             else int(pallas_tile_chains)),
                interpret=bool(pallas_interpret),
                checkpoint_every=checkpoint_every,
                checkpoint_path=progress_path, resume_from=resume_from,
                config_token=config_token,
                mesh=chain_mesh() if (jax.device_count() > 1
                                      and not pallas_interpret) else None)
        else:
            from .parallel import chain_mesh, pad_chains, shard_chain_batch
            dtype = jnp.result_type(float)
            mesh = chain_mesh()
            n_padded = pad_chains(n_chains, mesh)
            th0 = np.asarray(theta0, dtype)
            if n_padded > n_chains:
                th0 = np.concatenate(
                    [th0, np.tile(th0[-1:], (n_padded - n_chains, 1))])
            base_key = jax.random.PRNGKey(self.random_seed)
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                jnp.arange(n_padded))
            margs = shard_chain_batch(
                (jnp.asarray(th0, dtype), keys), mesh)
            if sampler == "hmc":
                from .samplers import hamiltonian_mc_custom
                hmc_kw = dict(
                    nits=nits, burnin=int(burnin),
                    n_leapfrog=int(n_leapfrog),
                    step_size=float(step_size),
                    path_adapt=bool(path_adapt),
                    dense_mass=bool(dense_mass),
                    walk_mask=jnp.asarray(mask, dtype),
                    prior_logpdf=prior_logpdf, use_priors=use_priors_eff)
                if checkpoint_every is not None:
                    from .samplers.hmc import \
                        hamiltonian_mc_custom_checkpointed
                    progress = (checkpoint_path + ".progress"
                                if checkpoint_path else None)
                    out = hamiltonian_mc_custom_checkpointed(
                        self._joint_chi_fn(solver_kw), margs[0], margs[1],
                        config_token=config_token,
                        checkpoint_every=int(checkpoint_every),
                        checkpoint_path=progress, resume_from=resume_from,
                        **hmc_kw)
                else:
                    out = hamiltonian_mc_custom(
                        self._joint_chi_fn(solver_kw), margs[0], margs[1],
                        **hmc_kw)
            elif self._stoch:
                from .samplers.joint import joint_pmmh
                from .samplers.pf import obs_blocks
                stoch_blocks = tuple(
                    obs_blocks(self.frameworks[nm]._obsdata_fit_host)
                    if nm in self._stoch else None
                    for nm in self.frameworks)
                out = joint_pmmh(
                    specs, idxs, obs, times, y0s, margs[0], margs[1],
                    stoch_blocks=stoch_blocks, nits=nits,
                    burnin=int(burnin),
                    walk_mask=jnp.asarray(mask, dtype),
                    rwalk_std=float(rwalk_std),
                    prior_logpdf=prior_logpdf,
                    use_priors=use_priors_eff, method=method,
                    substeps_list=subs, n_particles=int(n_particles),
                    sde_substeps=int(sde_substeps),
                    sde_method=str(sde_method),
                    adapt_proposal=bool(adapt_proposal))
            else:
                mh_kw = dict(nits=nits, burnin=int(burnin),
                             walk_mask=jnp.asarray(mask, dtype),
                             rwalk_std=float(rwalk_std),
                             prior_logpdf=prior_logpdf,
                             use_priors=use_priors_eff, method=method,
                             substeps_list=subs)
                if checkpoint_every is not None:
                    from .samplers.joint import \
                        joint_metropolis_hastings_checkpointed
                    progress = (checkpoint_path + ".progress"
                                if checkpoint_path else None)
                    out = joint_metropolis_hastings_checkpointed(
                        specs, idxs, obs, times, y0s, margs[0], margs[1],
                        config_token=config_token,
                        checkpoint_every=int(checkpoint_every),
                        checkpoint_path=progress, resume_from=resume_from,
                        **mh_kw)
                else:
                    out = joint_metropolis_hastings(
                        specs, idxs, obs, times, y0s, margs[0], margs[1],
                        **mh_kw)

        if until_rhat is not None or until_min_ess is not None:
            if sampler != "mh":
                raise ValueError(
                    "until_rhat/until_min_ess run-length extension is "
                    "supported for sampler='mh'")
            if checkpoint_every is not None or resume_from is not None:
                raise ValueError(
                    "until_rhat/until_min_ess cannot be combined with "
                    "checkpointing (the extension count is data-dependent)")
            if backend == "pallas":
                from .parallel import chain_mesh as _cm
                from .ops.pallas_joint import joint_metropolis_hastings_fused

                def run_more(th_last, salt):
                    return joint_metropolis_hastings_fused(
                        specs, idxs,
                        tuple(self.frameworks[nm]._obsdata_fit_host
                              for nm in self.frameworks),
                        tuple(np.asarray(self.frameworks[nm]._times_fit)
                              for nm in self.frameworks),
                        tuple(np.asarray(fw.get_inits())
                              for fw in self.frameworks.values()),
                        np.asarray(th_last, np.float32),
                        seed=int(self.random_seed) + 104729 * salt,
                        nits=nits, burnin=0, walk_mask=mask,
                        rwalk_std=float(rwalk_std),
                        stepper="rk4" if method == "rk4" else "dopri5",
                        substeps_list=subs,
                        priors=tuple(dists) if use_priors else None,
                        tile_chains=(None if pallas_tile_chains is None
                                     else int(pallas_tile_chains)),
                        interpret=bool(pallas_interpret),
                        mesh=_cm() if (jax.device_count() > 1
                                       and not pallas_interpret) else None)
            else:
                from .parallel import chain_mesh as _cm
                from .parallel import shard_chain_batch as _scb
                mesh2 = _cm()
                bkey = jax.random.PRNGKey(self.random_seed)
                dtype2 = jnp.result_type(float)

                def run_more(th_last, salt):
                    C2 = th_last.shape[0]
                    keys2 = jax.vmap(lambda i: jax.random.fold_in(
                        bkey, salt * 1_000_003 + i))(jnp.arange(C2))
                    m2 = _scb((jnp.asarray(th_last, dtype2), keys2), mesh2)
                    common = dict(
                        nits=nits, burnin=0,
                        walk_mask=jnp.asarray(mask, dtype2),
                        rwalk_std=float(rwalk_std),
                        prior_logpdf=prior_logpdf,
                        use_priors=use_priors_eff, method=method,
                        substeps_list=subs)
                    if self._stoch:
                        from .samplers.joint import joint_pmmh
                        from .samplers.pf import obs_blocks
                        sb = tuple(
                            obs_blocks(
                                self.frameworks[nm]._obsdata_fit_host)
                            if nm in self._stoch else None
                            for nm in self.frameworks)
                        # extensions run the unadapted kernel (scale 1):
                        # a restarted pseudo-marginal chain is valid MH
                        # from its first fresh incumbent estimate
                        return joint_pmmh(
                            specs, idxs, obs, times, y0s, m2[0], m2[1],
                            stoch_blocks=sb,
                            n_particles=int(n_particles),
                            sde_substeps=int(sde_substeps),
                            sde_method=str(sde_method),
                            adapt_proposal=False, **common)
                    return joint_metropolis_hastings(
                        specs, idxs, obs, times, y0s, m2[0], m2[1],
                        **common)

            out = self._extend_until(
                out, run_more, n_chains=n_chains, nits=nits, mask=mask,
                until_rhat=until_rhat, until_min_ess=until_min_ess,
                max_extensions=int(max_extensions))

        theta = np.asarray(out.theta)[:n_chains]   # (C, R, D)
        C, R, D = theta.shape
        names = list(self.frameworks)
        chi_all = np.asarray(out.chi)[:n_chains]
        # the HMC potential is the summed chi only — no per-experiment
        # parts (MHOutput); the MH paths record them
        parts_all = (np.asarray(out.chi_parts)[:n_chains]
                     if hasattr(out, "chi_parts") else None)
        ar_all = np.asarray(out.acceptance_ratio)[:n_chains]
        all_rejected = ar_all[:, -1] == 0.0 if R else np.zeros(C, bool)
        frames = []
        for c in range(C):
            df = self._df_from_thetas(theta[c])
            df["chi"] = chi_all[c]
            if parts_all is not None:
                for k, nm in enumerate(names):
                    df[f"chi:{nm}"] = parts_all[c, :, k]
            df["iteration"] = np.asarray(out.iteration)
            df["acceptance_ratio"] = ar_all[c]
            df["chain#"] = c
            df["all_rejected"] = bool(all_rejected[c])
            frames.append(df)
        if all_rejected.any():
            import warnings
            warnings.warn(
                f"{int(all_rejected.sum())}/{C} joint chains never "
                "accepted a proposal; their rows repeat the seed draw and "
                "are flagged all_rejected=True")
        posterior = pd.concat(frames, ignore_index=True)

        if print_report:
            report = ["\nJoint Fitting Report\n===================="]
            for col in self.columns:
                tmpl = self._template(col)
                if tmpl is None:
                    median, std = rawstats(posterior[col].to_numpy())
                    report.append(f"parameter: {col}\n\tmedian = "
                                  f"{float(median):0.3e}, Standard "
                                  f"deviation = {float(std):0.3e}")
                    continue
                vals = np.stack([np.ravel(np.asarray(v, float))
                                 for v in posterior[col].to_numpy()])
                for i in range(vals.shape[1]):
                    if tmpl[i] == 0:
                        continue
                    median, std = rawstats(vals[:, i])
                    report.append(f"parameter: {col}[{i}]\n\tmedian = "
                                  f"{float(median):0.3e}, Standard "
                                  f"deviation = {float(std):0.3e}")
            best = posterior.loc[posterior["chi"].idxmin()]
            report.append("\nBest joint sample:")
            if parts_all is not None:
                report.append("\tChi = {:0.3e} ({})".format(
                    best["chi"], ", ".join(
                        f"chi:{nm} = {best[f'chi:{nm}']:0.3e}"
                        for nm in names)))
            else:
                report.append("\tChi = {:0.3e}".format(best["chi"]))
            print("\n".join(report))
        return posterior

    def _experiment_posterior(self, posterior, nm):
        """Slice the joint posterior into experiment ``nm``'s own
        parameter columns (renamed to its pnames)."""
        fw = self.frameworks[nm]
        sub = pd.DataFrame(index=posterior.index)
        for p in fw._pnames:
            lab = p if p in self.shared else f"{nm}:{p}"
            sub[p] = posterior[lab]
        return sub

    def posterior_predictive(self, posterior, n_draws=200, ci=0.9,
                             print_report=True, **solver_kw):
        """Posterior predictive check per experiment: slice the joint
        posterior into each framework's parameters and run its
        :meth:`ModelFramework.posterior_predictive`. Returns a dict
        ``experiment name -> per-experiment result`` plus an ``overall``
        entry with the observation-weighted coverage."""
        out, n_cov, n_obs = {}, 0.0, 0
        for nm, fw in self.frameworks.items():
            res = fw.posterior_predictive(
                self._experiment_posterior(posterior, nm),
                n_draws=n_draws, ci=ci, print_report=False, **solver_kw)
            out[nm] = res
            k = len(res["summary"])
            n_cov += res["coverage"] * k
            n_obs += k
        coverage = n_cov / max(n_obs, 1)
        out["overall"] = {"coverage": coverage, "n_observations": n_obs}
        if print_report:
            parts = ", ".join(f"{nm}: {out[nm]['coverage']:.1%}"
                              for nm in self.frameworks)
            print(f"joint posterior predictive: {coverage:.1%} of "
                  f"{n_obs} observations inside the {int(ci * 100)}% "
                  f"interval ({parts})")
        return out

    def information_criteria(self, posterior, n_draws=400,
                             print_report=True, **solver_kw):
        """WAIC / PSIS-LOO per experiment plus pooled totals — the
        predictive yardstick for choosing a pooling mode: fit the same
        experiments with ``shared=``, ``hierarchical=`` and neither,
        and prefer the variant with the higher ``overall['elpd_loo']``.
        Per-experiment entries are :meth:`ModelFramework.
        information_criteria` results; ``overall`` sums elpd/p terms
        (experiments are independent given parameters) and combines
        standard errors in quadrature."""
        out, tot = {}, {"elpd_waic": 0.0, "elpd_loo": 0.0,
                        "p_waic": 0.0, "p_loo": 0.0,
                        "se2_waic": 0.0, "se2_loo": 0.0, "n_bad_khat": 0}
        for nm, fw in self.frameworks.items():
            res = fw.information_criteria(
                self._experiment_posterior(posterior, nm),
                n_draws=n_draws, print_report=False, **solver_kw)
            out[nm] = res
            tot["elpd_waic"] += res["waic"]["elpd_waic"]
            tot["p_waic"] += res["waic"]["p_waic"]
            tot["se2_waic"] += res["waic"]["se_elpd_waic"] ** 2
            tot["elpd_loo"] += res["loo"]["elpd_loo"]
            tot["p_loo"] += res["loo"]["p_loo"]
            tot["se2_loo"] += res["loo"]["se_elpd_loo"] ** 2
            tot["n_bad_khat"] += res["loo"]["n_bad_khat"]
        overall = {
            "elpd_waic": tot["elpd_waic"], "p_waic": tot["p_waic"],
            "se_elpd_waic": float(np.sqrt(tot["se2_waic"])),
            "elpd_loo": tot["elpd_loo"], "p_loo": tot["p_loo"],
            "se_elpd_loo": float(np.sqrt(tot["se2_loo"])),
            "n_bad_khat": tot["n_bad_khat"]}
        out["overall"] = overall
        if print_report:
            print(f"joint WAIC: elpd = {overall['elpd_waic']:.2f} "
                  f"(se {overall['se_elpd_waic']:.2f}); joint PSIS-LOO: "
                  f"elpd = {overall['elpd_loo']:.2f} "
                  f"(se {overall['se_elpd_loo']:.2f}), bad khat: "
                  f"{overall['n_bad_khat']}")
        return out

    def diagnostics(self, posterior) -> pd.DataFrame:
        """Convergence diagnostics (mean/std/median/ess/ess_per_draw/
        rhat) per joint column, incl. hyperparameters — same table as
        :meth:`ModelFramework.diagnostics` over the joint posterior."""
        from .utils.diagnostics import summarize
        return summarize(posterior, list(self.columns))

    def plot_corner(self, posterior, parameters=None, **kw):
        """Corner plot of the joint posterior (delegates to the first
        framework's :meth:`ModelFramework.plot_corner` with the joint
        column names, hyperparameters included)."""
        if parameters is None:
            parameters = [c for c in self.columns
                          if c in posterior
                          and posterior[c].dtype != object
                          and posterior[c].nunique() > 1]
        first = next(iter(self.frameworks.values()))
        return first.plot_corner(posterior, parameters=parameters, **kw)

    def plot_trace(self, posterior, parameters=None, **kw):
        """Per-chain trace plot of the joint posterior (delegates to the
        first framework's :meth:`ModelFramework.plot_trace` with the
        joint column names, hyperparameters included)."""
        if parameters is None:
            parameters = [c for c in self.columns
                          if c in posterior
                          and posterior[c].dtype != object
                          and posterior[c].nunique() > 1]
        first = next(iter(self.frameworks.values()))
        return first.plot_trace(posterior, parameters=parameters, **kw)

    def set_best_params(self, posterior):
        """Push the min-chi joint sample back into every framework (and
        remember the best hyperparameter values)."""
        best = posterior.loc[posterior["chi"].idxmin()]
        for lab in self._hyper_vals:
            if lab in best:
                self._hyper_vals[lab] = float(best[lab])
        for nm, fw in self.frameworks.items():
            vals = {}
            for i, p in enumerate(fw._pnames):
                lab = p if p in self.shared else f"{nm}:{p}"
                shp = fw._spec.pshapes[i]
                vals[p] = (np.asarray(best[lab], float).reshape(shp)
                           if shp else float(best[lab]))
            fw.set_parameters(**vals)
        return best
