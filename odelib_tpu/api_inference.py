"""Bayesian inference & model-criticism mixin for ModelFramework.

Everything here is NEW capability relative to the reference (whose entire
posterior toolkit is the MCMC DataFrame + ``set_best_params`` +
``plot_uncertainty``, ``/root/reference/ODElib/Framework.py:725-740``):
MAP/Laplace fits, full-rank ADVI, profile likelihood, SMC model evidence,
WAIC/PSIS-LOO information criteria, posterior/prior predictive checks,
convergence diagnostics, simulation-based calibration, power-scaling and
Sobol/local sensitivity analysis. Split out of api.py (which keeps the
reference-parity surface + MCMC orchestration) purely for structure; the
methods are part of the one ``ModelFramework`` class via this mixin.
"""
from __future__ import annotations

import time
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from . import distributions as _dist
from . import stats as jstats
from .model import integrate_theta
from .samplers import mh as _mh


@partial(jax.jit, static_argnums=(0, 5, 6, 7, 8, 9))
def _logpred_jit(spec, obs, times, y0b, thetas, method, rtol, atol,
                 max_steps, substeps):
    """(S, P) posterior draws -> (S, N) log predictions at the obs points."""
    from .model import observe

    def one(theta):
        y0 = spec.override_inits(y0b, theta)
        ys = integrate_theta(spec, theta, y0, times, method=method,
                             rtol=rtol, atol=atol, max_steps=max_steps,
                             substeps=substeps)
        return jnp.log(observe(spec, obs, ys))

    return jax.vmap(one)(thetas)


@partial(jax.jit, static_argnums=(0, 6, 7))
def _logpred_sde_jit(spec, obs, times, y0b, thetas, keys, substeps, method):
    """(S, P) draws -> (S, N) log predictions along ONE stochastic path
    per draw: for an SDE model the predictive replication must include
    the process noise, not just the observation noise."""
    from .model import observe, sdeint_theta

    def one(theta, key):
        y0 = spec.override_inits(y0b, theta)
        ys = sdeint_theta(spec, theta, y0, times, key, substeps=substeps,
                          method=method)
        return jnp.log(observe(spec, obs, ys))

    return jax.vmap(one)(thetas, keys)



class InferenceMixin:
    """Model-criticism methods mixed into :class:`~odelib_tpu.api.ModelFramework`."""

    def _require_deterministic(self, what, drift_only, hint=""):
        """Stochastic-feature-matrix guard: a method whose math assumes a
        deterministic likelihood must either refuse LOUDLY on a
        ``diffusion=`` model or be explicitly opted into the drift-only
        approximation — silently fitting the drift skeleton is exactly
        the noise-misattribution bias process noise exists to avoid
        (ops/sde.py module note)."""
        if self._spec.diffusion is None:
            return
        if not drift_only:
            raise ValueError(
                f"{what} assumes a deterministic likelihood, but this "
                "model has process noise (diffusion=...): a single "
                "drift trajectory's fit statistic is not the marginal "
                f"likelihood of the SDE. {hint}Pass drift_only=True to "
                "run it anyway on the drift skeleton (the diffusion "
                "term is IGNORED and results do not account for "
                "process noise).")
        warnings.warn(
            f"{what}: drift_only=True on a stochastic model — the "
            "diffusion term is ignored; treat the result as an analysis "
            "of the deterministic skeleton, not of the SDE.")

    def tune_particles(self, theta=None, pilot_particles=64, n_reps=32,
                       target_var=1.2, sde_substeps=4, sde_method="euler",
                       seed=None, print_report=True):
        """Recommend ``n_particles`` for ``MCMC(sampler='pmmh')``.

        Implements the pseudo-marginal var(log-lik) ~ 1.2 rule
        (:func:`odelib_tpu.samplers.pf.tune_particles`): runs ``n_reps``
        independent ``pilot_particles``-particle bootstrap filters at
        ``theta`` (default: the framework's CURRENT parameter values —
        call :meth:`set_best_params` or :meth:`fit_map` first so the rule
        is evaluated where the chain will spend its time), measures the
        variance of the log-likelihood estimate, and scales the particle
        count by ``var / target_var``. Returns ``(n_particles,
        loglik_var)`` and prints a one-line report.
        """
        from .samplers.pf import tune_particles as _tune

        if self._spec.diffusion is None:
            raise ValueError(
                "tune_particles requires a stochastic model — construct "
                "the framework with diffusion=... (deterministic fits "
                "have no particle filter)")
        if theta is None:
            theta = np.asarray(self._current_theta(), float)
        key = jax.random.PRNGKey(self.random_seed if seed is None
                                 else int(seed))
        k, v = _tune(self._spec, self._obsdata_fit_host,
                     np.asarray(self._times_fit, float),
                     np.asarray(self.get_inits(), float),
                     jnp.asarray(theta, jnp.result_type(float)), key,
                     pilot_particles=int(pilot_particles),
                     n_reps=int(n_reps), target_var=float(target_var),
                     substeps=int(sde_substeps),
                     sde_method=str(sde_method))
        if print_report:
            print(f"tune_particles: var(log-lik) = {v:.2f} at "
                  f"K={pilot_particles} -> recommended n_particles = {k} "
                  f"(target var {target_var})")
        return k, v

    def fit_map(self, starts=64, steps=500, learning_rate=0.05,
                use_priors=False, static_parameters=(), set_best=True,
                drift_only=False, **solver_kw) -> pd.DataFrame:
        """Multi-start gradient (Adam) point estimation: maximum likelihood,
        or MAP with ``use_priors=True``.

        Draws ``starts`` LHS samples from the priors, runs ``steps`` Adam
        iterations from every start AT ONCE (vmapped; gradients flow
        through the fixed-step solve), and returns a DataFrame of the
        per-start optima (pnames..., chi, loss, converged) sorted by chi.
        ``set_best=True`` pushes the winner into the framework like
        ``set_best_params``. The reference's only point-estimate route is
        min-chi over MCMC samples (``Framework.py:725-731``).
        """
        self._require_deterministic(
            'fit_map', drift_only,
            hint="Fit the SDE with MCMC(sampler='pmmh'). ")
        from .samplers import map_fit

        ps = self._lhs_samples(starts)
        theta0 = np.asarray(self._theta_from_df(ps))
        # include the current values as one start (warm restarts)
        theta0 = np.concatenate([theta0,
                                 np.asarray(self._current_theta())[None]])
        mask = np.ones(self._spec.theta_size)
        offsets = self._spec.theta_offsets
        for p in static_parameters:
            i = self._pnames.index(p)
            n = int(np.prod(self._spec.pshapes[i])) \
                if self._spec.pshapes[i] else 1
            mask[offsets[i]:offsets[i] + n] = 0.0
        method, _, _, _, substeps = self._solver_args(
            solver_kw, len(self._times_fit) - 1)
        prior_logpdf = None
        if use_priors:
            prior_logpdf = self._prior_logpdf_for(tuple(
                self.parameters[p].jdist
                if self.parameters[p] is not None else None
                for p in self._pnames))

        dtype = jnp.result_type(float)
        res = map_fit(self._spec, self._obsdata_fit,
                      jnp.asarray(self._times_fit, dtype),
                      jnp.asarray(self.get_inits(), dtype),
                      jnp.asarray(theta0, dtype),
                      steps=steps, learning_rate=learning_rate,
                      walk_mask=jnp.asarray(mask, dtype),
                      prior_logpdf=prior_logpdf, use_priors=use_priors,
                      method="rk4" if method == "rk4" else "fixed_dopri5",
                      substeps=substeps)
        theta = np.asarray(res.theta)
        out = {}
        for p, off, shp in zip(self._pnames, offsets, self._spec.pshapes):
            n = int(np.prod(shp)) if shp else 1
            col = theta[:, off:off + n]
            out[p] = list(col.reshape((-1,) + shp)) if shp else col[:, 0]
        df = pd.DataFrame(out)
        df["chi"] = np.asarray(res.chi)
        df["loss"] = np.asarray(res.loss)
        df["converged"] = np.asarray(res.converged)
        df = df.sort_values("chi").reset_index(drop=True)
        if set_best and np.isfinite(df["chi"].iloc[0]):
            best = df.iloc[0]
            self.set_parameters(**{p: best[p] for p in self._pnames})
        return df

    def laplace_approximation(self, parameters=None, use_priors=False,
                              drift_only=False, **solver_kw):
        """Gaussian (Laplace) posterior approximation around a point
        estimate: Hessian of U(z) = chi [- log prior] in log-parameter
        space via ``jax.hessian`` through the fixed-step solve.

        Run :meth:`fit_map` first (or pass ``parameters``) so the point is
        an optimum. Returns a dict with ``median`` (exp of the mode),
        ``log_std`` (per-parameter posterior std in log space),
        ``cov``/``corr`` (log-space covariance/correlation DataFrames) and
        ``hessian_pd`` (False when the Hessian was not positive definite —
        flat/unidentified directions; pseudo-inverse is used and the
        corresponding stds are unreliable). Array-valued parameters
        contribute one dimension per non-zero template entry, labeled
        ``p[i]`` (zero entries are pinned, the reference convention).
        Another autodiff capability with no reference counterpart.
        """
        self._require_deterministic(
            'laplace_approximation', drift_only,
            hint="Fit the SDE with MCMC(sampler='pmmh'). ")
        if parameters is None:
            theta = np.asarray(self._current_theta(), float)
        else:
            theta = np.asarray(self._spec.pack_theta(list(parameters)),
                               float)
        # free flat slots: everything except zero-template array entries
        offsets = self._spec.theta_offsets
        names, free = [], []
        for i, p in enumerate(self._pnames):
            shp = self._spec.pshapes[i]
            if not shp:
                names.append(p)
                free.append(offsets[i])
                continue
            par = self.parameters[p]
            tmpl = np.ravel(np.asarray(
                par.val if par is not None else np.zeros(shp), float))
            for j, v in enumerate(tmpl):
                if v != 0:
                    names.append(f"{p}[{j}]")
                    free.append(offsets[i] + j)
        free = np.asarray(free)
        _, _, _, _, substeps = self._solver_args(
            solver_kw, len(self._times_fit) - 1)
        dtype = jnp.result_type(float)
        spec = self._spec
        obs = self._obsdata_fit
        times = jnp.asarray(self._times_fit, dtype)
        y0b = jnp.asarray(self.get_inits(), dtype)
        prior_logpdf = None
        if use_priors:
            prior_logpdf = self._prior_logpdf_for(tuple(
                self.parameters[p].jdist
                if self.parameters[p] is not None else None
                for p in self._pnames))
        z0_full = jnp.log(jnp.maximum(jnp.asarray(theta, dtype), 1e-300))
        free_j = jnp.asarray(free)

        def u_of(z_free):
            from .model import chi_of_theta
            th = jnp.exp(z0_full.at[free_j].set(z_free))
            u = chi_of_theta(spec, obs, th, y0b, times,
                             method="fixed_dopri5", substeps=substeps)
            if use_priors:
                u = u - prior_logpdf(th)
            return u

        H = np.asarray(jax.hessian(u_of)(z0_full[free_j]), float)
        pd_ok = bool(np.all(np.isfinite(H)))
        if pd_ok:
            try:
                np.linalg.cholesky(H)
            except np.linalg.LinAlgError:
                pd_ok = False
        cov = np.linalg.pinv(H) if np.all(np.isfinite(H)) else \
            np.full_like(H, np.nan)
        std = np.sqrt(np.clip(np.diag(cov), 0.0, None))
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = cov / np.outer(std, std)
        theta_free = theta[free]
        return {
            "median": {p: float(v) for p, v in zip(names, theta_free)},
            "log_std": {p: float(s) for p, s in zip(names, std)},
            "cov": pd.DataFrame(cov, index=names, columns=names),
            "corr": pd.DataFrame(corr, index=names, columns=names),
            "hessian_pd": pd_ok,
        }

    def fit_advi(self, steps=800, learning_rate=0.05, n_mc=8,
                 rank="full", draws=1000, use_priors=True,
                 static_parameters=(), resample=False, print_report=True,
                 drift_only=False, **solver_kw) -> pd.DataFrame:
        """Variational (ADVI) posterior: fit a Gaussian to the
        log-parameter posterior by reparameterized ELBO ascent through
        the differentiable solve, then return ``draws`` posterior draws
        as a familiar posterior DataFrame (pnames..., chi, rsquared,
        aic) — typically 10-100x fewer solver evaluations than MCMC for
        a near-Gaussian posterior, at the cost of the Gaussian
        approximation (check against :meth:`MCMC` when it matters).

        ``rank='full'`` learns the full log-space covariance (captures
        parameter correlations, like :meth:`laplace_approximation` but
        optimized in KL instead of a mode expansion); ``'diag'`` is
        mean-field. ``use_priors`` defaults True — ADVI targets the SAME
        density the prior-aware samplers walk (samplers/advi.py
        docstring spells out the measure convention). Starts from the
        current parameter values: run :meth:`fit_map` (or adopt an MCMC
        best) first so the ascent starts in the posterior bulk.

        Diagnostics ride on the result: ``df.attrs['advi']`` holds the
        ELBO trace, the variational mean/Cholesky over the free flat
        slots, ``converged``, and ``khat`` — the Pareto-smoothed
        importance-sampling shape diagnostic of the Gaussian
        approximation against the true posterior (same scale as
        PSIS-LOO: khat < 0.7 means the smoothed weights in
        ``df.attrs['advi']['psis_logw']`` reliably correct q's moments;
        above it the approximation is genuinely off — run MCMC).
        ``resample=True`` returns rows importance-RESAMPLED by those
        weights, i.e. draws from the PSIS-corrected posterior rather
        than raw q. Array-valued parameters are supported (zero-template
        entries pinned); static parameters are excluded from the
        variational family. No reference counterpart — the reference's
        only inference engine is random-walk MH
        (``Statistics/Samplers.py:53-174``).
        """
        self._require_deterministic(
            'fit_advi', drift_only,
            hint="Fit the SDE with MCMC(sampler='pmmh'). ")
        from .samplers import advi as _advi
        if rank not in ("full", "diag"):
            raise ValueError(f"rank must be 'full' or 'diag', got {rank!r}")
        theta0 = np.asarray(self._current_theta(), float)
        mask = self._walk_mask(static_parameters)
        if np.any((theta0 <= 0) & (mask != 0)):
            raise ValueError(
                "fit_advi needs positive current values on every free "
                "dimension (the variational family lives in log space); "
                "set parameters or run fit_map first")
        method, _, _, _, substeps = self._solver_args(
            solver_kw, len(self._times_fit) - 1)
        prior_logpdf = None
        if use_priors:
            prior_logpdf = self._prior_logpdf_for(tuple(
                self.parameters[p].jdist
                if self.parameters[p] is not None else None
                for p in self._pnames))

        dtype = jnp.result_type(float)
        res = _advi(
            self._spec, self._obsdata_fit,
            jnp.asarray(self._times_fit, dtype),
            jnp.asarray(self.get_inits(), dtype), theta0,
            steps=steps, learning_rate=learning_rate, n_mc=n_mc,
            full_rank=(rank == "full"), draws=draws,
            walk_mask=mask, prior_logpdf=prior_logpdf,
            use_priors=use_priors, seed=int(self.random_seed),
            method="rk4" if method == "rk4" else "fixed_dopri5",
            substeps=substeps)

        theta = np.asarray(res.theta)
        out = {}
        offsets = self._spec.theta_offsets
        for p, off, shp in zip(self._pnames, offsets, self._spec.pshapes):
            n = int(np.prod(shp)) if shp else 1
            col = theta[:, off:off + n]
            out[p] = list(col.reshape((-1,) + shp)) if shp else col[:, 0]
        df = pd.DataFrame(out)
        df["chi"] = np.asarray(res.chi)
        df["rsquared"] = np.asarray(res.rsquared)
        df["aic"] = np.asarray(res.aic)
        from .samplers.advi import attach_advi_diagnostics
        df, khat = attach_advi_diagnostics(
            df, res, seed=self.random_seed, resample=resample,
            label="ADVI")
        if print_report:
            from .stats import rawstats as _rawstats
            report = ["\nADVI Report (variational posterior)\n"
                      "==================================="]
            for p in self._pnames:
                vals = df[p].to_numpy()
                if self._spec.pshapes[self._pnames.index(p)]:
                    flat = np.stack([np.ravel(np.asarray(v, float))
                                     for v in vals])
                    for j in range(flat.shape[1]):
                        if not np.any(flat[:, j]):
                            continue
                        m, s = _rawstats(flat[:, j])
                        report.append(
                            f"parameter: {p}[{j}]\n\tmedian = "
                            f"{float(m):0.3e}, Standard deviation = "
                            f"{float(s):0.3e}")
                else:
                    m, s = _rawstats(vals.astype(float))
                    report.append(f"parameter: {p}\n\tmedian = "
                                  f"{float(m):0.3e}, Standard deviation = "
                                  f"{float(s):0.3e}")
            report.append(f"\nfinal ELBO = {float(res.elbo[-1]):0.4e}, "
                          f"converged = {bool(res.converged)}, "
                          f"khat = {khat:0.3f} "
                          f"({'reliable' if khat < 0.7 else 'UNRELIABLE'})")
            print("\n".join(report))
        return df

    def profile_likelihood(self, parameter_name, p_range=None, points=21,
                           starts=8, steps=400, learning_rate=0.05,
                           confidence=0.95, use_priors=False,
                           print_report=True, drift_only=False,
                           **solver_kw):
        """Profile-likelihood identifiability analysis for one parameter
        (Raue et al. 2009): fix ``parameter_name`` at each grid value, and
        re-optimize every other parameter by the vmapped multi-start Adam
        of :meth:`fit_map` — ALL grid points x starts in one device batch.

        Returns a dict:

        * ``profile``: DataFrame(value, chi) — the profile curve;
        * ``ci``: (lo, hi) likelihood-ratio confidence interval at
          ``confidence`` (NaN side = not crossed within ``p_range``, i.e.
          the parameter is practically unidentifiable in that direction);
        * ``threshold``: the chi cutoff min(chi) + icdf_chi2(conf, 1)/2
          (chi is negative log-likelihood up to a constant);
        * ``identifiable``: False when the whole profile is flatter than
          the threshold — a structurally unidentifiable direction.

        The reference has no identifiability tooling; its ``gradient()``
        sweep (``Framework.py:1063-1127``) varies one parameter WITHOUT
        re-optimizing the rest, which conflates sloppiness with
        sensitivity.
        """
        self._require_deterministic(
            'profile_likelihood', drift_only,
            hint="Profile the SDE posterior from MCMC(sampler='pmmh') "
                 "draws instead. ")
        from scipy.stats import chi2 as _chi2

        from .samplers import map_fit

        if parameter_name not in self._pnames:
            raise ValueError(f"unknown parameter {parameter_name!r}")
        i = self._pnames.index(parameter_name)
        if any(s for s in self._spec.pshapes):
            raise ValueError("profile_likelihood supports scalar "
                             "parameters only")
        if p_range is None:
            par = self.parameters[parameter_name]
            if par is None or not par.has_distribution():
                raise ValueError(f"give p_range: {parameter_name} has no "
                                 "prior to derive one from")
            d = par.jdist
            lo, hi = float(d.ppf(0.005)), float(d.ppf(0.995))
            if not (np.isfinite(lo) and np.isfinite(hi) and lo > 0):
                raise ValueError(f"could not derive a positive range from "
                                 f"the prior of {parameter_name}; give "
                                 "p_range")
            grid = np.geomspace(lo, hi, int(points))
        else:
            grid = np.asarray(p_range, float)
            if grid.ndim != 1 or len(grid) < 3:
                raise ValueError("p_range must be a 1-D grid of >= 3 "
                                 "values")
        G, S = len(grid), int(starts)

        # starts: LHS prior draws + the current theta, each fixed to the
        # grid value in dimension i; mask freezes that dimension
        ps = self._lhs_samples(max(S - 1, 1))
        th_lhs = np.asarray(self._theta_from_df(ps), float)
        th0 = np.concatenate([th_lhs[:S - 1],
                              np.asarray(self._current_theta(),
                                         float)[None]])
        theta0 = np.tile(th0, (G, 1))                     # (G*S, P)
        theta0[:, i] = np.repeat(grid, S)
        mask = np.ones(self._spec.theta_size)
        mask[self._spec.theta_offsets[i]] = 0.0

        prior_logpdf = None
        if use_priors:
            prior_logpdf = self._prior_logpdf_for(tuple(
                self.parameters[p].jdist
                if self.parameters[p] is not None else None
                for p in self._pnames))

        method, _, _, _, substeps = self._solver_args(
            solver_kw, len(self._times_fit) - 1)
        dtype = jnp.result_type(float)
        res = map_fit(self._spec, self._obsdata_fit,
                      jnp.asarray(self._times_fit, dtype),
                      jnp.asarray(self.get_inits(), dtype),
                      jnp.asarray(theta0, dtype),
                      steps=int(steps), learning_rate=float(learning_rate),
                      walk_mask=jnp.asarray(mask, dtype),
                      prior_logpdf=prior_logpdf, use_priors=use_priors,
                      method="rk4" if method == "rk4" else "fixed_dopri5",
                      substeps=substeps)
        loss = np.asarray(res.loss, float).reshape(G, S)
        loss = np.where(np.isfinite(loss), loss, np.inf)
        prof = loss.min(axis=1)                           # (G,)

        chi_min = float(prof.min())
        delta = float(_chi2.ppf(float(confidence), 1) / 2.0)
        thresh = chi_min + delta

        def crossing(idx_order):
            """Interpolated grid value where the profile crosses thresh,
            walking outward from the minimum; NaN if never crossed.
            A non-finite profile point (every re-optimization start
            diverged there) is NOT a crossing — chi at that value is
            unknown, not known to exceed the threshold — so the side
            stays unbounded/NaN."""
            below = prof <= thresh
            j_min = int(np.argmin(prof))
            prev = j_min
            for j in idx_order:
                if not below[j]:
                    if not np.isfinite(prof[j]):
                        return np.nan
                    # linear interpolation in log-grid space
                    x0, x1 = np.log(grid[prev]), np.log(grid[j])
                    y0, y1 = prof[prev], prof[j]
                    t = (thresh - y0) / max(y1 - y0, 1e-300)
                    return float(np.exp(x0 + t * (x1 - x0)))
                prev = j
            return np.nan

        j_min = int(np.argmin(prof))
        lo_ci = crossing(range(j_min, -1, -1))
        hi_ci = crossing(range(j_min, G))
        identifiable = bool(np.nanmax(prof[np.isfinite(prof)])
                            > thresh) if np.isfinite(prof).any() else False
        out = {
            "profile": pd.DataFrame({"value": grid, "chi": prof}),
            "ci": (lo_ci, hi_ci),
            "threshold": thresh,
            "identifiable": identifiable,
        }
        if print_report:
            fmt = lambda v: "unbounded" if not np.isfinite(v) \
                else f"{v:0.4g}"  # noqa: E731
            print(f"profile likelihood [{parameter_name}]: min chi "
                  f"{chi_min:0.4g}, {int(confidence * 100)}% CI "
                  f"[{fmt(lo_ci)}, {fmt(hi_ci)}]"
                  + ("" if identifiable else
                     "  — FLAT PROFILE: practically unidentifiable over "
                     "this range"))
        return out

    def model_evidence(self, particles=1024, n_moves=5, ess_target=0.5,
                       static_parameters=(), print_report=True,
                       drift_only=False, **solver_kw):
        """Log model evidence (marginal likelihood) + posterior particles
        via tempered Sequential Monte Carlo (samplers/smc.py).

        Anneals ``particles`` LHS prior draws from the prior to the
        posterior with an ESS-adaptive temperature ladder; every stage's
        rejuvenation sweeps are vmapped batches of ODE solves with
        covariance-adapted proposals. Returns a dict with:

        * ``log_evidence``: log of ``∫ exp(-chi) * prior`` — the Bayes
          normalizer of the same unnormalized posterior :meth:`MCMC`
          samples. The Bayes factor between two models of the SAME data is
          ``exp(logZ_a - logZ_b)`` (a full-posterior comparison; the
          reference can only rank point fits by AIC, ``stats.py:44-47``);
        * ``posterior``: equal-weight particle DataFrame (pnames..., chi,
          rsquared, aic);
        * ``betas`` / ``acceptance``: the adaptive schedule and per-stage
          mutation acceptance rates.

        Every non-static parameter must carry a prior distribution —
        evidence is undefined without one.
        """
        self._require_deterministic(
            'model_evidence', drift_only,
            hint="SMC evidence over a particle-filter likelihood (SMC^2) "
                 "is not implemented. ")
        from .samplers.smc import smc_sample

        static_parameters = list(static_parameters)
        jdists = tuple(self.parameters[p].jdist
                       if (self.parameters[p] is not None
                           and self.parameters[p].has_distribution()
                           and p not in static_parameters) else None
                       for p in self._pnames)
        free_missing = [p for p, d in zip(self._pnames, jdists)
                        if d is None and p not in static_parameters]
        if free_missing:
            raise ValueError(
                f"model_evidence requires a prior on every free parameter; "
                f"missing: {free_missing} (declare them static via "
                f"static_parameters=... to hold them fixed)")
        prior_logpdf = self._prior_logpdf_for(jdists)

        offsets = self._spec.theta_offsets
        mask = np.zeros(self._spec.theta_size)
        for i, (p, d) in enumerate(zip(self._pnames, jdists)):
            shp = self._spec.pshapes[i]
            n = int(np.prod(shp)) if shp else 1
            if d is not None:
                mask[offsets[i]:offsets[i] + n] = 1.0
        # zero-template entries of array parameters are pinned at 0
        # (never walked, masked out of the prior)
        mask = self._pin_zero_templates(mask)
        ps = self._lhs_samples(particles)
        theta0 = np.array(self._theta_from_df(ps), float)  # writable copy
        # static parameters (and any dim without a prior) are CONDITIONED
        # on, not marginalized: pin them to the current values so the
        # returned evidence matches the docstring's "hold them fixed"
        cur = np.asarray(self._current_theta(), float)
        pin = mask == 0.0
        theta0[:, pin] = cur[pin]
        method, rtol, atol, max_steps, substeps = self._solver_args(
            solver_kw, len(self._times_fit) - 1)
        dtype = jnp.result_type(float)
        out = smc_sample(
            self._spec, self._obsdata_fit,
            jnp.asarray(self._times_fit, dtype),
            jnp.asarray(self.get_inits(), dtype),
            jnp.asarray(theta0, dtype),
            jax.random.PRNGKey(self.random_seed),
            prior_logpdf=prior_logpdf, n_moves=int(n_moves),
            ess_target=float(ess_target),
            walk_mask=jnp.asarray(mask, dtype),
            method=method, rtol=rtol, atol=atol, max_steps=max_steps,
            substeps=substeps)
        theta = np.asarray(out.theta)
        cols = {}
        for p, off, shp in zip(self._pnames, offsets, self._spec.pshapes):
            n = int(np.prod(shp)) if shp else 1
            col = theta[:, off:off + n]
            cols[p] = list(col.reshape((-1,) + shp)) if shp else col[:, 0]
        df = pd.DataFrame(cols)
        df["chi"] = np.asarray(out.chi)
        df["rsquared"] = np.asarray(out.rsquared)
        df["aic"] = np.asarray(out.aic)
        if print_report:
            print(f"SMC evidence: logZ = {out.log_evidence:.3f} over "
                  f"{len(out.betas) - 1} stages "
                  f"(mean mutation acceptance "
                  f"{float(np.mean(out.acceptance)):.3f})")
        return {"log_evidence": out.log_evidence, "posterior": df,
                "betas": out.betas, "acceptance": out.acceptance}

    def _posterior_logpred(self, posterior, n_draws, solver_kw,
                           stochastic=None):
        """Subsample posterior rows and re-integrate them as one vmapped
        batch: (S, N) log predictions at the observation points (shared by
        information_criteria and posterior_predictive).

        ``stochastic=None``: simulate one SDE path per draw when the model
        has a diffusion (predictive replications must include process
        noise); ``False`` forces the deterministic drift solve."""
        pnames = list(self.get_pnames())
        rows = posterior.dropna(subset=pnames)
        if len(rows) == 0:
            raise ValueError("posterior has no complete parameter rows")
        if len(rows) > n_draws:
            rows = rows.sample(int(n_draws), random_state=self.random_seed)
        thetas = np.asarray(self._theta_from_df(rows[pnames]))
        method, rtol, atol, max_steps, substeps = self._solver_args(
            solver_kw, len(self._times_fit) - 1)
        dtype = jnp.result_type(float)
        if stochastic is None:
            stochastic = self._spec.diffusion is not None
        if stochastic:
            base = jax.random.PRNGKey(self.random_seed)
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                jnp.arange(len(thetas)))
            sde_sub = substeps if isinstance(substeps, int) else 4
            return np.asarray(_logpred_sde_jit(
                self._spec, self._obsdata_fit,
                jnp.asarray(self._times_fit, dtype),
                jnp.asarray(self.get_inits(), dtype),
                jnp.asarray(thetas, dtype), keys, sde_sub, "euler"))
        return np.asarray(_logpred_jit(
            self._spec, self._obsdata_fit,
            jnp.asarray(self._times_fit, dtype),
            jnp.asarray(self.get_inits(), dtype),
            jnp.asarray(thetas, dtype),
            method, rtol, atol, max_steps, substeps))

    def _pointwise_loglik(self, logpred):
        """(draws, obs) EXACT pointwise log-likelihood matrix (constants
        included — WAIC/LOO need true densities, unlike the samplers'
        constant-free chi) under the framework's observation model, plus
        the valid-observation mask. ``logpred``: (draws, obs) log
        predictions at the observation points."""
        from scipy.special import gammaln

        obs = self._obsdata_fit_host
        m = self._spec.obs_model
        nu_or_r = self._spec.obs_param
        S_ = np.asarray(obs.log_sigma, np.float64)
        if m in ("poisson", "negbinom"):
            O = np.asarray(obs.abundance, np.float64)
            valid = np.isfinite(O)
            with np.errstate(over="ignore"):
                lam = np.exp(logpred)
            if m == "poisson":
                ll = (O[None, :] * logpred - lam
                      - gammaln(O + 1.0)[None, :])
            else:
                r = nu_or_r
                ll = (gammaln(O + r) - gammaln(r) - gammaln(O + 1.0)
                      )[None, :] \
                    + r * np.log(r / (r + lam)) \
                    + O[None, :] * (logpred - np.log(r + lam))
            return ll, valid
        O = np.asarray(obs.log_abundance, np.float64)
        valid = np.isfinite(O)
        t = (O[None, :] - logpred) / S_[None, :]
        if m == "student_t":
            nu = nu_or_r
            ll = (gammaln((nu + 1.0) / 2.0) - gammaln(nu / 2.0)
                  - 0.5 * np.log(nu * np.pi) - np.log(S_[None, :])
                  - 0.5 * (nu + 1.0) * np.log1p(t * t / nu))
        else:
            ll = (-0.5 * t * t - np.log(S_[None, :])
                  - 0.5 * np.log(2.0 * np.pi))
        return ll, valid

    def information_criteria(self, posterior, n_draws=400,
                             print_report=True, **solver_kw):
        """WAIC and PSIS-LOO predictive model comparison from an MCMC (or
        SMC) posterior DataFrame (utils/model_comparison.py).

        Subsamples ``n_draws`` posterior rows, re-integrates them as one
        vmapped device batch to get per-observation log predictions, and
        reduces the pointwise log-likelihood matrix to:

        * ``waic`` dict: elpd_waic, p_waic, waic, se_elpd_waic;
        * ``loo`` dict: elpd_loo, p_loo, looic, se_elpd_loo, per-point
          Pareto ``khat`` (k > 0.7 marks observations whose influence
          makes the LOO estimate unreliable), n_bad_khat.

        These are full-posterior criteria; the reference's AIC ranks a
        single best fit only (``stats.py:44-47``). Compare models fitted
        to the same data by ``elpd_loo`` (higher is better), e.g. via
        :func:`odelib_tpu.utils.model_comparison.compare`.
        """
        from .utils import model_comparison as _mc

        if self._spec.diffusion is not None:
            warnings.warn(
                "information_criteria on a stochastic model uses the "
                "drift-only (deterministic) predictions: a single path's "
                "pointwise density is not the filtering marginal "
                "likelihood. Treat WAIC/LOO as approximate here.")
        logpred = self._posterior_logpred(posterior, n_draws, solver_kw,
                                          stochastic=False)
        ll, valid = self._pointwise_loglik(logpred)
        ll = ll[:, valid]
        finite_rows = np.all(np.isfinite(ll), axis=1)
        if not finite_rows.all():
            warnings.warn(f"dropping {int((~finite_rows).sum())} posterior "
                          "draws with failed integrations from the "
                          "log-likelihood matrix")
            ll = ll[finite_rows]
        if len(ll) < 20:
            raise ValueError(f"only {len(ll)} finite posterior draws — too "
                             "few for WAIC/LOO")
        w = _mc.waic(ll)
        lo = _mc.psis_loo(ll)
        if print_report:
            print(f"WAIC: elpd = {w['elpd_waic']:.2f} "
                  f"(se {w['se_elpd_waic']:.2f}), p_waic = "
                  f"{w['p_waic']:.2f}")
            print(f"PSIS-LOO: elpd = {lo['elpd_loo']:.2f} "
                  f"(se {lo['se_elpd_loo']:.2f}), p_loo = "
                  f"{lo['p_loo']:.2f}, bad khat: {lo['n_bad_khat']}"
                  f"/{ll.shape[1]}")
        return {"waic": w, "loo": lo, "n_draws": int(len(ll)),
                "n_obs": int(ll.shape[1])}

    def posterior_predictive(self, posterior, n_draws=200, ci=0.9,
                             print_report=True, **solver_kw):
        """Posterior predictive check: simulate replicated observations
        from ``n_draws`` posterior rows (vmapped solves + lognormal
        observation noise at each point's ``log_sigma``) and compare the
        data against the predictive distribution.

        Returns a dict:

        * ``summary``: per-observation DataFrame (organism, time,
          observed log-abundance, predictive median/lo/hi at the ``ci``
          level, and ``covered``);
        * ``coverage``: fraction of observations inside their predictive
          interval — should be near ``ci`` for a well-specified model
          (systematically below = model misfit or underestimated sigma);
        * ``samples``: the (draws, obs) matrix of simulated log
          abundances, for custom checks.

        The reference's closest tool is the visual ``plot_uncertainty``
        envelope (``Framework.py:734-740``), which overlays trajectories
        but never quantifies coverage.

        Stochastic models (``diffusion=``): each draw is replicated along
        one fresh SDE sample path, so the predictive intervals include
        the process noise, not just the observation noise.
        """
        logpred = self._posterior_logpred(posterior, n_draws, solver_kw)
        return self._predictive_summary(logpred, ci, print_report,
                                        "posterior predictive")

    def prior_predictive(self, samples=200, ci=0.9, print_report=True,
                         **solver_kw):
        """Prior predictive check: simulate replicated observations from
        ``samples`` LHS prior draws (vmapped solves + lognormal noise at
        each point's ``log_sigma``) and compare the data against the
        prior predictive distribution — the standard pre-fit sanity step
        of the Bayesian workflow (coverage far below ``ci`` means the
        priors cannot generate the data; near 1.0 with huge intervals
        means they are uninformatively wide). Same return shape as
        :meth:`posterior_predictive`. No reference counterpart — its
        closest tool is eyeballing ``parameter.get_figure`` histograms
        (``/root/reference/ODElib/Framework.py:141-153``)."""
        draws = self._lhs_samples(int(samples))
        logpred = self._posterior_logpred(draws, int(samples), solver_kw)
        return self._predictive_summary(logpred, ci, print_report,
                                        "prior predictive")

    def _predictive_summary(self, logpred, ci, print_report, label):
        """Shared coverage summary for prior/posterior predictive checks:
        add observation noise FROM THE FRAMEWORK'S OBSERVATION MODEL, form
        per-point CIs, report coverage. Log-space models compare in log
        abundance (column ``log_abundance``); count models simulate counts
        and compare in linear space (column ``abundance``)."""
        obs = self._obsdata_fit_host
        Sg = np.asarray(obs.log_sigma, float)
        rng = np.random.default_rng(self.random_seed)
        m = self._spec.obs_model
        if m in ("poisson", "negbinom"):
            O = np.asarray(obs.abundance, float)
            with np.errstate(over="ignore"):
                lam = np.exp(logpred)
            lam_ok = np.isfinite(lam)
            # counts overflow int64 well before float lam does — such
            # points are masked back to NaN below anyway
            lam_s = np.clip(np.where(lam_ok, lam, 0.0), 0.0, 1e15)
            if m == "poisson":
                sims = rng.poisson(lam_s).astype(float)
            else:
                r = self._spec.obs_param
                sims = rng.poisson(rng.gamma(r, lam_s / r)).astype(float)
            sims = np.where(lam_ok, sims, np.nan)
            value_col = "abundance"
        else:
            O = np.asarray(obs.log_abundance, float)
            if m == "student_t":
                eps = rng.standard_t(self._spec.obs_param, logpred.shape)
            else:
                eps = rng.normal(0.0, 1.0, logpred.shape)
            sims = logpred + Sg[None, :] * eps
            value_col = "log_abundance"
        alpha = (1.0 - float(ci)) / 2.0
        lo = np.nanquantile(sims, alpha, axis=0)
        hi = np.nanquantile(sims, 1.0 - alpha, axis=0)
        med = np.nanmedian(sims, axis=0)
        covered = (O >= lo) & (O <= hi)
        valid = np.isfinite(O)
        snames = list(self._spec.post_snames)
        sidx = np.asarray(obs.state_index, int)
        times = np.asarray(self._times_fit, float)
        tidx = np.asarray(obs.t_index, int)
        summary = pd.DataFrame({
            "organism": [snames[i] for i in sidx],
            "time": times[tidx],
            value_col: O,
            "pred_median": med, "pred_lo": lo, "pred_hi": hi,
            "covered": covered,
        }).loc[valid]
        coverage = float(covered[valid].mean())
        if print_report:
            print(f"{label}: {coverage:.1%} of observations "
                  f"inside the {int(ci * 100)}% interval "
                  f"({int(covered[valid].sum())}/{int(valid.sum())})")
        return {"summary": summary.reset_index(drop=True),
                "coverage": coverage, "samples": sims}

    def diagnostics(self, posteriors) -> pd.DataFrame:
        """Convergence diagnostics for an MCMC posterior: per-parameter
        mean/std/median, effective sample size (FFT autocovariance, Geyer
        truncation), and split-chain R-hat.

        New capability over the reference (it ships no convergence tooling;
        users eyeball trace plots, demo cells 36-38). ``posteriors`` is any
        DataFrame with the framework's ``chain#`` column convention —
        typically the return value of :meth:`MCMC`.
        """
        from .utils.diagnostics import summarize
        return summarize(posteriors, list(self.get_pnames()))

    def sbc(self, reps=128, iterations_per_chain=2000, thin=10, bins=16,
            rwalk_std=0.05, burnin=None, static_parameters=(),
            print_report=True, drift_only=False, **solver_kw) -> dict:
        """Simulation-based calibration of the WHOLE inference pipeline
        (Talts et al. 2018): for each of ``reps`` replications, draw true
        parameters from the priors, simulate data with this framework's
        own observation design and noise model, run an MH chain on the
        synthetic data, and rank the truth among the thinned posterior
        draws. Uniform ranks certify solver + likelihood + sampler + RNG
        jointly; a U shape flags underdispersion, a slope flags bias.
        All replications run as ONE vmapped device program
        (utils/sbc.py, incl. the prior-measure note).

        Returns a dict: ``ranks`` (DataFrame, one column per prior
        parameter/slot), ``pvalues`` (chi-square uniformity per column),
        ``n_draws`` (rank denominator M), ``n_valid`` (replications whose
        synthetic solve stayed finite), ``calibrated`` (every p > 0.01).
        The reference ships zero tests of its inference loop (SURVEY §4);
        this is the statistical test a user runs before trusting a fit.
        """
        self._require_deterministic(
            'sbc', drift_only,
            hint="Calibration of the stochastic pipeline would need "
                 "per-replication PMMH (data-dependent filters). ")
        from .utils.sbc import rank_uniformity_pvalue, sbc_ranks

        offsets = self._spec.theta_offsets
        dists = [None] * self._spec.theta_size
        labels = {}
        for i, p in enumerate(self._pnames):
            par = self.parameters[p]
            if par is None or not par.has_distribution() \
                    or p in static_parameters:
                continue
            shp = self._spec.pshapes[i]
            if shp:
                tmpl = np.ravel(np.asarray(par.val, float))
                for k in range(tmpl.size):
                    if tmpl[k] != 0:
                        dists[offsets[i] + k] = par.jdist
                        labels[offsets[i] + k] = f"{p}[{k}]"
            else:
                dists[offsets[i]] = par.jdist
                labels[offsets[i]] = p
        if not labels:
            raise ValueError("sbc needs at least one parameter with a "
                             "prior distribution")
        method, _, _, _, substeps = self._solver_args(
            solver_kw, len(self._times_fit) - 1)
        res = sbc_ranks(
            self._spec, self._obsdata_fit, self._times_fit,
            self.get_inits(), tuple(dists),
            np.asarray(self._current_theta(), float), reps=int(reps),
            nits=int(iterations_per_chain), burnin=burnin, thin=int(thin),
            rwalk_std=float(rwalk_std), seed=int(self.random_seed),
            method="rk4" if method == "rk4" else "fixed_dopri5",
            substeps=substeps)
        valid = np.asarray(res.valid, bool)
        cols = {lab: res.ranks[valid, j] for j, lab in labels.items()}
        ranks_df = pd.DataFrame(cols)
        pvalues = {lab: rank_uniformity_pvalue(ranks_df[lab], res.n_draws,
                                               bins=bins)
                   for lab in ranks_df}
        out = {"ranks": ranks_df, "pvalues": pvalues,
               "n_draws": int(res.n_draws), "n_valid": int(valid.sum()),
               "reps": int(reps),
               "mean_acceptance": float(np.mean(res.acceptance[valid]))
               if valid.any() else float("nan"),
               "calibrated": bool(all(p > 0.01 for p in pvalues.values()))}
        if int(valid.sum()) < reps:
            warnings.warn(
                f"sbc: {reps - int(valid.sum())}/{reps} replications had "
                "non-finite synthetic solves and were dropped — prior "
                "mass is escaping the solver's stable region")
        if print_report:
            lines = ["\nSBC Report (rank-uniformity of the pipeline)\n"
                     "============================================",
                     f"replications: {int(valid.sum())}/{int(reps)} valid, "
                     f"M = {int(res.n_draws)} draws/rank, mean acceptance "
                     f"{out['mean_acceptance']:.3f}"]
            for lab, p in pvalues.items():
                flag = "ok" if p > 0.01 else "MISCALIBRATED"
                lines.append(f"\t{lab}: uniformity p = {p:0.3f}  [{flag}]")
            print("\n".join(lines))
        return out

    def power_scale_sensitivity(self, posterior, alphas=(0.8, 1.25),
                                threshold=0.05, print_report=True):
        """Prior/likelihood power-scaling sensitivity of a FITTED
        posterior (Kallioinen et al. 2023) — post-hoc, no refitting:
        the existing draws are PSIS-reweighted to ``prior^a`` and
        ``lik^a`` perturbations and each parameter's normalized
        distribution shift is recorded (utils/sensitivity.py —
        including the diagnosis table: likelihood-sensitive only is the
        healthy case; prior-only means the prior dominates; both means
        prior-data CONFLICT). ``posterior``: a DataFrame from
        :meth:`MCMC`/:meth:`fit_advi` with the parameter and ``chi``
        columns. Requires at least one parameter with a prior, and the
        posterior should come from a PRIOR-AWARE run (``use_priors=
        True``) — the perturbation algebra assumes the draws target
        ``lik * prior``. No reference counterpart."""
        from .utils.sensitivity import power_scale_sensitivity as _ps

        if self._spec.diffusion is not None:
            warnings.warn(
                "power_scale_sensitivity on a PMMH posterior reweights "
                "by the particle filter's NOISY log-likelihood estimate "
                "(the chi column): the power-scaled shifts are "
                "approximate — treat flags near the threshold with "
                "caution.")
        jdists = tuple(self.parameters[p].jdist
                       if self.parameters[p] is not None else None
                       for p in self._pnames)
        if all(d is None for d in jdists):
            raise ValueError("power_scale_sensitivity needs at least one "
                             "parameter with a prior distribution")
        finite = posterior[np.isfinite(posterior["chi"].astype(float))]
        thetas = np.asarray(self._theta_from_df(finite), float)
        chi = finite["chi"].to_numpy(float)
        # per-PARAMETER prior factors (selective scaling — see
        # utils/sensitivity.py): dimension j's prior sensitivity scales
        # only the prior of the parameter owning slot j
        spec = self._spec
        masks = (self._prior_nonzero_masks()
                 if any(s for s in spec.pshapes)
                 else (None,) * len(jdists))

        def prior_parts(theta):
            ps_ = spec.unpack_theta(theta)
            outs = []
            for d, v, mk in zip(jdists, ps_, masks):
                if d is None:
                    outs.append(jnp.zeros((), theta.dtype))
                    continue
                lp = d.logpdf(v)
                if mk is not None:
                    keep_m = jnp.asarray(mk, bool).reshape(jnp.shape(v))
                    lp = jnp.where(keep_m, lp, 0.0)
                outs.append(jnp.sum(lp))
            return jnp.stack(outs)

        parts = np.asarray(jax.vmap(prior_parts)(jnp.asarray(thetas)))
        # expand per-parameter columns to per-SLOT columns
        slot_cols = []
        for i, p in enumerate(self._pnames):
            shp = spec.pshapes[i]
            n = int(np.prod(shp)) if shp else 1
            slot_cols += [parts[:, i]] * n
        log_prior = np.stack(slot_cols, axis=1)

        labels = []
        for i, p in enumerate(self._pnames):
            shp = self._spec.pshapes[i]
            if shp:
                labels += [f"{p}[{k}]"
                           for k in range(int(np.prod(shp)))]
            else:
                labels.append(p)
        # keep slots that move and stay positive (log-space diagnostic);
        # pinned zero-template entries and static params drop out
        keep = [j for j in range(thetas.shape[1])
                if np.ptp(thetas[:, j]) > 0 and np.all(thetas[:, j] > 0)]
        if not keep:
            raise ValueError("no varying positive parameter slots in the "
                             "posterior")
        df = _ps(np.log(thetas[:, keep]), -chi, log_prior[:, keep],
                 alphas=tuple(alphas), threshold=float(threshold),
                 labels=[labels[j] for j in keep])
        if print_report:
            lines = ["\nPower-scaling sensitivity (prior | likelihood)\n"
                     "=============================================="]
            for _, r in df.iterrows():
                lines.append(
                    f"\t{r['parameter']}: prior {r['prior_sens']:0.3f}, "
                    f"likelihood {r['lik_sens']:0.3f}  [{r['diagnosis']}]")
            lines.append(f"(threshold {threshold}; khat max "
                         f"{df['khat'].max():0.2f} — reweighting reliable "
                         f"below 0.7)")
            print("\n".join(lines))
        return df

    def sobol_sensitivity(self, samples=512, target="chi", n_boot=200,
                          print_report=True, drift_only=False,
                          **solver_kw) -> pd.DataFrame:
        """Variance-based global sensitivity over the priors: first-order
        (S1) and total-order (ST) Sobol indices per parameter, with
        bootstrap standard errors (utils/sensitivity.py).

        ``target`` selects the scalar output: ``'chi'`` (goodness of fit
        against the data), a post-summation state name (its final-time
        value), or ``('log', state_name)`` for the log of that value.
        Runs the Saltelli design — ``samples * (P + 2)`` ODE solves — as
        ONE vmapped device batch. Parameters without a prior distribution
        stay at their current value and get index 0 by construction.

        The reference's closest tool is the serial one-at-a-time
        ``gradient()`` sweep (``Framework.py:1063-1127``); ST - S1 > 0
        here quantifies the interactions such sweeps cannot see.
        """
        self._require_deterministic(
            'sobol_sensitivity', drift_only,
            hint="Sensitivity targets are drift statistics. ")
        from .utils import sensitivity as _sens

        # one Sobol dimension per FLAT theta slot with a prior: scalars
        # directly; array parameters one dimension per non-zero template
        # entry, labeled "<p>[k]" (the reference's non-zero-entry
        # convention, Samplers.py:31-32)
        free = []
        offsets = self._spec.theta_offsets
        for i, p in enumerate(self._pnames):
            par = self.parameters[p]
            if par is None or not par.has_distribution():
                continue
            shp = self._spec.pshapes[i]
            if shp:
                tmpl = np.ravel(np.asarray(par.val, float))
                free.extend((offsets[i] + k, f"{p}[{k}]", par.jdist)
                            for k in range(tmpl.size) if tmpl[k] != 0)
            else:
                free.append((offsets[i], p, par.jdist))
        if len(free) < 2:
            raise ValueError("sobol_sensitivity needs >= 2 parameters "
                             "with prior distributions")
        if target == "chi":
            tgt = ("chi",)
        else:
            if isinstance(target, tuple) and target[0] == "log":
                kind, sname = "log_state", target[1]
            else:
                kind, sname = "state", target
            if sname not in self._spec.post_snames:
                raise ValueError(f"unknown state {sname!r}; have "
                                 f"{self._spec.post_snames}")
            tgt = (kind, self._spec.post_snames.index(sname))

        key = jax.random.PRNGKey(self.random_seed ^ 0x50B01)
        design, N, P = _sens.saltelli_design(
            key, [d for _, _, d in free], int(samples))
        # scatter design columns into full theta rows
        base = np.asarray(self._current_theta(), float)
        thetas = np.tile(base, (design.shape[0], 1))
        for col, (i, _, _) in enumerate(free):
            thetas[:, i] = np.asarray(design[:, col])

        method, rtol, atol, max_steps, substeps = self._solver_args(
            solver_kw, len(self._times_fit) - 1)
        dtype = jnp.result_type(float)
        f = np.asarray(_sens._eval_target(
            self._spec, self._obsdata_fit,
            jnp.asarray(self._times_fit, dtype),
            jnp.asarray(self.get_inits(), dtype),
            jnp.asarray(thetas, dtype), target=tgt,
            num_params=len(self._pnames), method=method, rtol=rtol,
            atol=atol, max_steps=max_steps, substeps=substeps))
        fA, fB = f[:N], f[N:2 * N]
        fAB = f[2 * N:].reshape(P, N)
        res = _sens.sobol_indices(fA, fB, fAB, n_boot=int(n_boot),
                                  seed=self.random_seed)
        out = pd.DataFrame(
            {"S1": res["S1"], "S1_se": res["S1_se"],
             "ST": res["ST"], "ST_se": res["ST_se"]},
            index=[p for _, p, _ in free])
        if print_report:
            t = target if isinstance(target, str) else "/".join(
                map(str, target))
            print(f"Sobol indices on {t} "
                  f"({res['n_effective']}/{N} finite samples):")
            print(out.round(3).to_string())
        return out

    def local_sensitivity(self, parameters=None, log_scale=True,
                          drift_only=False, **solver_kw):
        """Time-resolved local sensitivities d state / d (log) parameter
        along the current trajectory, by forward-mode AD through the
        solve: ``{state_name: DataFrame(index=times, columns=labels)}``.
        Scalar parameters give one column each; array parameters one
        column per non-zero template entry, labeled ``"<p>[k]"`` (the
        reference's non-zero-entry convention, ``Samplers.py:31-32``).
        (utils/sensitivity.py.)
        """
        self._require_deterministic(
            'local_sensitivity', drift_only,
            hint="Sensitivities are along the drift trajectory. ")
        from .utils import sensitivity as _sens

        if parameters is None:
            theta = self._current_theta()
        else:
            theta = self._spec.pack_theta(list(parameters))
        method, rtol, atol, max_steps, substeps = self._solver_args(
            solver_kw, len(self._times_fit) - 1)
        dtype = jnp.result_type(float)
        J = np.asarray(_sens.local_sensitivity(
            self._spec, jnp.asarray(theta, dtype),
            jnp.asarray(self.get_inits(), dtype),
            jnp.asarray(self._times_fit, dtype),
            log_scale=bool(log_scale),
            method="rk4" if method == "rk4" else "fixed_dopri5",
            rtol=rtol, atol=atol, max_steps=max_steps,
            substeps=substeps))
        offsets = self._spec.theta_offsets
        keep, labels = [], []
        for i, p in enumerate(self._pnames):
            shp = self._spec.pshapes[i]
            if not shp:
                keep.append(offsets[i])
                labels.append(p)
                continue
            par = self.parameters[p]
            tmpl = np.ravel(np.asarray(
                par.val if par is not None else np.ones(shp), float))
            for k in range(tmpl.size):
                if tmpl[k] != 0:
                    keep.append(offsets[i] + k)
                    labels.append(f"{p}[{k}]")
        return {s: pd.DataFrame(J[:, i, keep], index=self._times_fit,
                                columns=labels)
                for i, s in enumerate(self._spec.post_snames)}

