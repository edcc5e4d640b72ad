"""User-facing joint multi-experiment fitting (see samplers/joint.py).

``JointFit`` ties named parameters across several ``ModelFramework``
instances (same or different models, each with its own data) and samples
the joint posterior with all experiments fused into one device program.
No reference counterpart: ``ODElib`` binds one DataFrame per framework
and its only cross-dataset tool is averaging replicate columns
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

    Joint layout: ``[shared..., <name>:<p> for each experiment's free
    parameters...]``; posterior columns use the same naming. Priors for
    shared parameters come from the FIRST framework.
    """

    def __init__(self, frameworks, shared, random_seed=0):
        if not isinstance(frameworks, dict):
            frameworks = {f"exp{i}": f for i, f in enumerate(frameworks)}
        if len(frameworks) < 2:
            raise ValueError("JointFit needs at least two experiments")
        self.frameworks = dict(frameworks)
        self.shared = list(shared)
        self.random_seed = random_seed
        names = list(self.frameworks)
        for nm, fw in self.frameworks.items():
            if fw.df is None:
                raise ValueError(f"experiment {nm!r} has no data")
            if any(s for s in fw._spec.pshapes):
                raise ValueError("JointFit supports scalar parameters only")
            missing = [p for p in self.shared if p not in fw._pnames]
            if missing:
                raise ValueError(f"experiment {nm!r} lacks shared "
                                 f"parameter(s) {missing}")
        # joint layout
        self.columns = list(self.shared)
        self._idx_maps = {}
        for nm in names:
            fw = self.frameworks[nm]
            idx = []
            for p in fw._pnames:
                if p in self.shared:
                    idx.append(self.shared.index(p))
                else:
                    self.columns.append(f"{nm}:{p}")
                    idx.append(len(self.columns) - 1)
            self._idx_maps[nm] = tuple(idx)
        self.dim = len(self.columns)

    def _dists(self):
        """Prior distribution (or None) per joint dimension."""
        out = [None] * self.dim
        first = next(iter(self.frameworks.values()))
        for j, p in enumerate(self.shared):
            par = first.parameters[p]
            if par is not None and par.has_distribution():
                out[j] = par.jdist
        for nm, fw in self.frameworks.items():
            for p, j in zip(fw._pnames, self._idx_maps[nm]):
                if p in self.shared:
                    continue
                par = fw.parameters[p]
                if par is not None and par.has_distribution():
                    out[j] = par.jdist
        return out

    def _current_joint_theta(self):
        th = np.zeros(self.dim)
        first = next(iter(self.frameworks.values()))
        for nm, fw in self.frameworks.items():
            t = np.asarray(fw._current_theta(), float)
            for p, j in zip(fw._pnames, self._idx_maps[nm]):
                th[j] = t[list(fw._pnames).index(p)]
        for j, p in enumerate(self.shared):
            th[j] = float(np.asarray(first.parameters[p].val
                                     if first.parameters[p] is not None
                                     else th[j]))
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
        df = pd.DataFrame(thetas, columns=self.columns)
        df["chi"] = np.where(np.isfinite(chis), chis, np.nan)
        return df

    def MCMC(self, chain_inits=32, iterations_per_chain=1000,
             fitsurvey_samples=1000, use_priors=False, rwalk_std=0.05,
             burnin=None, static_parameters=(), print_report=True,
             **solver_kw) -> pd.DataFrame:
        """Joint MCMC posterior over all experiments.

        Chains seed from the best ``chain_inits`` of ``fitsurvey_samples``
        LHS prior draws (sampled with replacement, weighted toward low
        chi). Returns a DataFrame with the joint columns plus total
        ``chi``, per-experiment ``chi:<name>``, ``iteration``,
        ``acceptance_ratio`` and ``chain#`` — the familiar posterior
        shape, one row per recorded joint sample.
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
        theta0 = rows[self.columns].to_numpy(float)

        mask = np.ones(self.dim)
        for p in static_parameters:
            if p not in self.columns:
                raise ValueError(f"unknown static parameter {p!r} "
                                 f"(joint columns: {self.columns})")
            mask[self.columns.index(p)] = 0.0

        prior_logpdf = None
        if use_priors:
            dists = self._dists()

            def prior_logpdf(theta):
                tot = 0.0
                for j, d in enumerate(dists):
                    if d is not None:
                        tot = tot + d.logpdf(theta[j])
                return tot

        specs, idxs, obs, times, y0s, method, subs = \
            self._device_args(solver_kw)
        dtype = jnp.result_type(float)
        base_key = jax.random.PRNGKey(self.random_seed)
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
            jnp.arange(n_chains))
        out = joint_metropolis_hastings(
            specs, idxs, obs, times, y0s,
            jnp.asarray(theta0, dtype), keys,
            nits=nits, burnin=int(burnin),
            walk_mask=jnp.asarray(mask, dtype),
            rwalk_std=float(rwalk_std), prior_logpdf=prior_logpdf,
            use_priors=bool(use_priors), method=method,
            substeps_list=subs)

        theta = np.asarray(out.theta)        # (C, R, D)
        C, R, D = theta.shape
        names = list(self.frameworks)
        frames = []
        for c in range(C):
            df = pd.DataFrame(theta[c], columns=self.columns)
            df["chi"] = np.asarray(out.chi[c])
            for k, nm in enumerate(names):
                df[f"chi:{nm}"] = np.asarray(out.chi_parts[c, :, k])
            df["iteration"] = np.asarray(out.iteration)
            df["acceptance_ratio"] = np.asarray(out.acceptance_ratio[c])
            df["chain#"] = c
            frames.append(df)
        posterior = pd.concat(frames, ignore_index=True)

        if print_report:
            report = ["\nJoint Fitting Report\n===================="]
            for col in self.columns:
                median, std = rawstats(posterior[col].to_numpy())
                report.append(f"parameter: {col}\n\tmedian = "
                              f"{float(median):0.3e}, Standard deviation "
                              f"= {float(std):0.3e}")
            best = posterior.loc[posterior["chi"].idxmin()]
            report.append("\nBest joint sample:")
            report.append("\tChi = {:0.3e} ({})".format(
                best["chi"], ", ".join(
                    f"chi:{nm} = {best[f'chi:{nm}']:0.3e}"
                    for nm in names)))
            print("\n".join(report))
        return posterior

    def set_best_params(self, posterior):
        """Push the min-chi joint sample back into every framework."""
        best = posterior.loc[posterior["chi"].idxmin()]
        for nm, fw in self.frameworks.items():
            vals = {}
            for p, j in zip(fw._pnames, self._idx_maps[nm]):
                vals[p] = float(best[self.columns[j]])
            fw.set_parameters(**vals)
        return best
