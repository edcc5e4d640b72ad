"""The stochastic feature matrix (VERDICT r3 push item 2).

Every public ModelFramework method, called on a model built with
``diffusion=``, must either SUPPORT process noise or refuse LOUDLY
(raise with an informative message, or warn that it is running
drift-only) — never silently fit/analyze the drift skeleton as if it
were the stochastic model. The classification below is exhaustive over
the public surface by introspection: adding a new public method without
classifying it here fails ``test_every_public_method_is_classified``.
"""
import inspect
import warnings

import numpy as np
import pandas as pd
import pytest
import scipy.stats

import odelib_tpu


# classification -> how the method behaves on a diffusion= model
SUPPORTED = {
    # stochastic-aware end to end
    "MCMC",                  # pmmh supported; non-pmmh warns (tested below)
    "simulate",              # SDE paths (requires diffusion)
    "tune_particles",        # particle-count rule (requires diffusion)
    "posterior_predictive",  # replicates along SDE paths
    "prior_predictive",      # replicates along SDE paths
    "diagnostics",           # sampler-agnostic (ESS/R-hat on draws)
    "set_best_params",       # posterior bookkeeping on any MCMC output
    "copy",                  # carries the diffusion through
    "reset_dataframe",
    # deterministic-by-construction accessors/setters (no likelihood)
    "get_AIC", "get_Rsqrd", "get_adjRsqrd", "get_chi", "get_fitstats",
    "get_residuals", "get_inits", "get_model", "get_numstatevar",
    "get_parameters", "get_pnames", "get_snames", "set_inits",
    "set_parameters",
    # documented drift-skeleton analyses (theoretical sweeps of the
    # drift field, not likelihood fits — same reading as the reference's
    # equilibrium/gradient workflows)
    "integrate", "explore_equilibriums", "gradient", "fit_survey",
    "search_initparamfits", "find_inits", "get_chi_sensitivity",
    # plotting of data/draws
    "plot", "plot_corner", "plot_trace", "plot_uncertainty",
}

# refuse unless drift_only=True is passed (then warn)
REFUSERS = {
    "fit_map", "fit_advi", "laplace_approximation", "model_evidence",
    "profile_likelihood", "sbc", "sobol_sensitivity", "local_sensitivity",
}

# warn on stochastic input (approximate but defined)
WARNERS = {"information_criteria", "power_scale_sensitivity"}


@pytest.fixture()
def sde_model():
    def gbm(y, t, ps):
        return np.array([ps[0] * y[0]])

    def gnoise(y, t, ps):
        return np.array([ps[1] * y[0]])

    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 2.0, 9)[1:]
    ab = 10.0 * np.exp((0.5 - 0.5 * 0.3 ** 2) * ts
                       + 0.3 * np.sqrt(ts) * rng.normal(size=ts.size))
    df = pd.DataFrame({"organism": "X", "time": ts, "abundance": ab,
                       "log_sigma": 0.2})
    m = odelib_tpu.ModelFramework(
        ODE=gbm, diffusion=gnoise, parameter_names=["r", "s"],
        state_names=["X"], dataframe=df, t_steps=32, random_seed=1,
        r=odelib_tpu.parameter(scipy.stats.lognorm,
                               {"s": 0.5, "scale": 0.5}),
        s=odelib_tpu.parameter(scipy.stats.lognorm,
                               {"s": 0.5, "scale": 0.3}),
        X=10.0)
    m.set_parameters(r=0.5, s=0.3)
    return m


def test_every_public_method_is_classified():
    public = {n for n, f in inspect.getmembers(odelib_tpu.ModelFramework,
                                               callable)
              if not n.startswith("_")}
    classified = SUPPORTED | REFUSERS | WARNERS
    missing = public - classified
    assert not missing, (
        f"public methods without a stochastic-matrix classification: "
        f"{sorted(missing)} — decide support/refuse/warn and add them")
    stale = classified - public
    assert not stale, f"classified but no longer public: {sorted(stale)}"


# minimal valid call per refuser (cheap shapes; they must raise BEFORE
# doing real work, so cost is irrelevant)
REFUSER_CALLS = {
    "fit_map": dict(starts=2, steps=2),
    "fit_advi": dict(steps=2, n_mc=2, draws=4),
    "laplace_approximation": dict(),
    "model_evidence": dict(particles=8, n_moves=1),
    "profile_likelihood": dict(parameter_name="r", points=2, starts=2,
                               steps=2),
    "sbc": dict(reps=2, iterations_per_chain=20),
    "sobol_sensitivity": dict(samples=8, n_boot=2),
    "local_sensitivity": dict(),
}


@pytest.mark.parametrize("name", sorted(REFUSERS))
def test_refusers_raise_without_drift_only(sde_model, name):
    with pytest.raises(ValueError, match="drift_only"):
        getattr(sde_model, name)(**REFUSER_CALLS[name])


@pytest.mark.parametrize("name", ["local_sensitivity", "fit_map"])
def test_refusers_run_with_drift_only_and_warn(sde_model, name):
    kw = dict(REFUSER_CALLS[name], drift_only=True)
    with pytest.warns(UserWarning, match="drift_only"):
        getattr(sde_model, name)(**kw)


@pytest.mark.slow
def test_mcmc_mh_on_diffusion_model_warns(sde_model):
    with pytest.warns(UserWarning, match="DRIFT ONLY"):
        sde_model.MCMC(chain_inits=2, iterations_per_chain=10,
                       fitsurvey_samples=32, print_report=False)


@pytest.mark.slow
def test_mcmc_pmmh_on_diffusion_model_no_drift_warning(sde_model):
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        post = sde_model.MCMC(chain_inits=2, iterations_per_chain=10,
                              fitsurvey_samples=32, sampler="pmmh",
                              n_particles=8, sde_substeps=2,
                              print_report=False)
    assert len(post) > 0


@pytest.mark.slow
def test_information_criteria_warns(sde_model):
    post = sde_model.MCMC(chain_inits=2, iterations_per_chain=60,
                          fitsurvey_samples=32, sampler="pmmh",
                          n_particles=8, sde_substeps=2,
                          print_report=False)
    with pytest.warns(UserWarning, match="drift-only|stochastic"):
        sde_model.information_criteria(post, n_draws=24,
                                       print_report=False)


@pytest.mark.slow
def test_jointfit_accepts_stochastic_experiments(sde_model):
    """r5: JointFit routes stochastic experiments through joint PMMH
    (recovery test: tests/test_joint.py::test_joint_pmmh_*); gradient
    surfaces keep the refuse-unless-drift_only policy."""
    jf = odelib_tpu.JointFit({"a": sde_model, "b": sde_model.copy()},
                             shared=["r"])
    post = jf.MCMC(chain_inits=2, iterations_per_chain=10,
                   fitsurvey_samples=16, n_particles=8, sde_substeps=1,
                   print_report=False)
    assert len(post) > 0
    assert np.isfinite(post["chi"]).all()
    assert {"chi:a", "chi:b"} <= set(post.columns)
    with pytest.raises(ValueError, match="drift_only"):
        jf.fit_map(starts=2, steps=2)
    with pytest.raises(ValueError, match="drift_only"):
        jf.fit_advi(steps=2, n_mc=2, draws=4)
    with pytest.raises(ValueError, match="hmc"):
        jf.MCMC(sampler="hmc", chain_inits=2, iterations_per_chain=10,
                fitsurvey_samples=16, print_report=False)
    with pytest.raises(ValueError, match="pallas"):
        jf.MCMC(backend="pallas", chain_inits=2, iterations_per_chain=10,
                fitsurvey_samples=16, print_report=False)
    with pytest.raises(ValueError, match="checkpoint"):
        jf.MCMC(chain_inits=2, iterations_per_chain=10,
                fitsurvey_samples=16, checkpoint_every=5,
                checkpoint_path="/tmp/x.npz", print_report=False)
