"""Sensitivity analysis (utils/sensitivity.py): analytic Sobol oracles
(additive and interacting targets), local-derivative oracle, chi target
end-to-end."""
import os
import sys

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

import odelib_tpu  # noqa: E402
from odelib_tpu.distributions import Uniform  # noqa: E402


def _df_for(decay_rate=1.0, y0=1e6, n=8):
    tobs = np.linspace(0.0, 2.0, n)
    return pd.DataFrame(
        [{"organism": "y", "time": t, "abundance": y0 * np.exp(-decay_rate * t),
          "log_sigma": 0.2} for t in tobs])


def _mf(rhs, pnames, priors):
    kw = {p: odelib_tpu.parameter(stats_gen=d, hyperparameters={})
          for p, d in priors.items()}
    return odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=pnames, state_names=["y"],
        dataframe=_df_for(), t_steps=64, ode_style="jax", random_seed=3,
        **kw)


def test_sobol_additive_oracle():
    """dy/dt = -(a+b) y: log y(T) = log y0 - (a+b) T is additive, so
    S1 == ST with S1_a : S1_b = w_a^2 : w_b^2 for uniform priors."""
    def rhs(t, y, ps):
        a, b = ps
        return jnp.stack([-(a + b) * y[0]])

    mf = _mf(rhs, ["a", "b"],
             {"a": Uniform(loc=0.5, scale=1.0),
              "b": Uniform(loc=0.5, scale=2.0)})
    out = mf.sobol_sensitivity(samples=1024, target=("log", "y"),
                               print_report=False)
    # w_a=1, w_b=2 -> S1_a = 1/5, S1_b = 4/5
    assert out.loc["a", "S1"] == pytest.approx(0.2, abs=0.06)
    assert out.loc["b", "S1"] == pytest.approx(0.8, abs=0.06)
    assert out.loc["a", "ST"] == pytest.approx(0.2, abs=0.06)
    assert out.loc["b", "ST"] == pytest.approx(0.8, abs=0.06)
    assert (out["S1_se"] < 0.1).all()


def test_sobol_interaction_oracle():
    """dy/dt = -(a*b) y: f = -a b T has interaction variance. For
    a, b ~ U(0.1, 2.1): S1 = 0.44, ST = 0.56 for both (exact Gaussian
    algebra on uniform moments)."""
    def rhs(t, y, ps):
        a, b = ps
        return jnp.stack([-(a * b) * y[0]])

    mf = _mf(rhs, ["a", "b"],
             {"a": Uniform(loc=0.1, scale=2.0),
              "b": Uniform(loc=0.1, scale=2.0)})
    out = mf.sobol_sensitivity(samples=2048, target=("log", "y"),
                               print_report=False)
    for p in ("a", "b"):
        assert out.loc[p, "S1"] == pytest.approx(0.4394, abs=0.07)
        assert out.loc[p, "ST"] == pytest.approx(0.5606, abs=0.07)
        # the interaction gap is the thing one-at-a-time sweeps can't see
        assert out.loc[p, "ST"] - out.loc[p, "S1"] > 0.04


@pytest.mark.slow
def test_sobol_chi_target_and_validation():
    from helpers import synthetic_df
    from odelib_tpu import models

    mf = models.get("zero_i").framework(synthetic_df(), t_steps=288)
    out = mf.sobol_sensitivity(samples=256, print_report=False)
    assert set(out.index) == {"mu", "phi", "beta"}
    assert np.isfinite(out[["S1", "ST"]]).all().all()
    # indices live in [0, 1] up to estimator noise
    assert (out["ST"] > -0.1).all() and (out["ST"] < 1.2).all()

    with pytest.raises(ValueError, match="unknown state"):
        mf.sobol_sensitivity(samples=64, target="nope")

    def rhs(t, y, ps):
        (a,) = ps
        return jnp.stack([-a * y[0]])

    mf1 = _mf(rhs, ["a"], {"a": Uniform(loc=0.5, scale=1.0)})
    with pytest.raises(ValueError, match=">= 2 parameters"):
        mf1.sobol_sensitivity(samples=64)


def test_local_sensitivity_matches_analytic():
    """dy/dt = -k y: d y(t) / d log k = -k t y(t) exactly."""
    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-ps[0] * y[0]])

    mf = _mf(rhs, ["k"], {"k": Uniform(loc=0.5, scale=1.0)})
    mf.set_parameters(k=0.8)
    mf.set_inits(y=1e6)
    sens = mf.local_sensitivity()
    dfk = sens["y"]
    t = np.asarray(dfk.index, float)
    expected = -0.8 * t * 1e6 * np.exp(-0.8 * t)
    np.testing.assert_allclose(dfk["k"].to_numpy(), expected, rtol=1e-3)

    # linear scale: d y / d k = -t y
    sens_lin = mf.local_sensitivity(log_scale=False)
    np.testing.assert_allclose(sens_lin["y"]["k"].to_numpy(),
                               expected / 0.8, rtol=1e-3)


@pytest.mark.slow
def test_power_scale_sensitivity_diagnoses_prior_dominance():
    """Power-scaling (Kallioinen et al. 2023): a data-identified rate is
    likelihood-sensitive only; an inert parameter (no effect on the
    dynamics, posterior = its prior) is prior-sensitive only."""
    import jax.numpy as jnp
    import pandas as pd

    import odelib_tpu
    from odelib_tpu.distributions import LogNormal

    rng = np.random.default_rng(2)
    sig = 0.15
    df = pd.DataFrame(
        [{"organism": "y", "time": t,
          "abundance": 1e6 * np.exp(-t) * np.exp(rng.normal(0, sig)),
          "log_sigma": sig} for t in np.linspace(0.0, 3.0, 12)])

    def rhs(t, y, ps):
        k, c = ps
        return jnp.stack([-k * y[0] + 0.0 * c])

    fw = odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k", "c"], state_names=["y"],
        dataframe=df, t_steps=32, ode_style="jax", random_seed=0,
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=2.0, scale=1.0),
                               hyperparameters={}, random_seed=0),
        c=odelib_tpu.parameter(stats_gen=LogNormal(s=0.5, scale=1.0),
                               hyperparameters={}, random_seed=1))
    inits = pd.DataFrame([{"k": v, "c": c}
                          for v, c in ((0.8, 0.6), (0.9, 0.9),
                                       (1.1, 1.2), (1.2, 1.6))])
    post = fw.MCMC(chain_inits=inits, iterations_per_chain=3000,
                   rwalk_std=0.25, use_priors=True, print_report=False)
    tab = fw.power_scale_sensitivity(post, print_report=True)
    tab = tab.set_index("parameter")
    # k: the data pin it, the s=2 prior is locally flat
    assert tab.loc["k", "lik_sens"] >= 0.05, tab
    assert tab.loc["k", "prior_sens"] < 0.05, tab
    assert tab.loc["k", "diagnosis"] == "-"
    # c: nothing in the likelihood touches it; its posterior IS the prior
    assert tab.loc["c", "prior_sens"] >= 0.05, tab
    assert tab.loc["c", "lik_sens"] < 0.05, tab
    assert tab.loc["c", "diagnosis"] == "prior-dominated"


def test_power_scale_sensitivity_requires_priors():
    import jax.numpy as jnp
    import pandas as pd

    import odelib_tpu

    df = pd.DataFrame(
        [{"organism": "y", "time": t, "abundance": 1e6 * np.exp(-t),
          "log_sigma": 0.2} for t in np.linspace(0.0, 2.0, 8)])

    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0]])

    fw = odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k"], state_names=["y"], dataframe=df,
        t_steps=16, ode_style="jax", k=1.0)
    with pytest.raises(ValueError, match="prior"):
        fw.power_scale_sensitivity(pd.DataFrame({"k": [1.0], "chi": [1.0]}))


@pytest.mark.slow
def test_joint_power_scale_sensitivity():
    """JointFit mirror: a shared rate identified by both experiments is
    likelihood-sensitive; an inert per-experiment parameter is
    prior-dominated."""
    import jax.numpy as jnp
    import pandas as pd

    import odelib_tpu
    from odelib_tpu import JointFit
    from odelib_tpu.distributions import LogNormal

    rng = np.random.default_rng(4)
    sig = 0.15

    def mk(scale, seed):
        d = pd.DataFrame(
            [{"organism": "y", "time": t,
              "abundance": scale * np.exp(-t) * np.exp(rng.normal(0, sig)),
              "log_sigma": sig} for t in np.linspace(0.0, 3.0, 10)])

        def rhs(t, y, ps):
            k, c = ps
            return jnp.stack([-k * y[0] + 0.0 * c])

        return odelib_tpu.ModelFramework(
            ODE=rhs, parameter_names=["k", "c"], state_names=["y"],
            dataframe=d, t_steps=24, ode_style="jax", random_seed=seed,
            k=odelib_tpu.parameter(stats_gen=LogNormal(s=2.0, scale=1.0),
                                   hyperparameters={}, random_seed=seed),
            c=odelib_tpu.parameter(stats_gen=LogNormal(s=0.5, scale=1.0),
                                   hyperparameters={}, random_seed=seed))

    jf = JointFit({"a": mk(1e6, 0), "b": mk(3e5, 1)}, shared=["k"])
    post = jf.MCMC(chain_inits=4, iterations_per_chain=3000,
                   fitsurvey_samples=64, rwalk_std=0.25,
                   use_priors=True, print_report=False, backend="xla")
    tab = jf.power_scale_sensitivity(post, print_report=True)
    tab = tab.set_index("parameter")
    assert tab.loc["k", "lik_sens"] >= 0.05
    assert tab.loc["k", "diagnosis"] == "-"
    assert tab.loc["a:c", "prior_sens"] >= 0.05
    assert tab.loc["a:c", "diagnosis"] == "prior-dominated"
