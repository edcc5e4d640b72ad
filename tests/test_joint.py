"""Joint multi-experiment fitting (odelib_tpu.joint / samplers/joint.py):
information pooling on shared parameters, partially-shared recovery,
layout/validation."""
import os
import sys

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

import odelib_tpu  # noqa: E402
from odelib_tpu import JointFit  # noqa: E402
from odelib_tpu.distributions import LogNormal  # noqa: E402


def _decay_df(k, y0=1e6, sig=0.15, seed=0, n=10):
    rng = np.random.default_rng(seed)
    tobs = np.linspace(0.0, 3.0, n)
    return pd.DataFrame(
        [{"organism": "y", "time": t,
          "abundance": y0 * np.exp(-k * t) * np.exp(rng.normal(0, sig)),
          "log_sigma": sig} for t in tobs])


def _decay_fw(df, seed=0):
    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0]])

    return odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k"], state_names=["y"], dataframe=df,
        t_steps=32, ode_style="jax", random_seed=seed,
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.7, scale=1.0),
                               hyperparameters={}, random_seed=seed))


def test_joint_pooling_tightens_shared_posterior():
    """Two decay experiments with the SAME rate: the joint posterior std
    of k should be ~1/sqrt(2) of the single-experiment std."""
    fw1 = _decay_fw(_decay_df(1.0, seed=1), seed=1)
    fw2 = _decay_fw(_decay_df(1.0, seed=2), seed=2)

    post1 = fw1.MCMC(chain_inits=16, iterations_per_chain=400,
                     fitsurvey_samples=256, sd_fitdistance=6.0,
                     print_report=False)
    jf = JointFit({"a": fw1, "b": fw2}, shared=["k"], random_seed=3)
    postj = jf.MCMC(chain_inits=16, iterations_per_chain=400,
                    fitsurvey_samples=256, print_report=False)

    s1 = np.log(post1["k"]).std()
    sj = np.log(postj["k"]).std()
    assert sj < s1 * 0.85, (s1, sj)
    # both centred on the true rate
    assert abs(np.log(postj["k"]).mean()) < 0.15
    # per-experiment chi columns present and consistent
    np.testing.assert_allclose(
        postj["chi"], postj["chi:a"] + postj["chi:b"], rtol=1e-5)


def test_joint_partially_shared():
    """Shared y0-like dynamics but DIFFERENT rates: a 2-experiment joint
    fit with nothing shared recovers each rate; sharing k across unequal
    rates degrades chi — detectable via the survey."""
    def rhs(t, y, ps):
        k, s = ps
        return jnp.stack([-(k * s) * y[0]])

    def fw(df, seed):
        return odelib_tpu.ModelFramework(
            ODE=rhs, parameter_names=["k", "s"], state_names=["y"],
            dataframe=df, t_steps=32, ode_style="jax", random_seed=seed,
            k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.5, scale=1.0),
                                   hyperparameters={}, random_seed=seed),
            s=odelib_tpu.parameter(stats_gen=LogNormal(s=0.5, scale=1.0),
                                   hyperparameters={}, random_seed=seed + 1))

    fw1 = fw(_decay_df(0.7, seed=4), 4)     # k*s = 0.7
    fw2 = fw(_decay_df(1.4, seed=5), 5)     # k*s = 1.4
    jf = JointFit({"lo": fw1, "hi": fw2}, shared=["k"], random_seed=6)
    assert jf.columns == ["k", "lo:s", "hi:s"]
    post = jf.MCMC(chain_inits=16, iterations_per_chain=500,
                   fitsurvey_samples=512, print_report=False)
    # products must recover each experiment's decay rate even though k
    # is tied: the free s parameters absorb the difference
    p_lo = (post["k"] * post["lo:s"]).median()
    p_hi = (post["k"] * post["hi:s"]).median()
    assert abs(np.log(p_lo / 0.7)) < 0.2, p_lo
    assert abs(np.log(p_hi / 1.4)) < 0.2, p_hi


def test_joint_validation_and_helpers():
    fw1 = _decay_fw(_decay_df(1.0, seed=7), seed=7)
    fw2 = _decay_fw(_decay_df(1.0, seed=8), seed=8)
    with pytest.raises(ValueError, match="two experiments"):
        JointFit({"a": fw1}, shared=["k"])
    with pytest.raises(ValueError, match="lacks shared"):
        JointFit({"a": fw1, "b": fw2}, shared=["nope"])

    jf = JointFit([fw1, fw2], shared=["k"])
    assert jf.columns == ["k"]
    survey = jf.fit_survey(samples=64)
    assert {"k", "chi"} <= set(survey.columns)
    assert np.isfinite(survey["chi"]).any()

    post = jf.MCMC(chain_inits=4, iterations_per_chain=60,
                   fitsurvey_samples=64, print_report=False)
    best = jf.set_best_params(post)
    # pushed back into both frameworks
    v1 = float(np.asarray(fw1.parameters["k"].val))
    v2 = float(np.asarray(fw2.parameters["k"].val))
    assert v1 == v2 == pytest.approx(float(best["k"]))
    with pytest.raises(ValueError, match="unknown static"):
        jf.MCMC(chain_inits=4, iterations_per_chain=20,
                fitsurvey_samples=32, static_parameters=["zz"],
                print_report=False)