"""Multi-start MAP/ML optimization (samplers/optimize.py, fit_map)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from helpers import synthetic_df, zero_i  # noqa: E402

from odelib_tpu import models  # noqa: E402
from odelib_tpu.data import build_obsdata, format_dataframe  # noqa: E402
from odelib_tpu.model import make_spec  # noqa: E402
from odelib_tpu.samplers import map_fit  # noqa: E402


@pytest.fixture(scope="module")
def problem():
    spec = make_spec(zero_i, ("mu", "phi", "beta"), ("S", "V"))
    df = format_dataframe(synthetic_df(), ("S", "V"))
    times = np.linspace(0.0, 3.0, 18)
    obs, _ = build_obsdata(df, times, spec.post_snames)
    return spec, obs, jnp.asarray(times), jnp.asarray([5.2e6, 1.1e7])


@pytest.mark.slow
def test_map_fit_improves_every_start(problem):
    spec, obs, times, y0 = problem
    from odelib_tpu.model import chi_of_theta
    rng = np.random.default_rng(0)
    th0 = np.array([0.6, 2.4e-8, 24.0]) * np.exp(
        rng.normal(0, 0.5, (16, 3)))
    chi0 = jax.vmap(lambda th: chi_of_theta(
        spec, obs, th, y0, times, method="fixed_dopri5", substeps=4))(
        jnp.asarray(th0))
    res = map_fit(spec, obs, times, y0, jnp.asarray(th0), steps=300,
                  learning_rate=0.1)
    chi0, chi1 = np.asarray(chi0), np.asarray(res.chi)
    ok = np.isfinite(chi0)
    assert (chi1[ok] <= chi0[ok] + 1e-6).all()


@pytest.mark.slow
def test_map_fit_recovers_generating_parameters(problem):
    """synthetic_df is generated from known parameters; the best basin's
    phi/beta must land near them (mu is weakly identified)."""
    spec, obs, times, y0 = problem
    rng = np.random.default_rng(1)
    th0 = np.array([0.6, 2.4e-8, 24.0]) * np.exp(
        rng.normal(0, 0.4, (32, 3)))
    res = map_fit(spec, obs, times, y0, jnp.asarray(th0), steps=500,
                  learning_rate=0.1)
    best = np.asarray(res.theta)[np.nanargmin(np.asarray(res.chi))]
    assert abs(np.log(best[1] / 2.4e-8)) < 0.7   # phi within factor ~2
    assert abs(np.log(best[2] / 24.0)) < 0.7     # beta within factor ~2


def test_map_fit_respects_walk_mask(problem):
    spec, obs, times, y0 = problem
    th0 = jnp.asarray([[0.6, 2.4e-8, 24.0]])
    res = map_fit(spec, obs, times, y0, th0, steps=50, learning_rate=0.1,
                  walk_mask=jnp.asarray([1.0, 0.0, 1.0]))
    np.testing.assert_allclose(float(res.theta[0, 1]), 2.4e-8, rtol=1e-10)


def test_map_fit_rejects_adaptive_method(problem):
    spec, obs, times, y0 = problem
    with pytest.raises(ValueError, match="fixed-step"):
        map_fit(spec, obs, times, y0, jnp.ones((1, 3)), method="dopri5")


@pytest.mark.slow
def test_framework_fit_map_end_to_end():
    from helpers import demo_df
    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    chi_before = mf.get_fitstats()["Chi"]
    df = mf.fit_map(starts=16, steps=200, learning_rate=0.1)
    assert list(df.columns) == ["mu", "phi", "beta", "chi", "loss",
                                "converged"]
    assert (df["chi"].diff().dropna() >= 0).all()   # sorted
    chi_after = mf.get_fitstats()["Chi"]
    assert chi_after <= chi_before + 1e-9           # set_best applied


@pytest.mark.slow
def test_framework_fit_map_static_parameters():
    from helpers import demo_df
    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    mf.set_parameters(beta=24.0)
    df = mf.fit_map(starts=8, steps=50, set_best=False,
                    static_parameters=["beta"])
    # static parameter stays at each start's initial value: the LHS draws
    # for beta come from the prior (plus the warm start at 24.0), and the
    # optimizer must not move any of them (rows are chi-sorted, so compare
    # as sorted multisets)
    ps = mf._lhs_samples(8)  # same seed -> same draws as inside fit_map
    expected = np.concatenate([ps["beta"].to_numpy(), [24.0]])
    np.testing.assert_allclose(np.sort(df["beta"].to_numpy()),
                               np.sort(expected), rtol=1e-6)


def test_laplace_exact_on_gaussian_posterior():
    """Constant-state model: chi is exactly quadratic in z, so the Laplace
    approximation IS the posterior — std must equal sigma/sqrt(n)."""
    import pandas as pd
    from odelib_tpu import ModelFramework

    sig, n = 0.3, 10
    rng = np.random.default_rng(9)
    tobs = np.linspace(0.0, 3.0, n)
    logobs = np.log(1e6) + rng.normal(0, sig, n)
    df = pd.DataFrame([{"organism": "S", "time": t,
                        "abundance": np.exp(la), "log_sigma": sig}
                       for t, la in zip(tobs, logobs)])

    def const_rhs(t, y, ps):
        return jnp.stack([0.0 * y[0]])

    mf = ModelFramework(ODE=const_rhs, ode_style="jax",
                        parameter_names=["S0"], state_names=["S"],
                        dataframe=df, t_steps=11,
                        S0=float(np.exp(np.mean(logobs))))
    lap = mf.laplace_approximation()
    assert lap["hessian_pd"]
    np.testing.assert_allclose(lap["log_std"]["S0"], sig / np.sqrt(n),
                               rtol=1e-3)
    np.testing.assert_allclose(np.log(lap["median"]["S0"]),
                               np.mean(logobs), rtol=1e-6)


@pytest.mark.slow
def test_laplace_after_fit_map_demo():
    from helpers import demo_df
    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    mf.fit_map(starts=16, steps=300, learning_rate=0.1)
    lap = mf.laplace_approximation()
    # phi and beta are the identified pair: tight stds, strong negative
    # correlation (adsorption/burst-size tradeoff)
    assert lap["log_std"]["phi"] < 0.5
    assert lap["log_std"]["beta"] < 0.5
    assert lap["corr"].loc["phi", "beta"] < -0.5
