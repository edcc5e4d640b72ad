"""Profile likelihood (ModelFramework.profile_likelihood): exact Gaussian
CI oracle, a structurally unidentifiable ridge, and an identifiable decay
rate."""
import os
import sys

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

import odelib_tpu  # noqa: E402
from odelib_tpu.distributions import LogNormal  # noqa: E402


def _param(dist):
    return odelib_tpu.parameter(stats_gen=dist, hyperparameters={})


def test_profile_ci_matches_gaussian_oracle():
    """Constant model y = S0: chi(z) = n (z - dbar)^2 / (2 sig^2) + const
    in z = log S0, so the 95% profile CI is exactly
    exp(dbar +- 1.96 sig / sqrt(n))."""
    def rhs(t, y, ps):
        return jnp.stack([0.0 * y[0]])

    rng = np.random.default_rng(12)
    sig, n = 0.3, 10
    d = np.log(1e6) + rng.normal(0, sig, n)
    df = pd.DataFrame([{"organism": "S", "time": t, "abundance": np.exp(la),
                        "log_sigma": sig}
                       for t, la in zip(np.linspace(0, 3, n), d)])
    mf = odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["S0"], state_names=["S"], dataframe=df,
        t_steps=16, ode_style="jax",
        S0=_param(LogNormal(s=1.0, scale=1e6)))
    dbar = d.mean()
    grid = np.exp(np.linspace(dbar - 4 * sig / np.sqrt(n),
                              dbar + 4 * sig / np.sqrt(n), 41))
    out = mf.profile_likelihood("S0", p_range=grid, starts=2, steps=50,
                                print_report=False)
    lo, hi = out["ci"]
    lo_true = np.exp(dbar - 1.959964 * sig / np.sqrt(n))
    hi_true = np.exp(dbar + 1.959964 * sig / np.sqrt(n))
    assert out["identifiable"]
    np.testing.assert_allclose(lo, lo_true, rtol=0.02)
    np.testing.assert_allclose(hi, hi_true, rtol=0.02)
    # profile curve itself is the analytic parabola
    prof = out["profile"]
    z = np.log(prof["value"].to_numpy())
    expected = n * (z - dbar) ** 2 / (2 * sig ** 2) + prof["chi"].min()
    j = np.argmin(prof["chi"].to_numpy())
    np.testing.assert_allclose(prof["chi"].to_numpy() - prof["chi"][j],
                               expected - expected[j], atol=0.2)


@pytest.fixture(scope="module")
def ridge_mf():
    def rhs(t, y, ps):
        k1, k2 = ps
        return jnp.stack([-(k1 * k2) * y[0]])

    tobs = np.linspace(0.0, 3.0, 10)
    df = pd.DataFrame([{"organism": "y", "time": t,
                        "abundance": 1e6 * np.exp(-t), "log_sigma": 0.2}
                       for t in tobs])
    return odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k1", "k2"], state_names=["y"],
        dataframe=df, t_steps=32, ode_style="jax",
        k1=_param(LogNormal(s=1.0, scale=1.0)),
        k2=_param(LogNormal(s=1.0, scale=1.0)))


def test_profile_flags_unidentifiable_ridge(ridge_mf):
    """Only k1*k2 is identified: profiling k1 re-optimizes k2 = 1/k1 and
    the profile is flat -> no CI crossing, identifiable=False."""
    out = ridge_mf.profile_likelihood(
        "k1", p_range=np.geomspace(0.3, 3.0, 11), starts=4, steps=300,
        print_report=False)
    assert not out["identifiable"]
    assert np.isnan(out["ci"][0]) and np.isnan(out["ci"][1])
    prof = out["profile"]["chi"].to_numpy()
    assert np.nanmax(prof) - np.nanmin(prof) < 0.5


def test_profile_identifiable_decay():
    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0], 0.0 * y[1]])

    tobs = np.linspace(0.0, 3.0, 10)
    rows = [{"organism": "y", "time": t, "abundance": 1e6 * np.exp(-t),
             "log_sigma": 0.2} for t in tobs]
    # second observed state pins nothing; just exercises multi-state paths
    rows += [{"organism": "w", "time": t, "abundance": 1e3,
              "log_sigma": 0.2} for t in tobs]
    df = pd.DataFrame(rows)
    mf = odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k"], state_names=["y", "w"],
        dataframe=df, t_steps=32, ode_style="jax",
        k=_param(LogNormal(s=0.7, scale=1.0)))
    out = mf.profile_likelihood("k", p_range=np.geomspace(0.5, 2.0, 21),
                                starts=2, steps=50, print_report=False)
    lo, hi = out["ci"]
    assert out["identifiable"]
    assert np.isfinite(lo) and np.isfinite(hi)
    assert lo < 1.0 < hi          # true rate inside the CI
    assert hi / lo < 1.5          # and the CI is tight for 10% noise


def test_profile_validation(ridge_mf):
    with pytest.raises(ValueError, match="unknown parameter"):
        ridge_mf.profile_likelihood("nope")
    with pytest.raises(ValueError, match="p_range"):
        ridge_mf.profile_likelihood("k1", p_range=[1.0, 2.0])