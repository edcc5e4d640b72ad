"""Convergence diagnostics (utils/diagnostics.py): ESS and split-R-hat
validated against analytically known processes."""
import numpy as np
import pandas as pd
import pytest

from odelib_tpu.utils.diagnostics import (effective_sample_size, split_rhat,
                                          summarize)


def _ar1(rho, C, N, seed=0):
    """AR(1) chains with unit stationary variance."""
    rng = np.random.default_rng(seed)
    x = np.empty((C, N))
    x[:, 0] = rng.normal(size=C)
    innov = rng.normal(size=(C, N)) * np.sqrt(1 - rho ** 2)
    for t in range(1, N):
        x[:, t] = rho * x[:, t - 1] + innov[:, t]
    return x


def test_ess_iid_is_total_draws():
    x = np.random.default_rng(0).normal(size=(4, 4000))
    ess = effective_sample_size(x)
    assert 0.8 * x.size < ess < 1.25 * x.size


def test_ess_ar1_matches_theory():
    """AR(1) with correlation rho has ESS = N (1-rho)/(1+rho)."""
    rho = 0.8
    x = _ar1(rho, 8, 8000, seed=1)
    ess = effective_sample_size(x)
    expected = x.size * (1 - rho) / (1 + rho)
    assert abs(ess - expected) / expected < 0.25, (ess, expected)


def test_ess_monotone_in_correlation():
    e = [effective_sample_size(_ar1(r, 4, 4000, seed=2))
         for r in (0.0, 0.5, 0.9)]
    assert e[0] > e[1] > e[2]


def test_rhat_converged_near_one():
    x = np.random.default_rng(3).normal(size=(8, 2000))
    r = split_rhat(x)
    assert abs(r - 1.0) < 0.02


def test_rhat_flags_disagreeing_chains():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 1000))
    x[0] += 5.0  # one chain stuck elsewhere
    assert split_rhat(x) > 1.5


def test_rhat_flags_trending_chains():
    """A within-chain trend (unconverged) is caught by the SPLIT in
    split-R-hat even when chain means agree."""
    t = np.linspace(0, 3, 1000)
    x = np.random.default_rng(5).normal(size=(4, 1000)) + t[None]
    assert split_rhat(x) > 1.2


def test_degenerate_chain_gives_nan():
    x = np.ones((4, 100))
    assert np.isnan(split_rhat(x))
    assert np.isnan(effective_sample_size(x))


def test_summarize_table():
    rng = np.random.default_rng(6)
    C, R = 4, 500
    post = pd.DataFrame({
        "mu": rng.normal(0.6, 0.05, C * R),
        "beta": rng.normal(25.0, 2.0, C * R),
        "chain#": np.repeat(np.arange(C), R),
    })
    tab = summarize(post, ["mu", "beta"])
    assert list(tab.columns) == ["mean", "std", "median", "ess",
                                 "ess_per_draw", "rhat"]
    assert abs(tab.loc["mu", "mean"] - 0.6) < 0.01
    assert tab.loc["beta", "ess"] > 0.5 * C * R
    assert abs(tab.loc["beta", "rhat"] - 1.0) < 0.05
    with pytest.raises(ValueError, match="chain#"):
        summarize(post.drop(columns=["chain#"]), ["mu"])


@pytest.mark.slow
def test_framework_diagnostics_end_to_end():
    import os, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import demo_df
    from odelib_tpu import models

    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    post = mf.MCMC(chain_inits=4, iterations_per_chain=80,
                   fitsurvey_samples=128, sd_fitdistance=6.0,
                   print_report=False, backend="xla")
    tab = mf.diagnostics(post)
    assert set(tab.index) == {"mu", "phi", "beta"}
    assert (tab["ess"].fillna(1) >= 1).all()
