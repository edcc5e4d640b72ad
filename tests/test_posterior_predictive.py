"""Posterior predictive checks (ModelFramework.posterior_predictive):
calibration on well-specified synthetic data, detection of a wrong model,
summary-frame integrity."""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

import odelib_tpu  # noqa: E402
from odelib_tpu import models  # noqa: E402
from odelib_tpu.distributions import LogNormal  # noqa: E402
from helpers import synthetic_df  # noqa: E402


@pytest.fixture(scope="module")
def fitted():
    mf = models.get("zero_i").framework(synthetic_df(), t_steps=288)
    post = mf.MCMC(chain_inits=8, iterations_per_chain=150,
                   fitsurvey_samples=256, sd_fitdistance=6.0,
                   print_report=False)
    return mf, post


def test_ppc_coverage_calibrated_on_true_model(fitted):
    mf, post = fitted
    res = mf.posterior_predictive(post, n_draws=150, ci=0.9,
                                  print_report=False)
    # well-specified model: coverage near nominal (binomial noise on ~32
    # points allows a wide band, but not collapse)
    assert 0.7 <= res["coverage"] <= 1.0
    s = res["summary"]
    assert {"organism", "time", "log_abundance", "pred_median",
            "pred_lo", "pred_hi", "covered"} <= set(s.columns)
    assert (s["pred_lo"] <= s["pred_hi"]).all()
    assert set(s["organism"]) == {"S", "V"}
    assert res["samples"].shape[0] <= 150


def test_ppc_flags_wrong_model(fitted):
    """An independent-decay model fitted to zero_i data should leave many
    observations outside its predictive intervals."""
    _, _ = fitted
    df = synthetic_df()

    def decay(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0], -k * y[1]])

    mf2 = odelib_tpu.ModelFramework(
        ODE=decay, parameter_names=["k"], state_names=["S", "V"],
        dataframe=df, t_steps=288, ode_style="jax",
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=1.0, scale=0.5),
                               hyperparameters={}))
    post2 = mf2.MCMC(chain_inits=[{"k": 0.3}] * 8,
                     iterations_per_chain=150, print_report=False)
    res2 = mf2.posterior_predictive(post2, n_draws=150, ci=0.9,
                                    print_report=False)
    res_true_cov = 0.85  # calibrated model sits near nominal
    assert res2["coverage"] < res_true_cov - 0.2, (
        f"wrong model coverage {res2['coverage']:.2f} not flagged")

def test_prior_predictive(fitted):
    """Prior predictive runs pre-fit: wide priors should cover the data
    (possibly all of it) and the summary mirrors the posterior check."""
    mf, post = fitted
    res = mf.prior_predictive(samples=150, ci=0.9, print_report=False)
    assert 0.5 <= res["coverage"] <= 1.0
    s = res["summary"]
    assert {"organism", "time", "log_abundance", "pred_median",
            "pred_lo", "pred_hi", "covered"} <= set(s.columns)
    # prior intervals are wider than the fitted posterior's
    post_res = mf.posterior_predictive(post, n_draws=150, ci=0.9,
                                       print_report=False)
    prior_w = (s["pred_hi"] - s["pred_lo"]).median()
    post_w = (post_res["summary"]["pred_hi"]
              - post_res["summary"]["pred_lo"]).median()
    assert prior_w > post_w
