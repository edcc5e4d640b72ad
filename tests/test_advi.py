"""ADVI variational posterior (samplers/advi.py, ModelFramework.fit_advi):
agreement with MCMC on a near-lognormal posterior, full-rank correlation
recovery, masking, and array-parameter support."""
import os
import sys

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

import odelib_tpu  # noqa: E402
from odelib_tpu.distributions import LogNormal  # noqa: E402


def _decay_df(k, y0=1e6, sig=0.15, seed=0, n=12):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        [{"organism": "y", "time": t,
          "abundance": y0 * np.exp(-k * t) * np.exp(rng.normal(0, sig)),
          "log_sigma": sig} for t in np.linspace(0.0, 3.0, n)])


def _decay_fw(seed=0):
    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0]])

    return odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k"], state_names=["y"],
        dataframe=_decay_df(1.0, seed=seed), t_steps=32, ode_style="jax",
        random_seed=seed,
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.7, scale=1.0),
                               hyperparameters={}, random_seed=seed))


@pytest.mark.slow
def test_advi_matches_mcmc_on_decay():
    """Near-lognormal 1-D posterior: ADVI's log-space mean/std must match
    the prior-aware MCMC posterior within Monte-Carlo slack."""
    fw = _decay_fw(seed=3)
    post_v = fw.fit_advi(steps=400, draws=2000, print_report=False)
    assert post_v.attrs["advi"]["converged"]
    assert {"k", "chi", "rsquared", "aic"} <= set(post_v.columns)
    assert np.isfinite(post_v["chi"]).all()

    post_m = fw.MCMC(chain_inits=16, iterations_per_chain=600,
                     fitsurvey_samples=256, use_priors=True,
                     print_report=False)
    mv, sv = np.log(post_v["k"]).mean(), np.log(post_v["k"]).std()
    mm, sm = np.log(post_m["k"]).mean(), np.log(post_m["k"]).std()
    assert abs(mv - mm) < 3 * sm / np.sqrt(50) + 0.05, (mv, mm)
    assert 0.5 < sv / sm < 2.0, (sv, sm)


@pytest.mark.slow
def test_advi_full_rank_recovers_correlation():
    """Rate enters as a PRODUCT k*s: log k and log s are strongly
    anti-correlated in the posterior. Full-rank ADVI must see it;
    mean-field cannot by construction."""
    def rhs(t, y, ps):
        k, s = ps
        return jnp.stack([-(k * s) * y[0]])

    fw = odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k", "s"], state_names=["y"],
        dataframe=_decay_df(1.0, seed=5), t_steps=32, ode_style="jax",
        random_seed=5,
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.4, scale=1.0),
                               hyperparameters={}, random_seed=5),
        s=odelib_tpu.parameter(stats_gen=LogNormal(s=0.4, scale=1.0),
                               hyperparameters={}, random_seed=6))

    post = fw.fit_advi(steps=600, draws=3000, print_report=False)
    corr = np.corrcoef(np.log(post["k"]), np.log(post["s"]))[0, 1]
    assert corr < -0.3, corr

    post_d = fw.fit_advi(steps=600, draws=3000, rank="diag",
                         print_report=False)
    corr_d = np.corrcoef(np.log(post_d["k"]), np.log(post_d["s"]))[0, 1]
    assert abs(corr_d) < 0.2, corr_d


def test_advi_static_parameters_pinned():
    def rhs(t, y, ps):
        k, s = ps
        return jnp.stack([-(k * s) * y[0]])

    fw = odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k", "s"], state_names=["y"],
        dataframe=_decay_df(1.0, seed=7), t_steps=32, ode_style="jax",
        random_seed=7,
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.4, scale=1.0),
                               hyperparameters={}, random_seed=7),
        s=odelib_tpu.parameter(init_value=1.0))
    post = fw.fit_advi(steps=200, draws=200, static_parameters=["s"],
                       print_report=False)
    np.testing.assert_allclose(post["s"], 1.0)
    assert post["k"].std() > 0

    with pytest.raises(ValueError, match="rank"):
        fw.fit_advi(rank="banana")


@pytest.mark.slow
def test_advi_array_param():
    """Vector decay rates: ADVI over the flat slots, zero-template entry
    pinned at zero."""
    mu_true = np.array([1.0, 0.0])
    rng = np.random.default_rng(9)
    rows = []
    for t in np.linspace(0.0, 3.0, 10):
        for i, org in enumerate(["A", "B"]):
            rows.append({"organism": org, "time": t,
                         "abundance": (1e6 if i == 0 else 1e5)
                         * np.exp(-mu_true[i] * t)
                         * np.exp(rng.normal(0, 0.15)),
                         "log_sigma": 0.15})

    def rhs(t, y, ps):
        (mu,) = ps
        return jnp.stack([-mu[0] * y[0], -mu[1] * y[1]])

    fw = odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["mu"], state_names=["A", "B"],
        dataframe=pd.DataFrame(rows), t_steps=32, ode_style="jax",
        random_seed=9,
        mu=odelib_tpu.parameter(stats_gen=LogNormal(s=0.5, scale=1.0),
                                init_value=np.array([0.8, 0.0]),
                                hyperparameters={}, random_seed=9))
    post = fw.fit_advi(steps=300, draws=300, print_report=True)
    cells = np.stack([np.asarray(v, float) for v in post["mu"]])
    assert (cells[:, 1] == 0.0).all()
    med = np.median(cells[:, 0])
    assert abs(np.log(med / mu_true[0])) < 0.3, med


def test_advi_psis_khat_and_resample():
    """The PSIS diagnostic certifies the near-Gaussian fit (khat < 0.7)
    and resample=True returns importance-corrected draws."""
    fw = _decay_fw(seed=11)
    post = fw.fit_advi(steps=400, draws=1500, print_report=False)
    info = post.attrs["advi"]
    assert np.isfinite(info["khat"]) and info["khat"] < 0.7, info["khat"]
    lw = info["psis_logw"]
    assert lw.shape == (1500,)
    np.testing.assert_allclose(np.exp(lw).sum(), 1.0, rtol=1e-6)

    post_r = fw.fit_advi(steps=400, draws=1500, resample=True,
                         print_report=False)
    assert len(post_r) == 1500
    # resampled values are a subset of the q draws (with replacement)
    assert set(np.round(post_r["k"], 12)) <= set(np.round(post["k"], 12))
    # corrected posterior still centred right
    assert abs(np.log(post_r["k"]).mean()) < 0.1


@pytest.mark.slow
def test_psis_correction_tightens_toward_truth():
    """Deliberately UNDERDISPERSED q (too few steps from a far start):
    importance weights must be informative (khat finite), and the
    PSIS-weighted mean must be at least as close to the quadrature-true
    mean as the raw q mean."""
    from odelib_tpu.samplers import psis_weights

    fw = _decay_fw(seed=13)
    # short run: mean not yet converged -> weights do real work
    post = fw.fit_advi(steps=120, draws=2000, print_report=False)
    info = post.attrs["advi"]
    lw = info["psis_logw"]
    logk = np.log(post["k"].to_numpy(float))
    w = np.exp(lw)
    raw_mean = logk.mean()
    corrected_mean = float((w * logk).sum())
    # truth for this dataset/prior: prior-aware posterior mean; get it
    # from a long MCMC run
    mc = fw.MCMC(chain_inits=16, iterations_per_chain=800,
                 fitsurvey_samples=128, use_priors=True,
                 print_report=False)
    true_mean = np.log(mc["k"]).mean()
    assert (abs(corrected_mean - true_mean)
            <= abs(raw_mean - true_mean) + 0.01), \
        (raw_mean, corrected_mean, true_mean)
