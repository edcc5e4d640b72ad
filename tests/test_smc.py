"""Tempered SMC (samplers/smc.py): analytic evidence oracle, posterior
moments, schedule behavior, and the ModelFramework.model_evidence API."""
import os
import sys

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from odelib_tpu.data import build_obsdata, format_dataframe  # noqa: E402
from odelib_tpu.model import make_spec  # noqa: E402
from odelib_tpu.samplers import smc_sample  # noqa: E402


# ---------------------------------------------------------------------------
# Conjugate-Gaussian oracle. Constant model y = S0; with z = log S0,
# chi(z) = sum_i (d_i - z)^2 / (2 sig^2) and prior z ~ N(m0, s0^2), the
# evidence integral Z = ∫ exp(-chi(z)) N(z; m0, s0^2) dz is analytic:
#   log Z = -S/(2 sig^2) + 0.5 log(2 pi sig^2 / n)
#           + log N(dbar; m0, s0^2 + sig^2/n)
# with n = #obs, dbar = mean(d), S = sum (d_i - dbar)^2. The posterior over
# z is N(mpost, spost^2) with precision n/sig^2 + 1/s0^2.
# ---------------------------------------------------------------------------

M0, S0P = np.log(2e6), 1.5      # prior mean / std in log space
SIG = 0.3


@pytest.fixture(scope="module")
def conjugate_problem():
    def const_rhs(t, y, ps):
        return jnp.stack([0.0 * y[0]])

    spec = make_spec(const_rhs, ("S0",), ("S",))
    rng = np.random.default_rng(11)
    tobs = np.linspace(0.0, 3.0, 12)
    d = np.log(1e6) + rng.normal(0, SIG, len(tobs))
    rows = [{"organism": "S", "time": t, "abundance": np.exp(la),
             "log_sigma": SIG} for t, la in zip(tobs, d)]
    df = format_dataframe(pd.DataFrame(rows), ("S",))
    times = np.linspace(0.0, 3.0, 11)
    obs, _ = build_obsdata(df, times, spec.post_snames)

    n, dbar = len(d), d.mean()
    S = ((d - dbar) ** 2).sum()
    tot_var = S0P ** 2 + SIG ** 2 / n
    logZ = (-S / (2 * SIG ** 2)
            + 0.5 * np.log(2 * np.pi * SIG ** 2 / n)
            - 0.5 * np.log(2 * np.pi * tot_var)
            - 0.5 * (dbar - M0) ** 2 / tot_var)
    prec = n / SIG ** 2 + 1.0 / S0P ** 2
    mpost = (n * dbar / SIG ** 2 + M0 / S0P ** 2) / prec
    spost = 1.0 / np.sqrt(prec)
    return spec, obs, jnp.asarray(times), jnp.asarray([1.0]), logZ, \
        mpost, spost


def _prior_logpdf(theta):
    z = jnp.log(theta[0])
    return (-0.5 * ((z - M0) / S0P) ** 2
            - 0.5 * jnp.log(2 * jnp.pi * S0P ** 2))


def test_smc_evidence_matches_analytic(conjugate_problem):
    spec, obs, times, y0, logZ_true, mpost, spost = conjugate_problem
    N = 2048
    rng = np.random.default_rng(3)
    theta0 = np.exp(M0 + S0P * rng.normal(size=(N, 1)))  # true prior draws
    out = smc_sample(spec, obs, times, y0, jnp.asarray(theta0),
                     jax.random.PRNGKey(7), prior_logpdf=_prior_logpdf,
                     n_moves=3, method="fixed_dopri5", substeps=1)
    assert out.betas[-1] == 1.0
    assert abs(out.log_evidence - logZ_true) < 0.1, (
        f"logZ {out.log_evidence:.3f} vs analytic {logZ_true:.3f}")
    # posterior particle moments vs the conjugate posterior
    z = np.log(np.asarray(out.theta)).ravel()
    assert abs(z.mean() - mpost) < 5 * spost / np.sqrt(200)  # ESS-deflated
    np.testing.assert_allclose(z.std(), spost, rtol=0.2)
    # prior is much wider than the posterior -> real tempering happened
    assert len(out.betas) > 2
    assert all(b2 > b1 for b1, b2 in zip(out.betas, out.betas[1:]))


def test_smc_trivial_when_prior_equals_posterior(conjugate_problem):
    """With an overwhelmingly informative prior (much tighter than the
    likelihood), beta should reach 1 in very few stages and logZ should
    approach exp(-chi) at the prior mode averaged over the prior."""
    spec, obs, times, y0, *_ = conjugate_problem
    N = 512
    rng = np.random.default_rng(5)
    s_tight = 0.01
    theta0 = np.exp(M0 + s_tight * rng.normal(size=(N, 1)))

    def tight_prior(theta):
        z = jnp.log(theta[0])
        return (-0.5 * ((z - M0) / s_tight) ** 2
                - 0.5 * jnp.log(2 * jnp.pi * s_tight ** 2))

    out = smc_sample(spec, obs, times, y0, jnp.asarray(theta0),
                     jax.random.PRNGKey(9), prior_logpdf=tight_prior,
                     n_moves=2, method="fixed_dopri5", substeps=1)
    assert out.betas[-1] == 1.0
    assert len(out.betas) <= 4
    # chi is ~constant over the tight prior: logZ ~ -mean chi
    chi_m = float(np.mean(np.asarray(out.chi)))
    assert abs(out.log_evidence + chi_m) < 1.0


def test_smc_validation(conjugate_problem):
    spec, obs, times, y0, *_ = conjugate_problem
    th0 = jnp.ones((16, 1))
    with pytest.raises(ValueError, match="prior_logpdf"):
        smc_sample(spec, obs, times, y0, th0, jax.random.PRNGKey(0),
                   prior_logpdf=None)
    with pytest.raises(ValueError, match="ess_target"):
        smc_sample(spec, obs, times, y0, th0, jax.random.PRNGKey(0),
                   prior_logpdf=_prior_logpdf, ess_target=1.5)
    with pytest.raises(ValueError, match="population"):
        smc_sample(spec, obs, times, y0, jnp.ones((4, 1)),
                   jax.random.PRNGKey(0), prior_logpdf=_prior_logpdf)


@pytest.mark.slow
def test_model_evidence_api_and_bayes_factor():
    """zero_i vs a one-parameter pure-decay model on zero_i data: the
    richer (true) model must win the Bayes factor decisively."""
    from helpers import synthetic_df
    from odelib_tpu import models

    df = synthetic_df()
    mf = models.get("zero_i").framework(df, t_steps=288)
    res = mf.model_evidence(particles=256, n_moves=3, print_report=False)
    assert res["betas"][-1] == 1.0
    assert np.isfinite(res["log_evidence"])
    post = res["posterior"]
    assert {"chi", "rsquared", "aic"} <= set(post.columns)
    assert np.isfinite(post["chi"]).all()

    # a deliberately wrong model: both populations decay independently
    import odelib_tpu

    def decay(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0], -k * y[1]])

    from odelib_tpu.distributions import LogNormal
    mf2 = odelib_tpu.ModelFramework(
        ODE=decay, parameter_names=["k"], state_names=["S", "V"],
        dataframe=df, t_steps=288, ode_style="jax",
        k=odelib_tpu.parameter(
            stats_gen=LogNormal(s=1.0, scale=0.5), hyperparameters={}))
    res2 = mf2.model_evidence(particles=256, n_moves=3, print_report=False)
    assert res["log_evidence"] > res2["log_evidence"] + 10, (
        f"true model logZ {res['log_evidence']:.1f} should beat wrong "
        f"model {res2['log_evidence']:.1f}")


@pytest.mark.slow
def test_model_evidence_conditions_on_static_parameters():
    """static_parameters must be pinned at their CURRENT value, not drawn
    from their prior — the evidence is conditioned, not marginalized."""
    from helpers import synthetic_df
    from odelib_tpu import models

    mf = models.get("zero_i").framework(synthetic_df(), t_steps=288)
    mf.set_parameters(mu=0.55)
    res = mf.model_evidence(particles=128, n_moves=2,
                            static_parameters=["mu"], print_report=False)
    mu_col = res["posterior"]["mu"].to_numpy()
    np.testing.assert_allclose(mu_col, 0.55, rtol=1e-6)


def test_model_evidence_requires_priors():
    from helpers import synthetic_df
    from odelib_tpu import models

    mf = models.get("zero_i").framework(synthetic_df(),
                                        use_default_priors=False,
                                        t_steps=288)
    with pytest.raises(ValueError, match="prior"):
        mf.model_evidence(particles=64)
