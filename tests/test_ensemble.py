"""Affine-invariant ensemble sampler (samplers/ensemble.py): exact-Gaussian
oracle, mixing advantage on a correlated ridge, masking, validation."""
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
from odelib_tpu.samplers import ensemble_mh, metropolis_hastings  # noqa: E402
from odelib_tpu.utils.diagnostics import effective_sample_size  # noqa: E402


# ---------------------------------------------------------------------------
# Exact-Gaussian oracle (same construction as test_pt.py): constant model,
# posterior over log S0 is exactly N(mean(logobs), sig^2/n).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gaussian_problem():
    def const_rhs(t, y, ps):
        return jnp.stack([0.0 * y[0]])

    spec = make_spec(const_rhs, ("S0",), ("S",))
    rng = np.random.default_rng(17)
    sig = 0.3
    tobs = np.linspace(0.0, 3.0, 10)
    logobs = np.log(1e6) + rng.normal(0, sig, len(tobs))
    rows = [{"organism": "S", "time": t, "abundance": np.exp(la),
             "log_sigma": sig} for t, la in zip(tobs, logobs)]
    df = format_dataframe(pd.DataFrame(rows), ("S",))
    times = np.linspace(0.0, 3.0, 11)
    obs, _ = build_obsdata(df, times, spec.post_snames)
    return (spec, obs, jnp.asarray(times), jnp.asarray([1.0]),
            float(np.mean(logobs)), sig / np.sqrt(len(tobs)))


def test_ensemble_recovers_exact_gaussian(gaussian_problem):
    spec, obs, times, y0, post_mean, post_std = gaussian_problem
    W = 32
    rng = np.random.default_rng(21)
    th0 = np.exp(post_mean + rng.normal(0, 0.2, (W, 1)))
    out = ensemble_mh(spec, obs, times, y0, jnp.asarray(th0),
                      jax.random.PRNGKey(3), nits=1500, burnin=750,
                      method="fixed_dopri5", substeps=1)
    z = np.log(np.asarray(out.theta)).ravel()
    se = post_std / np.sqrt(W)
    assert abs(z.mean() - post_mean) < 5 * se
    np.testing.assert_allclose(z.std(), post_std, rtol=0.35)
    # stretch moves on a well-scaled 1-D target should accept frequently
    assert float(np.asarray(out.acceptance_ratio)[:, -1].mean()) > 0.2


# ---------------------------------------------------------------------------
# Correlated ridge: dy/dt = -(k1*k2) y identifies only the product, so the
# posterior in (log k1, log k2) is a narrow ridge along z1+z2 = const made
# proper by lognormal priors. Affine invariance should mix the flat
# direction far better than an isotropic random walk with the same budget.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ridge_problem():
    def rhs(t, y, ps):
        k1, k2 = ps
        return jnp.stack([-(k1 * k2) * y[0]])

    spec = make_spec(rhs, ("k1", "k2"), ("y",))
    sig = 0.1
    tobs = np.linspace(0.0, 3.0, 10)
    rows = [{"organism": "y", "time": t, "abundance": 1e6 * np.exp(-t),
             "log_sigma": sig} for t in tobs]
    df = format_dataframe(pd.DataFrame(rows), ("y",))
    times = np.linspace(0.0, 3.0, 16)
    obs, _ = build_obsdata(df, times, spec.post_snames)

    def prior_logpdf(theta):
        # lognormal(med 1, sigma 1) on both rates in log space
        z = jnp.log(theta)
        return -0.5 * jnp.sum(z ** 2)

    return spec, obs, jnp.asarray(times), jnp.asarray([1e6]), prior_logpdf


@pytest.mark.slow
def test_ensemble_beats_isotropic_walk_on_ridge(ridge_problem):
    spec, obs, times, y0, prior_logpdf = ridge_problem
    W, nits, burnin = 32, 800, 400
    rng = np.random.default_rng(9)
    # start spread over the prior, normalized onto the ridge k1*k2 ~= 1
    z1 = rng.normal(0, 1, W)
    th0 = np.stack([np.exp(z1), np.exp(-z1)], axis=1)
    kw = dict(nits=nits, burnin=burnin, method="fixed_dopri5", substeps=2,
              prior_logpdf=prior_logpdf, use_priors=True)

    out_e = ensemble_mh(spec, obs, times, y0, jnp.asarray(th0),
                        jax.random.PRNGKey(4), init_jitter=0.0, **kw)
    keys = jax.random.split(jax.random.PRNGKey(4), W)
    out_m = metropolis_hastings(spec, obs, times, y0, jnp.asarray(th0),
                                keys, rwalk_std=0.05, **kw)

    def flat_direction_ess(out):
        z = np.log(np.asarray(out.theta))           # (W, R, 2)
        return effective_sample_size(z[..., 0] - z[..., 1])

    ess_e, ess_m = flat_direction_ess(out_e), flat_direction_ess(out_m)
    assert ess_e > 2 * ess_m, (
        f"ensemble ESS {ess_e:.0f} not better than isotropic MH {ess_m:.0f} "
        f"on the unidentified ridge direction")


def test_ensemble_static_mask(gaussian_problem):
    spec, obs, times, y0, post_mean, _ = gaussian_problem
    # two params: second is a decoy frozen by the mask
    def rhs(t, y, ps):
        return jnp.stack([0.0 * y[0]])

    spec2 = make_spec(rhs, ("S0", "dummy"), ("S",))
    W = 8
    th0 = np.exp(post_mean) * np.ones((W, 1))
    th0 = np.concatenate([th0 * np.exp(
        np.random.default_rng(0).normal(0, 0.2, (W, 1))),
        np.full((W, 1), 7.0)], axis=1)
    out = ensemble_mh(spec2, obs, times, y0, jnp.asarray(th0),
                      jax.random.PRNGKey(5), nits=60, burnin=20,
                      walk_mask=jnp.asarray([1.0, 0.0]),
                      method="fixed_dopri5", substeps=1)
    # exp(log(7)) round-trip: exact up to one ulp, never walked
    np.testing.assert_allclose(np.asarray(out.theta)[..., 1], 7.0,
                               rtol=1e-12)


def test_ensemble_validation(gaussian_problem):
    spec, obs, times, y0, post_mean, _ = gaussian_problem
    th0 = jnp.full((5, 1), float(np.exp(post_mean)))  # odd walker count
    with pytest.raises(ValueError, match="even"):
        ensemble_mh(spec, obs, times, y0, th0, jax.random.PRNGKey(0),
                    nits=10, burnin=2)
    th0 = jnp.full((4, 1), float(np.exp(post_mean)))
    with pytest.raises(ValueError, match="stretch scale"):
        ensemble_mh(spec, obs, times, y0, th0, jax.random.PRNGKey(0),
                    nits=10, burnin=2, a=1.0)
    with pytest.raises(ValueError, match="no recorded"):
        ensemble_mh(spec, obs, times, y0, th0, jax.random.PRNGKey(0),
                    nits=10, burnin=9)
    # 4 walkers for 3 walked params triggers the under-provisioned warning
    def rhs3(t, y, ps):
        return jnp.stack([0.0 * y[0]])
    spec3 = make_spec(rhs3, ("a", "b", "c"), ("S",))
    with pytest.warns(UserWarning, match="walkers"):
        ensemble_mh(spec3, obs, times, y0, jnp.ones((4, 3)),
                    jax.random.PRNGKey(0), nits=10, burnin=2,
                    method="fixed_dopri5", substeps=1)


@pytest.mark.slow
def test_mcmc_sampler_ensemble_tiny_chain_count():
    """chain_inits below the 4-walker minimum must be padded up, not
    crash with a walker-count error."""
    from helpers import demo_df
    from odelib_tpu import models

    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    post = mf.MCMC(chain_inits=1, iterations_per_chain=30,
                   fitsurvey_samples=64, sd_fitdistance=6.0,
                   print_report=False, sampler="ensemble")
    assert len(post) == 1 * 14          # only the requested chain returned
    assert np.isfinite(post["chi"]).all()


@pytest.mark.slow
def test_mcmc_sampler_ensemble_end_to_end():
    from helpers import demo_df
    from odelib_tpu import models

    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    post = mf.MCMC(chain_inits=8, iterations_per_chain=60,
                   fitsurvey_samples=128, sd_fitdistance=6.0,
                   print_report=False, sampler="ensemble")
    assert len(post) == 8 * 29
    assert np.isfinite(post["chi"]).all()
    assert set(post["chain#"]) == set(range(8))
