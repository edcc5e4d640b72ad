"""Adaptive Metropolis (samplers/amh.py): exact-Gaussian oracle, ridge
mixing advantage over isotropic MH, masking, end-to-end API."""
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
from odelib_tpu.samplers import (  # noqa: E402
    adaptive_metropolis, metropolis_hastings)
from odelib_tpu.utils.diagnostics import effective_sample_size  # noqa: E402


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


def test_amh_recovers_exact_gaussian(gaussian_problem):
    spec, obs, times, y0, post_mean, post_std = gaussian_problem
    C = 32
    rng = np.random.default_rng(2)
    th0 = np.exp(post_mean + rng.normal(0, 0.2, (C, 1)))
    keys = jax.random.split(jax.random.PRNGKey(2), C)
    out = adaptive_metropolis(spec, obs, times, y0, jnp.asarray(th0), keys,
                              nits=1500, burnin=750,
                              method="fixed_dopri5", substeps=1)
    z = np.log(np.asarray(out.theta)).ravel()
    se = post_std / np.sqrt(C)
    assert abs(z.mean() - post_mean) < 5 * se
    np.testing.assert_allclose(z.std(), post_std, rtol=0.35)
    # 2.38-scaled proposals on a 1-D Gaussian should accept ~40-60%
    acc = float(np.asarray(out.acceptance_ratio)[:, -1].mean())
    assert 0.25 < acc < 0.75, acc


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
        z = jnp.log(theta)
        return -0.5 * jnp.sum(z ** 2)

    return spec, obs, jnp.asarray(times), jnp.asarray([1e6]), prior_logpdf


@pytest.mark.slow
def test_amh_beats_isotropic_walk_on_ridge(ridge_problem):
    spec, obs, times, y0, prior_logpdf = ridge_problem
    C, nits, burnin = 16, 1200, 600
    rng = np.random.default_rng(9)
    z1 = rng.normal(0, 1, C)
    th0 = np.stack([np.exp(z1), np.exp(-z1)], axis=1)
    keys = jax.random.split(jax.random.PRNGKey(4), C)
    kw = dict(nits=nits, burnin=burnin, method="fixed_dopri5", substeps=2,
              prior_logpdf=prior_logpdf, use_priors=True)

    out_a = adaptive_metropolis(spec, obs, times, y0, jnp.asarray(th0),
                                keys, **kw)
    out_m = metropolis_hastings(spec, obs, times, y0, jnp.asarray(th0),
                                keys, rwalk_std=0.05, **kw)

    def flat_ess(out):
        z = np.log(np.asarray(out.theta))
        return effective_sample_size(z[..., 0] - z[..., 1])

    ess_a, ess_m = flat_ess(out_a), flat_ess(out_m)
    assert ess_a > 2 * ess_m, (
        f"adaptive ESS {ess_a:.0f} not better than isotropic {ess_m:.0f}")


def test_amh_static_mask(gaussian_problem):
    spec, obs, times, y0, post_mean, _ = gaussian_problem

    def rhs(t, y, ps):
        return jnp.stack([0.0 * y[0]])

    spec2 = make_spec(rhs, ("S0", "dummy"), ("S",))
    C = 4
    rng = np.random.default_rng(0)
    th0 = np.concatenate(
        [np.exp(post_mean + rng.normal(0, 0.2, (C, 1))),
         np.full((C, 1), 7.0)], axis=1)
    keys = jax.random.split(jax.random.PRNGKey(5), C)
    out = adaptive_metropolis(spec2, obs, times, y0, jnp.asarray(th0), keys,
                              nits=200, burnin=100, adapt_start=30,
                              walk_mask=jnp.asarray([1.0, 0.0]),
                              method="fixed_dopri5", substeps=1)
    np.testing.assert_allclose(np.asarray(out.theta)[..., 1], 7.0,
                               rtol=1e-12)
    # adaptation must still produce moves on the walked dim
    assert np.asarray(out.theta)[..., 0].std() > 0


@pytest.mark.slow
def test_mcmc_sampler_amh_end_to_end():
    from helpers import demo_df
    from odelib_tpu import models

    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    post = mf.MCMC(chain_inits=4, iterations_per_chain=120,
                   fitsurvey_samples=128, sd_fitdistance=6.0,
                   print_report=False, sampler="amh", adapt_start=20)
    assert len(post) == 4 * 59
    assert np.isfinite(post["chi"]).all()