"""Cross-sampler consistency: every sampler in the package targets the
same posterior, so on the exact-Gaussian problem (constant model, known
N(mean(logobs), sig^2/n) posterior over log S0) ALL of them must agree —
with the analytic truth and therefore with each other. One consolidated
guarantee over: XLA MH, adaptive MH, ensemble, parallel tempering, HMC,
tempered SMC, fused-Pallas MH and fused-Pallas ensemble (interpret)."""
import os
import sys

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from odelib_tpu.data import (build_obsdata_host, format_dataframe,  # noqa: E402
                             obsdata_to_device)
from odelib_tpu.model import make_spec  # noqa: E402
from odelib_tpu.ops.pallas_mh import (ensemble_fused,  # noqa: E402
                                      metropolis_hastings_fused)
from odelib_tpu.samplers import (adaptive_metropolis, ensemble_mh,  # noqa: E402
                                 hamiltonian_mc, metropolis_hastings,
                                 parallel_tempering, smc_sample)

# smoke tier (r5): 10-sampler statistical gauntlet — runs in the full suite only
pytestmark = pytest.mark.slow

SIG = 0.3
N_OBS = 10


@pytest.fixture(scope="module")
def problem():
    def const_rhs(t, y, ps):
        return jnp.stack([0.0 * y[0]])

    spec = make_spec(const_rhs, ("S0",), ("S",))
    rng = np.random.default_rng(23)
    tobs = np.linspace(0.0, 3.0, N_OBS)
    logobs = np.log(1e6) + rng.normal(0, SIG, N_OBS)
    rows = [{"organism": "S", "time": t, "abundance": np.exp(la),
             "log_sigma": SIG} for t, la in zip(tobs, logobs)]
    df = format_dataframe(pd.DataFrame(rows), ("S",))
    times = np.linspace(0.0, 3.0, 11)
    obs_host, _ = build_obsdata_host(df, times, spec.post_snames)
    obs_dev = obsdata_to_device(obs_host, jnp.float32)
    post_mean = float(np.mean(logobs))
    post_std = SIG / np.sqrt(N_OBS)
    C = 32
    th0 = np.exp(post_mean + np.random.default_rng(3).normal(
        0, 0.2, (C, 1))).astype(np.float32)
    return (spec, obs_host, obs_dev, np.asarray(times), np.array([1.0]),
            th0, post_mean, post_std)


def _check(z, post_mean, post_std, label, n_indep=32):
    se = post_std / np.sqrt(n_indep)
    assert abs(z.mean() - post_mean) < 6 * se, (
        f"{label}: mean {z.mean():.4f} vs {post_mean:.4f}")
    np.testing.assert_allclose(z.std(), post_std, rtol=0.35,
                               err_msg=label)


def test_all_samplers_agree_on_gaussian_posterior(problem):
    spec, obs_host, obs_dev, times, y0, th0, m, s = problem
    times_d = jnp.asarray(times, jnp.float32)
    y0_d = jnp.asarray(y0, jnp.float32)
    th0_d = jnp.asarray(th0)
    C = th0.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(11), C)
    kw = dict(nits=1200, burnin=600, method="fixed_dopri5", substeps=1)

    outs = {}
    outs["mh"] = metropolis_hastings(spec, obs_dev, times_d, y0_d,
                                     th0_d, keys, **kw)
    outs["amh"] = adaptive_metropolis(spec, obs_dev, times_d, y0_d,
                                      th0_d, keys, **kw)
    outs["ensemble"] = ensemble_mh(spec, obs_dev, times_d, y0_d, th0_d,
                                   jax.random.PRNGKey(12), **kw)
    outs["pt"], _ = parallel_tempering(spec, obs_dev, times_d, y0_d,
                                       th0_d, keys,
                                       temperatures=(1.0, 2.0, 4.0), **kw)
    outs["hmc"] = hamiltonian_mc(spec, obs_dev, times_d, y0_d, th0_d,
                                 keys, nits=600, burnin=300,
                                 n_leapfrog=8, step_size=0.02,
                                 method="fixed_dopri5", substeps=1)
    outs["fused_mh"] = metropolis_hastings_fused(
        spec, obs_host, times, y0, th0, seed=13, nits=1200, burnin=600,
        substeps=1, tile_chains=128, interpret=True)
    outs["fused_ensemble"] = ensemble_fused(
        spec, obs_host, times, y0, np.tile(th0, (8, 1)), seed=14,
        nits=600, burnin=300, substeps=1, tile_chains=256, interpret=True)
    from odelib_tpu.ops.pallas_pt import parallel_tempering_fused
    outs["fused_pt"], _ = parallel_tempering_fused(
        spec, obs_host, times, y0, th0, seed=15, nits=1200, burnin=600,
        temperatures=(1.0, 2.0, 4.0), substeps=1, tile_chains=128,
        interpret=True)

    for label, out in outs.items():
        z = np.log(np.asarray(out.theta)).ravel()
        _check(z, m, s, label)

    # SMC: particles from the analytic prior N(m, 1.5^2) in log space
    rng = np.random.default_rng(5)
    M0, S0P = m, 1.5
    particles = np.exp(M0 + S0P * rng.normal(size=(1024, 1)))

    def prior_logpdf(theta):
        z = jnp.log(theta[0])
        return (-0.5 * ((z - M0) / S0P) ** 2
                - 0.5 * jnp.log(2 * jnp.pi * S0P ** 2))

    smc = smc_sample(spec, obs_dev, times_d, y0_d,
                     jnp.asarray(particles, jnp.float32),
                     jax.random.PRNGKey(15), prior_logpdf=prior_logpdf,
                     n_moves=3, method="fixed_dopri5", substeps=1)
    # SMC targets prior*likelihood; the prior is 5x wider than the
    # likelihood, so its posterior matches within the prior correction
    prec = N_OBS / SIG ** 2 + 1 / S0P ** 2
    m_smc = (N_OBS * m / SIG ** 2 + M0 / S0P ** 2) / prec
    z = np.log(np.asarray(smc.theta)).ravel()
    _check(z, m_smc, 1 / np.sqrt(prec), "smc", n_indep=200)