"""Hamiltonian Monte Carlo sampler (samplers/hmc.py) + gradient utilities.

HMC targets the same z-space posterior as the MH sampler (see the module
docstring's measure-theory note), so the key test is statistical parity of
posterior moments between the two samplers on the demo problem.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from helpers import demo_df, zero_i  # noqa: E402

from odelib_tpu import models  # noqa: E402
from odelib_tpu.data import build_obsdata, format_dataframe  # noqa: E402
from odelib_tpu.model import make_spec  # noqa: E402
from odelib_tpu.samplers import hamiltonian_mc, metropolis_hastings  # noqa: E402


@pytest.fixture(scope="module")
def problem():
    spec = make_spec(zero_i, ("mu", "phi", "beta"), ("S", "V"))
    df = format_dataframe(demo_df(), ("S", "V"))
    times = np.linspace(0.0, 3.0, 18)
    obs, y0 = build_obsdata(df, times, spec.post_snames)
    y0 = jnp.asarray([5.2e6, 1.1e7])
    theta_star = np.array([0.9, 3.0e-8, 25.0])
    return spec, obs, jnp.asarray(times), y0, theta_star


def _chains(theta_star, n, seed, jitter=0.1):
    rng = np.random.default_rng(seed)
    th0 = theta_star * np.exp(rng.normal(0, jitter, (n, 3)))
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return jnp.asarray(th0), keys


@pytest.mark.slow
def test_hmc_runs_and_mixes(problem):
    spec, obs, times, y0, theta_star = problem
    th0, keys = _chains(theta_star, 8, 0)
    out = hamiltonian_mc(spec, obs, times, y0, th0, keys,
                         nits=120, burnin=60, n_leapfrog=5, step_size=0.02)
    assert out.theta.shape == (8, 59, 3)
    ar = np.asarray(out.acceptance_ratio[:, -1])
    assert np.isfinite(np.asarray(out.chi)).all()
    # dual averaging should land acceptance in a healthy band
    assert 0.2 < ar.mean() < 1.0, f"mean acceptance {ar.mean():.2f}"
    # chains actually move
    th = np.asarray(out.theta)
    assert (np.abs(np.diff(np.log(th[..., 0]), axis=1)) > 0).any()


@pytest.fixture(scope="module")
def gaussian_problem():
    """A problem whose posterior is EXACTLY Gaussian in log-parameters:
    constant states equal to their '<sname>0' init parameters, so
    chi(z) = sum_i (log_obs_i - z_state)^2 / (2 sigma^2) — closed-form
    moments to validate the samplers against."""
    import pandas as pd

    def const_rhs(t, y, ps):
        return jnp.stack([0.0 * y[0], 0.0 * y[1]])

    spec = make_spec(const_rhs, ("S0", "V0"), ("S", "V"))
    rng = np.random.default_rng(7)
    sig = 0.3
    tobs = np.linspace(0.0, 3.0, 10)
    rows = []
    mu_true = {"S": np.log(1e6), "V": np.log(3e7)}
    logobs = {"S": [], "V": []}
    for org in ("S", "V"):
        for t in tobs:
            la = mu_true[org] + rng.normal(0, sig)
            logobs[org].append(la)
            rows.append({"organism": org, "time": t,
                         "abundance": np.exp(la), "log_sigma": sig})
    df = format_dataframe(pd.DataFrame(rows), ("S", "V"))
    times = np.linspace(0.0, 3.0, 11)
    obs, _ = build_obsdata(df, times, spec.post_snames)
    # exact posterior over z = (log S0, log V0): independent Gaussians
    post_mean = np.array([np.mean(logobs["S"]), np.mean(logobs["V"])])
    post_std = np.array([sig / np.sqrt(len(tobs))] * 2)
    y0 = jnp.asarray([1.0, 1.0])  # overridden by S0/V0 every step
    return spec, obs, jnp.asarray(times), y0, post_mean, post_std


@pytest.mark.slow
def test_hmc_recovers_exact_gaussian_posterior(gaussian_problem):
    spec, obs, times, y0, post_mean, post_std = gaussian_problem
    C = 32
    rng = np.random.default_rng(11)
    th0 = np.exp(post_mean[None] + rng.normal(0, 0.2, (C, 2)))
    keys = jax.random.split(jax.random.PRNGKey(11), C)
    out = hamiltonian_mc(spec, obs, times, y0, jnp.asarray(th0), keys,
                         nits=400, burnin=200, n_leapfrog=6, step_size=0.05)
    z = np.log(np.asarray(out.theta)).reshape(-1, 2)
    n_eff = C  # conservative: one effective draw per chain
    se = post_std / np.sqrt(n_eff)
    assert np.all(np.abs(z.mean(0) - post_mean) < 5 * se), (
        f"mean {z.mean(0)} vs exact {post_mean} (5se={5 * se})")
    np.testing.assert_allclose(z.std(0), post_std, rtol=0.35)


@pytest.mark.slow
def test_chees_recovers_exact_gaussian_posterior(gaussian_problem):
    """path_adapt=True (ChEES trajectory-length adaptation) must target
    the identical posterior — and actually move tau off its seed."""
    spec, obs, times, y0, post_mean, post_std = gaussian_problem
    C = 32
    rng = np.random.default_rng(21)
    th0 = np.exp(post_mean[None] + rng.normal(0, 0.2, (C, 2)))
    keys = jax.random.split(jax.random.PRNGKey(21), C)
    out = hamiltonian_mc(spec, obs, times, y0, jnp.asarray(th0), keys,
                         nits=400, burnin=200, n_leapfrog=2, step_size=0.05,
                         path_adapt=True)
    z = np.log(np.asarray(out.theta)).reshape(-1, 2)
    se = post_std / np.sqrt(C)
    assert np.all(np.abs(z.mean(0) - post_mean) < 5 * se), (
        f"mean {z.mean(0)} vs exact {post_mean} (5se={5 * se})")
    np.testing.assert_allclose(z.std(0), post_std, rtol=0.35)
    ar = np.asarray(out.acceptance_ratio[:, -1])
    assert 0.2 < ar.mean() <= 1.0


@pytest.mark.slow
def test_chees_static_parameters_stay_fixed(problem):
    spec, obs, times, y0, theta_star = problem
    th0, keys = _chains(theta_star, 4, 5)
    mask = jnp.asarray([1.0, 0.0, 1.0])
    out = hamiltonian_mc(spec, obs, times, y0, th0, keys,
                         nits=60, burnin=30, path_adapt=True, walk_mask=mask)
    th = np.asarray(out.theta)
    expect = np.broadcast_to(np.asarray(th0)[:, None, 1], th[:, :, 1].shape)
    np.testing.assert_allclose(th[:, :, 1], expect, rtol=1e-6)


@pytest.mark.slow
def test_mh_recovers_exact_gaussian_posterior(gaussian_problem):
    """Same oracle for the MH sampler — pins both samplers to the SAME
    measure, making them mutually consistent by transitivity."""
    spec, obs, times, y0, post_mean, post_std = gaussian_problem
    C = 32
    rng = np.random.default_rng(12)
    th0 = np.exp(post_mean[None] + rng.normal(0, 0.2, (C, 2)))
    keys = jax.random.split(jax.random.PRNGKey(12), C)
    out = metropolis_hastings(spec, obs, times, y0, jnp.asarray(th0), keys,
                              nits=1500, burnin=750, method="fixed_dopri5",
                              substeps=1, rwalk_std=0.08)
    z = np.log(np.asarray(out.theta)).reshape(-1, 2)
    se = post_std / np.sqrt(C)
    assert np.all(np.abs(z.mean(0) - post_mean) < 5 * se)
    np.testing.assert_allclose(z.std(0), post_std, rtol=0.35)


@pytest.mark.slow
def test_hmc_static_parameters_stay_fixed(problem):
    spec, obs, times, y0, theta_star = problem
    th0, keys = _chains(theta_star, 4, 3)
    mask = jnp.asarray([1.0, 0.0, 1.0])
    out = hamiltonian_mc(spec, obs, times, y0, th0, keys,
                         nits=60, burnin=30, n_leapfrog=4, walk_mask=mask)
    th = np.asarray(out.theta)
    expect = np.broadcast_to(np.asarray(th0)[:, None, 1], th[:, :, 1].shape)
    np.testing.assert_allclose(th[:, :, 1], expect, rtol=1e-6)


def test_hmc_rejects_adaptive_method(problem):
    spec, obs, times, y0, theta_star = problem
    th0, keys = _chains(theta_star, 2, 4)
    with pytest.raises(ValueError, match="fixed-step"):
        hamiltonian_mc(spec, obs, times, y0, th0, keys, nits=10, burnin=2,
                       method="dopri5")


@pytest.mark.slow
def test_mcmc_sampler_hmc_end_to_end():
    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    post = mf.MCMC(chain_inits=4, iterations_per_chain=60,
                   fitsurvey_samples=128, sd_fitdistance=6.0,
                   print_report=False, sampler="hmc", n_leapfrog=4,
                   backend="xla")
    assert len(post) == 4 * 29
    assert set(["mu", "phi", "beta", "chi", "rsquared", "aic", "iteration",
                "acceptance_ratio", "chain#"]) <= set(post.columns)
    assert np.isfinite(post["chi"]).all()
    with pytest.raises(ValueError, match="hmc"):
        mf.MCMC(chain_inits=2, iterations_per_chain=10, sampler="hmc",
                backend="pallas", fitsurvey_samples=16)
    with pytest.raises(ValueError, match="sampler"):
        mf.MCMC(chain_inits=2, iterations_per_chain=10, sampler="nuts",
                fitsurvey_samples=16)


def test_chi_sensitivity_matches_finite_differences():
    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    g = mf.get_chi_sensitivity(log_scale=True)
    assert set(g) == {"mu", "phi", "beta"}

    # central finite differences in log space
    from odelib_tpu.model import chi_of_theta
    theta = np.asarray(mf._current_theta(), float)
    spec, obs = mf._spec, mf._obsdata_fit
    times = jnp.asarray(mf._times_fit, jnp.result_type(float))
    y0 = jnp.asarray(mf.get_inits(), jnp.result_type(float))

    def chi_at(th):
        return float(chi_of_theta(spec, obs, jnp.asarray(th), y0, times,
                                  method="fixed_dopri5", substeps=4))

    h = 1e-5
    for i, p in enumerate(("mu", "phi", "beta")):
        up, dn = theta.copy(), theta.copy()
        up[i] *= np.exp(h)
        dn[i] *= np.exp(-h)
        fd = (chi_at(up) - chi_at(dn)) / (2 * h)
        assert np.isfinite(g[p])
        np.testing.assert_allclose(g[p], fd, rtol=5e-3, atol=1e-4)


@pytest.mark.slow
def test_chunked_dispatch_bitwise_identical(problem):
    """chunk_iters bounds per-dispatch wall-clock by scanning in
    host-driven chunks; the carry holds ALL sampler state (key, dual
    averaging, ChEES, mass), so any chunking must reproduce the
    single-dispatch run bitwise."""
    spec, obs, times, y0, theta_star = problem
    th0, keys = _chains(theta_star, 4, 11)
    kw = dict(nits=48, burnin=16, n_leapfrog=3, step_size=0.02,
              path_adapt=True, max_leapfrog=16)
    ref = hamiltonian_mc(spec, obs, times, y0, th0, keys, **kw)
    for e in (5, 16, 31):
        out = hamiltonian_mc(spec, obs, times, y0, th0, keys,
                             chunk_iters=e, **kw)
        np.testing.assert_array_equal(np.asarray(out.theta),
                                      np.asarray(ref.theta))
        np.testing.assert_array_equal(np.asarray(out.chi),
                                      np.asarray(ref.chi))


@pytest.mark.slow
def test_dense_mass_recovers_exact_gaussian_posterior(gaussian_problem):
    """dense_mass=True targets the identical posterior through the
    Cholesky-factored cross-chain covariance metric."""
    spec, obs, times, y0, post_mean, post_std = gaussian_problem
    C = 32
    rng = np.random.default_rng(31)
    th0 = np.exp(post_mean[None] + rng.normal(0, 0.2, (C, 2)))
    keys = jax.random.split(jax.random.PRNGKey(31), C)
    out = hamiltonian_mc(spec, obs, times, y0, jnp.asarray(th0), keys,
                         nits=400, burnin=200, n_leapfrog=6, step_size=0.05,
                         dense_mass=True)
    z = np.log(np.asarray(out.theta)).reshape(-1, 2)
    se = post_std / np.sqrt(C)
    assert np.all(np.abs(z.mean(0) - post_mean) < 5 * se), (
        f"mean {z.mean(0)} vs exact {post_mean} (5se={5 * se})")
    np.testing.assert_allclose(z.std(0), post_std, rtol=0.35)


@pytest.mark.slow
def test_dense_mass_beats_diag_on_correlated_target():
    """The dense metric's whole point: on a strongly correlated target
    the diagonal recipe steps axis-aligned and pays in autocorrelation;
    the full covariance metric decorrelates the dynamics. Measured gap
    on this rho=0.98 4-dim Gaussian is >5x min-ESS — assert a safe 2x."""
    from odelib_tpu.samplers.hmc import hamiltonian_mc_custom
    from odelib_tpu.utils.diagnostics import effective_sample_size

    P, rho = 4, 0.98
    cov = np.full((P, P), rho)
    np.fill_diagonal(cov, 1.0)
    s = np.geomspace(0.2, 2.0, P)
    cov = cov * np.outer(s, s)
    A = jnp.asarray(np.linalg.inv(cov))

    def chi_fn(theta):
        z = jnp.log(theta)
        return 0.5 * z @ A @ z

    C = 128
    key = jax.random.PRNGKey(3)
    th0 = jnp.exp(0.5 * jax.random.normal(key, (C, P)))
    keys = jax.random.split(key, C)
    ess = {}
    for dense in (False, True):
        out = hamiltonian_mc_custom(chi_fn, th0, keys, nits=768, burnin=384,
                                    n_leapfrog=8, dense_mass=dense)
        z = np.log(np.asarray(out.theta))
        ess[dense] = min(effective_sample_size(z[:, :, p])
                         for p in range(P))
    assert ess[True] > 2.0 * ess[False], (
        f"dense min-ESS {ess[True]:.0f} vs diag {ess[False]:.0f}")


@pytest.mark.slow
def test_dense_mass_static_parameters_stay_fixed(problem):
    """Masked dims ride the identity block of the dense metric: zero
    momentum, zero drift, bit-frozen values."""
    spec, obs, times, y0, theta_star = problem
    th0, keys = _chains(theta_star, 4, 7)
    mask = jnp.asarray([1.0, 0.0, 1.0])
    out = hamiltonian_mc(spec, obs, times, y0, th0, keys,
                         nits=60, burnin=30, n_leapfrog=4, walk_mask=mask,
                         dense_mass=True)
    th = np.asarray(out.theta)
    expect = np.broadcast_to(np.asarray(th0)[:, None, 1], th[:, :, 1].shape)
    np.testing.assert_allclose(th[:, :, 1], expect, rtol=1e-6)


@pytest.mark.slow
def test_dense_mass_chunked_bitwise_identical(problem):
    spec, obs, times, y0, theta_star = problem
    th0, keys = _chains(theta_star, 4, 13)
    kw = dict(nits=48, burnin=16, n_leapfrog=3, step_size=0.02,
              dense_mass=True)
    ref = hamiltonian_mc(spec, obs, times, y0, th0, keys, **kw)
    out = hamiltonian_mc(spec, obs, times, y0, th0, keys,
                         chunk_iters=7, **kw)
    np.testing.assert_array_equal(np.asarray(out.theta),
                                  np.asarray(ref.theta))


@pytest.mark.slow
def test_dense_mass_checkpoint_kill_and_resume(problem, tmp_path):
    """The (P, P) mass leaf persists and restores through the dense
    carry skeleton; a killed run resumes bitwise."""
    from odelib_tpu.samplers.hmc import hamiltonian_mc_checkpointed

    spec, obs, times, y0, theta_star = problem
    th0, keys = _chains(theta_star, 4, 17)
    ckpt = str(tmp_path / "hmc_dense.npz")
    kw = dict(nits=40, burnin=12, n_leapfrog=3, step_size=0.02,
              dense_mass=True, checkpoint_every=9, checkpoint_path=ckpt)
    plain = hamiltonian_mc(spec, obs, times, y0, th0, keys,
                           nits=40, burnin=12, n_leapfrog=3,
                           step_size=0.02, dense_mass=True)
    killed = hamiltonian_mc_checkpointed(spec, obs, times, y0, th0, keys,
                                         _stop_after_chunks=2, **kw)
    assert killed is None
    resumed = hamiltonian_mc_checkpointed(spec, obs, times, y0, th0, keys,
                                          resume_from=ckpt, **kw)
    np.testing.assert_array_equal(np.asarray(resumed.theta),
                                  np.asarray(plain.theta))
    np.testing.assert_array_equal(np.asarray(resumed.chi),
                                  np.asarray(plain.chi))


@pytest.mark.slow
def test_warmup_rejuvenation_rescues_stuck_chain():
    """A chain seeded on a NaN plateau never accepts; at the warmup
    boundary it must restart from a random well-mixing peer (resampling
    within the warm ensemble — exact, since recording hasn't started)
    instead of recording its seed for the whole run."""
    from odelib_tpu.samplers.hmc import hamiltonian_mc_custom

    def chi_fn(theta):
        z = jnp.log(theta)[0]
        return jnp.where(jnp.abs(z) > 20.0, jnp.nan, 0.5 * z * z)

    rng = np.random.default_rng(0)
    C = 16
    th0 = np.exp(rng.normal(0, 1, (C, 1)))
    th0[0, 0] = np.exp(30.0)      # every proposal from here is rejected
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    out = hamiltonian_mc_custom(chi_fn, jnp.asarray(th0), keys,
                                nits=200, burnin=100, n_leapfrog=4)
    z0 = np.log(np.asarray(out.theta)[0, :, 0])
    assert np.all(np.abs(z0) < 20.0), "chain 0 still on the NaN plateau"
    assert float(np.asarray(out.acceptance_ratio)[0, -1]) > 0.05
