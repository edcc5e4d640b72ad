"""Batched Metropolis-Hastings sampler: semantics + statistical correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odelib_tpu.model import make_spec
from odelib_tpu.data import build_obsdata, format_dataframe
from odelib_tpu.samplers import metropolis_hastings, survey

from helpers import zero_i, synthetic_df, TRUE_PARAMS


@pytest.fixture(scope="module")
def setup():
    df = format_dataframe(synthetic_df(), ("S", "V"))
    times = np.linspace(0, 3.1, 120)
    spec = make_spec(zero_i, ("mu", "phi", "beta"), ("S", "V"))
    obs, observed = build_obsdata(df, times, spec.post_snames)
    y0 = np.array([df.loc["S"].iloc[0]["abundance"],
                   df.loc["V"].iloc[0]["abundance"]])
    return spec, obs, jnp.asarray(times), jnp.asarray(y0)


def test_output_shapes_and_iteration_convention(setup):
    spec, obs, times, y0 = setup
    theta0 = jnp.tile(jnp.asarray([[0.6, 2.4e-8, 24.0]]), (3, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    out = metropolis_hastings(spec, obs, times, y0, theta0, keys,
                              nits=100, rtol=1e-6, atol=1e-3)
    # reference: iterations = arange(1, nits); records where it > burnin=50
    assert out.iteration.shape == (49,)
    assert int(out.iteration[0]) == 51 and int(out.iteration[-1]) == 99
    assert out.theta.shape == (3, 49, 3)
    assert out.chi.shape == (3, 49)
    ar = np.asarray(out.acceptance_ratio)
    assert ((ar >= 0) & (ar <= 1)).all()


@pytest.mark.slow
def test_posterior_concentrates_near_truth(setup):
    """Chains started at the truth must stay in a region of good fit and
    produce finite metrics; posterior median within a factor ~2 of truth."""
    spec, obs, times, y0 = setup
    C = 16
    theta_true = np.array([TRUE_PARAMS["mu"], TRUE_PARAMS["phi"],
                           TRUE_PARAMS["beta"]])
    rng = np.random.default_rng(1)
    theta0 = jnp.asarray(theta_true * np.exp(rng.normal(0, 0.1, (C, 3))))
    keys = jax.random.split(jax.random.PRNGKey(1), C)
    out = metropolis_hastings(spec, obs, times, y0, theta0, keys,
                              nits=400, rtol=1e-6, atol=1e-3)
    th = np.asarray(out.theta).reshape(-1, 3)
    assert np.isfinite(th).all()
    med = np.exp(np.log(th).mean(axis=0))
    assert np.all(med / theta_true < 2.5) and np.all(theta_true / med < 2.5)
    chi = np.asarray(out.chi)
    assert np.isfinite(chi).all()
    # accepted fits should beat a mildly-off parameter set
    bad = survey(spec, obs, times, y0,
                 jnp.asarray([theta_true * np.array([1.8, 0.5, 1.5])]),
                 rtol=1e-6, atol=1e-3)
    assert np.isfinite(float(bad[0]))
    assert chi.mean() < float(bad[0])


def test_static_parameters_do_not_walk(setup):
    spec, obs, times, y0 = setup
    theta0 = jnp.asarray([[0.6, 2.4e-8, 24.0]])
    keys = jax.random.split(jax.random.PRNGKey(2), 1)
    mask = jnp.asarray([1.0, 0.0, 1.0])  # phi static
    out = metropolis_hastings(spec, obs, times, y0, theta0, keys,
                              nits=60, walk_mask=mask, rtol=1e-6, atol=1e-3)
    phi = np.asarray(out.theta[0, :, 1])
    np.testing.assert_allclose(phi, 2.4e-8, rtol=1e-12)
    mu = np.asarray(out.theta[0, :, 0])
    assert np.unique(mu).size > 1


def test_failed_integration_rejected_not_fatal(setup):
    """A chain initialized at blow-up parameters yields NaN chi but the run
    completes (reference NaN-tolerance, SURVEY.md 5.3)."""
    spec, obs, times, y0 = setup
    theta0 = jnp.asarray([[50.0, 2.4e-2, 2400.0],    # absurd -> stiff blowup
                          [0.6, 2.4e-8, 24.0]])
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    out = metropolis_hastings(spec, obs, times, y0, theta0, keys,
                              nits=40, rtol=1e-6, atol=1e-3, max_steps=500)
    assert np.isfinite(np.asarray(out.chi[1])).all()


def test_init_override_via_sname0_params():
    """'<sname>0' parameters drive initial conditions (Samplers.py:111-114)."""
    df = format_dataframe(synthetic_df(), ("S", "V"))
    times = np.linspace(0, 3.1, 60)

    def rhs(t, y, ps):  # index ps (reference style) — ps[3] is V0, unused
        return zero_i(t, y, (ps[0], ps[1], ps[2]))

    spec = make_spec(rhs, ("mu", "phi", "beta", "V0"), ("S", "V"))
    assert spec.init_pidx == (-1, 3)
    obs, _ = build_obsdata(df, times, spec.post_snames)
    y0 = jnp.asarray([5.2e6, 0.0])  # V init comes from the V0 parameter
    theta0 = jnp.asarray([[0.6, 2.4e-8, 24.0, 1.1e7]])
    keys = jax.random.split(jax.random.PRNGKey(4), 1)
    out = metropolis_hastings(spec, obs, times, y0, theta0, keys,
                              nits=40, rtol=1e-6, atol=1e-3)
    assert np.isfinite(np.asarray(out.chi)).all()


def test_use_priors_changes_acceptance(setup):
    spec, obs, times, y0 = setup
    theta0 = jnp.asarray([[0.6, 2.4e-8, 24.0]])
    keys = jax.random.split(jax.random.PRNGKey(5), 1)
    from odelib_tpu import distributions as D
    dists = [D.LogNormal(s=3.0, scale=1e-8), D.LogNormal(s=3.0, scale=1e-8),
             D.LogNormal(s=1.0, scale=25.0)]

    def prior_logpdf(theta):
        return sum(d.logpdf(theta[i]) for i, d in enumerate(dists))

    out_a = metropolis_hastings(spec, obs, times, y0, theta0, keys,
                                nits=60, rtol=1e-6, atol=1e-3)
    out_b = metropolis_hastings(spec, obs, times, y0, theta0, keys,
                                nits=60, prior_logpdf=prior_logpdf,
                                use_priors=True, rtol=1e-6, atol=1e-3)
    assert not np.allclose(np.asarray(out_a.theta),
                           np.asarray(out_b.theta))


@pytest.mark.slow
def test_survey_matches_serial_chi(setup):
    spec, obs, times, y0 = setup
    thetas = jnp.asarray([[0.6, 2.4e-8, 24.0],
                          [0.3, 1e-8, 10.0],
                          [1.0, 5e-8, 50.0]])
    batched = np.asarray(survey(spec, obs, times, y0, thetas,
                                rtol=1e-8, atol=1e-3))
    from odelib_tpu.model import chi_of_theta
    for i in range(3):
        single = float(chi_of_theta(spec, obs, thetas[i], y0, times,
                                    rtol=1e-8, atol=1e-3))
        np.testing.assert_allclose(batched[i], single, rtol=1e-10)


def test_burnin_exhausting_nits_raises(setup):
    """ADVICE r1 (low): degenerate burnin >= nits-1 must raise like the
    fused backend instead of returning zero-record outputs."""
    spec, obs, times, y0 = setup[:4]
    import jax
    import pytest as _pytest

    theta0 = jnp.asarray([[0.6, 2.4e-8, 24.0]])
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    with _pytest.raises(ValueError, match="no recorded iterations"):
        metropolis_hastings(spec, obs, times, y0, theta0, keys,
                            nits=8, burnin=7)
