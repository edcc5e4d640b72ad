"""Parity of odelib_tpu.distributions against scipy.stats."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as ss

from odelib_tpu import distributions as D

Q = np.linspace(0.001, 0.999, 41)
X_POS = np.geomspace(1e-6, 1e3, 31)


CASES = [
    (D.Normal(loc=1.5, scale=2.0), ss.norm(loc=1.5, scale=2.0),
     np.linspace(-6, 9, 31)),
    (D.LogNormal(s=3.0, scale=1e-8), ss.lognorm(s=3.0, scale=1e-8),
     np.geomspace(1e-13, 1e-3, 31)),
    (D.LogNormal(s=1.0, scale=25.0), ss.lognorm(s=1.0, scale=25.0),
     np.geomspace(1e-1, 1e3, 31)),
    (D.Uniform(loc=2.0, scale=5.0), ss.uniform(loc=2.0, scale=5.0),
     np.linspace(2.1, 6.9, 31)),
    (D.Gamma(a=2.5, scale=3.0), ss.gamma(a=2.5, scale=3.0),
     np.geomspace(1e-2, 50, 31)),
    (D.Gamma(a=0.3, scale=1.0), ss.gamma(a=0.3, scale=1.0),
     np.geomspace(1e-4, 10, 31)),
    (D.TruncNormal(a=-1.0, b=2.0, loc=0.5, scale=1.5),
     ss.truncnorm(-1.0, 2.0, loc=0.5, scale=1.5),
     np.linspace(-0.9, 3.4, 31)),
    (D.Exponential(loc=0.0, scale=3.0), ss.expon(scale=3.0),
     np.geomspace(1e-3, 30, 31)),
    (D.Cauchy(loc=1.0, scale=2.0), ss.cauchy(loc=1.0, scale=2.0),
     np.linspace(-20, 22, 31)),
    (D.HalfNormal(loc=0.0, scale=2.5), ss.halfnorm(scale=2.5),
     np.linspace(0.01, 10, 31)),
    (D.Weibull(c=1.8, scale=4.0), ss.weibull_min(1.8, scale=4.0),
     np.geomspace(1e-2, 15, 31)),
    (D.Weibull(c=0.6, scale=1.0), ss.weibull_min(0.6, scale=1.0),
     np.geomspace(1e-4, 8, 31)),
    (D.Beta(a=2.0, b=5.0), ss.beta(2.0, 5.0),
     np.linspace(0.01, 0.99, 31)),
    (D.Beta(a=0.5, b=0.5), ss.beta(0.5, 0.5),
     np.linspace(0.01, 0.99, 31)),
    (D.Beta(a=3.0, b=1.5, loc=2.0, scale=4.0),
     ss.beta(3.0, 1.5, loc=2.0, scale=4.0),
     np.linspace(2.05, 5.95, 31)),
]


@pytest.mark.parametrize("ours,theirs,xs", CASES,
                         ids=[type(c[0]).__name__ + str(i)
                              for i, c in enumerate(CASES)])
def test_pdf_cdf_ppf_match_scipy(ours, theirs, xs):
    np.testing.assert_allclose(ours.pdf(xs), theirs.pdf(xs),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(ours.logpdf(xs), theirs.logpdf(xs),
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(ours.cdf(xs), theirs.cdf(xs),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(ours.ppf(Q), theirs.ppf(Q),
                               rtol=5e-6, atol=1e-14)


def test_positive_normal_matches_reference_construction():
    """Positive_Normal mirrors Statistics/distributions.py:5-14."""
    ours = D.Positive_Normal(loc=2.0, scale=1.0)
    mu, sigma, lower, upper = 2.0, 1.0, 0.0, 2.0 + 1.0 * 100
    ref = ss.truncnorm((lower - mu) / sigma, (upper - mu) / sigma,
                       loc=mu, scale=sigma)
    xs = np.linspace(0.01, 6.0, 21)
    np.testing.assert_allclose(ours.pdf(xs), ref.pdf(xs), rtol=1e-8)
    np.testing.assert_allclose(ours.ppf(Q), ref.ppf(Q), rtol=1e-6)


def test_rvs_matches_distribution():
    dist = D.LogNormal(s=1.0, scale=25.0)
    key = jax.random.PRNGKey(0)
    draws = np.asarray(dist.rvs(key, shape=(200_000,)))
    ks = ss.kstest(draws, ss.lognorm(s=1.0, scale=25.0).cdf)
    assert ks.pvalue > 1e-3


def test_rvs_jittable_and_vmappable():
    dist = D.Gamma(a=2.0, scale=1.0)
    f = jax.jit(lambda k: dist.rvs(k, shape=(4,)))
    out = f(jax.random.PRNGKey(1))
    assert out.shape == (4,) and bool(jnp.all(out > 0))
    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    batched = jax.vmap(lambda k: dist.ppf(jax.random.uniform(k)))(keys)
    assert batched.shape == (8,)


def test_from_scipy_generator_and_name():
    d1 = D.from_scipy(ss.lognorm, {"s": 3.0, "scale": 1e-8})
    assert isinstance(d1, D.LogNormal)
    np.testing.assert_allclose(float(d1.s), 3.0)
    d2 = D.from_scipy("gamma", {"a": 2.0})
    assert isinstance(d2, D.Gamma)
    d3 = D.from_scipy(D.Uniform(loc=0.0, scale=1.0))
    assert isinstance(d3, D.Uniform)
    d4 = D.from_scipy(ss.beta, {"a": 2.0, "b": 5.0})
    assert isinstance(d4, D.Beta)
    d5 = D.from_scipy("halfnorm", {"scale": 2.0})
    assert isinstance(d5, D.HalfNormal)
    with pytest.raises(ValueError):
        D.from_scipy(ss.vonmises, {"kappa": 1.0})


def test_from_scipy_frozen():
    frozen = ss.lognorm(3.0, scale=1e-8)
    d = D.from_scipy(frozen)
    np.testing.assert_allclose(float(d.s), 3.0)
    np.testing.assert_allclose(float(d.scale), 1e-8)


def test_fit_normal_lognormal():
    rng = np.random.default_rng(3)
    data = rng.lognormal(mean=np.log(25.0), sigma=1.0, size=50_000)
    fitted = D.LogNormal().fit(data)
    np.testing.assert_allclose(float(fitted.scale), 25.0, rtol=0.05)
    np.testing.assert_allclose(float(fitted.s), 1.0, rtol=0.05)

    data = rng.normal(2.0, 0.5, size=50_000)
    fitted = D.Normal().fit(data)
    np.testing.assert_allclose(float(fitted.loc), 2.0, atol=0.02)
    np.testing.assert_allclose(float(fitted.scale), 0.5, atol=0.02)


def test_discrete_normal_pmf_shape():
    d = D.DiscreteNormal(mu=10.0, sigma=2.0)
    ks = np.arange(0, 21)
    pmf = np.asarray(d.pmf(ks))
    assert pmf.argmax() == 10
    # ppf inverts cdf on the lattice
    assert float(d.ppf(0.5)) == pytest.approx(10.0, abs=1)
    key = jax.random.PRNGKey(0)
    draws = np.asarray(d.rvs(key, (1000,)))
    assert np.allclose(draws, np.round(draws))
    assert abs(draws.mean() - 10.0) < 0.3


def test_discrete_normal_large_sigma():
    """cdf/ppf must hold for any sigma (the old fixed 288-integer window
    collapsed for sigma > 12)."""
    d = D.DiscreteNormal(mu=0.0, sigma=50.0)
    assert float(d.ppf(0.5)) == pytest.approx(0.0, abs=1)
    q99 = float(d.ppf(0.99))
    assert 110 < q99 < 122          # Phi^-1(0.99) * 50 = 116.3
    assert float(d.cdf(q99)) >= 0.99
    assert float(d.cdf(-q99)) <= 0.011
    # round-trip on the lattice
    for q in (0.1, 0.25, 0.75, 0.9):
        k = float(d.ppf(q))
        assert float(d.cdf(k)) >= q - 1e-6
        assert float(d.cdf(k - 1)) < q + 1e-6


def test_from_scipy_scalar_hyperparams_are_hashable():
    """ADVICE r1 (high): jnp-scalar hyperparameters made the priors tuple
    unhashable at the fused-kernel lru_cache boundary. Scalars must coerce
    to Python floats; array hyperparameters stay device arrays."""
    import jax.numpy as jnp
    import scipy.stats

    d = D.from_scipy(scipy.stats.lognorm,
                     {"s": jnp.float32(3.0), "scale": jnp.asarray(1e-8)})
    hash((d,))  # must not raise
    assert isinstance(d.s, float) and d.s == 3.0
    assert isinstance(d.scale, float)
    # vector hyperparameters (array parameters) are preserved as arrays
    dv = D.from_scipy(scipy.stats.norm,
                      {"loc": jnp.asarray([0.0, 1.0]), "scale": 2.0})
    assert np.asarray(dv.loc).shape == (2,)
