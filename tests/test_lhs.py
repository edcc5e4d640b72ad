"""LHS sampler properties (TPU-native replacement of pyDOE2,
Statistics/Samplers.py:6-51)."""
import jax
import numpy as np
import pytest
import scipy.stats as ss

from odelib_tpu import distributions as D
from odelib_tpu.samplers import lhs_unit, sample_lhs


def test_unit_lhs_stratification():
    """Exactly one sample per stratum per dimension — the defining LHS
    property (pyDOE2 default criterion)."""
    n, s = 5, 64
    cube = np.asarray(lhs_unit(jax.random.PRNGKey(0), n, s))
    assert cube.shape == (s, n)
    assert (cube >= 0).all() and (cube < 1).all()
    for d in range(n):
        strata = np.floor(cube[:, d] * s).astype(int)
        assert sorted(strata) == list(range(s))


def test_columns_independently_shuffled():
    cube = np.asarray(lhs_unit(jax.random.PRNGKey(1), 2, 128))
    strata = np.floor(cube * 128).astype(int)
    assert (strata[:, 0] != strata[:, 1]).any()


@pytest.mark.slow
def test_ppf_transform_marginals():
    """Each column follows its prior (KS test against scipy)."""
    dists = [D.LogNormal(s=1.0, scale=25.0), D.Uniform(loc=2.0, scale=3.0),
             D.Gamma(a=2.0, scale=1.5)]
    scipys = [ss.lognorm(s=1.0, scale=25.0), ss.uniform(loc=2.0, scale=3.0),
              ss.gamma(a=2.0, scale=1.5)]
    draws = np.asarray(sample_lhs(jax.random.PRNGKey(2), dists, 4000))
    for i, sdist in enumerate(scipys):
        ks = ss.kstest(draws[:, i], sdist.cdf)
        assert ks.pvalue > 1e-3, f"dim {i} marginal off (p={ks.pvalue})"


def test_lhs_beats_iid_uniformity():
    """LHS stratification gives (near-)exact marginal uniformity."""
    cube = np.asarray(lhs_unit(jax.random.PRNGKey(3), 1, 1000))[:, 0]
    # mean of U(0,1) LHS with 1000 strata is within 1/(2*1000) of 0.5
    assert abs(cube.mean() - 0.5) < 2e-3
