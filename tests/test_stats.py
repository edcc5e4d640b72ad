"""Property tests of fit-statistic kernels vs the reference formulas
(ODElib/Statistics/stats.py:3-63, Framework.py:11-17), reimplemented here
with numpy as the oracle."""
import numpy as np
import pandas as pd
import pytest

from odelib_tpu import stats as jstats


def ref_chi(O, C, S):
    return ((np.ma.masked_invalid(O) - C) ** 2 / (2 * (S ** 2))).sum()


def test_chi_matches_reference(rng):
    O = rng.normal(10, 2, 50)
    C = rng.normal(10, 2, 50)
    S = rng.uniform(0.5, 2.0, 50)
    np.testing.assert_allclose(jstats.chi(O, C, S), ref_chi(O, C, S),
                               rtol=1e-12)


def test_chi_masks_invalid_observations(rng):
    O = rng.normal(10, 2, 20)
    C = rng.normal(10, 2, 20)
    S = rng.uniform(0.5, 2.0, 20)
    O[3] = np.nan
    O[7] = np.inf
    np.testing.assert_allclose(jstats.chi(O, C, S), ref_chi(O, C, S),
                               rtol=1e-12)


def test_chi_propagates_nan_model():
    """NaN in C at a valid O must poison chi (integration-failure signal)."""
    O = np.ones(5)
    C = np.ones(5)
    C[2] = np.nan
    S = np.ones(5)
    assert np.isnan(float(jstats.chi(O, C, S)))


def test_chi_batched(rng):
    O = rng.normal(10, 2, 50)
    S = rng.uniform(0.5, 2.0, 50)
    C = rng.normal(10, 2, (7, 50))
    batched = np.asarray(jstats.chi(O, C, S))
    for i in range(7):
        np.testing.assert_allclose(batched[i], ref_chi(O, C[i], S), rtol=1e-12)


def test_aic():
    np.testing.assert_allclose(jstats.AIC(3.5, 4), -2 * (-3.5) + 2 * 4)


def test_rsqrd_matches_reference(rng):
    C = {"S": rng.lognormal(1, 1, 19), "V": rng.lognormal(2, 1, 19)}
    O = {"S": rng.lognormal(1, 1, 19), "V": rng.lognormal(2, 1, 19)}
    sstot = sum(O[k].shape[0] * np.var(O[k]) for k in O)
    ssres = sum(np.nansum((C[k] - O[k]) ** 2) for k in C)
    expect = 1 - ssres / sstot
    np.testing.assert_allclose(jstats.Rsqrd(C, O), expect, rtol=1e-12)

    # flat variant with precomputed sstot
    Cf = np.concatenate([C["S"], C["V"]])
    Of = np.concatenate([O["S"], O["V"]])
    np.testing.assert_allclose(jstats.rsqrd_flat(Cf, Of, sstot), expect,
                               rtol=1e-12)


def test_rsqrd_nan_model_dropped(rng):
    C = {"S": rng.lognormal(1, 1, 10)}
    O = {"S": rng.lognormal(1, 1, 10)}
    C["S"][4] = np.nan
    ssres = np.nansum((C["S"] - O["S"]) ** 2)
    sstot = 10 * np.var(O["S"])
    np.testing.assert_allclose(jstats.Rsqrd(C, O), 1 - ssres / sstot,
                               rtol=1e-12)


def test_adjusted_rsquared():
    np.testing.assert_allclose(
        jstats.get_adjusted_rsquared(0.9, 38, 3),
        1 - (1 - 0.9) * (38 - 1) / (38 - 3 - 1))


def test_predict_logsigma(rng):
    sigma = rng.uniform(0.1, 3, 11)
    mean = rng.uniform(1, 10, 11)
    np.testing.assert_allclose(
        jstats.predict_logsigma(sigma, mean),
        np.log(1.0 + sigma ** 2.0 / mean ** 2.0) ** 0.5, rtol=1e-12)


def test_rawstats_matches_reference(rng):
    s = pd.Series(rng.lognormal(0.5, 1.2, 1000))
    log_mean = np.log(s).mean()
    median = np.exp(log_mean)
    log_std = np.log(s).std()  # pandas: ddof=1
    std = ((np.exp(log_std ** 2) - 1) *
           np.exp(2 * log_mean + log_std ** 2.0)) ** 0.5
    m, sd = jstats.rawstats(s.to_numpy())
    np.testing.assert_allclose(m, median, rtol=1e-10)
    np.testing.assert_allclose(sd, std, rtol=1e-10)
