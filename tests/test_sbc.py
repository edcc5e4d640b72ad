"""Simulation-based calibration (utils/sbc.py, ModelFramework.sbc):
a correct pipeline yields uniform ranks; a broken sampler is detected."""
import os
import sys

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

import odelib_tpu  # noqa: E402
from odelib_tpu.distributions import LogNormal  # noqa: E402

# smoke tier (r5): repeated-MCMC simulation-based calibration — runs in the full suite only
pytestmark = pytest.mark.slow


def _decay_fw(seed=0, n=12, sig=0.15):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        [{"organism": "y", "time": t,
          "abundance": 1e6 * np.exp(-t) * np.exp(rng.normal(0, sig)),
          "log_sigma": sig} for t in np.linspace(0.0, 3.0, n)])

    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0]])

    return odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k"], state_names=["y"], dataframe=df,
        t_steps=32, ode_style="jax", random_seed=seed,
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.3, scale=1.0),
                               hyperparameters={}, random_seed=seed))


def test_sbc_calibrated_on_decay():
    """Correct solver + likelihood + sampler: SBC ranks are uniform."""
    fw = _decay_fw(seed=3)
    out = fw.sbc(reps=96, iterations_per_chain=800, thin=6, bins=8,
                 rwalk_std=0.1, print_report=True)
    assert out["n_valid"] == 96
    r = out["ranks"]["k"].to_numpy()
    assert r.min() >= 0 and r.max() <= out["n_draws"]
    # the chain actually moves
    assert 0.05 < out["mean_acceptance"] < 0.95
    assert out["pvalues"]["k"] > 0.005, out["pvalues"]
    assert out["calibrated"]


def test_sbc_detects_stuck_sampler():
    """Negative control: a sampler that cannot move (rwalk_std=0) piles
    every rank at 0 — SBC must flag it."""
    fw = _decay_fw(seed=5)
    with np.errstate(all="ignore"):
        out = fw.sbc(reps=48, iterations_per_chain=200, thin=4,
                     rwalk_std=0.0, print_report=False)
    assert (out["ranks"]["k"] == 0).all()
    assert out["pvalues"]["k"] < 1e-6
    assert not out["calibrated"]


def test_sbc_validation():
    fw = _decay_fw(seed=7)
    with pytest.raises(ValueError, match="prior"):
        fw.sbc(reps=8, static_parameters=["k"])
    with pytest.raises(ValueError, match="recorded"):
        fw.sbc(reps=8, iterations_per_chain=10, burnin=20)


def _two_param_fw(seed=0, n=10, sig=0.2):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        [{"organism": "y", "time": t,
          "abundance": 1e5 * np.exp(-0.8 * t) * np.exp(rng.normal(0, sig)),
          "log_sigma": sig} for t in np.linspace(0.0, 2.0, n)])

    def rhs(t, y, ps):
        k, c = ps
        return jnp.stack([-k * y[0] + 0.0 * c])

    return odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k", "c"], state_names=["y"],
        dataframe=df, t_steps=24, ode_style="jax", random_seed=seed,
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.3, scale=0.8),
                               hyperparameters={}, random_seed=seed),
        c=odelib_tpu.parameter(init_value=1.0))


def test_sbc_with_priorless_slot():
    """Regression: a slot without a prior gets the -1 sentinel — this
    used to crash ('assignment destination is read-only') because the
    jitted output buffer was wrapped, not copied."""
    fw = _two_param_fw(seed=11)
    out = fw.sbc(reps=16, iterations_per_chain=200, thin=4, bins=4,
                 rwalk_std=0.1, print_report=False)
    assert list(out["ranks"].columns) == ["k"]   # only the prior slot
    assert (out["ranks"]["k"] >= 0).all()


def test_rank_uniformity_pvalue_integer_support():
    """Regression: when bins does not divide n_draws+1, expected counts
    must follow each bin's integer support. Perfectly uniform ranks
    (every value 0..M exactly r times) must give p = 1, not a statistic
    growing linearly with the sample count."""
    from odelib_tpu.utils.sbc import rank_uniformity_pvalue

    M, r = 100, 50                   # 101 values, bins=16 doesn't divide
    ranks = np.tile(np.arange(M + 1), r)
    p = rank_uniformity_pvalue(ranks, M, bins=16)
    assert p > 0.9999, p
    # and a genuinely skewed pile of ranks is still flagged
    p_bad = rank_uniformity_pvalue(np.zeros(500, int), M, bins=16)
    assert p_bad < 1e-6
