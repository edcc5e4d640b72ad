"""Bolus dose events (ModelSpec.dose_events) across every integration path.

Repeated dosing is the pharmacokinetic norm; the reference's ``odeint``
call has no event mechanism (``/root/reference/ODElib/Framework.py:656``).
Convention under test everywhere: ``dose[i]`` joins the state when
integration LEAVES grid point i, so reported trajectories and scored
observations are PRE-dose left limits (troughs).
"""
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
import scipy.stats as ss

import odelib_tpu
from odelib_tpu.data import (build_obsdata_host, compact_observation_grid,
                             format_dataframe)
from odelib_tpu.model import dose_matrix, integrate_theta, make_spec
from odelib_tpu.ops.pallas_mh import survey_fused
from odelib_tpu.samplers import survey
from odelib_tpu.data import obsdata_to_device


def _decay(t, y, ps):
    return jnp.stack([-ps[0] * y[0]])


K = 0.7
DOSES = [(0.0, "A", 10.0), (2.0, "A", 10.0), (4.0, "A", 10.0)]


def _exact_pre_dose(ts, k=K, dose_times=(0.0, 2.0, 4.0), amt=10.0, y0=0.0):
    """Closed-form linear decay with boluses: superposition of decaying
    exponentials; value at t is the PRE-dose left limit."""
    ts = np.asarray(ts, float)
    out = y0 * np.exp(-k * ts)
    for td in dose_times:
        out = out + np.where(ts > td, amt * np.exp(-k * (ts - td)), 0.0)
    return out


@pytest.mark.parametrize("method,kw", [
    ("dopri5", dict(rtol=1e-8, atol=1e-10)),
    ("kvaerno5", dict(rtol=1e-8, atol=1e-10)),
    ("rk4", dict(substeps=32)),
    ("fixed_dopri5", dict(substeps=8)),
])
def test_dosed_decay_matches_closed_form(method, kw):
    spec = make_spec(_decay, ("k",), ("A",), dose_events=DOSES)
    ts = np.linspace(0.0, 6.0, 61)   # dose times land exactly on the grid
    ys = np.asarray(integrate_theta(
        spec, jnp.array([K]), jnp.array([0.0]), jnp.asarray(ts),
        method=method, **kw))[:, 0]
    expect = _exact_pre_dose(ts)
    np.testing.assert_allclose(ys, expect, rtol=1e-5, atol=1e-8)
    # pre-dose convention: at t=2.0 (a dose time) the reported value is
    # the trough, excluding the incoming bolus
    i2 = np.argmin(np.abs(ts - 2.0))
    assert abs(ys[i2] - 10.0 * np.exp(-2 * K)) < 1e-4


def test_dose_snaps_to_nearest_grid_point():
    spec = make_spec(_decay, ("k",), ("A",),
                     dose_events=[(1.02, "A", 5.0)])
    ts = np.linspace(0.0, 2.0, 21)   # grid spacing 0.1; 1.02 snaps to 1.0
    D = np.asarray(dose_matrix(spec, jnp.asarray(ts)))
    assert D.shape == (21, 1)
    assert D[10, 0] == 5.0 and D.sum() == 5.0


def test_make_spec_dose_validation():
    with pytest.raises(ValueError, match="state name"):
        make_spec(_decay, ("k",), ("A",), dose_events=[(1.0, "B", 1.0)])
    with pytest.raises(ValueError, match="out of range"):
        make_spec(_decay, ("k",), ("A",), dose_events=[(1.0, 3, 1.0)])
    s = make_spec(_decay, ("k",), ("A",),
                  dose_events=[(2.0, 0, 1.0), (1.0, "A", 2.0)])
    assert s.dose_events == ((1.0, 0, 2.0), (2.0, 0, 1.0))  # sorted


def _trough_df():
    """Noisy pre-dose trough measurements of the 3-dose decay."""
    rng = np.random.default_rng(0)
    tobs = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    ab = _exact_pre_dose(tobs) * np.exp(rng.normal(0, 0.08, len(tobs)))
    return pd.DataFrame({"organism": "A", "time": tobs, "abundance": ab,
                         "log_sigma": 0.08})


def test_compact_grid_keeps_dose_times():
    df = format_dataframe(_trough_df(), ("A",))
    times = np.linspace(0, 6, 301)
    obs_host, _ = build_obsdata_host(df, times, ("A",))
    ct, _ = compact_observation_grid(obs_host, times,
                                     extra_times=[0.0, 2.0, 4.0])
    for td in (2.0, 4.0):
        assert np.min(np.abs(ct - td)) < 1e-9
    # and without extra_times 4.0 is only there because it's observed
    ct0, _ = compact_observation_grid(obs_host, times)
    assert len(ct) >= len(ct0)


def test_fused_kernel_parity_with_doses():
    df = format_dataframe(_trough_df(), ("A",))
    times = np.linspace(0, 6, 61)
    spec = make_spec(_decay, ("k",), ("A",), dose_events=DOSES)
    obs_host, _ = build_obsdata_host(df, times, ("A",))
    times_fit, obs_fit_host = compact_observation_grid(
        obs_host, times, extra_times=[t for t, _, _ in DOSES])
    thetas = np.exp(np.random.default_rng(1).normal(
        np.log(K), 0.3, (8, 1)))
    pal = np.asarray(survey_fused(spec, obs_fit_host, times_fit,
                                  np.array([0.0]), thetas, substeps=4,
                                  tile_chains=128, interpret=True))
    xla = np.asarray(survey(
        spec, obsdata_to_device(obs_fit_host, jnp.float32),
        jnp.asarray(times_fit, jnp.float32), jnp.asarray([0.0], jnp.float32),
        jnp.asarray(thetas, jnp.float32), method="fixed_dopri5", substeps=4))
    np.testing.assert_allclose(pal, xla, rtol=2e-4, atol=1e-4)


@pytest.mark.slow
def test_mcmc_recovers_elimination_rate():
    """End-to-end: fit k from multi-dose trough data through MCMC()."""
    model = odelib_tpu.ModelFramework(
        ODE=_decay, parameter_names=["k"], state_names=["A"],
        dataframe=_trough_df(), dose_events=DOSES, t_steps=61,
        ode_style="jax", random_seed=0,
        k=odelib_tpu.parameter(ss.lognorm, {"s": 0.7, "scale": 0.5}),
    )
    post = model.MCMC(chain_inits=16, iterations_per_chain=250,
                      fitsurvey_samples=256, backend="xla",
                      print_report=False)
    med = post["k"].median()
    assert 0.55 < med < 0.9        # truth 0.7
    # integrate() (full grid) also applies the doses
    model.set_best_params(post)
    tr = model.integrate(as_dataframe=False)
    i5 = np.argmin(np.abs(model.times - 5.0))
    expect = _exact_pre_dose(np.array([model.times[i5]]),
                             k=float(model.parameters["k"].val))[0]
    assert np.isclose(float(tr[i5, 0]), expect, rtol=1e-3)
