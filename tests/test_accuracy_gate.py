"""Quantified accuracy gate for the production hot path (VERDICT r1 task 4).

The fused MCMC kernel scores chi with FIXED-step Dopri5 (substeps=4) on the
COMPACT observation grid (data.py:compact_observation_grid), while the
reference semantics are an adaptive solve on the full 288-point grid. This
gate measures chi(fixed, substeps=4, compact) against the oracle
chi(adaptive Dopri5, rtol 1e-6, full grid, float64) over 1024 LHS draws from
the demo priors (lognorm s=3/scale=1e-8 for mu,phi; s=1/scale=25 for beta —
demo notebook cell 9) and asserts the bounds recorded in BASELINE.md.

Measured r2 (this machine, float64 fixed vs float64 oracle):
  near-fit draws (chi < 500):   max rel err 6.7e-6
  all finite-both draws:        median 2.1e-7, p95 8.2e-5, p99 6.0e-3
  finiteness disagreements:     fixed-finite/adaptive-NaN draws all have
                                chi >= 2.0e4 (blow-up region; both reject)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odelib_tpu import distributions as D
from odelib_tpu.data import (build_obsdata_host, compact_observation_grid,
                             format_dataframe, obsdata_to_device)
from odelib_tpu.model import make_spec
from odelib_tpu.samplers.lhs import sample_lhs
from odelib_tpu.samplers.mh import survey

from helpers import demo_df, zero_i

# smoke tier (r5): 1024-draw adaptive-oracle fixture — runs in the full suite only
pytestmark = pytest.mark.slow

N_DRAWS = 1024
SEED_THRESHOLD = 171.0  # chi of data displaced by 3 sigma (sd_fitdistance=3)


@pytest.fixture(scope="module")
def chis():
    df = format_dataframe(demo_df(), ("S", "V"))
    times_full = np.linspace(0, df["time"].max(), 288)
    spec = make_spec(zero_i, ("mu", "phi", "beta"), ("S", "V"))
    obs_host, _ = build_obsdata_host(df, times_full, spec.post_snames)
    times_fit, obs_fit_host = compact_observation_grid(obs_host, times_full)
    y0 = np.array([df.loc["S"].iloc[0]["abundance"],
                   df.loc["V"].iloc[0]["abundance"]])
    dists = (D.LogNormal(s=3.0, scale=1e-8), D.LogNormal(s=3.0, scale=1e-8),
             D.LogNormal(s=1.0, scale=25.0))
    thetas = np.asarray(sample_lhs(jax.random.PRNGKey(0), dists, N_DRAWS))

    obs_full = obsdata_to_device(obs_host, jnp.float64)
    obs_fit = obsdata_to_device(obs_fit_host, jnp.float64)
    chi_oracle = np.asarray(survey(
        spec, obs_full, jnp.asarray(times_full), jnp.asarray(y0, jnp.float64),
        jnp.asarray(thetas, jnp.float64), method="dopri5", rtol=1e-6,
        atol=1e-2, max_steps=32768))
    chi_fixed = np.asarray(survey(
        spec, obs_fit, jnp.asarray(times_fit), jnp.asarray(y0, jnp.float64),
        jnp.asarray(thetas, jnp.float64), method="fixed_dopri5", substeps=4))
    return chi_oracle, chi_fixed


def test_near_fit_chi_parity(chis):
    """In the region MCMC actually explores (chi < 500), the production
    discretization is indistinguishable from the adaptive oracle."""
    chi_oracle, chi_fixed = chis
    near = np.isfinite(chi_oracle) & np.isfinite(chi_fixed) & (
        chi_oracle < 500.0)
    # the LHS cloud must actually hit the fit region (178 of 1024 prior
    # draws land under chi<500 on the r5 committed synthetic dataset;
    # the reference's lab data scores 69 — the r4 relaxation to 40 is
    # reverted, VERDICT r4 push item 1)
    assert near.sum() >= 50
    rel = np.abs(chi_fixed[near] - chi_oracle[near]) / np.maximum(
        np.abs(chi_oracle[near]), 1.0)
    assert rel.max() < 1e-4, f"near-fit max rel chi err {rel.max():.2e}"


def test_global_chi_error_distribution(chis):
    """Across the whole prior-plausible region the error stays within the
    recorded envelope (large errors occur only at astronomically bad chi)."""
    chi_oracle, chi_fixed = chis
    both = np.isfinite(chi_oracle) & np.isfinite(chi_fixed)
    rel = np.abs(chi_fixed[both] - chi_oracle[both]) / np.maximum(
        np.abs(chi_oracle[both]), 1.0)
    assert np.median(rel) < 1e-5
    assert np.quantile(rel, 0.95) < 1e-3
    # any draw with a materially wrong chi must be deep in rejection land
    bad = rel > 1e-2
    if bad.any():
        assert chi_oracle[both][bad].min() > 100 * SEED_THRESHOLD


def test_auto_schedule_matches_uniform4_accuracy(chis):
    """The headline bench (bench.py) runs the fused kernel on a CALIBRATED
    per-interval substep schedule (ops/schedule.py) instead of uniform
    substeps=4 — ~25% fewer RK steps. Gate: calibrated the same way the
    bench does it (256 draws around the seed region, rtol 1e-5), the
    schedule's chi error vs the adaptive full-grid oracle must match the
    uniform-4 envelope in the region MCMC explores."""
    from odelib_tpu.ops.schedule import calibrate_substeps

    chi_oracle, _ = chis
    df = format_dataframe(demo_df(), ("S", "V"))
    times_full = np.linspace(0, df["time"].max(), 288)
    spec = make_spec(zero_i, ("mu", "phi", "beta"), ("S", "V"))
    obs_host, _ = build_obsdata_host(df, times_full, spec.post_snames)
    times_fit, obs_fit_host = compact_observation_grid(obs_host, times_full)
    y0 = np.array([df.loc["S"].iloc[0]["abundance"],
                   df.loc["V"].iloc[0]["abundance"]])
    rng = np.random.default_rng(0)
    cal = np.asarray(np.array([0.9, 3.0e-8, 25.0])
                     * np.exp(rng.normal(0, 0.3, (256, 3))), np.float32)
    sched = calibrate_substeps(spec, y0, times_fit, cal,
                               rtol=1e-5, atol=1e-2)
    assert sum(sched) < 4 * len(sched)  # it actually saves steps

    dists = (D.LogNormal(s=3.0, scale=1e-8), D.LogNormal(s=3.0, scale=1e-8),
             D.LogNormal(s=1.0, scale=25.0))
    thetas = np.asarray(sample_lhs(jax.random.PRNGKey(0), dists, N_DRAWS))
    obs_fit = obsdata_to_device(obs_fit_host, jnp.float64)
    chi_auto = np.asarray(survey(
        spec, obs_fit, jnp.asarray(times_fit), jnp.asarray(y0, jnp.float64),
        jnp.asarray(thetas, jnp.float64), method="fixed_dopri5",
        substeps=sched))
    near = np.isfinite(chi_oracle) & np.isfinite(chi_auto) & (
        chi_oracle < 500.0)
    assert near.sum() >= 50
    rel = np.abs(chi_auto[near] - chi_oracle[near]) / np.maximum(
        np.abs(chi_oracle[near]), 1.0)
    assert rel.max() < 1e-4, f"auto-sched near-fit max rel err {rel.max():.2e}"
    both = np.isfinite(chi_oracle) & np.isfinite(chi_auto)
    relg = np.abs(chi_auto[both] - chi_oracle[both]) / np.maximum(
        np.abs(chi_oracle[both]), 1.0)
    assert np.median(relg) < 1e-5
    assert np.quantile(relg, 0.95) < 1e-3


def test_finiteness_disagreements_cannot_seed_chains(chis):
    """Fixed-step integration doesn't detect stiff blow-ups (no NaN) — it
    returns a huge chi instead. Verify every such draw is rejected by the
    survey threshold, so the discrepancy can't leak into chain seeding."""
    chi_oracle, chi_fixed = chis
    mask = ~np.isfinite(chi_oracle) & np.isfinite(chi_fixed)
    if mask.any():
        assert chi_fixed[mask].min() > 10 * SEED_THRESHOLD
