"""Parallel tempering (samplers/pt.py): invariance of the cold chain and
actual mode-hopping on a constructed bimodal posterior."""
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
from odelib_tpu.samplers import metropolis_hastings, parallel_tempering  # noqa: E402


# ---------------------------------------------------------------------------
# Exact-Gaussian invariance (same oracle as test_hmc.py): swaps must not
# corrupt the cold chain's stationary distribution.
# ---------------------------------------------------------------------------

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


def test_pt_cold_chain_recovers_exact_gaussian(gaussian_problem):
    spec, obs, times, y0, post_mean, post_std = gaussian_problem
    C = 32
    rng = np.random.default_rng(21)
    th0 = np.exp(post_mean + rng.normal(0, 0.2, (C, 1)))
    keys = jax.random.split(jax.random.PRNGKey(21), C)
    out, swap_rate = parallel_tempering(
        spec, obs, times, y0, jnp.asarray(th0), keys,
        temperatures=(1.0, 2.0, 4.0), nits=1500, burnin=750,
        method="fixed_dopri5", substeps=1, rwalk_std=0.08)
    z = np.log(np.asarray(out.theta)).ravel()
    se = post_std / np.sqrt(C)
    assert abs(z.mean() - post_mean) < 5 * se
    np.testing.assert_allclose(z.std(), post_std, rtol=0.35)
    assert float(np.mean(np.asarray(swap_rate))) > 0.05


# ---------------------------------------------------------------------------
# Bimodal decay-rate posterior: dy/dt = -g(k) y with g(k) = (k-2)^2 + 0.5
# equals the true rate 1.0 at k = 2 +- sqrt(0.5) — two exact posterior
# modes separated by a chi barrier at k = 2.
# ---------------------------------------------------------------------------

K_LO = 2.0 - np.sqrt(0.5)   # 1.293
K_HI = 2.0 + np.sqrt(0.5)   # 2.707


@pytest.fixture(scope="module")
def bimodal_problem():
    def rhs(t, y, ps):
        (k,) = ps
        g = (k - 2.0) ** 2 + 0.5
        return jnp.stack([-g * y[0]])

    spec = make_spec(rhs, ("k",), ("y",))
    sig = 0.3
    tobs = np.linspace(0.0, 3.0, 10)
    rows = [{"organism": "y", "time": t, "abundance": 1e6 * np.exp(-t),
             "log_sigma": sig} for t in tobs]
    df = format_dataframe(pd.DataFrame(rows), ("y",))
    times = np.linspace(0.0, 3.0, 16)
    obs, _ = build_obsdata(df, times, spec.post_snames)
    return spec, obs, jnp.asarray(times), jnp.asarray([1e6])


def _mode_fractions(theta):
    k = np.asarray(theta).ravel()
    lo = np.abs(np.log(k) - np.log(K_LO)) < 0.25
    hi = np.abs(np.log(k) - np.log(K_HI)) < 0.25
    return lo.mean(), hi.mean()


def test_plain_mh_stays_in_one_mode(bimodal_problem):
    spec, obs, times, y0 = bimodal_problem
    C = 16
    th0 = jnp.full((C, 1), K_LO)
    keys = jax.random.split(jax.random.PRNGKey(5), C)
    out = metropolis_hastings(spec, obs, times, y0, th0, keys,
                              nits=1200, burnin=600, method="fixed_dopri5",
                              substeps=2, rwalk_std=0.05)
    frac_lo, frac_hi = _mode_fractions(out.theta)
    assert frac_lo > 0.5
    assert frac_hi < 0.05, f"random walk crossed the barrier ({frac_hi})"


def test_pt_hops_between_modes(bimodal_problem):
    spec, obs, times, y0 = bimodal_problem
    C = 16
    th0 = jnp.full((C, 1), K_LO)   # ALL chains start in the low mode
    keys = jax.random.split(jax.random.PRNGKey(6), C)
    out, swap_rate = parallel_tempering(
        spec, obs, times, y0, th0, keys,
        temperatures=(1.0, 2.0, 4.0, 8.0, 16.0),
        nits=1200, burnin=600, method="fixed_dopri5", substeps=2,
        rwalk_std=0.05)
    frac_lo, frac_hi = _mode_fractions(out.theta)
    assert frac_hi > 0.10, (
        f"tempering failed to reach the second mode (hi={frac_hi}, "
        f"swap={float(np.mean(np.asarray(swap_rate))):.3f})")
    assert frac_lo > 0.10
    # symmetric modes: long-run occupancy should not be wildly lopsided
    assert 0.1 < frac_hi / max(frac_lo + frac_hi, 1e-9) < 0.9


def test_pt_validation_errors(bimodal_problem):
    spec, obs, times, y0 = bimodal_problem
    th0 = jnp.full((2, 1), K_LO)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    with pytest.raises(ValueError, match="temperatures\\[0\\]"):
        parallel_tempering(spec, obs, times, y0, th0, keys,
                           temperatures=(2.0, 4.0), nits=10, burnin=2)
    with pytest.raises(ValueError, match="increasing"):
        parallel_tempering(spec, obs, times, y0, th0, keys,
                           temperatures=(1.0, 4.0, 2.0), nits=10, burnin=2)
    with pytest.raises(ValueError, match=">= 2"):
        parallel_tempering(spec, obs, times, y0, th0, keys,
                           temperatures=(1.0,), nits=10, burnin=2)


@pytest.mark.slow
def test_mcmc_sampler_pt_end_to_end():
    from helpers import demo_df
    from odelib_tpu import models

    mf = models.get("zero_i").framework(demo_df(), t_steps=288)
    post = mf.MCMC(chain_inits=4, iterations_per_chain=60,
                   fitsurvey_samples=128, sd_fitdistance=6.0,
                   print_report=False, sampler="pt",
                   temperatures=(1.0, 3.0, 9.0))
    assert len(post) == 4 * 29
    assert np.isfinite(post["chi"]).all()


# ---------------------------------------------------------------------------
# round 4: per-proposal swap rates, checkpointing, ladder adaptation
# ---------------------------------------------------------------------------

def test_swap_attempts_counts():
    from odelib_tpu.samplers.pt import swap_attempts

    # nits=9, swap_every=2 -> swap rounds at it=2,4,6,8 with parities
    # 1,0,1,0 -> pair 0 (parity 0) attempted twice, pair 1 twice
    att = swap_attempts(9, 2, 2)
    np.testing.assert_array_equal(att, [2.0, 2.0])
    # swap_every=1 -> rounds 1..8, parity alternates -> 4/4
    np.testing.assert_array_equal(swap_attempts(9, 1, 2), [4.0, 4.0])


def test_swap_rate_is_per_proposal(gaussian_problem):
    """Nearly-equal adjacent temperatures accept ~every proposed swap:
    per-proposal rate ~1.0 (the old all-rounds denominator capped ~0.5)."""
    spec, obs, times, y0, *_ = gaussian_problem
    C = 8
    th0 = jnp.full((C, 1), 1e6)
    keys = jax.random.split(jax.random.PRNGKey(3), C)
    out, swap_rate = parallel_tempering(
        spec, obs, times, y0, th0, keys,
        temperatures=(1.0, 1.0001, 1.0002), nits=101, burnin=50,
        method="fixed_dopri5", substeps=1, rwalk_std=0.01)
    assert swap_rate.shape == (C, 2)
    assert float(np.mean(np.asarray(swap_rate))) > 0.9


@pytest.mark.slow
def test_pt_checkpointed_bitwise_and_resume(gaussian_problem, tmp_path):
    from odelib_tpu.samplers.pt import parallel_tempering_checkpointed

    spec, obs, times, y0, *_ = gaussian_problem
    C = 6
    rng = np.random.default_rng(4)
    th0 = jnp.asarray(1e6 * np.exp(rng.normal(0, 0.1, (C, 1))))
    keys = jax.random.split(jax.random.PRNGKey(5), C)
    kw = dict(temperatures=(1.0, 2.0, 4.0), nits=41, burnin=20,
              method="fixed_dopri5", substeps=1, rwalk_std=0.1)
    ref, sr = parallel_tempering(spec, obs, times, y0, th0, keys, **kw)
    ck = str(tmp_path / "pt.npz")
    out, sr2 = parallel_tempering_checkpointed(
        spec, obs, times, y0, th0, keys, checkpoint_every=7,
        checkpoint_path=ck, **kw)
    for a, b in zip(ref[:5], out[:5]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(sr), np.asarray(sr2))
    # kill after 2 chunks -> resume -> bitwise
    ck2 = str(tmp_path / "pt2.npz")
    r = parallel_tempering_checkpointed(
        spec, obs, times, y0, th0, keys, checkpoint_every=7,
        checkpoint_path=ck2, _stop_after_chunks=2, **kw)
    assert r is None
    out2, sr3 = parallel_tempering_checkpointed(
        spec, obs, times, y0, th0, keys, checkpoint_every=7,
        checkpoint_path=ck2, resume_from=ck2, **kw)
    for a, b in zip(ref[:5], out2[:5]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="different PT configuration"):
        parallel_tempering_checkpointed(
            spec, obs, times, y0, th0, keys, checkpoint_every=7,
            checkpoint_path=ck2, resume_from=ck2,
            **{**kw, "rwalk_std": 0.2})


@pytest.mark.slow
def test_tune_ladder_adapts_to_target(bimodal_problem):
    """tune_ladder converges the geometric ratio so the mean per-proposal
    swap acceptance lands near the target, and the adapted ladder matches
    or beats the hand-tuned (1,2,4,8) on the bimodal oracle (VERDICT r3
    push item 3 done-criterion)."""
    from odelib_tpu.samplers.pt import tune_ladder

    spec, obs, times, y0 = bimodal_problem
    C = 16
    th0 = jnp.full((C, 1), K_LO)
    keys = jax.random.split(jax.random.PRNGKey(6), C)
    temps, acc = tune_ladder(
        spec, obs, times, y0, th0, keys, n_temps=5, target_swap=0.3,
        pilot_iters=120, method="fixed_dopri5", substeps=2,
        rwalk_std=0.05)
    assert temps[0] == 1.0 and len(temps) == 5
    assert all(b < a for b, a in zip(temps, temps[1:]))
    assert 0.15 < acc < 0.55, (temps, acc)

    kw = dict(nits=1200, burnin=600, method="fixed_dopri5", substeps=2,
              rwalk_std=0.05)
    out_auto, _ = parallel_tempering(
        spec, obs, times, y0, th0, keys, temperatures=temps, **kw)
    out_hand, _ = parallel_tempering(
        spec, obs, times, y0, th0, keys,
        temperatures=(1.0, 2.0, 4.0, 8.0, 16.0), **kw)
    lo_a, hi_a = _mode_fractions(out_auto.theta)
    lo_h, hi_h = _mode_fractions(out_hand.theta)
    # the adapted ladder must reach the far mode at least as well as the
    # hand-guessed one (allow MC noise slack)
    assert hi_a > 0.10
    assert hi_a >= hi_h - 0.10, (temps, hi_a, hi_h)
