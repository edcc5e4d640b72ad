"""Static step-schedule calibration (ops/schedule.py) + non-uniform substeps
support across odeint_fixed and the fused Pallas kernel."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odelib_tpu import models
from odelib_tpu.ops import calibrate_substeps, odeint_fixed, odeint_grid, \
    schedule_cost
from odelib_tpu.ops.pallas_mh import _normalize_substeps, survey_fused, \
    metropolis_hastings_fused


@pytest.fixture(scope="module")
def zero_i():
    m = models.get("zero_i")
    spec = m.spec()
    times = np.linspace(0.0, 3.0, 18)
    rng = np.random.default_rng(0)
    thetas = m.theta() * np.exp(rng.normal(0, 0.3, (64, 3)))
    return m, spec, times, thetas


def _rhs_fn(spec):
    def f(t, y, args):
        return spec.rhs(t, y, spec.unpack_theta(args))
    return f


def test_accepted_at_tracks_adaptive_work(zero_i):
    m, spec, times, _ = zero_i
    sol = odeint_grid(_rhs_fn(spec), jnp.asarray(m.y0()), jnp.asarray(times),
                      jnp.asarray(m.theta()), rtol=1e-6, atol=1e-4)
    acc = np.asarray(sol.accepted_at)
    assert acc.shape == times.shape
    assert acc[0] == 0
    assert (np.diff(acc) >= 1).all()          # every interval costs work
    assert acc[-1] <= int(sol.num_steps)      # accepted <= attempts


def test_calibrate_shape_and_monotone_cost(zero_i):
    m, spec, times, thetas = zero_i
    sched = calibrate_substeps(spec, m.y0(), times, thetas,
                               rtol=1e-6, atol=1e-4)
    assert len(sched) == len(times) - 1
    assert all(s >= 1 for s in sched)
    # a tighter tolerance must not produce a cheaper schedule
    tight = calibrate_substeps(spec, m.y0(), times, thetas,
                               rtol=1e-9, atol=1e-7)
    assert schedule_cost(tight) >= schedule_cost(sched)


def test_calibrated_schedule_beats_uniform_of_same_cost(zero_i):
    """The point of the schedule: at equal total work, putting steps where
    the controller needed them is more accurate than spreading uniformly."""
    m, spec, times, thetas = zero_i
    f = _rhs_fn(spec)
    th = jnp.asarray(m.theta())
    y0 = jnp.asarray(m.y0())
    ts = jnp.asarray(times)
    sched = calibrate_substeps(spec, m.y0(), times, thetas,
                               rtol=1e-6, atol=1e-4)
    oracle = np.asarray(odeint_grid(f, y0, ts, th,
                                    rtol=1e-10, atol=1e-8).ys)

    def max_rel(sub):
        ys = np.asarray(odeint_fixed(f, y0, ts, th, substeps=sub,
                                     method="dopri5").ys)
        return float(np.max(np.abs(ys - oracle) / np.abs(oracle)))

    err_sched = max_rel(sched)
    # uniform schedule with at most the same total cost
    uni = max(1, schedule_cost(sched) // (len(times) - 1))
    err_uni = max_rel(uni)
    assert err_sched <= err_uni * 1.5  # allow noise; typically much better
    assert err_sched < 1e-4


def test_odeint_fixed_uniform_tuple_matches_int(zero_i):
    m, spec, times, _ = zero_i
    f = _rhs_fn(spec)
    th = jnp.asarray(m.theta())
    y0 = jnp.asarray(m.y0())
    ts = jnp.asarray(times)
    a = odeint_fixed(f, y0, ts, th, substeps=3, method="dopri5")
    b = odeint_fixed(f, y0, ts, th, substeps=(3,) * (len(times) - 1),
                     method="dopri5")
    np.testing.assert_allclose(np.asarray(a.ys), np.asarray(b.ys),
                               rtol=1e-12)
    assert int(a.num_steps) == int(b.num_steps)


def test_odeint_fixed_schedule_validation(zero_i):
    m, spec, times, _ = zero_i
    f = _rhs_fn(spec)
    with pytest.raises(ValueError, match="len\\(ts\\)-1"):
        odeint_fixed(f, jnp.asarray(m.y0()), jnp.asarray(times),
                     jnp.asarray(m.theta()), substeps=(2, 2), method="rk4")


def test_normalize_substeps_errors():
    assert _normalize_substeps(4, 10) == 4
    assert _normalize_substeps([1, 2, 3], 3) == (1, 2, 3)
    with pytest.raises(ValueError, match="3 entries"):
        _normalize_substeps([1, 2], 3)
    with pytest.raises(ValueError, match=">= 1"):
        _normalize_substeps([1, 0, 2], 3)
    with pytest.raises(ValueError, match=">= 1"):
        _normalize_substeps(0, 3)


@pytest.fixture(scope="module")
def fit_setup():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import demo_df
    from odelib_tpu.data import build_obsdata, format_dataframe
    m = models.get("zero_i")
    spec = m.spec()
    df = format_dataframe(demo_df(), ("S", "V"))
    times = np.linspace(0.0, 3.0, 18)
    obs, _ = build_obsdata(df, times, spec.post_snames)
    return spec, obs, times, m


@pytest.mark.slow
def test_survey_fused_uniform_schedule_bitwise(fit_setup):
    spec, obs, times, m = fit_setup
    rng = np.random.default_rng(1)
    thetas = (m.theta() * np.exp(rng.normal(0, 0.2, (8, 3)))).astype(
        np.float32)
    y0 = [5.2e6, 1.1e7]
    chi_int = np.asarray(survey_fused(spec, obs, times, y0, thetas,
                                      substeps=2, tile_chains=128,
                                      interpret=True))
    chi_tup = np.asarray(survey_fused(spec, obs, times, y0, thetas,
                                      substeps=(2,) * (len(times) - 1),
                                      tile_chains=128, interpret=True))
    np.testing.assert_array_equal(chi_int, chi_tup)


@pytest.mark.slow
def test_fused_mh_runs_nonuniform_schedule(fit_setup):
    spec, obs, times, m = fit_setup
    sched = tuple(1 + (i % 3) for i in range(len(times) - 1))
    theta0 = np.tile(np.asarray([m.theta()], np.float32), (4, 1))
    out = metropolis_hastings_fused(
        spec, obs, times, [5.2e6, 1.1e7], theta0, seed=7, nits=20, burnin=5,
        substeps=sched, tile_chains=128, interpret=True)
    assert out.theta.shape[0] == 4
    assert np.isfinite(np.asarray(out.chi)).all()


@pytest.mark.slow
def test_mcmc_auto_substeps_end_to_end(fit_setup):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import demo_df
    m = models.get("zero_i")
    mf = m.framework(demo_df(), t_steps=288, substeps="auto")
    post = mf.MCMC(chain_inits=4, iterations_per_chain=30,
                   fitsurvey_samples=128, sd_fitdistance=6.0,
                   print_report=False, backend="pallas",
                   pallas_interpret=True, pallas_tile_chains=128)
    assert len(post) > 0
    sched = mf._auto_schedule
    assert isinstance(sched, tuple)
    assert len(sched) == len(mf._times_fit) - 1
    # the calibrated schedule is reused (and validated) by later surveys
    sv = mf.fit_survey(samples=16, method="fixed_dopri5")
    assert "chi" in sv


@pytest.mark.slow
def test_auto_substeps_chi_accuracy_gate(fit_setup):
    """chi under the calibrated schedule stays within the accuracy gate of
    the adaptive oracle over near-fit draws (the region chains explore) —
    the same methodology as tests/test_accuracy_gate.py for uniform-4."""
    spec, obs, times, m = fit_setup
    from odelib_tpu.model import chi_of_theta
    import jax

    rng = np.random.default_rng(3)
    thetas = m.theta() * np.exp(rng.normal(0, 0.2, (64, 3)))
    sched = calibrate_substeps(spec, m.y0(), times, thetas,
                               rtol=1e-6, atol=1e-4)
    y0 = jnp.asarray([5.2e6, 1.1e7])

    chi_fix = jax.vmap(lambda th: chi_of_theta(
        spec, obs, th, y0, jnp.asarray(times), method="fixed_dopri5",
        substeps=sched))(jnp.asarray(thetas))
    chi_ora = jax.vmap(lambda th: chi_of_theta(
        spec, obs, th, y0, jnp.asarray(times), method="dopri5",
        rtol=1e-9, atol=1e-7, max_steps=65536))(jnp.asarray(thetas))
    chi_fix, chi_ora = np.asarray(chi_fix), np.asarray(chi_ora)
    finite = np.isfinite(chi_ora)
    # "near-fit" = the better half of the draw cloud (chains concentrate
    # tighter than this); absolute chi depends on whether the real demo CSV
    # or the synthetic fallback data is in use
    near = finite & (chi_ora < np.quantile(chi_ora[finite], 0.5))
    assert near.sum() >= 10
    rel = np.abs(chi_fix[near] - chi_ora[near]) / np.maximum(chi_ora[near],
                                                             1.0)
    assert rel.max() < 1e-3, f"max rel chi err {rel.max():.2e}"


@pytest.mark.slow
def test_auto_stiff_grid_robertson_accuracy():
    """r5 (VERDICT push item 2): auto_stiff_grid turns a NAIVE uniform
    output grid into a pilot-derived graded grid + substep schedule whose
    batched fixed-Kvaerno3 solve matches high-accuracy LSODA — no
    hand-chosen geomspace anywhere."""
    from scipy.integrate import odeint as sodeint

    from odelib_tpu.ops.integrate import odeint_fixed
    from odelib_tpu.ops.schedule import auto_stiff_grid, schedule_cost

    def rober(t, y, k):
        k1, k2, k3 = k
        return jnp.stack([-k1 * y[0] + k3 * y[1] * y[2],
                          k1 * y[0] - k2 * y[1] ** 2 - k3 * y[1] * y[2],
                          k2 * y[1] ** 2])

    def rober_np(y, t, kk):
        return np.array(
            [-kk[0] * y[0] + kk[2] * y[1] * y[2],
             kk[0] * y[0] - kk[1] * y[1] ** 2 - kk[2] * y[1] * y[2],
             kk[1] * y[1] ** 2])

    y0 = jnp.asarray([1.0, 0.0, 0.0])
    times = np.linspace(0.0, 1e3, 32)         # deliberately naive grid
    rng = np.random.default_rng(0)
    pilot = jnp.asarray(np.array([0.04, 3e7, 1e4])
                        * np.exp(rng.normal(0, 0.1, (6, 3))))
    grid, sched, oidx = auto_stiff_grid(rober, y0, times, pilot,
                                        rtol=1e-6, atol=1e-10)
    # requested outputs survive as grid points (up to the relative
    # merge tolerance that protects the f32 device cast)
    np.testing.assert_allclose(np.asarray(grid)[oidx], times, rtol=1e-4)
    assert len(grid) > len(times)             # pilot added transient nodes
    assert schedule_cost(sched) < 64 * (len(grid) - 1)

    ks = jnp.asarray(np.array([0.04, 3e7, 1e4])
                     * np.exp(rng.normal(0, 0.1, (16, 3))))
    ys = np.asarray(jax.jit(jax.vmap(
        lambda k: odeint_fixed(rober, y0, jnp.asarray(grid), k,
                               substeps=sched, method="kvaerno3").ys))(ks))
    for i in (0, 5, 11):
        ref = sodeint(rober_np, [1.0, 0.0, 0.0], times,
                      args=(tuple(np.asarray(ks[i])),),
                      rtol=1e-10, atol=1e-14, mxstep=1000000)
        rel = np.max(np.abs(ys[i][oidx] - ref)
                     / np.maximum(np.abs(ref), 1e-8))
        assert rel < 1e-3, f"lane {i}: max rel err {rel:.2e}"


def test_auto_stiff_grid_fallback_when_pilot_fails():
    """A pilot that cannot integrate falls back to the caller's grid and
    a uniform schedule, with a warning — never an exception."""
    from odelib_tpu.ops.schedule import auto_stiff_grid

    def blow(t, y, k):
        return jnp.stack([k[0] * y[0] * y[0] + 1.0])

    with pytest.warns(UserWarning, match="no pilot lane"):
        grid, sched, oidx = auto_stiff_grid(
            blow, jnp.asarray([1.0]), np.linspace(0, 100.0, 5),
            jnp.asarray([[1e6], [1e7]]), max_steps=64)
    assert len(grid) == 5 and sched == (8, 8, 8, 8)
    np.testing.assert_array_equal(oidx, np.arange(5))
