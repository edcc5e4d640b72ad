"""Censored observations (detection limits): Tobit scoring everywhere.

The reference's chi treats every value as an exact measurement
(``/root/reference/ODElib/Statistics/stats.py:22-41``); data below the
limit of detection — routine in its own virology domain — has no valid
likelihood there. Here a ``censored`` dataframe column marks limit rows
(0 exact, 1 left/LOD, 2 right), scored as ``-log F(limit)`` /
``-log S(limit)`` of the active observation model
(``stats.obs_negloglik``), on the XLA path for all four likelihood
families and inside the fused Pallas kernel for the lognormal default.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
import scipy.stats as ss

import odelib_tpu
from odelib_tpu import stats as jstats
from odelib_tpu.data import (build_obsdata_host, format_dataframe,
                             obsdata_to_device, parse_censor_column)
from odelib_tpu.model import fit_metrics, integrate_theta, make_spec
from odelib_tpu.ops.pallas_mh import survey_fused
from odelib_tpu.samplers import survey


# ---------------------------------------------------------------------------
# column parsing
# ---------------------------------------------------------------------------
def test_parse_censor_column_accepts_bools_ints_strings():
    got = parse_censor_column([True, False, 1, 2, 0, "left", "right",
                               "none", "", "LOD", None, np.nan])
    np.testing.assert_array_equal(
        got, [1, 0, 1, 2, 0, 1, 2, 0, 0, 1, 0, 0])


def test_parse_censor_column_rejects_garbage():
    with pytest.raises(ValueError, match="unknown censoring label"):
        parse_censor_column(["sideways"])
    with pytest.raises(ValueError, match="censoring flag"):
        parse_censor_column([3])


def test_replicate_schema_with_censoring_raises():
    df = pd.DataFrame({"organism": "A", "time": [1.0, 1.0],
                       "abundance": [2.0, 3.0], "replicate": [1, 2],
                       "censored": [True, False]})
    with pytest.raises(ValueError, match="replicate"):
        format_dataframe(df, ("A",))


# ---------------------------------------------------------------------------
# likelihood values vs scipy (censored terms are exact, not
# up-to-constant: -log CDF / -log SF of the observation model)
# ---------------------------------------------------------------------------
def test_lognormal_censored_matches_scipy_logcdf():
    log_L = np.array([1.0, 2.0, 0.5])
    log_C = np.array([1.4, 1.1, 0.8])
    S = np.array([0.3, 0.5, 0.2])
    cen = np.array([1, 1, 2])
    got = float(jstats.obs_negloglik(
        "lognormal", 0.0, log_L, log_C, S, np.exp(log_L), np.exp(log_C),
        censor=cen))
    z = (log_L - log_C) / S
    want = -(ss.norm.logcdf(z[0]) + ss.norm.logcdf(z[1])
             + ss.norm.logcdf(-z[2]))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_student_t_censored_matches_scipy_logcdf():
    nu = 4.0
    log_L = np.array([1.0, 2.0])
    log_C = np.array([1.6, 1.2])
    S = np.array([0.3, 0.5])
    z = (log_L - log_C) / S
    got = float(jstats.obs_negloglik(
        "student_t", nu, log_L, log_C, S, np.exp(log_L), np.exp(log_C),
        censor=np.array([1, 2])))
    want = -(ss.t.logcdf(z[0], nu) + ss.t.logsf(z[1], nu))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_poisson_censored_matches_scipy():
    O = np.array([3.0, 10.0])        # recorded limits (counts)
    C = np.array([6.5, 4.0])         # model intensities
    got = float(jstats.obs_negloglik(
        "poisson", 0.0, np.log(O), np.log(C), np.ones(2), O, C,
        censor=np.array([1, 2])))
    want = -(ss.poisson.logcdf(3, 6.5) + ss.poisson.logsf(10, 4.0))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_negbinom_censored_matches_scipy():
    r = 5.0
    O = np.array([3.0, 10.0])
    C = np.array([6.5, 4.0])
    p = r / (r + C)
    got = float(jstats.obs_negloglik(
        "negbinom", r, np.log(O), np.log(C), np.ones(2), O, C,
        censor=np.array([1, 2])))
    want = -(ss.nbinom.logcdf(3, r, p[0]) + ss.nbinom.logsf(10, r, p[1]))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_exact_points_unchanged_and_mix_is_additive():
    log_O = np.array([1.0, 2.0, 1.5])
    log_C = np.array([1.2, 1.9, 1.0])
    S = np.array([0.3, 0.4, 0.2])
    base = float(jstats.obs_negloglik(
        "lognormal", 0.0, log_O, log_C, S, np.exp(log_O), np.exp(log_C)))
    with_flags = float(jstats.obs_negloglik(
        "lognormal", 0.0, log_O, log_C, S, np.exp(log_O), np.exp(log_C),
        censor=np.zeros(3, np.int32)))
    np.testing.assert_allclose(base, with_flags, rtol=1e-12)
    # censoring one point replaces exactly its term
    cen = np.array([0, 1, 0])
    mixed = float(jstats.obs_negloglik(
        "lognormal", 0.0, log_O, log_C, S, np.exp(log_O), np.exp(log_C),
        censor=cen))
    z1 = (log_O[1] - log_C[1]) / S[1]
    want = base - 0.5 * z1 * z1 - ss.norm.logcdf(z1)
    np.testing.assert_allclose(mixed, want, rtol=1e-6)


def test_censored_failure_semantics_and_grad():
    """A NaN prediction at a censored point must make the score
    non-finite (blow-ups reject), and the censored score must be
    differentiable (HMC runs through log_ndtr)."""
    log_O = jnp.array([1.0, 2.0])
    S = jnp.ones(2)
    cen = jnp.array([1, 1])
    bad = jstats.obs_negloglik("lognormal", 0.0, log_O,
                               jnp.array([1.0, jnp.nan]), S,
                               jnp.exp(log_O), jnp.array([2.7, jnp.nan]),
                               censor=cen)
    assert not np.isfinite(float(bad))

    def f(lc):
        return jstats.obs_negloglik("lognormal", 0.0, log_O, lc, S,
                                    jnp.exp(log_O), jnp.exp(lc),
                                    censor=cen)
    g = np.asarray(jax.grad(f)(jnp.array([1.4, 1.1])))
    assert np.all(np.isfinite(g)) and np.all(g > 0)  # higher pred = worse


# ---------------------------------------------------------------------------
# data plumbing
# ---------------------------------------------------------------------------
def _decay(t, y, ps):
    return jnp.stack([-ps[0] * y[0]])


K, Y0, LOD = 0.8, 10.0, 0.5


def _censored_df(seed=0, sigma=0.15):
    """Noisy exponential-decay measurements; values below LOD recorded AT
    the limit with censored=True (the standard assay convention). The
    t=0 row provides the initial state (Framework convention)."""
    rng = np.random.default_rng(seed)
    tobs = np.concatenate([[0.0], np.linspace(0.5, 6.0, 12)])
    true = Y0 * np.exp(-K * tobs)
    meas = true * np.exp(rng.normal(0, sigma, len(tobs)))
    meas[0] = Y0
    cen = meas < LOD
    meas = np.where(cen, LOD, meas)
    return pd.DataFrame({"organism": "A", "time": tobs, "abundance": meas,
                         "log_sigma": sigma, "censored": cen})


def test_build_obsdata_threads_censor_and_masks_sstot():
    df = format_dataframe(_censored_df(), ("A",))
    times = np.linspace(0, 6, 61)
    obs, _ = build_obsdata_host(df, times, ("A",))
    cen = np.asarray(obs.censor)
    assert cen.any() and (cen == 1).sum() == df["censored"].sum()
    # sstot excludes the limit rows
    ab = np.exp(np.asarray(obs.log_abundance))[cen == 0]
    np.testing.assert_allclose(float(obs.sstot),
                               ab.shape[0] * np.var(ab), rtol=1e-12)
    # uncensored df has censor None (no pytree/hash churn on the hot path)
    df0 = format_dataframe(_censored_df().drop(columns="censored"), ("A",))
    obs0, _ = build_obsdata_host(df0, times, ("A",))
    assert obs0.censor is None
    # an all-False censored column collapses to None too
    dfF = _censored_df()
    dfF["censored"] = False
    obsF, _ = build_obsdata_host(format_dataframe(dfF, ("A",)),
                                 times, ("A",))
    assert obsF.censor is None


def test_fit_metrics_rsq_excludes_censored():
    df = format_dataframe(_censored_df(), ("A",))
    times = np.linspace(0, 6, 61)
    obs, _ = build_obsdata_host(df, times, ("A",))
    spec = make_spec(_decay, ("k",), ("A",))
    ys = integrate_theta(spec, jnp.array([K]), jnp.array([Y0]),
                         jnp.asarray(times))
    chi, rsq, _ = fit_metrics(spec, obsdata_to_device(obs), ys, 1)
    assert np.isfinite(float(chi))
    # manual masked R^2
    pred = np.asarray(ys)[np.asarray(obs.t_index), 0]
    keep = np.asarray(obs.censor) == 0
    O = np.exp(np.asarray(obs.log_abundance))
    ssres = np.sum((pred[keep] - O[keep]) ** 2)
    np.testing.assert_allclose(float(rsq),
                               1.0 - ssres / float(obs.sstot), rtol=1e-5)


# ---------------------------------------------------------------------------
# fused kernel
# ---------------------------------------------------------------------------
def test_kernel_log_ndtr_accuracy():
    """The Mosaic-safe log Phi (erf branch + Mills asymptotic tail) must
    track scipy within ~1e-3 nats over the whole working range, including
    across the z = -4 seam, and keep NaN/blow-up semantics."""
    from odelib_tpu.ops.pallas_mh import _log_ndtr_kernel
    z = np.concatenate([np.linspace(-12, -3.5, 60),
                        np.linspace(-3.5, 6, 40)])
    got = np.asarray(_log_ndtr_kernel(jnp.asarray(z, jnp.float32)), float)
    want = ss.norm.logcdf(z)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)
    assert np.isnan(float(_log_ndtr_kernel(jnp.float32(np.nan))))
    assert float(_log_ndtr_kernel(jnp.float32(np.inf))) == 0.0


def test_kernel_t_logcdf_accuracy():
    """The Mosaic-safe Student-t log CDF (fixed-iteration Lentz
    incomplete-beta CF, static nu) must track scipy across dof and the
    whole working z range, and keep NaN semantics (r5)."""
    from odelib_tpu.ops.pallas_mh import _t_logcdf_kernel
    z = np.concatenate([np.linspace(-30, -4, 40),
                        np.linspace(-4, 8, 50)])
    for nu in (1.0, 2.5, 4.0, 30.0, 100.0):
        got = np.asarray(_t_logcdf_kernel(jnp.asarray(z, jnp.float32),
                                          nu), float)
        want = ss.t.logcdf(z, nu)
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3,
                                   err_msg=f"nu={nu}")
    assert np.isnan(float(_t_logcdf_kernel(jnp.float32(np.nan), 4.0)))


@pytest.mark.parametrize("obs_model,obs_param",
                         [("lognormal", 0.0), ("student_t", 4.0)])
@pytest.mark.slow
def test_fused_kernel_parity_with_censoring(obs_model, obs_param):
    df = format_dataframe(_censored_df(), ("A",))
    times = np.linspace(0, 6, 61)
    spec = make_spec(_decay, ("k",), ("A",), obs_model=obs_model,
                     obs_param=obs_param)
    obs_host, _ = build_obsdata_host(df, times, ("A",))
    from odelib_tpu.data import compact_observation_grid
    times_fit, obs_fit_host = compact_observation_grid(obs_host, times)
    thetas = np.exp(np.random.default_rng(1).normal(np.log(K), 0.3, (8, 1)))
    pal = np.asarray(survey_fused(spec, obs_fit_host, times_fit,
                                  np.array([Y0]), thetas, substeps=4,
                                  tile_chains=128, interpret=True))
    xla = np.asarray(survey(
        spec, obsdata_to_device(obs_fit_host, jnp.float32),
        jnp.asarray(times_fit, jnp.float32),
        jnp.asarray([Y0], jnp.float32),
        jnp.asarray(thetas, jnp.float32), method="fixed_dopri5",
        substeps=4))
    # atol 5e-3: the kernel's Mills-tail log Phi is ~1e-3 nats near its
    # z = -4 seam (test_kernel_log_ndtr_accuracy); the t branch's CF is
    # ~1e-3 relative in f32; exact points match to the usual f32 parity
    np.testing.assert_allclose(pal, xla, rtol=3e-4, atol=5e-3)


def test_fused_kernel_rejects_censored_count_models():
    df = format_dataframe(_censored_df(), ("A",))
    times = np.linspace(0, 6, 61)
    spec = make_spec(_decay, ("k",), ("A",), obs_model="poisson")
    obs_host, _ = build_obsdata_host(df, times, ("A",))
    with pytest.raises(ValueError, match="lognormal"):
        survey_fused(spec, obs_host, times, np.array([Y0]),
                     np.array([[K]]), substeps=1, tile_chains=128,
                     interpret=True)


# ---------------------------------------------------------------------------
# end to end
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_mcmc_with_censoring_recovers_decay_rate():
    """Fitting WITH the Tobit likelihood recovers k; treating the limits
    as exact values biases k low (the trajectory is dragged up toward the
    LOD plateau). This is the scientific point of the feature."""
    def fit(df, sd=3.0):
        model = odelib_tpu.ModelFramework(
            ODE=_decay, parameter_names=["k"], state_names=["A"],
            dataframe=df, t_steps=61, ode_style="jax", random_seed=0,
            k=odelib_tpu.parameter(ss.lognorm, {"s": 0.5, "scale": 0.6}),
        )
        post = model.MCMC(chain_inits=16, iterations_per_chain=300,
                          fitsurvey_samples=256, backend="xla",
                          sd_fitdistance=sd, print_report=False)
        return float(post["k"].median())

    df = _censored_df(seed=3)
    k_tobit = fit(df)
    # the naive fit can't even clear the reference's default seeding
    # threshold (the LOD plateau is unfittable by a pure decay) — itself
    # evidence of the bias; loosen the gate so it runs
    k_naive = fit(df.drop(columns="censored"), sd=8.0)
    assert 0.65 < k_tobit < 0.95            # truth 0.8
    assert k_naive < k_tobit                # the documented bias direction
