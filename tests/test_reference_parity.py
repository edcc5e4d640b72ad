"""DIRECT parity against the actual reference implementation.

Most parity tests use scipy as the oracle; these import the real
``/root/reference/ODElib`` package (read-only; pyDOE2 — absent from this
image — is stubbed with an equivalent stratified-uniform LHS) and compare
outputs of the same workload end-to-end. Skipped when the reference tree
is not mounted.
"""
import contextlib
import io
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest
import scipy.stats

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "ODElib")),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_odelib():
    """Import the reference package with a pyDOE2 stand-in."""
    if "pyDOE2" not in sys.modules:
        stub = types.ModuleType("pyDOE2")

        def lhs(n, samples):  # stratified uniform hypercube, pyDOE2 default
            rng = np.random.default_rng(0)
            u = (rng.random((samples, n)) + np.arange(samples)[:, None]) \
                / samples
            for j in range(n):
                u[:, j] = rng.permutation(u[:, j])
            return u

        stub.lhs = lhs
        sys.modules["pyDOE2"] = stub
    # the reference targets pandas<2 (Series.iteritems, removed in 2.0)
    if not hasattr(pd.Series, "iteritems"):
        pd.Series.iteritems = pd.Series.items
    sys.path.insert(0, REF)
    import ODElib
    yield ODElib
    sys.path.remove(REF)


def _zero_i_ref(y, t, ps):
    mu, phi, beta = ps[0], ps[1], ps[2]
    S, V = y[0], y[1]
    return np.array([mu * S - phi * S * V,
                     beta * phi * S * V - phi * S * V])


def _demo_df():
    return pd.read_csv(os.path.join(REF, "demo", "demodata.csv")).replace(
        {"virus": "V", "host": "S"})


def _build(mod, parameter_cls):
    return mod(ODE=_zero_i_ref, parameter_names=["mu", "phi", "beta"],
               state_names=["S", "V"], dataframe=_demo_df(),
               mu=parameter_cls(scipy.stats.lognorm,
                                {"s": 1, "scale": 0.5}),
               phi=parameter_cls(scipy.stats.lognorm,
                                 {"s": 1, "scale": 1e-8}),
               beta=parameter_cls(scipy.stats.lognorm,
                                  {"s": 1, "scale": 30}),
               t_steps=288, random_seed=3)


def test_integrate_matches_reference(ref_odelib):
    """Same params, same grid: our Dopri5 vs the reference's LSODA."""
    import odelib_tpu

    ref = _build(ref_odelib.ModelFramework, ref_odelib.parameter)
    ours = _build(odelib_tpu.ModelFramework, odelib_tpu.parameter)
    for m in (ref, ours):
        m.set_parameters(mu=0.9, phi=3e-8, beta=25.0)
        m.set_inits(S=5.2e6, V=1.1e7)

    ys_ref = ref.integrate(as_dataframe=False)
    ys_ours = np.asarray(ours.integrate(as_dataframe=False))
    scale = np.abs(ys_ref) + 1e3
    assert np.max(np.abs(ys_ours - ys_ref) / scale) < 1e-4


def test_chi_matches_reference(ref_odelib):
    """Identical prediction dict -> identical chi (formula parity on the
    real reference code, not a re-derivation)."""
    import odelib_tpu

    ref = _build(ref_odelib.ModelFramework, ref_odelib.parameter)
    ours = _build(odelib_tpu.ModelFramework, odelib_tpu.parameter)
    for m in (ref, ours):
        m.set_parameters(mu=0.9, phi=3e-8, beta=25.0)
        m.set_inits(S=5.2e6, V=1.1e7)
    pred_ref = ref.integrate(predict_obs=True, as_dataframe=False)
    pred_ours = ours.integrate(predict_obs=True, as_dataframe=False)
    for s in pred_ref:
        np.testing.assert_allclose(pred_ours[s], pred_ref[s], rtol=1e-4)
    np.testing.assert_allclose(ours.get_chi(pred_ref),
                               ref.get_chi(pred_ref), rtol=1e-6)
    np.testing.assert_allclose(ours.get_fitstats(pred_ref)["AIC"],
                               ref.get_fitstats(pred_ref)["AIC"], rtol=1e-6)


@pytest.mark.slow
def test_posterior_parity_with_reference(ref_odelib):
    """Small MCMC on both implementations: best-fit chi and posterior
    medians agree within Monte-Carlo error."""
    import odelib_tpu

    ref = _build(ref_odelib.ModelFramework, ref_odelib.parameter)
    ours = _build(odelib_tpu.ModelFramework, odelib_tpu.parameter)

    with contextlib.redirect_stdout(io.StringIO()):  # ref prints per iter
        post_ref = ref.MCMC(chain_inits=4, iterations_per_chain=300,
                            cpu_cores=1, fitsurvey_samples=512,
                            sd_fitdistance=8.0, print_report=False)
    post_ours = ours.MCMC(chain_inits=4, iterations_per_chain=300,
                          fitsurvey_samples=512, sd_fitdistance=8.0,
                          print_report=False)

    chi_ref = np.nanmin(post_ref["chi"].to_numpy(float))
    chi_ours = np.nanmin(post_ours["chi"].to_numpy(float))
    # both should find fits of comparable quality on this unimodal problem
    assert abs(chi_ours - chi_ref) < 0.35 * max(chi_ref, chi_ours)

    for p in ("mu", "phi", "beta"):
        med_ref = np.nanmedian(post_ref[p].to_numpy(float))
        med_ours = np.nanmedian(post_ours[p].to_numpy(float))
        assert 0.25 < med_ours / med_ref < 4.0, (p, med_ref, med_ours)


@pytest.mark.slow
def test_all_rejected_chain_parity(ref_odelib):
    """What does the reference ACTUALLY do when a chain never accepts?
    Executed answer: it records the seed state every post-burnin iteration
    with acceptance_ratio 0 (``Samplers.py:147-153`` stores
    unconditionally; the NaN row at ``:171-172`` fires only when nothing
    was recorded at all, i.e. burnin >= nits-1). Our sampler matches the
    repeated-seed-row behavior and additionally flags those chains with
    the documented ``all_rejected`` column so pooled posteriors can drop
    them (VERDICT r2 missing 2)."""
    import odelib_tpu

    true = {"mu": 0.9, "phi": 3e-8, "beta": 25.0}

    def build(mod, parameter_cls, df):
        return mod(ODE=_zero_i_ref, parameter_names=["mu", "phi", "beta"],
                   state_names=["S", "V"], dataframe=df,
                   mu=parameter_cls(scipy.stats.lognorm,
                                    {"s": 1, "scale": 0.5}),
                   phi=parameter_cls(scipy.stats.lognorm,
                                     {"s": 1, "scale": 1e-8}),
                   beta=parameter_cls(scipy.stats.lognorm,
                                      {"s": 1, "scale": 30}),
                   t_steps=288, random_seed=3)

    # synthetic data AT the true parameters with an absurdly tight
    # log_sigma: the seed fits near-perfectly, every 5% rwalk proposal
    # costs ~(0.05/1e-4)^2 chi — rejected with probability 1-exp(-1e5)
    probe = build(odelib_tpu.ModelFramework, odelib_tpu.parameter,
                  _demo_df())
    probe.set_parameters(**true)
    probe.set_inits(S=5.2e6, V=1.1e7)
    ys = np.asarray(probe.integrate(as_dataframe=False))
    t_sel = np.linspace(0, len(probe.times) - 1, 9).astype(int)
    rows = []
    for org, col in (("S", 0), ("V", 1)):
        for ti in t_sel:
            rows.append({"organism": org, "time": probe.times[ti],
                         "abundance": ys[ti, col], "log_sigma": 1e-4})
    df = pd.DataFrame(rows)

    ref = build(ref_odelib.ModelFramework, ref_odelib.parameter, df)
    ours = build(odelib_tpu.ModelFramework, odelib_tpu.parameter, df)
    for m in (ref, ours):
        m.set_inits(S=5.2e6, V=1.1e7)

    with contextlib.redirect_stdout(io.StringIO()):
        post_ref = ref.MCMC(chain_inits=[dict(true)], cpu_cores=1,
                            iterations_per_chain=40, print_report=False)
    with pytest.warns(UserWarning, match="never accepted"):
        post_ours = ours.MCMC(chain_inits=[dict(true)],
                              iterations_per_chain=40, print_report=False)

    # reference: 19 repeated seed rows, zero acceptance, NO NaN row
    assert len(post_ref) == 19
    assert (post_ref["acceptance_ratio"] == 0.0).all()
    assert not post_ref[["mu", "phi", "beta"]].isna().any().any()
    for p, v in true.items():
        np.testing.assert_allclose(post_ref[p].to_numpy(float), v)

    # ours: same repeated seed rows, plus the all_rejected flag
    assert len(post_ours) == 19
    assert (post_ours["acceptance_ratio"] == 0.0).all()
    assert post_ours["all_rejected"].all()
    for p, v in true.items():
        np.testing.assert_allclose(post_ours[p].to_numpy(float), v,
                                   rtol=1e-6)


def test_reference_gradient_is_broken_and_ours_matches_its_intent(ref_odelib):
    """The reference's gradient() crashes on any normal model: it assigns a
    raw float into self.parameters (Framework.py:1095) and get_parameters
    then dereferences .val on it (Framework.py:581) — latent defect #6.
    Confirm the crash, then check our lax.scan gradient() against a serial
    scipy loop implementing the reference's INTENDED semantics (odeint per
    p, equilibrium seeding via clip(final, 1e-3), endpoint aggregation)."""
    from scipy.integrate import odeint as scipy_odeint

    import odelib_tpu

    ref = _build(ref_odelib.ModelFramework, ref_odelib.parameter)
    ours = _build(odelib_tpu.ModelFramework, odelib_tpu.parameter)
    for m in (ref, ours):
        m.set_parameters(mu=0.9, phi=3e-8, beta=25.0)
        m.set_inits(S=5.2e6, V=1.1e7)

    p_range = np.linspace(0.5, 1.2, 5)
    with contextlib.redirect_stdout(io.StringIO()):
        with pytest.raises(AttributeError):
            ref.gradient("mu", p_range, seed_equilibrium=True,
                         aggregate_enpoints=True, print_status=False)

    out_ours = ours.gradient("mu", p_range, seed_equilibrium=True,
                             aggregate_enpoints=True, print_status=False)

    # intended reference semantics, serial scipy
    times = np.asarray(ours.times, float)
    init = np.array([5.2e6, 1.1e7])
    rows = []
    for p in p_range:
        ys = scipy_odeint(_zero_i_ref, init, times,
                          args=([p, 3e-8, 25.0],), rtol=1e-8, atol=1e-8)
        init = np.clip(ys[-1], 0.001, None)
        rows.append(ys[-1])
    expect = np.asarray(rows)

    got = out_ours[["S", "V"]].to_numpy(float)
    scale = np.abs(expect) + 1e2
    assert np.max(np.abs(got - expect) / scale) < 1e-3
    np.testing.assert_allclose(out_ours["mu"].to_numpy(float), p_range)
