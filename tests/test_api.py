"""Compat-layer parity: ModelFramework/parameter vs reference behavior
(ODElib/Framework.py), using scipy as the numeric oracle."""
import numpy as np
import pandas as pd
import pytest
import scipy.stats
from scipy.integrate import odeint as scipy_odeint

import odelib_tpu
from odelib_tpu import ModelFramework, parameter

from helpers import demo_df, synthetic_df, zero_i, zero_i_refstyle, one_i


@pytest.fixture()
def zeroI():
    return ModelFramework(ODE=zero_i,
                          parameter_names=["mu", "phi", "beta"],
                          state_names=["S", "V"],
                          dataframe=demo_df(),
                          mu=parameter(scipy.stats.lognorm,
                                       {"s": 3, "scale": 1e-8}),
                          phi=parameter(scipy.stats.lognorm,
                                        {"s": 3, "scale": 1e-8}),
                          beta=parameter(scipy.stats.lognorm,
                                         {"s": 1, "scale": 25}),
                          t_steps=288)


def test_package_exports():
    assert hasattr(odelib_tpu, "ModelFramework")
    assert hasattr(odelib_tpu, "parameter")


def test_parameter_class():
    p = parameter(scipy.stats.lognorm, {"s": 1, "scale": 25})
    assert p.has_distribution()
    assert p.val.shape == ()
    assert float(p.val) > 0
    # pdf at current value (reference bug 3 fixed: deterministic now)
    assert p.pdf() == p.pdf(p.val)
    v0 = float(p.val)
    p.rwalk()
    assert float(p.val) != v0 and float(p.val) > 0
    c = p.copy()
    assert float(c.val) == float(p.val) and c.dist is p.dist
    p2 = parameter(init_value=3.0, name="x")
    assert not p2.has_distribution()
    assert p2.pdf() == 1.0
    with pytest.raises(ValueError):
        parameter()


def test_parameter_fit():
    """Reference bug 1 (Framework.py:93) fixed: fit() works."""
    rng = np.random.default_rng(0)
    p = parameter(scipy.stats.norm, {"loc": 0, "scale": 1})
    p.fit(rng.normal(5.0, 2.0, 2000))
    assert abs(p.hp["loc"] - 5.0) < 0.2
    assert abs(p.hp["scale"] - 2.0) < 0.2


def test_construction_and_accessors(zeroI):
    assert zeroI.get_pnames() == ["mu", "phi", "beta"]
    assert zeroI.get_snames() == ["S", "V"]
    assert zeroI.get_numstatevar() == 2
    assert len(zeroI.times) == 288
    assert zeroI.times[0] == 0.0
    # initial states auto-extracted from t==0 rows (Framework.py:246-249)
    inits = zeroI.get_inits(as_dict=True)
    df = demo_df()
    at0 = df[df["time"] == 0]
    for org in ("S", "V"):
        expect = at0[at0["organism"] == org]["abundance"].iloc[0]
        assert inits[org] == pytest.approx(expect)
    r = repr(zeroI)
    assert "Parameters:" in r and "mu" in r and "Initial States:" in r


def test_set_parameters_raw_value_fresh(zeroI):
    """Reference bug 2 (Framework.py:452) fixed: raw value for a fresh
    parameter becomes a parameter object holding that value."""
    m = ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                       state_names=["S", "V"], t_end=3, t_steps=10)
    m.set_parameters(mu=0.5)
    assert isinstance(m.parameters["mu"], parameter)
    assert float(m.parameters["mu"].val) == 0.5
    with pytest.raises(Exception):
        m.set_parameters(nope=1.0)
    with pytest.raises(Exception):
        m.set_inits(nope=1.0)


def test_get_parameters_formats(zeroI):
    d = zeroI.get_parameters(as_dict=True)
    assert set(d) == {"mu", "phi", "beta"}
    t = zeroI.get_parameters()
    assert isinstance(t, tuple) and len(t) == 1 and len(t[0]) == 3
    # kwarg override
    d2 = zeroI.get_parameters(as_dict=True, mu=9.0)
    assert d2["mu"] == 9.0


def test_integrate_matches_scipy(zeroI):
    zeroI.set_parameters(mu=0.6, phi=2.4e-8, beta=24.0)
    mod = zeroI.integrate()
    assert list(mod.columns) == ["S", "V", "time"]
    y0 = zeroI.get_inits()

    def f(y, t):
        S, V = y
        return [0.6 * S - 2.4e-8 * S * V,
                24.0 * 2.4e-8 * S * V - 2.4e-8 * S * V]

    ref = scipy_odeint(f, y0, zeroI.times, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(mod[["S", "V"]].to_numpy(), ref, rtol=1e-5)

    raw = zeroI.integrate(as_dataframe=False)
    np.testing.assert_allclose(raw, ref, rtol=1e-5)

    pred = zeroI.integrate(predict_obs=True, as_dataframe=False)
    assert set(pred) == {"S", "V"}
    for s in pred:
        assert pred[s].shape == zeroI._obs_logabundance[s].shape

    pred_df = zeroI.integrate(predict_obs=True, as_dataframe=True)
    assert list(pred_df.columns) == ["time", "abundance"]
    assert pred_df.index.name == "organism"


def test_integrate_reference_style_rhs():
    """The demo notebook's numpy-written f(y, t, ps) works verbatim."""
    m = ModelFramework(ODE=zero_i_refstyle,
                       parameter_names=["mu", "phi", "beta"],
                       state_names=["S", "V"],
                       dataframe=synthetic_df(),
                       mu=0.6, phi=2.4e-8, beta=24.0, t_steps=60)
    mod = m.integrate(as_dataframe=False)
    assert np.isfinite(mod).all()
    m2 = ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                        state_names=["S", "V"], dataframe=synthetic_df(),
                        mu=0.6, phi=2.4e-8, beta=24.0, t_steps=60)
    np.testing.assert_allclose(mod, m2.integrate(as_dataframe=False),
                               rtol=1e-10)


def test_get_chi_matches_reference_formula(zeroI):
    zeroI.set_parameters(mu=0.6, phi=2.4e-8, beta=24.0)
    mod_dict = zeroI.integrate(predict_obs=True, as_dataframe=False)
    O, C, S = [], [], []
    for s in mod_dict:
        O.append(zeroI._obs_logabundance[s])
        C.append(np.log(mod_dict[s]))
        S.append(zeroI._obs_logsigma[s])
    expect = float(((np.ma.masked_invalid(np.concatenate(O))
                     - np.concatenate(C)) ** 2
                    / (2 * np.concatenate(S) ** 2)).sum())
    assert zeroI.get_chi(mod_dict) == pytest.approx(expect, rel=1e-10)
    fs = zeroI.get_fitstats()
    assert set(fs) == {"Chi", "R^2", "AIC"}
    assert fs["AIC"] == pytest.approx(2 * fs["Chi"] + 2 * 3, rel=1e-10)


def test_state_summations():
    """H = S + I1 (demo cell 21)."""
    df = demo_df().replace({"V": "V", "S": "H"})
    m = ModelFramework(ODE=one_i, parameter_names=["mu", "phi", "beta",
                                                   "lam"],
                       state_names=["S", "I1", "V"], dataframe=df,
                       state_summations={"H": ["S", "I1"]},
                       mu=0.6, phi=2.4e-8, beta=24.0, lam=1.5,
                       S=5236900, t_steps=60)
    assert m.get_snames() == ["H", "V"]
    assert m.get_snames(after_summation=False) == ["S", "I1", "V"]
    mod = m.integrate()
    assert list(mod.columns) == ["H", "V", "time"]
    raw = m.integrate(as_dataframe=False, sum_subpopulations=False)
    np.testing.assert_allclose(mod["H"], raw[:, 0] + raw[:, 1], rtol=1e-12)
    np.testing.assert_allclose(mod["V"], raw[:, 2], rtol=1e-12)
    # validation errors (Framework.py:356-359)
    with pytest.raises(ValueError):
        ModelFramework(ODE=one_i, parameter_names=["mu"],
                       state_names=["S", "I1", "V"],
                       state_summations={"H": ["S", "I1"], "G": ["S", "V"]})
    with pytest.raises(ValueError):
        ModelFramework(ODE=one_i, parameter_names=["mu"],
                       state_names=["S", "I1", "V"],
                       state_summations={"H": ["S", "nope"]})


@pytest.mark.slow
def test_lhs_samples_and_fit_survey(zeroI):
    df = zeroI._lhs_samples(samples=50)
    assert list(df.columns) == ["mu", "phi", "beta"]
    assert len(df) == 50
    assert (df > 0).all().all()

    fs = zeroI.fit_survey(samples=64)
    assert list(fs.columns) == ["mu", "phi", "beta", "chi"]
    assert len(fs) == 64
    assert fs["chi"].notna().any()


def test_copy_independent(zeroI):
    c = zeroI.copy(overwrite={"mu": 123.0})
    assert float(c.parameters["mu"].val) == 123.0
    assert float(zeroI.parameters["mu"].val) != 123.0
    c.set_inits(S=1.0)
    assert zeroI.istates["S"] != 1.0
    assert c._spec is zeroI._spec  # shared static spec -> shared jit cache


@pytest.mark.slow
def test_mcmc_end_to_end(zeroI, capsys):
    zeroI.set_parameters(mu=0.6, phi=2.4e-8, beta=24.0)
    post = zeroI.MCMC(chain_inits=4, iterations_per_chain=60,
                      fitsurvey_samples=256, sd_fitdistance=6.0,
                      print_report=True)
    # reference posterior columns (Samplers.py:160-165 + Framework.py:1036)
    # plus the documented all_rejected sentinel (VERDICT r2 missing 2)
    assert list(post.columns) == ["mu", "phi", "beta", "chi", "rsquared",
                                  "aic", "iteration", "acceptance_ratio",
                                  "chain#", "all_rejected"]
    assert not post["all_rejected"].any()
    # nits=60 -> burnin=30 -> records it in 31..59 = 29 per chain
    assert len(post) == 4 * 29
    assert set(post["chain#"]) == {0, 1, 2, 3}
    assert post["iteration"].min() == 31
    assert post["iteration"].max() == 59
    assert post["chi"].notna().all()
    out = capsys.readouterr().out
    assert "Fitting Report" in out
    # set_best_params ran; current params should equal the min-chi row
    best = post.loc[post.chi == post.chi.min()].iloc[0]
    assert float(zeroI.parameters["mu"].val) == pytest.approx(best["mu"])


@pytest.mark.slow
def test_mcmc_chain_inits_dataframe(zeroI):
    inits = pd.DataFrame([{"mu": 0.6, "phi": 2.4e-8, "beta": 24.0},
                          {"mu": 0.5, "phi": 2.0e-8, "beta": 20.0}])
    post = zeroI.MCMC(chain_inits=inits, iterations_per_chain=40,
                      print_report=False)
    assert set(post["chain#"]) == {0, 1}


@pytest.mark.slow
def test_mcmc_static_parameters(zeroI):
    zeroI.set_parameters(mu=0.6, phi=2.4e-8, beta=24.0)
    post = zeroI.MCMC(chain_inits=2, iterations_per_chain=40,
                      fitsurvey_samples=128, sd_fitdistance=6.0,
                      static_parameters=["beta"], print_report=False)
    for c in (0, 1):
        sub = post[post["chain#"] == c]
        assert sub["beta"].nunique() == 1


def test_explore_equilibriums(zeroI):
    eq = zeroI.explore_equilibriums(samples=16)
    assert list(eq.columns) == ["S", "V", "mu", "phi", "beta"]
    assert len(eq) == 16


def test_explore_equilibriums_convergence_flag(zeroI):
    eq = zeroI.explore_equilibriums(samples=16, check_convergence=True)
    assert "equilibrium_residual" in eq.columns
    r = eq["equilibrium_residual"].to_numpy()
    assert (r[np.isfinite(r)] >= 0).all()


def test_explore_equilibriums_newton_refinement():
    """Logistic-prey Lotka-Volterra has the analytic coexistence fixed
    point x* = m/(b a), y* = r (1 - x*/K) / a; integration to moderate T
    only spirals near it, Newton polishing must land on it."""
    import jax.numpy as jnp

    import odelib_tpu
    from odelib_tpu.distributions import Uniform

    def rhs(t, y, ps):
        r, K, a, b, m = ps
        x, z = y
        return jnp.stack([r * x * (1 - x / K) - a * x * z,
                          b * a * x * z - m * z])

    tobs = np.linspace(0.0, 3.0, 5)
    df = pd.DataFrame([{"organism": s, "time": t, "abundance": 1.0,
                        "log_sigma": 0.2}
                       for s in ("x", "z") for t in tobs])
    mf = odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["r", "K", "a", "b", "m"],
        state_names=["x", "z"], dataframe=df, t_end=40.0, t_steps=256,
        ode_style="jax", r=1.0, K=10.0, b=0.5, m=1.0,
        a=odelib_tpu.parameter(stats_gen=Uniform(loc=0.4, scale=0.4),
                               hyperparameters={}))
    mf.set_inits(x=1.0, z=1.0)
    raw = mf.explore_equilibriums(samples=8, check_convergence=True)
    ref = mf.explore_equilibriums(samples=8, check_convergence=True,
                                  refine_newton=10)
    # Newton drives the residual (relative RHS norm) to ~0
    assert (ref["equilibrium_residual"].to_numpy()
            < 1e-5).all()
    assert (ref["equilibrium_residual"].to_numpy()
            <= raw["equilibrium_residual"].to_numpy() + 1e-12).all()
    a_vals = ref["a"].to_numpy()
    x_star = 1.0 / (0.5 * a_vals)
    y_star = 1.0 * (1.0 - x_star / 10.0) / a_vals
    np.testing.assert_allclose(ref["x"].to_numpy(), x_star, rtol=1e-4)
    np.testing.assert_allclose(ref["z"].to_numpy(), y_star, rtol=1e-4)


def test_gradient(zeroI):
    zeroI.set_parameters(mu=0.6, phi=2.4e-8, beta=24.0)
    pr = np.linspace(0.2, 1.0, 5)
    end = zeroI.gradient("mu", pr, aggregate_enpoints=True,
                         print_status=False)
    assert list(end.columns) == ["S", "V", "mu"]
    assert len(end) == 5
    np.testing.assert_allclose(end["mu"], pr)
    full = zeroI.gradient("mu", pr, print_status=False)
    assert {"S", "V", "time", "mu"} <= set(full.columns)
    assert len(full) == 5 * len(zeroI.times)
    # parameter restored afterwards
    assert float(zeroI.parameters["mu"].val) == 0.6


def test_rawstats_module_function():
    rng = np.random.default_rng(0)
    s = pd.Series(rng.lognormal(0, 1, 500))
    m, sd = odelib_tpu.api.rawstats(s)
    assert m == pytest.approx(np.exp(np.log(s).mean()), rel=1e-8)


def test_replicate_schema():
    """Schema 2 (organism, time, abundance, replicate) — groupby log stats
    (Framework.py:287-298)."""
    rng = np.random.default_rng(0)
    rows = []
    base = synthetic_df()
    for _, r in base.iterrows():
        for rep in range(3):
            rows.append({"organism": r["organism"], "time": r["time"],
                         "abundance": r["abundance"]
                         * np.exp(rng.normal(0, 0.1)),
                         "replicate": rep})
    df = pd.DataFrame(rows)
    m = ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                       state_names=["S", "V"], dataframe=df,
                       mu=0.6, phi=2.4e-8, beta=24.0, t_steps=60)
    assert "log_sigma" in m.df.columns
    assert m._obs_logsigma["S"].shape == m._obs_logabundance["S"].shape
    assert np.isfinite(m.get_chi(
        m.integrate(predict_obs=True, as_dataframe=False)))


def test_missing_log_sigma_warns():
    df = synthetic_df().drop(columns=["log_sigma"])
    with pytest.warns(UserWarning, match="log_sigma not found"):
        m = ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                           state_names=["S", "V"], dataframe=df,
                           mu=0.6, phi=2.4e-8, beta=24.0, t_steps=30)
    assert (m.df["log_sigma"] == 1).all()


def test_reset_dataframe(zeroI):
    df2 = synthetic_df(seed=7)
    zeroI.reset_dataframe(df2)
    assert zeroI._samples == len(zeroI.df)
    assert len(zeroI.times) == 288


# ---------------------------------------------------------------------------
# regression tests for review findings (round 1 code review)
# ---------------------------------------------------------------------------

def test_get_residuals_row_aligned(zeroI):
    """One residual per observation row, aligned with the dataframe — the
    reference's duplicate-label Series subtraction cartesian-joins."""
    zeroI.set_parameters(mu=0.9, phi=3e-8, beta=25.0)
    res = zeroI.get_residuals()
    assert len(res) == len(zeroI.df)
    assert list(res.index) == list(zeroI.df.index)
    mod = zeroI.integrate(predict_obs=True)
    s0 = zeroI.get_snames(predict_obs=True)[0]
    np.testing.assert_allclose(
        np.asarray(res.loc[[s0]], float),
        mod.loc[[s0], "abundance"].to_numpy()
        - zeroI.df.loc[[s0], "abundance"].to_numpy())


def test_adapt_rhs_naming_conventions():
    """jax-style RHS with non-literal names is recognized; ambiguous names
    raise instead of silently swapping (t, y)."""
    import jax.numpy as jnp

    def jax_style(time, state, ps):
        return jnp.stack([ps[0] * state[0], -ps[0] * state[1]])

    m = ModelFramework(ODE=jax_style, parameter_names=["r"],
                       state_names=["A", "B"], t_end=1.0, t_steps=16,
                       r=parameter(init_value=1.0))
    m.set_inits(A=1.0, B=1.0)
    ys = m.integrate(as_dataframe=False)
    np.testing.assert_allclose(ys[-1, 0], np.e, rtol=1e-4)

    def ambiguous(a, b, ps):
        return [a[0], b]

    with pytest.raises(ValueError, match="cannot infer"):
        ModelFramework(ODE=ambiguous, parameter_names=["r"],
                       state_names=["A"], t_steps=8,
                       r=parameter(init_value=1.0))


def test_single_member_summation_rejected():
    with pytest.raises(ValueError, match="two or more"):
        ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                       state_names=["S", "V"],
                       state_summations={"H": ["S"]}, t_steps=8,
                       mu=parameter(init_value=1.0),
                       phi=parameter(init_value=1.0),
                       beta=parameter(init_value=1.0))


def test_statistics_sample_lhs_reseeds(zeroI):
    from odelib_tpu.Statistics import Samplers as S
    a = S.sample_lhs(zeroI.parameters, 32)
    b = S.sample_lhs(zeroI.parameters, 32)
    c = S.sample_lhs(zeroI.parameters, 32, seed=11)
    d = S.sample_lhs(zeroI.parameters, 32, seed=11)
    assert not a.equals(b)           # global-RNG reseeding, like reference
    pd.testing.assert_frame_equal(c, d)   # explicit seed reproducible


def test_find_inits_exponentiate_flag(zeroI):
    # parameters making both derivatives positive, so log-scores are finite
    zeroI.set_parameters(mu=0.9, phi=1e-12, beta=25.0)
    df = zeroI.find_inits(
        var_dist={"S": (scipy.stats.uniform(loc=1.0, scale=2.0), True)},
        set_best=False, V=1e7)
    assert len(df)
    s = df["S"].to_numpy()
    assert s.min() >= np.e * 0.99 and s.max() <= np.e ** 3 * 1.01


@pytest.mark.slow
def test_mcmc_pallas_backend_with_priors(zeroI):
    """ADVICE r1 (high): MCMC(use_priors=True) on the fused backend crashed
    with 'unhashable type ArrayImpl' when priors came from from_scipy.
    Drive the full public path (interpret mode emulates the kernel on CPU)."""
    inits = pd.DataFrame([
        {"mu": 0.6, "phi": 2.4e-8, "beta": 24.0},
        {"mu": 0.7, "phi": 2.0e-8, "beta": 20.0},
    ])
    post = zeroI.MCMC(chain_inits=inits, iterations_per_chain=12, burnin=6,
                      use_priors=True, backend="pallas",
                      pallas_interpret=True, pallas_tile_chains=128,
                      substeps=1, print_report=False)
    assert len(post) == 2 * 5
    assert np.isfinite(post["chi"]).all()
    assert set(post["chain#"]) == {0, 1}


def test_parameter_random_seed_reproducible():
    """VERDICT r1 task 7: seeded construction draws and walks reproduce."""
    a = parameter(scipy.stats.lognorm, {"s": 1, "scale": 25}, random_seed=7)
    b = parameter(scipy.stats.lognorm, {"s": 1, "scale": 25}, random_seed=7)
    assert float(a.val) == float(b.val)
    a.rwalk(); b.rwalk()
    assert float(a.val) == float(b.val)
    c = parameter(scipy.stats.lognorm, {"s": 1, "scale": 25}, random_seed=8)
    assert float(c.val) != float(a.val)


@pytest.mark.slow
def test_mcmc_checkpoint_every_matches_uninterrupted(zeroI, tmp_path):
    """VERDICT r1 task 6 at the public API: periodic checkpointing leaves
    the posterior bitwise unchanged and persists resumable progress."""
    inits = pd.DataFrame([
        {"mu": 0.6, "phi": 2.4e-8, "beta": 24.0},
        {"mu": 0.7, "phi": 2.0e-8, "beta": 20.0},
    ])
    kw = dict(chain_inits=inits, iterations_per_chain=13, burnin=4,
              backend="pallas", pallas_interpret=True,
              pallas_tile_chains=128, substeps=1, print_report=False)
    ref = zeroI.MCMC(**kw)
    ckpt = str(tmp_path / "post.npz")
    chk = zeroI.MCMC(checkpoint_path=ckpt, checkpoint_every=5, **kw)
    pd.testing.assert_frame_equal(ref, chk)
    import os as _os
    assert _os.path.exists(ckpt + ".progress")
    assert _os.path.exists(ckpt)
    # resume from the completed progress file reproduces the run too
    res = zeroI.MCMC(checkpoint_path=ckpt, checkpoint_every=5,
                     resume_from=ckpt + ".progress", **kw)
    pd.testing.assert_frame_equal(ref, res)


@pytest.mark.slow
def test_mcmc_until_converged_extends_run():
    """until_rhat/until_min_ess: the run extends in whole-run increments
    until the pooled posterior meets the targets. With a min-ESS target
    that a single 40-iteration run cannot meet, at least one extension
    must happen; the iteration column keeps counting and the acceptance
    ratio stays an exact global running ratio (monotone denominators)."""
    import jax.numpy as jnp

    from odelib_tpu.distributions import LogNormal

    rng = np.random.default_rng(0)
    sig = 0.15
    df = pd.DataFrame(
        [{"organism": "y", "time": t,
          "abundance": 1e6 * np.exp(-t) * np.exp(rng.normal(0, sig)),
          "log_sigma": sig} for t in np.linspace(0.0, 3.0, 12)])

    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0]])

    fw = odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k"], state_names=["y"], dataframe=df,
        t_steps=32, ode_style="jax", random_seed=0,
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.3, scale=1.0),
                               hyperparameters={}, random_seed=0))
    inits = pd.DataFrame([{"k": v} for v in (0.7, 0.9, 1.1, 1.3)])
    post = fw.MCMC(chain_inits=inits, iterations_per_chain=100,
                   rwalk_std=0.05, print_report=False,
                   until_min_ess=150.0, max_extensions=10)
    per_chain = post[post["chain#"] == 0]
    assert len(per_chain) > 49          # extended beyond records 51..99
    # iteration continues across extension boundaries without resets
    its = per_chain["iteration"].to_numpy()
    assert (np.diff(its) > 0).all()
    assert its.max() > 99
    ar = per_chain["acceptance_ratio"].to_numpy(float)
    assert np.isfinite(ar).all() and (ar <= 1.0).all()
    # global ratio consistency: counts = ar * iteration must be integral
    counts = ar * its
    np.testing.assert_allclose(counts, np.round(counts), atol=1e-5)
    # the target was actually met (that's why the loop stopped)
    from odelib_tpu.utils.diagnostics import effective_sample_size
    z = np.log(np.stack([post[post["chain#"] == c]["k"].to_numpy(float)
                         for c in range(4)]))
    assert effective_sample_size(z) >= 150.0


@pytest.mark.slow
def test_mcmc_until_rejects_bad_combinations(zeroI):
    inits = pd.DataFrame([{"mu": 0.6, "phi": 2.4e-8, "beta": 24.0}] * 2)
    with pytest.raises(ValueError, match="until_rhat/until_min_ess"):
        zeroI.MCMC(chain_inits=inits, iterations_per_chain=20,
                   sampler="hmc", until_rhat=1.01, print_report=False)
    with pytest.raises(ValueError, match="checkpoint"):
        zeroI.MCMC(chain_inits=inits, iterations_per_chain=20,
                   until_rhat=1.01, checkpoint_every=5,
                   checkpoint_path="/tmp/x.npz", print_report=False)
