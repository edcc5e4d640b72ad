"""Hierarchical (partial-pooling) multi-experiment fitting
(odelib_tpu.joint.JointFit(hierarchical=...)): layout, the pooling
density, shrinkage toward the population median, hyperparameter
recovery, and the gradient consumers (fit_map / fit_advi).

No reference counterpart: ``ODElib`` has no cross-experiment structure
at all (``/root/reference/ODElib/Framework.py:168-263`` binds exactly
one DataFrame per framework).
"""
import os
import sys

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

import odelib_tpu  # noqa: E402
from odelib_tpu import JointFit  # noqa: E402
from odelib_tpu.distributions import LogNormal  # noqa: E402


def _decay_df(k, y0=1e6, sig=0.15, seed=0, n=10):
    rng = np.random.default_rng(seed)
    tobs = np.linspace(0.0, 3.0, n)
    return pd.DataFrame(
        [{"organism": "y", "time": t,
          "abundance": y0 * np.exp(-k * t) * np.exp(rng.normal(0, sig)),
          "log_sigma": sig} for t in tobs])


def _decay_fw(df, seed=0, prior_s=0.7):
    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0]])

    return odelib_tpu.ModelFramework(
        ODE=rhs, parameter_names=["k"], state_names=["y"], dataframe=df,
        t_steps=32, ode_style="jax", random_seed=seed,
        k=odelib_tpu.parameter(stats_gen=LogNormal(s=prior_s, scale=1.0),
                               hyperparameters={}, random_seed=seed))


def _three_experiments(ks=(0.8, 1.0, 1.25), sig=0.15, n=10):
    return {f"e{i}": _decay_fw(_decay_df(k, sig=sig, seed=10 + i, n=n),
                               seed=10 + i)
            for i, k in enumerate(ks)}


def test_layout_and_validation():
    jf = JointFit(_three_experiments(), hierarchical=["k"], random_seed=1)
    assert jf.columns == ["e0:k", "e1:k", "e2:k",
                          "k:pop_median", "k:pop_sigma"]
    assert jf.dim == 5
    # hypers walk by default; static pinning works on hyper labels
    assert np.all(jf._walk_mask() == 1.0)
    m = jf._walk_mask(static_parameters=["k:pop_sigma"])
    assert m[jf._col_offsets["k:pop_sigma"]] == 0.0
    # hyper slots never reach a solve
    hyper = {jf._col_offsets["k:pop_median"],
             jf._col_offsets["k:pop_sigma"]}
    for idx in jf._idx_maps.values():
        assert hyper.isdisjoint(idx)
    # initial hypers: geometric mean / log-spread of the current values
    th = jf._current_joint_theta()
    logs = np.log(th[:3])
    np.testing.assert_allclose(th[3], np.exp(logs.mean()), rtol=1e-12)
    np.testing.assert_allclose(th[4], max(logs.std(), 0.1), rtol=1e-12)

    with pytest.raises(ValueError, match="both shared and hierarchical"):
        JointFit(_three_experiments(), shared=["k"], hierarchical=["k"])
    with pytest.raises(ValueError, match="non-hierarchical"):
        JointFit(_three_experiments(), hierarchical=["k"],
                 hyperpriors={"zz": (None, None)})
    with pytest.raises(ValueError, match="lacks tied"):
        JointFit(_three_experiments(), hierarchical=["nope"])


def test_pooling_density_matches_numpy():
    """The effective prior is the exact lognormal-population density over
    z = log theta plus the sigma/median hyperpriors."""
    jf = JointFit(_three_experiments(), hierarchical=["k"], random_seed=2)
    fn, on = jf._effective_prior(False)
    assert on
    th = np.array([0.9, 1.1, 1.3, 1.05, 0.25])
    got = float(fn(jnp.asarray(th)))
    mu, tau = np.log(th[3]), th[4]
    z = np.log(th[:3])
    want = np.sum(-0.5 * ((z - mu) / tau) ** 2 - np.log(tau)
                  - 0.5 * np.log(2 * np.pi))
    # default hyperpriors: first framework's k prior on the median,
    # LogNormal(s=1, scale=0.3) on the spread
    want += float(LogNormal(s=0.7, scale=1.0).logpdf(th[3]))
    want += float(LogNormal(s=1.0, scale=0.3).logpdf(th[4]))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # use_priors=True does NOT re-apply the pooled slots' individual
    # priors — the population law replaces them (here every non-hyper
    # slot is pooled, so the density is unchanged)
    fn2, _ = jf._effective_prior(True)
    got2 = float(fn2(jnp.asarray(th)))
    np.testing.assert_allclose(got2, want, rtol=1e-6)


def test_backend_pallas_rejected():
    jf = JointFit(_three_experiments(), hierarchical=["k"])
    with pytest.raises(ValueError, match="hierarchical"):
        jf.MCMC(backend="pallas", chain_inits=4, iterations_per_chain=50,
                fitsurvey_samples=32, print_report=False)


@pytest.mark.slow
def test_shrinkage_and_hyper_recovery():
    """Equal true rates, noisy data: partial pooling pulls the per-
    experiment posterior medians toward each other (vs. independent
    fitting) and the population median recovers the truth."""
    ks = (1.0, 1.0, 1.0)
    fws_h = _three_experiments(ks, sig=0.45, n=6)
    fws_i = _three_experiments(ks, sig=0.45, n=6)

    jf_h = JointFit(fws_h, hierarchical=["k"], random_seed=3)
    post_h = jf_h.MCMC(chain_inits=16, iterations_per_chain=800,
                       fitsurvey_samples=256, print_report=False)
    jf_i = JointFit(fws_i, random_seed=3)   # no pooling at all
    post_i = jf_i.MCMC(chain_inits=16, iterations_per_chain=800,
                       fitsurvey_samples=256, print_report=False)

    med_h = np.array([post_h[f"e{i}:k"].median() for i in range(3)])
    med_i = np.array([post_i[f"e{i}:k"].median() for i in range(3)])
    spread_h = np.log(med_h).std()
    spread_i = np.log(med_i).std()
    assert spread_h < spread_i * 0.9, (spread_h, spread_i)
    # population median centred on the true rate
    assert abs(np.log(post_h["k:pop_median"].median())) < 0.25
    # hyper columns are genuinely sampled, not frozen
    assert post_h["k:pop_sigma"].std() > 0
    # best-sample push-back records the winning hypers
    jf_h.set_best_params(post_h)
    best = post_h.loc[post_h["chi"].idxmin()]
    assert jf_h._hyper_vals["k:pop_median"] == float(best["k:pop_median"])


@pytest.mark.slow
def test_gradient_consumers_run_hierarchical():
    """fit_map and fit_advi optimize the pooled posterior (the pooling
    term is always on) and report the hyper columns."""
    jf = JointFit(_three_experiments(), hierarchical=["k"], random_seed=4)
    dfm = jf.fit_map(starts=8, steps=200)
    assert {"k:pop_median", "k:pop_sigma", "chi"} <= set(dfm.columns)
    assert np.isfinite(dfm["chi"].iloc[0])
    # a MAP under pooling keeps the hypers near the per-experiment bulk
    best = dfm.iloc[0]
    logs = np.log([best[f"e{i}:k"] for i in range(3)])
    assert abs(np.log(best["k:pop_median"]) - logs.mean()) < 0.5

    dfa = jf.fit_advi(steps=300, draws=256, print_report=False)
    assert {"k:pop_median", "k:pop_sigma", "chi"} <= set(dfa.columns)
    assert np.isfinite(dfa["chi"]).all()
    # variational spread on the hypers is nonzero
    assert dfa["k:pop_sigma"].std() > 0


def test_custom_hyperpriors_scipy_accepted():
    import scipy.stats as st
    jf = JointFit(
        _three_experiments(), hierarchical=["k"],
        hyperpriors={"k": (st.lognorm(0.5, scale=2.0),
                           LogNormal(s=0.5, scale=0.2))})
    fn, _ = jf._effective_prior(False)
    th = jf._current_joint_theta()
    v = float(fn(jnp.asarray(th)))
    assert np.isfinite(v)
    # the median hyperprior moved: evaluating far from scale=2.0 drops
    th2 = th.copy()
    th2[jf._col_offsets["k:pop_median"]] = 50.0
    assert float(fn(jnp.asarray(th2))) < v


@pytest.mark.slow
def test_joint_diagnostics_and_plots():
    import matplotlib
    matplotlib.use("Agg")
    jf = JointFit(_three_experiments(), hierarchical=["k"], random_seed=5)
    post = jf.MCMC(chain_inits=8, iterations_per_chain=200,
                   fitsurvey_samples=64, print_report=False)
    tab = jf.diagnostics(post)
    assert {"ess", "rhat"} <= set(tab.columns)
    assert "k:pop_median" in tab.index
    f, axes = jf.plot_trace(post)
    assert len(axes) >= 5                   # 5 joint columns (+ chi)
    f2, axes2 = jf.plot_corner(post)
    assert axes2.shape[0] >= 5


@pytest.mark.slow
def test_joint_posterior_predictive():
    jf = JointFit(_three_experiments(), hierarchical=["k"], random_seed=6)
    post = jf.MCMC(chain_inits=8, iterations_per_chain=200,
                   fitsurvey_samples=64, print_report=False)
    out = jf.posterior_predictive(post, n_draws=50, print_report=False)
    assert set(out) == {"e0", "e1", "e2", "overall"}
    for nm in ("e0", "e1", "e2"):
        assert 0.0 <= out[nm]["coverage"] <= 1.0
        assert len(out[nm]["summary"]) == 10      # n obs per experiment
    assert out["overall"]["n_observations"] == 30


@pytest.mark.slow
def test_information_criteria_prefer_partial_pooling():
    """Unequal true rates: complete pooling (shared k) misfits, partial
    pooling tracks each experiment — joint elpd_loo must prefer the
    hierarchical variant. The pooled totals also must sum the
    per-experiment terms."""
    ks = (0.6, 1.0, 1.6)
    jf_s = JointFit(_three_experiments(ks), shared=["k"], random_seed=8)
    post_s = jf_s.MCMC(chain_inits=12, iterations_per_chain=500,
                       fitsurvey_samples=128, print_report=False)
    ic_s = jf_s.information_criteria(post_s, n_draws=150,
                                     print_report=False)

    jf_h = JointFit(_three_experiments(ks), hierarchical=["k"],
                    random_seed=8)
    post_h = jf_h.MCMC(chain_inits=12, iterations_per_chain=500,
                       fitsurvey_samples=128, print_report=False)
    ic_h = jf_h.information_criteria(post_h, n_draws=150,
                                     print_report=False)

    assert ic_h["overall"]["elpd_loo"] > ic_s["overall"]["elpd_loo"], (
        ic_h["overall"], ic_s["overall"])
    # totals are the sum of per-experiment terms
    want = sum(ic_h[nm]["loo"]["elpd_loo"] for nm in ("e0", "e1", "e2"))
    np.testing.assert_allclose(ic_h["overall"]["elpd_loo"], want,
                               rtol=1e-12)


def test_mixed_priors_nonpooled_kept():
    """With use_priors=True the non-pooled parameters keep their own
    priors while pooled slots get only the population law."""
    def rhs(t, y, ps):
        k, s = ps
        return jnp.stack([-(k * s) * y[0]])

    def fw(df, seed):
        return odelib_tpu.ModelFramework(
            ODE=rhs, parameter_names=["k", "s"], state_names=["y"],
            dataframe=df, t_steps=32, ode_style="jax", random_seed=seed,
            k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.5, scale=1.0),
                                   hyperparameters={}, random_seed=seed),
            s=odelib_tpu.parameter(stats_gen=LogNormal(s=0.4, scale=2.0),
                                   hyperparameters={}, random_seed=seed + 1))

    jf = JointFit({"a": fw(_decay_df(0.9, seed=20), 20),
                   "b": fw(_decay_df(1.1, seed=21), 21)},
                  hierarchical=["k"], random_seed=22)
    assert jf.columns == ["a:k", "a:s", "b:k", "b:s",
                          "k:pop_median", "k:pop_sigma"]
    th = jf._current_joint_theta()
    f0, _ = jf._effective_prior(False)
    f1, _ = jf._effective_prior(True)
    diff = float(f1(jnp.asarray(th))) - float(f0(jnp.asarray(th)))
    want = sum(float(LogNormal(s=0.4, scale=2.0).logpdf(v))
               for v in (th[1], th[3]))       # only the s slots
    np.testing.assert_allclose(diff, want, rtol=1e-6)


@pytest.mark.slow
def test_joint_hmc_matches_mh():
    """sampler='hmc' targets the same hierarchical posterior as the
    random walk: per-experiment medians agree within MC error, and the
    funnel hyperparameters are genuinely sampled."""
    jf = JointFit(_three_experiments(), hierarchical=["k"], random_seed=16)
    post_h = jf.MCMC(chain_inits=8, iterations_per_chain=400,
                     fitsurvey_samples=128, sampler="hmc",
                     n_leapfrog=4, step_size=0.05, print_report=False)
    post_m = jf.MCMC(chain_inits=8, iterations_per_chain=800,
                     fitsurvey_samples=128, print_report=False)
    assert "chi:e0" not in post_h          # no parts on the HMC path
    assert "chi:e0" in post_m
    for c in ("e0:k", "e1:k", "e2:k"):
        lh = np.log(post_h[c].median())
        lm = np.log(post_m[c].median())
        assert abs(lh - lm) < 0.15, (c, lh, lm)
    assert post_h["k:pop_sigma"].std() > 0
    acc = post_h["acceptance_ratio"].to_numpy()
    assert 0.2 < acc[-1] < 0.99
    with pytest.raises(ValueError, match="XLA backend"):
        jf.MCMC(sampler="hmc", backend="pallas", chain_inits=4,
                iterations_per_chain=50, fitsurvey_samples=32,
                print_report=False)
