"""Statistical parity: batched TPU-native MCMC vs a serial scipy+numpy
reference-mirror sampler on the same data (SURVEY.md section 4: posterior
means within Monte-Carlo error — RNG streams differ, so parity is
statistical, never bitwise)."""
import numpy as np
import pytest
import scipy.stats
from scipy.integrate import odeint as scipy_odeint

from odelib_tpu import ModelFramework, parameter

from helpers import synthetic_df, zero_i

# smoke tier (r5): statistical parity vs serial scipy MH — runs in the full suite only
pytestmark = pytest.mark.slow


def reference_mirror_mcmc(df, times, y0, theta_init, nits, seed):
    """Serial MH mirroring Samplers.py:53-174 semantics with scipy odeint."""
    tgrid = np.asarray(times)
    tidx, obs_log, obs_sig = {}, {}, {}
    d = df.set_index("organism")
    d["log_abundance"] = np.log(d["abundance"])
    for s in set(d.index):
        sub = d.loc[[s]]
        tidx[s] = np.array([np.argmin(np.abs(t - tgrid))
                            for t in sub["time"]])
        obs_log[s] = sub["log_abundance"].to_numpy()
        obs_sig[s] = sub["log_sigma"].to_numpy()

    def f(y, t, ps):
        S, V = y
        mu, phi, beta = ps
        return [mu * S - phi * S * V, beta * phi * S * V - phi * S * V]

    def chi_of(ps):
        mod = scipy_odeint(f, y0, tgrid, args=(ps,))
        tot = 0.0
        for i, s in enumerate(("S", "V")):
            C = np.log(mod[:, i][tidx[s]])
            tot += float(((np.ma.masked_invalid(obs_log[s]) - C) ** 2
                          / (2 * obs_sig[s] ** 2)).sum())
        return tot

    rng = np.random.RandomState(seed)
    ps = np.array(theta_init, float)
    chi = chi_of(ps)
    burnin = nits // 2
    samples = []
    for it in range(1, nits):
        prop = np.exp(np.log(ps) + rng.normal(0, 0.05, ps.shape))
        chinew = chi_of(prop)
        with np.errstate(over="ignore"):
            if np.exp(chi - chinew) > rng.rand():
                ps, chi = prop, chinew
        if it > burnin:
            samples.append(ps.copy())
    return np.array(samples)


@pytest.mark.slow
def test_posterior_means_within_mc_error():
    df = synthetic_df()
    nits = 600
    theta_init = [0.6, 2.4e-8, 24.0]

    # --- reference mirror: a few serial chains
    times = np.linspace(0, df["time"].max(), 60)
    y0 = [df[(df.organism == "S") & (df.time == 0)]["abundance"].iloc[0],
          df[(df.organism == "V") & (df.time == 0)]["abundance"].iloc[0]]
    ref_samples = np.concatenate(
        [reference_mirror_mcmc(df, times, y0, theta_init, nits, seed)
         for seed in range(4)])

    # --- ours: batched chains through the compat API
    m = ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                       state_names=["S", "V"], dataframe=df, t_steps=60,
                       mu=parameter(scipy.stats.lognorm,
                                    {"s": 3, "scale": 1e-8}),
                       phi=parameter(scipy.stats.lognorm,
                                     {"s": 3, "scale": 1e-8}),
                       beta=parameter(scipy.stats.lognorm,
                                      {"s": 1, "scale": 25}))
    import pandas as pd
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=24.0)] * 8)
    post = m.MCMC(chain_inits=inits, iterations_per_chain=nits,
                  print_report=False)

    for i, p in enumerate(["mu", "phi", "beta"]):
        ref_log = np.log(ref_samples[:, i])
        our_log = np.log(post[p].to_numpy())
        # means within combined posterior spread (generous MC-error bound:
        # chains are autocorrelated, so use the posterior std itself)
        tol = max(ref_log.std(), our_log.std())
        assert abs(ref_log.mean() - our_log.mean()) < tol, (
            p, ref_log.mean(), our_log.mean(), tol)


def reference_mirror_mcmc_one_i(df, times, S0, V0, theta_init, nits, seed):
    """Serial MH mirror for the one-infected-class model with the
    H = S + I1 state summation (reference demo cells 21-22 semantics:
    summation applied after integration, Framework.py:659-664)."""
    tgrid = np.asarray(times)
    d = df.set_index("organism")
    d["log_abundance"] = np.log(d["abundance"])
    tidx, obs_log, obs_sig = {}, {}, {}
    for s in set(d.index):
        sub = d.loc[[s]]
        tidx[s] = np.array([np.argmin(np.abs(t - tgrid))
                            for t in sub["time"]])
        obs_log[s] = sub["log_abundance"].to_numpy()
        obs_sig[s] = sub["log_sigma"].to_numpy()

    def f(y, t, ps):
        mu, phi, beta, lam = ps
        S, I1, V = y
        return [mu * S - phi * S * V,
                phi * S * V - lam * I1,
                beta * lam * I1 - phi * S * V]

    y0 = [S0, 0.0, V0]

    def chi_of(ps):
        mod = scipy_odeint(f, y0, tgrid, args=(ps,))
        H = mod[:, 0] + mod[:, 1]
        tot = 0.0
        for name, series in (("H", H), ("V", mod[:, 2])):
            with np.errstate(divide="ignore", invalid="ignore"):
                C = np.log(series[tidx[name]])
            tot += float(((np.ma.masked_invalid(obs_log[name]) - C) ** 2
                          / (2 * obs_sig[name] ** 2)).sum())
        return tot

    rng = np.random.RandomState(seed)
    ps = np.array(theta_init, float)
    chi = chi_of(ps)
    burnin = nits // 2
    samples = []
    for it in range(1, nits):
        prop = np.exp(np.log(ps) + rng.normal(0, 0.05, ps.shape))
        chinew = chi_of(prop)
        with np.errstate(over="ignore"):
            if np.exp(chi - chinew) > rng.rand():
                ps, chi = prop, chinew
        if it > burnin:
            samples.append(ps.copy())
    return np.array(samples)


@pytest.mark.slow
def test_posterior_means_within_mc_error_one_i_summation():
    """Parity on the summation model (H = S + I1, fixed S init) — exercises
    the '<sname>0'-free init override, the summation matrix in the hot
    loop, and the 4-parameter walk."""
    df = synthetic_df().replace({"S": "H"})
    nits = 500
    theta_init = [0.6, 2.4e-8, 20.0, 3.0]
    times = np.linspace(0, df["time"].max(), 60)
    H0 = df[(df.organism == "H") & (df.time == 0)]["abundance"].iloc[0]
    V0 = df[(df.organism == "V") & (df.time == 0)]["abundance"].iloc[0]
    S0 = 0.99 * H0  # fixed susceptible init, like demo cell 21's S=5236900

    ref_samples = np.concatenate(
        [reference_mirror_mcmc_one_i(df, times, S0, V0, theta_init, nits,
                                     seed) for seed in range(4)])

    from helpers import one_i
    m = ModelFramework(ODE=one_i, ode_style="jax",
                       parameter_names=["mu", "phi", "beta", "lam"],
                       state_names=["S", "I1", "V"], dataframe=df,
                       state_summations={"H": ["S", "I1"]},
                       t_steps=60, S=S0,
                       mu=parameter(scipy.stats.lognorm,
                                    {"s": 3, "scale": 1e-8}),
                       phi=parameter(scipy.stats.lognorm,
                                     {"s": 3, "scale": 1e-8}),
                       beta=parameter(scipy.stats.lognorm,
                                      {"s": 1, "scale": 20}),
                       lam=parameter(scipy.stats.lognorm,
                                     {"s": 2, "scale": 0.1}))
    import pandas as pd
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=20.0, lam=3.0)] * 8)
    post = m.MCMC(chain_inits=inits, iterations_per_chain=nits,
                  print_report=False)

    for i, p in enumerate(["mu", "phi", "beta", "lam"]):
        ref_log = np.log(ref_samples[:, i])
        our_log = np.log(post[p].to_numpy())
        tol = max(ref_log.std(), our_log.std())
        assert abs(ref_log.mean() - our_log.mean()) < tol, (
            p, ref_log.mean(), our_log.mean(), tol)
