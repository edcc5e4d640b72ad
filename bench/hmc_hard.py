"""Hard-posterior HMC-vs-MH workload builder (shared by the bench suite).

The demo's own cell-29 shape (`/root/reference/demo/Demo_InfectionStates.
ipynb`): the `one_i` infection model with a state summation H = S + I1 and
all three initial states fitted as `<sname>0` parameters — 7 free
dimensions with strong correlations (beta-lam, phi-S0, V0-phi ridges).
This is the regime where random-walk MH's isotropic 5% steps collapse
(each dimension's marginal scale differs and the ridges are narrow) and a
mass-adapted HMC should pay for its n_leapfrog-fold costlier iterations.
"""
import numpy as np


def demo_data_source():
    """Which dataset build_hard_problem will use: 'committed' (the
    package's own odelib_tpu/demodata.csv — the default since r5, when
    the regenerated dataset made the one_i hard posterior identifiable)
    or an explicit ODELIB_DEMODATA override path (e.g. the reference's
    real lab data, when mounted)."""
    import os
    if os.environ.get("ODELIB_DEMODATA"):
        return os.environ["ODELIB_DEMODATA"]
    return "committed"


def build_hard_problem(seed=0):
    """Returns (framework, theta0 (C,P) seeds near the fit).

    Uses the api layer for data plumbing; samplers are driven directly by
    the caller on fw._spec / fw._obsdata_fit.
    """
    import jax.numpy as jnp
    import scipy.stats

    import odelib_tpu

    def one_i(t, y, ps):
        # init-parameters S0/I10/V0 ride along in ps but only feed y0
        mu, phi, beta, lam = ps[0], ps[1], ps[2], ps[3]
        S, I1, V = y
        dS = mu * S - phi * S * V
        dI1 = phi * S * V - lam * I1
        dV = beta * lam * I1 - phi * S * V
        return jnp.stack([dS, dI1, dV])

    import os

    import pandas as pd

    # Workload data: the COMMITTED synthetic dataset by default — the r5
    # regeneration (examples/make_demodata.py, nonzero I10 + resolvable
    # latent period) made the one_i hard posterior identifiable from a
    # fresh clone (pilot: max split R-hat 1.009, 0 frozen chains at 96
    # wide-seeded chains x 4096 iterations). ODELIB_DEMODATA still
    # overrides (e.g. the reference's real lab data when mounted);
    # callers surface WHICH dataset ran via demo_data_source().
    from odelib_tpu.data import load_demo_dataframe

    df = load_demo_dataframe(host="H", virus="V")

    ln = scipy.stats.lognorm
    fw = odelib_tpu.ModelFramework(
        ODE=one_i, parameter_names=("mu", "phi", "beta", "lam",
                                    "S0", "I10", "V0"),
        state_names=("S", "I1", "V"), dataframe=df,
        state_summations={"H": ["S", "I1"]},
        mu=odelib_tpu.parameter(ln, {"s": 1, "scale": 0.5},
                                random_seed=seed),
        phi=odelib_tpu.parameter(ln, {"s": 1, "scale": 1e-8},
                                 random_seed=seed + 1),
        beta=odelib_tpu.parameter(ln, {"s": 1, "scale": 30},
                                  random_seed=seed + 2),
        lam=odelib_tpu.parameter(ln, {"s": 1, "scale": 1.0},
                                 random_seed=seed + 3),
        S0=odelib_tpu.parameter(ln, {"s": 0.5, "scale": 5.0e6},
                                random_seed=seed + 4),
        I10=odelib_tpu.parameter(ln, {"s": 1.5, "scale": 1.0e4},
                                 random_seed=seed + 5),
        V0=odelib_tpu.parameter(ln, {"s": 0.5, "scale": 1.0e7},
                                random_seed=seed + 6),
        t_steps=288, random_seed=seed)
    return fw


def seed_chains(fw, C, samples=4096, sd_fitdistance=8.0):
    """Survey the priors and seed C chains from the sub-threshold draws
    (the MCMC() seeding recipe, shared so both samplers start alike)."""
    survey = fw.fit_survey(samples=samples).dropna()
    calc = {s: np.exp(fw._obs_logabundance[s]
                      + sd_fitdistance * fw._obs_logsigma[s])
            for s in fw._obs_logabundance}
    cut = fw.get_chi(calc)
    good = survey[survey["chi"] < cut]
    if len(good) == 0:
        good = survey.nsmallest(max(C // 4, 8), "chi")
    rows = good.sample(C, replace=True, random_state=0)
    return np.asarray(fw._theta_from_df(rows[fw.get_pnames()]), np.float32)
