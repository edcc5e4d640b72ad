"""Infection-states demo — the TPU-native equivalent of the reference's
``demo/Demo_InfectionStates.ipynb`` (the de-facto executable spec, SURVEY.md
C21): three host-virus ODE variants fit to the same time-series data, with
state summations, LHS pre-survey, massively parallel MCMC, and model
comparison by AIC.

Run:  python examples/demo_infection_states.py [--chains 1024] [--iters 1000]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd
import scipy.stats

import odelib_tpu
from odelib_tpu import ModelFramework, parameter


# --- the three ODE model variants (reference demo cell 4), written with
# numpy exactly like the notebook — the framework adapts them to JAX ---

def zero_i(y, t, ps):
    """Host-virus model, no infected class."""
    mu, phi, beta = ps[0], ps[1], ps[2]
    S, V = y[0], y[1]
    dSdt = mu * S - phi * S * V
    dVdt = beta * phi * S * V - phi * S * V
    return np.array([dSdt, dVdt])


def one_i(y, t, ps):
    """One infected class: S -> I1 -> lysis."""
    mu, phi, beta, lam = ps[0], ps[1], ps[2], ps[3]
    S, I1, V = y[0], y[1], y[2]
    dSdt = mu * S - phi * S * V
    dI1dt = phi * S * V - lam * I1
    dVdt = beta * lam * I1 - phi * S * V
    return np.array([dSdt, dI1dt, dVdt])


def two_i(y, t, ps):
    """Two infected classes with transition rate tau."""
    mu, phi, beta, lam, tau = ps[0], ps[1], ps[2], ps[3], ps[4]
    S, I1, I2, V = y[0], y[1], y[2], y[3]
    dSdt = mu * S - phi * S * V
    dI1dt = phi * S * V - tau * I1
    dI2dt = tau * I1 - lam * I2
    dVdt = beta * lam * I2 - phi * S * V
    return np.array([dSdt, dI1dt, dI2dt, dVdt])


def load_data():
    from odelib_tpu.data import load_demo_dataframe
    return load_demo_dataframe()


def lognorm(s, scale):
    return parameter(scipy.stats.lognorm, {"s": s, "scale": scale})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--survey", type=int, default=10_000)
    args = ap.parse_args()

    results = {}

    # --- model 0: no infected states (demo cell 9/13) ---
    df = load_data().replace({"virus": "V", "host": "S"})
    zeroI = ModelFramework(ODE=zero_i,
                           parameter_names=["mu", "phi", "beta"],
                           state_names=["S", "V"], dataframe=df,
                           mu=lognorm(3, 1e-8), phi=lognorm(3, 1e-8),
                           beta=lognorm(1, 25), t_steps=288)
    print(zeroI, "\n")
    post = zeroI.MCMC(chain_inits=args.chains,
                      iterations_per_chain=args.iters,
                      fitsurvey_samples=args.survey, sd_fitdistance=6.0)
    results["zero_i"] = zeroI.get_fitstats()

    # --- model 1: one infected class + state summation H = S + I1
    # (demo cell 21/22) ---
    df = load_data().replace({"virus": "V", "host": "H"})
    oneI = ModelFramework(ODE=one_i,
                          parameter_names=["mu", "phi", "beta", "lam"],
                          state_names=["S", "I1", "V"], dataframe=df,
                          state_summations={"H": ["S", "I1"]},
                          mu=lognorm(3, 1e-8), phi=lognorm(3, 1e-8),
                          beta=lognorm(1, 20), lam=lognorm(2, 0.1),
                          S=5236900, t_steps=288)
    post1 = oneI.MCMC(chain_inits=args.chains,
                      iterations_per_chain=args.iters,
                      fitsurvey_samples=args.survey, sd_fitdistance=6.0)
    results["one_i"] = oneI.get_fitstats()

    # --- model 2: two infected classes (demo cell 29) ---
    twoI = ModelFramework(ODE=two_i,
                          parameter_names=["mu", "phi", "beta", "lam",
                                           "tau"],
                          state_names=["S", "I1", "I2", "V"], dataframe=df,
                          state_summations={"H": ["S", "I1", "I2"]},
                          mu=lognorm(3, 1e-8), phi=lognorm(3, 1e-8),
                          beta=lognorm(1, 20), lam=lognorm(2, 0.1),
                          tau=lognorm(2, 1), S=5236900, t_steps=288)
    post2 = twoI.MCMC(chain_inits=args.chains,
                      iterations_per_chain=args.iters,
                      fitsurvey_samples=args.survey, sd_fitdistance=6.0)
    results["two_i"] = twoI.get_fitstats()

    # --- model comparison (AIC ranking; BASELINE.json config 5) ---
    print("\nModel comparison")
    print("================")
    for name, fs in sorted(results.items(), key=lambda kv: kv[1]["AIC"]):
        print(f"  {name:8s}  Chi={fs['Chi']:10.3e}  R^2={fs['R^2']:8.4f}  "
              f"AIC={fs['AIC']:10.3e}")
    best = min(results, key=lambda k: results[k]["AIC"])
    print(f"\nBest model by AIC: {best}")
    return results


if __name__ == "__main__":
    main()
