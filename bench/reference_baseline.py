"""Measure the reference's serial scipy+numpy MCMC throughput (the
denominator for BASELINE.json's >=1000x target).

The reference itself cannot be imported here (pyDOE2 is absent), so this
mirrors its per-iteration cost structure exactly (SURVEY.md call stack 3.3):
per MH iteration — lognormal random walk on each parameter
(``Framework.py:107-122``), a full ``scipy.integrate.odeint`` solve on the
288-point grid (``Framework.py:656``), observation subsetting via
precomputed nearest-grid indices (``Framework.py:670-682``), and the
masked-invalid chi reduction (``stats.py:22-41``) plus R^2/AIC bookkeeping
on acceptance — i.e. serial chain-steps/sec of the reference implementation.

Writes BASELINE_MEASURED.json at the repo root.
"""
import json
import os
import time

import numpy as np
import pandas as pd
from scipy.integrate import odeint


def zero_i(y, t, ps):
    mu, phi, beta = ps[0], ps[1], ps[2]
    S, V = y[0], y[1]
    dSdt = mu * S - phi * S * V
    dVdt = beta * phi * S * V - phi * S * V
    return np.array([dSdt, dVdt])


def load_demo():
    path = "/root/reference/demo/demodata.csv"
    if os.path.exists(path):
        df = pd.read_csv(path).replace({"virus": "V", "host": "S"})
    else:  # synthetic stand-in with the same shape
        rng = np.random.default_rng(0)
        rows = []
        for org, scale in (("S", 5e6), ("V", 1e7)):
            for t in np.arange(0.0, 3.2, 0.2):
                rows.append({"organism": org, "time": t,
                             "abundance": scale * np.exp(rng.normal(0, .2)),
                             "log_sigma": 0.2})
        df = pd.DataFrame(rows)
    df = df.set_index("organism")
    df["log_abundance"] = np.log(df["abundance"])
    return df


def main(n_iters=60, n_chains=3, t_steps=288):
    df = load_demo()
    times = np.linspace(0, df["time"].max(), t_steps)
    tidx = {}
    obs_log, obs_sig = {}, {}
    for s in set(df.index):
        sub = df.loc[[s]]
        a = sub["time"].to_numpy()
        tidx[s] = np.array([np.argmin(np.abs(t - times)) for t in a])
        obs_log[s] = sub["log_abundance"].to_numpy()
        obs_sig[s] = sub["log_sigma"].to_numpy()

    y0 = [float(df.loc[["S"]].iloc[0]["abundance"]),
          float(df.loc[["V"]].iloc[0]["abundance"])]

    def chi_of(mod):
        tot = 0.0
        for i, s in enumerate(("S", "V")):
            C = np.log(mod[:, i][tidx[s]])
            tot += float(((np.ma.masked_invalid(obs_log[s]) - C) ** 2
                          / (2 * obs_sig[s] ** 2)).sum())
        return tot

    steps = 0
    np.random.seed(0)
    start = time.perf_counter()
    for chain in range(n_chains):
        ps = np.array([0.6, 2.4e-8, 24.0])
        mod = odeint(zero_i, y0, times, args=(ps,))
        chi = chi_of(mod)
        for it in range(1, n_iters):
            prop = np.exp(np.log(ps) + np.random.normal(0, 0.05, ps.shape))
            mod = odeint(zero_i, y0, times, args=(prop,))
            chinew = chi_of(mod)
            # R^2 + AIC bookkeeping happen on accept in the reference
            if np.exp(chi - chinew) > np.random.rand():
                ps, chi = prop, chinew
                for i, s in enumerate(("S", "V")):
                    C = mod[:, i][tidx[s]]
                    _ = 1 - np.nansum((C - np.exp(obs_log[s])) ** 2) / (
                        len(C) * np.var(np.exp(obs_log[s])))
                _ = 2 * chi + 2 * 3
            steps += 1
    elapsed = time.perf_counter() - start
    rate = steps / elapsed
    out = {
        "metric": "serial reference MCMC chain-steps/sec (scipy LSODA, "
                  "zero_i, 288-grid)",
        "value": rate,
        "chains": n_chains,
        "iterations": n_iters,
        "elapsed_s": elapsed,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return rate


if __name__ == "__main__":
    main()
