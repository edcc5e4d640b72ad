"""Measure the reference's serial scipy+numpy performance for EVERY bench
config (the denominators for BENCH_SUITE.json's vs_baseline columns).

The reference itself cannot be imported here (pyDOE2 is absent), so each
measurement mirrors its cost structure exactly (SURVEY.md call stacks):
integration is ``scipy.integrate.odeint`` (LSODA — the reference's only
engine, ``Framework.py:4,656``), chi is the masked-invalid reduction
(``stats.py:22-41``), MH follows ``Samplers.py:104-153``.

Configs (BASELINE.json):
  1. single integrate + chi latency (call stack 3.2)
  2. single-chain MH posterior, 1000 iterations (call stack 3.3 inner loop)
  3. Lotka-Volterra parameter sweep, serial LSODA per draw
     (explore_equilibriums cost structure, call stack 3.4)
  4. MCMC chain-steps/sec, serial chain (the >=1000x headline denominator)
  5. stiff Robertson solves/sec, serial LSODA per draw

Writes BASELINE_MEASURED.json at the repo root:
  {"value": <config-4 chain-steps/s>,          # bench.py compat
   "configs": {"1": {...}, "2": {...}, ...}}
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
    path = os.path.join(os.path.dirname(__file__), "..", "odelib_tpu",
                        "demodata.csv")
    path = os.environ.get("ODELIB_DEMODATA", path)
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


def _setup(t_steps=288):
    df = load_demo()
    times = np.linspace(0, df["time"].max(), t_steps)
    tidx, obs_log, obs_sig = {}, {}, {}
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

    return times, y0, chi_of


def _timed(fn, reps):
    fn()  # warm caches
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def config1_single_solve(reps=50):
    """Single LSODA solve on the 288-point grid + chi (call stack 3.2)."""
    times, y0, chi_of = _setup()
    ps = np.array([0.9, 3.0e-8, 25.0])

    def run():
        chi_of(odeint(zero_i, y0, times, args=(ps,)))

    med = _timed(run, reps)
    return {"metric": "LSODA integrate+chi latency (288-grid)",
            "value_ms": round(med * 1e3, 3)}


def config2_single_chain(nits=1000):
    """One full 1000-iteration MH chain, serial (Samplers.py:104-153)."""
    times, y0, chi_of = _setup()
    np.random.seed(0)
    ps = np.array([0.9, 3.0e-8, 25.0])
    chi = chi_of(odeint(zero_i, y0, times, args=(ps,)))
    t0 = time.perf_counter()
    for it in range(1, nits):
        prop = np.exp(np.log(ps) + np.random.normal(0, 0.05, ps.shape))
        mod = odeint(zero_i, y0, times, args=(prop,))
        chinew = chi_of(mod)
        if np.exp(chi - chinew) > np.random.rand():
            ps, chi = prop, chinew
    elapsed = time.perf_counter() - t0
    return {"metric": f"single-chain MH, {nits} iterations (serial LSODA)",
            "value_ms": round(elapsed * 1e3, 1), "iterations": nits}


def config3_lv_sweep(n=64):
    """Serial Lotka-Volterra equilibrium sweep (explore_equilibriums cost
    structure: one LSODA solve per LHS draw, keep the final state)."""

    def lv(y, t, ps):
        a, b, c, d = ps
        x, z = y
        return np.array([a * x - b * x * z, c * b * x * z - d * z])

    rng = np.random.default_rng(0)
    draws = np.array([1.1, 0.4, 0.1, 0.4]) * np.exp(
        rng.normal(0, 0.3, (n, 4)))
    ts = np.linspace(0, 50, 64)
    y0 = [10.0, 5.0]

    t0 = time.perf_counter()
    for ps in draws:
        _ = odeint(lv, y0, ts, args=(ps,))[-1]
    elapsed = time.perf_counter() - t0
    return {"metric": f"Lotka-Volterra sweep, {n} serial LSODA trajectories",
            "value_traj_per_s": round(n / elapsed, 1),
            "elapsed_ms": round(elapsed * 1e3, 1)}


def config4_chain_steps(n_iters=200, n_chains=3):
    """Serial reference MCMC chain-steps/sec — the headline denominator."""
    df = load_demo()
    times, y0, chi_of = _setup()
    tidx, obs_log = {}, {}
    for s in set(df.index):
        sub = df.loc[[s]]
        tidx[s] = np.array([np.argmin(np.abs(t - times))
                            for t in sub["time"].to_numpy()])
        obs_log[s] = sub["log_abundance"].to_numpy()
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
    return {"metric": "serial reference MCMC chain-steps/sec (scipy LSODA, "
                      "zero_i, 288-grid)",
            "value": steps / elapsed, "chains": n_chains,
            "iterations": n_iters, "elapsed_s": elapsed}


def config5_robertson(n=32):
    """Serial stiff Robertson solves (LSODA auto-switches to BDF — the
    reference's transparent stiff coverage, Framework.py:4,656)."""

    def rober(y, t, k):
        k1, k2, k3 = k
        y1, y2, y3 = y
        return np.array([-k1 * y1 + k3 * y2 * y3,
                         k1 * y1 - k2 * y2 * y2 - k3 * y2 * y3,
                         k2 * y2 * y2])

    rng = np.random.default_rng(0)
    ks = np.array([0.04, 3e7, 1e4]) * np.exp(rng.normal(0, 0.1, (n, 3)))
    ts = np.concatenate([[0.0], np.geomspace(1e-5, 1e3, 31)])
    y0 = [1.0, 0.0, 0.0]

    t0 = time.perf_counter()
    for k in ks:
        _ = odeint(rober, y0, ts, args=(k,), rtol=1e-5, atol=1e-8)[-1]
    elapsed = time.perf_counter() - t0
    return {"metric": f"stiff Robertson, {n} serial LSODA solves",
            "value_solves_per_s": round(n / elapsed, 1),
            "elapsed_ms": round(elapsed * 1e3, 1)}


def main():
    configs = {
        "1": config1_single_solve(),
        "2": config2_single_chain(),
        "3": config3_lv_sweep(),
        "4": config4_chain_steps(),
        "5": config5_robertson(),
    }
    out = {
        # top level mirrors config 4 for bench.py compatibility
        "metric": configs["4"]["metric"],
        "value": configs["4"]["value"],
        "chains": configs["4"]["chains"],
        "iterations": configs["4"]["iterations"],
        "elapsed_s": configs["4"]["elapsed_s"],
        "configs": configs,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
