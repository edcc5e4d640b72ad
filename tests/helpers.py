"""Shared test fixtures: demo ODE models + synthetic/real data frames."""
import os

import jax.numpy as jnp
import numpy as np
import pandas as pd

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from odelib_tpu.data import demo_data_path  # noqa: E402

DEMODATA = demo_data_path()


def zero_i(t, y, ps):
    mu, phi, beta = ps
    S, V = y
    dS = mu * S - phi * S * V
    dV = beta * phi * S * V - phi * S * V
    return jnp.stack([dS, dV])


def one_i(t, y, ps):
    mu, phi, beta, lam = ps
    S, I1, V = y
    dS = mu * S - phi * S * V
    dI1 = phi * S * V - lam * I1
    dV = beta * lam * I1 - phi * S * V
    return jnp.stack([dS, dI1, dV])


# reference-style numpy RHS (f(y, t, ps)) for compat-adapter testing;
# uses the module-level `import numpy as np`, as the demo notebook does.
def zero_i_refstyle(y, t, ps):
    mu, phi, beta = ps[0], ps[1], ps[2]
    S, V = y[0], y[1]
    dSdt = mu * S - phi * S * V
    dVdt = beta * phi * S * V - phi * S * V
    return np.array([dSdt, dVdt])


def demo_df():
    """The reference demo data (host/virus) if available, else synthetic."""
    if os.path.exists(DEMODATA):
        df = pd.read_csv(DEMODATA)
        return df.replace({"virus": "V", "host": "S"})
    return synthetic_df()


def synthetic_df(seed=0):
    """Synthetic two-state observations from a known zero_i trajectory."""
    from scipy.integrate import odeint

    rng = np.random.default_rng(seed)
    mu, phi, beta = 0.6, 2.4e-8, 24.0
    y0 = [5.2e6, 1.1e7]
    tobs = np.arange(0.0, 3.2, 0.2)

    def f(y, t):
        S, V = y
        return [mu * S - phi * S * V,
                beta * phi * S * V - phi * S * V]

    ys = odeint(f, y0, tobs)
    rows = []
    for i, org in enumerate(["S", "V"]):
        sig = 0.15
        ab = ys[:, i] * np.exp(rng.normal(0, sig, len(tobs)))
        for t, a in zip(tobs, ab):
            rows.append({"organism": org, "time": t, "abundance": a,
                         "log_sigma": sig})
    return pd.DataFrame(rows)


TRUE_PARAMS = dict(mu=0.6, phi=2.4e-8, beta=24.0)
