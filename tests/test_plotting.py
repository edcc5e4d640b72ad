"""Plotting surface parity (plot / plot_uncertainty / parameter.get_figure)."""
import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest
import scipy.stats

from odelib_tpu import ModelFramework, parameter

from helpers import synthetic_df, zero_i


@pytest.fixture()
def model():
    return ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                          state_names=["S", "V"], dataframe=synthetic_df(),
                          t_steps=60, mu=0.6, phi=2.4e-8, beta=24.0)


def test_plot_returns_fig_axes(model):
    f, ax = model.plot()
    assert f is not None
    assert len(np.ravel(ax)) >= 2


def test_plot_uncertainty(model):
    import matplotlib.pyplot as plt
    posteriors = pd.DataFrame({
        "mu": [0.5, 0.6], "phi": [2e-8, 2.5e-8], "beta": [20.0, 25.0]})
    _, ax = plt.subplots()
    model.plot_uncertainty(ax, posteriors, "S", ntimes=3)
    assert len(ax.lines) == 3


def test_parameter_get_figure():
    p = parameter(scipy.stats.lognorm, {"s": 1, "scale": 25}, name="beta")
    fig = p.get_figure(samples=200)
    assert fig is not None
    fig2 = p.get_figure(samples=200, logspace=True)
    assert fig2 is not None


def test_calc_stds(model):
    bands = model._calc_stds("S")
    assert bands.shape[0] == 2
    assert (bands >= 0).all()


def test_plot_corner(model):
    rng = np.random.default_rng(0)
    n = 300
    post = pd.DataFrame({
        "mu": np.exp(rng.normal(-0.5, 0.3, n)),
        "phi": np.exp(rng.normal(-17.5, 0.2, n)),
        "beta": np.exp(rng.normal(3.2, 0.25, n))})
    f, axes = model.plot_corner(post)
    assert axes.shape == (3, 3)
    # upper triangle hidden, diagonal histograms populated
    assert not axes[0][1].get_visible()
    assert len(axes[0][0].patches) > 0        # histogram bars
    assert len(axes[1][0].collections) == 1   # scatter
    # static parameter dropped automatically
    post["beta"] = 25.0
    f2, axes2 = model.plot_corner(post)
    assert axes2.shape == (2, 2)
    allstatic = pd.DataFrame({"mu": [1.0] * 5, "phi": [2.0] * 5,
                              "beta": [3.0] * 5})
    with pytest.raises(ValueError, match="varying"):
        model.plot_corner(allstatic)


def test_plot_trace(model):
    rng = np.random.default_rng(1)
    frames = []
    for c in range(4):
        n = 50
        frames.append(pd.DataFrame({
            "mu": np.exp(rng.normal(-0.5, 0.3, n)),
            "phi": np.exp(rng.normal(-17.5, 0.2, n)),
            "beta": np.exp(rng.normal(3.2, 0.25, n)),
            "chi": rng.uniform(5, 20, n),
            "iteration": np.arange(500, 500 + n),
            "chain#": c}))
    post = pd.concat(frames, ignore_index=True)
    f, axes = model.plot_trace(post)
    assert len(axes) == 4                       # 3 params + chi
    assert len(axes[0].lines) == 4              # one line per chain
    assert axes[-1].get_xlabel() == "iteration"
    assert axes[0].get_ylabel() == "log10(mu)"
    # chain subsampling caps the line count
    f2, axes2 = model.plot_trace(post, max_chains=2)
    assert len(axes2[0].lines) == 2
    # no chain# column: a single pooled trace
    f3, axes3 = model.plot_trace(post.drop(columns=["chain#"]),
                                 parameters=["mu"], logspace=False)
    assert len(axes3[0].lines) == 1
    assert axes3[0].get_ylabel() == "mu"
    with pytest.raises(ValueError, match="varying"):
        model.plot_trace(pd.DataFrame({"mu": [1.0] * 5}))


def test_plot_corner_trace_skip_array_param_columns():
    """Posterior columns of an array-valued parameter hold ndarray cells
    (object dtype): the default parameter selection must skip them —
    nunique() on them raises and a scatter axis has no meaning — instead
    of crashing (round-3 review finding)."""
    import jax.numpy as jnp

    def rhs(t, y, ps):
        k, s, b = ps
        return jnp.stack([-(k[0] + k[1]) * s * y[0] + b])

    df = pd.DataFrame([{"organism": "y", "time": t,
                        "abundance": 1e6 * np.exp(-t), "log_sigma": 0.2}
                       for t in np.linspace(0.0, 3.0, 8)])
    fw = ModelFramework(ODE=rhs, parameter_names=["k", "s", "b"],
                        state_names=["y"], dataframe=df, t_steps=16,
                        ode_style="jax",
                        k=parameter(init_value=np.array([0.5, 0.5])),
                        s=1.0, b=0.1)
    rng = np.random.default_rng(2)
    n = 60
    post = pd.DataFrame({
        "k": [rng.lognormal(size=2) for _ in range(n)],   # object dtype
        "s": np.exp(rng.normal(0, 0.3, n)),
        "b": np.exp(rng.normal(-2.0, 0.3, n)),
        "chi": rng.uniform(1, 5, n),
        "iteration": np.arange(100, 100 + n),
        "chain#": np.zeros(n, int)})
    assert post["k"].dtype == object

    f, axes = fw.plot_corner(post)      # scalars only: s, b
    assert axes.shape == (2, 2)
    f2, axes2 = fw.plot_trace(post)
    assert len(axes2) == 3              # s, b + chi
