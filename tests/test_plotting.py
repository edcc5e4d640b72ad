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
