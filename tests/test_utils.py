"""Observability + multi-host helper coverage (SURVEY.md section 5)."""
import logging

import numpy as np
import pytest

from odelib_tpu.parallel import chain_mesh, local_chain_slice
from odelib_tpu.utils import StageTimer, get_logger


def test_stage_timer_accumulates_and_reports():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert set(t.times) == {"a", "b"}
    msg = t.report()
    assert "a" in msg and "b" in msg and "%" in msg


def test_logger_is_configured_once():
    a = get_logger()
    b = get_logger()
    assert a is b
    assert len(a.handlers) == 1
    assert a.level == logging.INFO


def test_local_chain_slice_single_process_covers_all():
    mesh = chain_mesh()
    start, stop = local_chain_slice(64, mesh)
    assert (start, stop) == (0, 64)


@pytest.mark.slow
def test_mcmc_profile_flag():
    """profile=True must log stage timings without changing the posterior."""
    import scipy.stats as st

    import odelib_tpu as od
    from helpers import demo_df, zero_i_refstyle

    kw = dict(
        ODE=zero_i_refstyle, parameter_names=["mu", "phi", "beta"],
        state_names=["S", "V"], dataframe=demo_df(), t_steps=64,
        mu=od.parameter(st.lognorm, hyperparameters={"s": 1, "scale": 0.5}),
        phi=od.parameter(st.lognorm, hyperparameters={"s": 1, "scale": 1e-8}),
        beta=od.parameter(st.lognorm, hyperparameters={"s": 1, "scale": 30}),
    )
    m = od.ModelFramework(**kw)

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Capture()
    get_logger().addHandler(h)
    try:
        post = m.MCMC(chain_inits=2, iterations_per_chain=12,
                      fitsurvey_samples=64, sd_fitdistance=8.0,
                      print_report=False, profile=True)
    finally:
        get_logger().removeHandler(h)
    assert not post.empty
    text = "\n".join(records)
    assert "survey+seeding" in text and "chains[" in text \
        and "postprocess" in text


def test_local_chain_slice_non_divisible_covers_all():
    """Equal-block (ceil) semantics: a non-divisible chain count loses no
    rows across the union of process slices."""
    mesh = chain_mesh()
    start, stop = local_chain_slice(10, mesh)
    assert (start, stop) == (0, 10)
