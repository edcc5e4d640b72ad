"""Tests for the packaged model library (odelib_tpu.models).

Every ModelDef must integrate cleanly from its literature defaults with its
recommended solver, agree with scipy on the canonical benchmark systems, and
plug straight into both the functional core and the compat ModelFramework.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odelib_tpu import models
from odelib_tpu.model import integrate_theta


ALL = models.available()


def test_registry_lists_all_families():
    assert set(ALL) >= {"zero_i", "one_i", "two_i", "lotka_volterra",
                        "logistic", "chemostat", "sir", "seir", "robertson",
                        "vanderpol", "oregonator", "pk_oral",
                        "pk_two_compartment", "fitzhugh_nagumo",
                        "hindmarsh_rose"}
    with pytest.raises(KeyError):
        models.get("not_a_model")
    # duplicate registration is rejected
    with pytest.raises(ValueError):
        models.register(models.get("sir"))


@pytest.mark.parametrize("name", ALL)
def test_defaults_integrate_finite(name):
    """Default theta/y0 over the default horizon stays finite with the
    recommended adaptive method."""
    m = models.get(name)
    spec = m.spec()
    theta = jnp.asarray(m.theta())
    times = jnp.asarray(m.times(100))
    ys = integrate_theta(spec, theta, jnp.asarray(m.y0()), times,
                         method=m.recommended_method, rtol=1e-6, atol=1e-8,
                         max_steps=16384)
    assert ys.shape == (100, len(m.snames))
    assert bool(jnp.all(jnp.isfinite(ys))), f"{name} produced non-finite"


@pytest.mark.parametrize("name", ALL)
def test_rhs_is_batch_safe(name):
    """The RHS must work on (S, batch...) tiles — the fused-kernel calling
    convention (pallas_mh._make_scorer)."""
    m = models.get(name)
    y = jnp.asarray(m.y0())[:, None, None] * jnp.ones((1, 2, 4))
    ps = [jnp.full((2, 4), v) for v in m.theta()]
    dy = m.rhs(0.1, y, ps)
    assert dy.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(dy)))


@pytest.mark.parametrize("name", ["lotka_volterra", "sir", "robertson"])
def test_scipy_parity(name):
    """Trajectory parity against scipy LSODA on non-stiff and stiff members."""
    from scipy.integrate import solve_ivp

    m = models.get(name)
    spec = m.spec()
    theta = m.theta()
    times = m.times(60)
    ys = np.asarray(integrate_theta(
        spec, jnp.asarray(theta), jnp.asarray(m.y0()), jnp.asarray(times),
        method=m.recommended_method, rtol=1e-8, atol=1e-10, max_steps=65536))

    def f(t, y):
        return np.asarray(m.rhs(t, jnp.asarray(y), list(theta)))

    ref = solve_ivp(f, (times[0], times[-1]), m.y0(), t_eval=times,
                    method="LSODA", rtol=1e-10, atol=1e-12)
    scale = np.abs(ref.y.T).max(axis=0, keepdims=True)
    err = np.abs(ys - ref.y.T) / np.maximum(scale, 1e-12)
    assert err.max() < 1e-5, f"{name}: max scaled err {err.max():.2e}"


def test_priors_match_parameter_api():
    """Default priors are native Distributions usable by parameter()."""
    from odelib_tpu import parameter

    for name in ALL:
        m = models.get(name)
        if m.priors is None:
            continue
        for pname, d in m.priors().items():
            assert pname in m.pnames
            if d is None:
                continue
            p = parameter(stats_gen=d, name=pname, random_seed=0)
            assert np.isfinite(p.val).all()
            assert p.pdf(p.val) >= 0.0


@pytest.mark.slow
def test_framework_constructor_end_to_end():
    """models.get('zero_i').framework(df) builds a working ModelFramework:
    integrate + chi + a tiny MCMC all run."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import demo_df

    m = models.get("zero_i")
    mf = m.framework(demo_df(), t_steps=64)
    mod = mf.integrate()
    assert np.isfinite(np.asarray(mod)).all()
    chi = mf.get_chi(mf.integrate(predict_obs=True, as_dataframe=False))
    assert np.isfinite(float(chi))
    post = mf.MCMC(chain_inits=4, iterations_per_chain=30,
                   fitsurvey_samples=128, sd_fitdistance=20.0,
                   print_report=False, backend="xla")
    assert len(post) > 0


def test_framework_respects_overrides():
    """Explicit kwargs beat the packaged defaults; fixed params appear."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import demo_df
    from odelib_tpu import parameter
    import scipy.stats

    m = models.get("zero_i")
    own = parameter(scipy.stats.lognorm, {"s": 1.0, "scale": 30.0},
                    name="beta", random_seed=1)
    mf = m.framework(demo_df(), t_steps=32, beta=own)
    assert mf.get_parameters(as_dict=True)["beta"] is not None
    assert mf.parameters["beta"].dist is scipy.stats.lognorm


def test_stiff_flags_route_to_implicit():
    for name in ("robertson", "vanderpol", "oregonator"):
        m = models.get(name)
        assert m.stiff
        assert m.recommended_method == "kvaerno5"
        assert m.recommended_fixed_stepper == "kvaerno3"


def test_summations_prewired():
    spec = models.get("one_i").spec()
    assert spec.post_snames == ("H", "V")
    spec2 = models.get("two_i").spec()
    assert spec2.post_snames == ("H", "V")
    # opt out
    spec3 = models.get("one_i").spec(state_summations=None)
    assert spec3.post_snames == ("S", "I1", "V")
