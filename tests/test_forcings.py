"""Time-varying forcing signals (covariates) in the ODE right-hand side.

The reference's ``odeint`` call (``/root/reference/ODElib/Framework.py:656``)
has no input mechanism: a user wanting temperature-driven rates must close
their Python RHS over an interpolator that re-evaluates inside every LSODA
step. Here forcings are static tables on the ModelSpec — interpolated once
per (traced) RHS call on the XLA paths, and constant-folded to float
literals in the fused Pallas kernels, whose step times are static.
"""
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from odelib_tpu.data import (build_obsdata_host, compact_observation_grid,
                             format_dataframe, obsdata_to_device)
from odelib_tpu.model import (eval_forcings, integrate_theta, make_spec,
                              normalize_forcings)
from odelib_tpu.ops.pallas_mh import survey_fused
from odelib_tpu.samplers import survey

from helpers import synthetic_df, zero_i


def growth_rhs(t, y, ps, u):
    """dN/dt = r * T(t) * N — exactly integrable for tabulated T."""
    (r,) = ps
    return jnp.stack([r * u["T"] * y[0]])


FT = (0.0, 1.0, 2.0, 4.0)
FV = (1.0, 3.0, 0.5, 0.5)


def _cumint_linear(ft, fv, t):
    """Exact integral of the piecewise-linear interpolant on [0, t]."""
    total, ft, fv = 0.0, list(ft), list(fv)
    for a, b, va, vb in zip(ft[:-1], ft[1:], fv[:-1], fv[1:]):
        if t <= a:
            break
        hi = min(t, b)
        vhi = va + (vb - va) * (hi - a) / (b - a)
        total += 0.5 * (va + vhi) * (hi - a)
    if t > ft[-1]:
        total += fv[-1] * (t - ft[-1])
    return total


def _cumint_hold(ft, fv, t):
    """Exact integral of the zero-order-hold interpolant on [0, t]."""
    total = 0.0
    for a, b, va in zip(ft[:-1], ft[1:], fv[:-1]):
        if t <= a:
            return total
        total += va * (min(t, b) - a)
    if t > ft[-1]:
        total += fv[-1] * (t - ft[-1])
    return total


@pytest.mark.parametrize("mode,cumint", [("linear", _cumint_linear),
                                         ("hold", _cumint_hold)])
def test_forced_growth_matches_closed_form(mode, cumint):
    spec = make_spec(growth_rhs, ("r",), ("N",),
                     forcings={"T": (FT, FV, mode)})
    times = np.linspace(0.0, 5.0, 41)
    r = 0.7
    ys = np.asarray(integrate_theta(spec, jnp.array([r]), jnp.array([2.0]),
                                    jnp.asarray(times), method="dopri5",
                                    rtol=1e-8, atol=1e-10))
    exact = 2.0 * np.exp([r * cumint(FT, FV, t) for t in times])
    # 'hold' has RHS discontinuities at the breakpoints the adaptive
    # controller must step over, so its tolerance is looser
    np.testing.assert_allclose(ys[:, 0], exact,
                               rtol=1e-6 if mode == "linear" else 1e-3)


def test_eval_forcings_concrete_and_traced_agree():
    forc = normalize_forcings({"a": (FT, FV), "b": (FT, FV, "hold"),
                               "c": (FT, FV, "cubic")})
    import jax
    f_traced = jax.jit(lambda t: tuple(eval_forcings(forc, t).values()))
    for t in [-0.5, 0.0, 0.3, 1.0, 1.7, 2.0, 3.9, 4.0, 5.5]:
        conc = eval_forcings(forc, t)
        trac = f_traced(t)
        assert isinstance(conc["a"], float)  # constant-folds in kernels
        assert isinstance(conc["c"], float)
        np.testing.assert_allclose([conc["a"], conc["b"], conc["c"]],
                                   [float(v) for v in trac], rtol=1e-12)


def test_forcing_validation_errors():
    with pytest.raises(ValueError, match="strictly increasing"):
        normalize_forcings({"T": ((0.0, 0.0, 1.0), (1.0, 2.0, 3.0))})
    with pytest.raises(ValueError, match="equal-length"):
        normalize_forcings({"T": ((0.0, 1.0), (1.0, 2.0, 3.0))})
    with pytest.raises(ValueError, match="mode"):
        normalize_forcings({"T": ((0.0, 1.0), (1.0, 2.0), "quadratic")})
    with pytest.raises(ValueError, match="finite"):
        normalize_forcings({"T": ((0.0, 1.0), (1.0, np.inf))})


def forced_zero_i(t, y, ps, u):
    mu, phi, beta = ps
    S, V = y
    dS = mu * u["g"] * S - phi * S * V
    dV = beta * phi * S * V - phi * S * V
    return jnp.stack([dS, dV])


@pytest.fixture(scope="module")
def forced_setup():
    df = format_dataframe(synthetic_df(), ("S", "V"))
    df = df[np.isclose(np.mod(np.round(df["time"] / 0.2), 2), 0)]
    times = np.linspace(0, 3.1, 144)
    forc = {"g": ((0.0, 1.5, 3.2), (0.8, 1.4, 0.9))}
    spec = make_spec(forced_zero_i, ("mu", "phi", "beta"), ("S", "V"),
                     forcings=forc)
    obs_host, _ = build_obsdata_host(df, times, spec.post_snames)
    times_fit, obs_fit_host = compact_observation_grid(obs_host, times)
    y0 = np.array([df.loc["S"].iloc[0]["abundance"],
                   df.loc["V"].iloc[0]["abundance"]])
    return spec, obs_fit_host, times_fit, y0


@pytest.mark.parametrize("stepper,xla_method",
                         [("dopri5", "fixed_dopri5"),
                          ("kvaerno3", "fixed_kvaerno3")])
@pytest.mark.slow
def test_fused_kernel_forcings_match_xla(forced_setup, stepper, xla_method):
    """The kernel's constant-folded forcing lookups must agree with the XLA
    fixed-step path's traced interpolation at the same step times — for
    both the explicit and the stiff in-kernel steppers (the implicit one's
    chord-Newton stages also query the forcing at static times)."""
    spec, obs_host, times_fit, y0 = forced_setup
    rng = np.random.default_rng(1)
    thetas = np.array([0.6, 2.4e-8, 24.0]) * np.exp(
        rng.normal(0, 0.2, (8, 3)))
    pal = np.asarray(survey_fused(spec, obs_host, times_fit, y0, thetas,
                                  substeps=2, stepper=stepper,
                                  tile_chains=128, interpret=True))
    obs_dev = obsdata_to_device(obs_host, jnp.float32)
    xla = np.asarray(survey(spec, obs_dev,
                            jnp.asarray(times_fit, jnp.float32),
                            jnp.asarray(y0, jnp.float32),
                            jnp.asarray(thetas, jnp.float32),
                            method=xla_method, substeps=2))
    np.testing.assert_allclose(pal, xla, rtol=2e-4)


@pytest.mark.slow
def test_framework_forcings_end_to_end():
    """Reference-style 4-arg RHS through ModelFramework: with g ≡ 1 the
    forced model must reproduce the unforced zero_i chi exactly, and a
    short MCMC must run and return finite samples."""
    from odelib_tpu import ModelFramework, parameter
    from scipy.stats import lognorm

    def ref_style(y, t, ps, u):
        mu, phi, beta = ps[0], ps[1], ps[2]
        S, V = y[0], y[1]
        dS = mu * u["g"] * S - phi * S * V
        dV = beta * phi * S * V - phi * S * V
        return np.array([dS, dV])

    df = synthetic_df()
    kw = dict(mu=0.6, phi=2.4e-8, beta=24.0, t_end=3.1, t_steps=144)
    forced = ModelFramework(ref_style, ["mu", "phi", "beta"], ["S", "V"],
                            dataframe=df,
                            forcings={"g": ([0.0, 3.2], [1.0, 1.0])}, **kw)
    plain = ModelFramework(zero_i, ["mu", "phi", "beta"], ["S", "V"],
                           dataframe=df, **kw)
    np.testing.assert_allclose(forced.get_fitstats()["Chi"],
                               plain.get_fitstats()["Chi"], rtol=1e-10)

    # non-trivial forcing shifts the fit — and samples stay finite
    forced2 = ModelFramework(
        ref_style, ["mu", "phi", "beta"], ["S", "V"], dataframe=df,
        forcings={"g": ([0.0, 1.5, 3.2], [0.5, 2.0, 0.5])},
        mu=parameter(lognorm, {"s": 0.5, "scale": 0.6}),
        phi=parameter(lognorm, {"s": 0.5, "scale": 2.4e-8}),
        beta=parameter(lognorm, {"s": 0.5, "scale": 24.0}),
        t_end=3.1, t_steps=144)
    assert forced2.get_fitstats()["Chi"] != pytest.approx(
        float(plain.get_fitstats()["Chi"]))
    post = forced2.MCMC(chain_inits=4, iterations_per_chain=30,
                        fitsurvey_samples=64, burnin=10, backend="xla",
                        print_report=False)
    assert len(post) > 0 and np.isfinite(post["chi"]).all()


@pytest.mark.slow
def test_jointfit_with_forced_experiment():
    """A forced experiment participates in JointFit unchanged: its spec's
    wrapped RHS (and the fused joint kernel's static plans) carry the
    forcing tables through the shared-parameter joint posterior."""
    from odelib_tpu import JointFit, ModelFramework, parameter
    from scipy.stats import lognorm

    def mk(df, forcings=None):
        rhs = forced_zero_i if forcings else zero_i
        return ModelFramework(
            rhs, ["mu", "phi", "beta"], ["S", "V"], dataframe=df,
            ode_style="jax", forcings=forcings,
            mu=parameter(lognorm, {"s": 0.5, "scale": 0.6}, random_seed=1),
            phi=parameter(lognorm, {"s": 0.5, "scale": 2.4e-8},
                          random_seed=2),
            beta=parameter(lognorm, {"s": 0.5, "scale": 24.0},
                           random_seed=3),
            t_end=3.1, t_steps=96)

    jf = JointFit({"plain": mk(synthetic_df(0)),
                   "forced": mk(synthetic_df(1),
                                {"g": ([0.0, 1.5, 3.2], [0.8, 1.3, 0.9])})},
                  shared=("beta",))
    post = jf.MCMC(chain_inits=4, iterations_per_chain=30, burnin=10,
                   fitsurvey_samples=64, backend="xla",
                   print_report=False)
    assert np.isfinite(post["chi"]).all()
    assert {"beta", "plain:mu", "forced:mu", "chi:plain",
            "chi:forced"} <= set(post.columns)


def test_cubic_forcing_matches_scipy_pchip():
    """mode='cubic' is shape-preserving PCHIP: host constant-folding path
    exact vs scipy, traced path to float rounding; out-of-range queries
    clamp to the endpoint values like the other modes."""
    from scipy.interpolate import PchipInterpolator
    import jax

    rng = np.random.default_rng(3)
    for n in (2, 3, 5, 11):
        ft = np.cumsum(rng.uniform(0.2, 1.0, n))
        fv = rng.normal(0.0, 2.0, n)
        forc = normalize_forcings({"u": (ft, fv, "cubic")})
        ref = PchipInterpolator(ft, fv) if n > 2 else None
        tq = rng.uniform(ft[0] - 1, ft[-1] + 1, 64)
        host = np.array([eval_forcings(forc, float(t))["u"] for t in tq])
        traced = np.asarray(jax.vmap(
            lambda t: eval_forcings(forc, t)["u"])(jnp.asarray(tq)))
        tc = np.clip(tq, ft[0], ft[-1])
        exp = ref(tc) if ref is not None else np.interp(tc, ft, fv)
        np.testing.assert_allclose(host, exp, atol=1e-12)
        np.testing.assert_allclose(traced, exp, atol=1e-9)


def test_cubic_forcing_preserves_monotonicity():
    """Monotone knots -> monotone interpolant (the PCHIP property a natural
    cubic spline lacks): a ramp-and-plateau signal never overshoots."""
    ft = (0.0, 1.0, 2.0, 3.0, 10.0)
    fv = (0.0, 0.1, 5.0, 5.05, 5.1)
    forc = normalize_forcings({"u": (ft, fv, "cubic")})
    vals = np.array([eval_forcings(forc, float(t))["u"]
                     for t in np.linspace(0.0, 10.0, 2001)])
    assert np.all(np.diff(vals) >= -1e-12)
    assert vals.min() >= -1e-12 and vals.max() <= 5.1 + 1e-12


def test_cubic_beats_linear_on_smooth_forcing():
    """A smooth (sinusoidal) driver tabulated at 9 knots: integrating
    through the PCHIP interpolant tracks the true forced trajectory far
    better than the linear table — the reason the mode exists."""
    t_knots = np.linspace(0.0, 5.0, 13)
    v_knots = 1.0 + 0.8 * np.sin(1.3 * t_knots)
    times = np.linspace(0.0, 5.0, 41)
    r = 0.7
    # exact: dN/dt = r*T(t)*N with the TRUE sine driver
    exact = 2.0 * np.exp(r * (times + (0.8 / 1.3)
                              * (1.0 - np.cos(1.3 * times))))
    errs = {}
    for mode in ("linear", "cubic"):
        spec = make_spec(growth_rhs, ("r",), ("N",),
                         forcings={"T": (t_knots, v_knots, mode)})
        ys = np.asarray(integrate_theta(
            spec, jnp.array([r]), jnp.array([2.0]), jnp.asarray(times),
            method="dopri5", rtol=1e-9, atol=1e-12))
        errs[mode] = np.max(np.abs(ys[:, 0] / exact - 1.0))
    # measured on this workload: linear 2.1e-2, cubic 2.6e-3 (8.1x)
    assert errs["cubic"] < errs["linear"] / 5, errs
    assert errs["cubic"] < 5e-3, errs


@pytest.mark.slow
def test_fused_kernel_cubic_forcing_matches_xla(forced_setup):
    """Cubic-mode tables constant-fold in the fused kernel exactly like
    linear ones (step times are static floats)."""
    _, obs_host, times_fit, y0 = forced_setup
    spec = make_spec(forced_zero_i, ("mu", "phi", "beta"), ("S", "V"),
                     forcings={"g": ((0.0, 1.0, 2.0, 3.2),
                                     (0.8, 1.4, 1.1, 0.9), "cubic")})
    rng = np.random.default_rng(2)
    thetas = np.array([0.6, 2.4e-8, 24.0]) * np.exp(
        rng.normal(0, 0.2, (8, 3)))
    pal = np.asarray(survey_fused(spec, obs_host, times_fit, y0, thetas,
                                  substeps=2, tile_chains=128,
                                  interpret=True))
    obs_dev = obsdata_to_device(obs_host, jnp.float32)
    xla = np.asarray(survey(spec, obs_dev,
                            jnp.asarray(times_fit, jnp.float32),
                            jnp.asarray(y0, jnp.float32),
                            jnp.asarray(thetas, jnp.float32),
                            method="fixed_dopri5", substeps=2))
    np.testing.assert_allclose(pal, xla, rtol=2e-4)


def test_spec_rebuild_does_not_double_wrap(forced_setup):
    """make_spec on an already-wrapped RHS (the _refresh_pshapes path) must
    not re-apply the forcing closure."""
    spec = forced_setup[0]
    spec2 = make_spec(spec.rhs, spec.pnames, spec.snames,
                      pshapes=spec.pshapes, forcings=spec.forcings)
    t, y = 0.7, jnp.array([1e6, 1e6])
    theta = [0.6, 2.4e-8, 24.0]
    np.testing.assert_allclose(np.asarray(spec.rhs(t, y, theta)),
                               np.asarray(spec2.rhs(t, y, theta)))
    assert spec2.forcings == spec.forcings
