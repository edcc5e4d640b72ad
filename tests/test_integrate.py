"""Integrator parity vs scipy (LSODA / RK45) on analytic and demo ODEs.

The three host-virus infection models reproduce the reference demo
(demo/Demo_InfectionStates.ipynb cell 4) — the north-star parity gate is
rtol 1e-6 vs scipy LSODA on these (SURVEY.md section 7).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import odeint as scipy_odeint
from scipy.integrate import solve_ivp

from odelib_tpu.ops import odeint_grid, odeint_fixed


# --- demo ODEs, written TPU-style f(t, y, ps) ------------------------------

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


def two_i(t, y, ps):
    mu, phi, beta, lam, tau = ps
    S, I1, I2, V = y
    dS = mu * S - phi * S * V
    dI1 = phi * S * V - tau * I1
    dI2 = tau * I1 - lam * I2
    dV = beta * lam * I2 - phi * S * V
    return jnp.stack([dS, dI1, dI2, dV])


def scipy_ref(f, y0, ts, ps):
    def fn(y, t):
        return np.asarray(f(t, jnp.asarray(y), ps))
    return scipy_odeint(fn, y0, ts, rtol=1e-10, atol=1e-12)


TS = np.linspace(0.0, 3.1, 288)

DEMO_CASES = [
    ("zero_i", zero_i, [5.2e6, 1.1e7], (0.5, 1e-8, 25.0)),
    ("one_i", one_i, [5.2e6, 1e3, 1.1e7], (0.5, 1e-8, 20.0, 1.5)),
    ("two_i", two_i, [5.2e6, 1e3, 1e2, 1.1e7], (0.5, 1e-8, 20.0, 1.5, 2.0)),
]


@pytest.mark.parametrize("name,f,y0,ps", DEMO_CASES,
                         ids=[c[0] for c in DEMO_CASES])
def test_dopri5_vs_lsoda_demo_models(name, f, y0, ps):
    sol = odeint_grid(f, jnp.asarray(y0, jnp.float64), TS,
                      jnp.asarray(ps, jnp.float64),
                      rtol=1e-9, atol=1e-9)
    ref = scipy_ref(f, y0, TS, jnp.asarray(ps, jnp.float64))
    assert bool(sol.ok)
    np.testing.assert_allclose(np.asarray(sol.ys), ref, rtol=1e-6)


@pytest.mark.parametrize("name,f,y0,ps", DEMO_CASES,
                         ids=[c[0] for c in DEMO_CASES])
def test_kvaerno3_vs_lsoda_demo_models(name, f, y0, ps):
    sol = odeint_grid(f, jnp.asarray(y0, jnp.float64), TS,
                      jnp.asarray(ps, jnp.float64),
                      rtol=1e-8, atol=1e-8, method="kvaerno3",
                      max_steps=16384)
    ref = scipy_ref(f, y0, TS, jnp.asarray(ps, jnp.float64))
    assert bool(sol.ok)
    np.testing.assert_allclose(np.asarray(sol.ys), ref, rtol=2e-5,
                               atol=1e-4 * np.abs(ref).max())


def test_exponential_analytic():
    f = lambda t, y, a: a * y
    ts = np.linspace(0, 2, 50)
    sol = odeint_grid(f, jnp.array([1.0]), ts, 1.3, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol.ys)[:, 0], np.exp(1.3 * ts),
                               rtol=1e-8)


def test_logistic_analytic():
    f = lambda t, y, args: args[0] * y * (1 - y / args[1])
    ts = np.linspace(0, 10, 101)
    r, K, y0 = 1.2, 10.0, 0.5
    sol = odeint_grid(f, jnp.array([y0]), ts, jnp.array([r, K]),
                      rtol=1e-10, atol=1e-12)
    expect = K / (1 + (K / y0 - 1) * np.exp(-r * ts))
    np.testing.assert_allclose(np.asarray(sol.ys)[:, 0], expect, rtol=1e-8)


def test_stiff_robertson_kvaerno3():
    """Robertson problem: the classic stiff benchmark. Explicit solvers need
    millions of steps here; the ESDIRK path must handle it."""
    def rober(t, y, k):
        k1, k2, k3 = k
        y1, y2, y3 = y
        d1 = -k1 * y1 + k3 * y2 * y3
        d2 = k1 * y1 - k2 * y2 * y2 - k3 * y2 * y3
        d3 = k2 * y2 * y2
        return jnp.stack([d1, d2, d3])

    ks = jnp.array([0.04, 3e7, 1e4])
    ts = np.geomspace(1e-5, 1e4, 40)
    ts = np.concatenate([[0.0], ts])
    y0 = jnp.array([1.0, 0.0, 0.0])
    ref = solve_ivp(lambda t, y: np.asarray(rober(t, jnp.asarray(y), ks)),
                    (0, ts[-1]), np.asarray(y0), method="LSODA",
                    t_eval=ts, rtol=1e-10, atol=1e-12)
    steps = {}
    for method in ("kvaerno3", "kvaerno5"):
        sol = odeint_grid(rober, y0, ts, ks, rtol=1e-8, atol=1e-10,
                          method=method, max_steps=20000)
        assert bool(sol.ok), method
        np.testing.assert_allclose(np.asarray(sol.ys), ref.y.T, rtol=2e-4,
                                   atol=1e-9)
        steps[method] = int(sol.num_steps)
    # the point of the 5th-order method: far fewer steps at the same rtol
    assert steps["kvaerno5"] < steps["kvaerno3"] / 5


def test_auto_switches_to_stiff_solver():
    """method='auto' = LSODA-parity switching: dopri5 exhausts max_steps on
    Robertson, so auto must fall through to Kvaerno3 and succeed; on a
    non-stiff model it must return the dopri5 result bit-for-bit."""
    def rober(t, y, k):
        k1, k2, k3 = k
        y1, y2, y3 = y
        return jnp.stack([-k1 * y1 + k3 * y2 * y3,
                          k1 * y1 - k2 * y2 * y2 - k3 * y2 * y3,
                          k2 * y2 * y2])

    ks = jnp.array([0.04, 3e7, 1e4])
    ts = np.concatenate([[0.0], np.geomspace(1e-5, 1e4, 40)])
    y0 = jnp.array([1.0, 0.0, 0.0])
    kw = dict(rtol=1e-8, atol=1e-10, max_steps=20000)
    assert not bool(odeint_grid(rober, y0, ts, ks, method="dopri5",
                                **kw).ok)
    sol = odeint_grid(rober, y0, ts, ks, method="auto", **kw)
    stiff = odeint_grid(rober, y0, ts, ks, method="kvaerno5", **kw)
    assert bool(sol.ok)
    np.testing.assert_array_equal(np.asarray(sol.ys), np.asarray(stiff.ys))

    # non-stiff: auto == dopri5 exactly
    f = lambda t, y, args: -y
    ts2 = np.linspace(0, 2, 21)
    a = odeint_grid(f, jnp.array([1.0]), ts2, ())
    b = odeint_grid(f, jnp.array([1.0]), ts2, (), method="auto")
    assert bool(b.ok)
    np.testing.assert_array_equal(np.asarray(a.ys), np.asarray(b.ys))


def test_failure_returns_nan_not_exception():
    """Blow-up in finite time -> NaN tail + ok=False, like the reference's
    NaN-tolerant behavior (Framework.py:997)."""
    f = lambda t, y, args: y * y  # y' = y^2 blows up at t = 1/y0
    ts = np.linspace(0, 2.0, 20)
    sol = odeint_grid(f, jnp.array([1.0]), ts, (), max_steps=2000)
    ys = np.asarray(sol.ys)
    assert not bool(sol.ok)
    assert np.isnan(ys[-1, 0])
    # early times are still correct: y = 1/(1-t)
    np.testing.assert_allclose(ys[5, 0], 1 / (1 - ts[5]), rtol=1e-5)


@pytest.mark.slow
def test_vmap_over_parameters():
    """Per-lane adaptive stepping: one stiff-ish lane must not corrupt
    others, and failing lanes NaN out individually."""
    ts = np.linspace(0, 3.1, 60)
    y0 = jnp.array([5.2e6, 1.1e7])

    def solve(ps):
        return odeint_grid(zero_i, y0, ts, ps, rtol=1e-8, atol=1e-8,
                           max_steps=4000)

    phis = jnp.array([1e-9, 1e-8, 3e-8, 1e-7])
    ps = jnp.stack([jnp.full_like(phis, 0.5), phis,
                    jnp.full_like(phis, 25.0)], axis=1)
    batched = jax.vmap(solve)(ps)
    for i in range(4):
        single = solve(ps[i])
        np.testing.assert_allclose(np.asarray(batched.ys[i]),
                                   np.asarray(single.ys), rtol=1e-7,
                                   atol=1e-6)
        ref = scipy_ref(zero_i, np.asarray(y0), ts, ps[i])
        np.testing.assert_allclose(np.asarray(batched.ys[i]), ref, rtol=1e-5,
                                   atol=1e-3)


def test_jit_and_grad():
    """Differentiability (bonus over the reference): forward-mode through the
    adaptive solver; reverse-mode through the scan-based fixed-step solver."""
    ts = jnp.linspace(0.0, 2.0, 30)
    # d/da sum(exp(a t)) = sum(t exp(a t))
    expect = np.sum(np.asarray(ts) * np.exp(0.7 * np.asarray(ts)))

    @jax.jit
    def loss_adaptive(a):
        sol = odeint_grid(lambda t, y, aa: aa * y, jnp.array([1.0]), ts, a,
                          rtol=1e-8, atol=1e-10)
        return jnp.sum(sol.ys)

    g_fwd = jax.jacfwd(loss_adaptive)(0.7)
    np.testing.assert_allclose(float(g_fwd), expect, rtol=1e-4)

    @jax.jit
    def loss_fixed(a):
        sol = odeint_fixed(lambda t, y, aa: aa * y, jnp.array([1.0]), ts, a,
                           substeps=4, method="dopri5")
        return jnp.sum(sol.ys)

    g_rev = jax.grad(loss_fixed)(0.7)
    np.testing.assert_allclose(float(g_rev), expect, rtol=1e-4)


def test_fixed_step_accuracy():
    ts = np.linspace(0.0, 3.1, 288)
    y0 = jnp.asarray([5.2e6, 1.1e7], jnp.float64)
    ps = jnp.asarray([0.5, 1e-8, 25.0], jnp.float64)
    ref = scipy_ref(zero_i, np.asarray(y0), ts, ps)
    sol = odeint_fixed(zero_i, y0, ts, ps, substeps=2, method="dopri5")
    np.testing.assert_allclose(np.asarray(sol.ys), ref, rtol=1e-6)
    sol4 = odeint_fixed(zero_i, y0, ts, ps, substeps=4, method="rk4")
    np.testing.assert_allclose(np.asarray(sol4.ys), ref, rtol=1e-5)


def test_odeint_fixed_kvaerno3_robertson():
    """Batched stiff fast path: fixed-step ESDIRK on a geomspace grid must
    match high-accuracy LSODA where fixed explicit steps blow up."""
    import jax
    import jax.numpy as jnp
    from scipy.integrate import odeint as scipy_odeint

    from odelib_tpu.ops.integrate import odeint_fixed

    def rober(t, y, k):
        return jnp.stack([-k[0]*y[0] + k[2]*y[1]*y[2],
                          k[0]*y[0] - k[1]*y[1]**2 - k[2]*y[1]*y[2],
                          k[1]*y[1]**2])

    ts = np.concatenate([[0.0], np.geomspace(1e-5, 1e3, 31)])
    k = jnp.asarray([0.04, 3e7, 1e4])
    sol = odeint_fixed(rober, jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(ts),
                       k, substeps=8, method="kvaerno3")
    assert bool(sol.ok)
    ref = scipy_odeint(
        lambda y, t, kk: np.array([-kk[0]*y[0] + kk[2]*y[1]*y[2],
                                   kk[0]*y[0] - kk[1]*y[1]**2
                                   - kk[2]*y[1]*y[2],
                                   kk[1]*y[1]**2]),
        [1.0, 0.0, 0.0], ts, args=((0.04, 3e7, 1e4),),
        rtol=1e-10, atol=1e-14)
    ys = np.asarray(sol.ys)
    np.testing.assert_allclose(ys[:, 0], ref[:, 0], rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(ys[:, 2], ref[:, 2], rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(ys[:, 1], ref[:, 1], rtol=3e-2, atol=1e-10)
    # vmaps cleanly (the batched fast path used by bench config 5)
    ks = jnp.asarray(np.array([0.04, 3e7, 1e4])
                     * np.exp(np.random.default_rng(0).normal(0, 0.1, (8, 3))))
    batch = jax.vmap(lambda kk: odeint_fixed(
        rober, jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(ts), kk,
        substeps=8, method="kvaerno3").ys[-1])(ks)
    assert np.isfinite(np.asarray(batch)).all()
