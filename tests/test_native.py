"""Native C++ ODE core: parity vs scipy AND vs the JAX integrator
(three independent implementations cross-checking each other)."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import odeint as scipy_odeint

from odelib_tpu.native import MassActionODE, Term, solve_callback
from odelib_tpu.ops import odeint_grid

from helpers import zero_i


# zero_i with params [mu, phi, beta]:
#   dS = mu*S - phi*S*V
#   dV = beta*phi*S*V - phi*S*V      (beta*phi handled by two-factor split:
# we pass the derived param vector [mu, phi, beta*phi])
def zero_i_system():
    return MassActionODE(2, [
        Term(target=0, coeff=+1.0, pidx=0, powers=(1, 0)),   # +mu*S
        Term(target=0, coeff=-1.0, pidx=1, powers=(1, 1)),   # -phi*S*V
        Term(target=1, coeff=+1.0, pidx=2, powers=(1, 1)),   # +beta*phi*S*V
        Term(target=1, coeff=-1.0, pidx=1, powers=(1, 1)),   # -phi*S*V
    ])


TS = np.linspace(0.0, 3.1, 100)
Y0 = np.array([5.2e6, 1.1e7])
MU, PHI, BETA = 0.6, 2.4e-8, 24.0


def scipy_ref():
    def f(y, t):
        S, V = y
        return [MU * S - PHI * S * V,
                BETA * PHI * S * V - PHI * S * V]
    return scipy_odeint(f, Y0, TS, rtol=1e-10, atol=1e-10)


def test_mass_action_vs_scipy():
    sys = zero_i_system()
    ys, ok = sys.solve([MU, PHI, BETA * PHI], Y0, TS, rtol=1e-9, atol=1e-9)
    assert ok
    np.testing.assert_allclose(ys, scipy_ref(), rtol=1e-6)


def test_mass_action_vs_jax_dopri5():
    """Same algorithm, independent implementation: tight agreement."""
    sys = zero_i_system()
    ys, ok = sys.solve([MU, PHI, BETA * PHI], Y0, TS, rtol=1e-9, atol=1e-9)
    sol = odeint_grid(zero_i, jnp.asarray(Y0, jnp.float64), TS,
                      jnp.asarray([MU, PHI, BETA], jnp.float64),
                      rtol=1e-9, atol=1e-9)
    assert ok and bool(sol.ok)
    np.testing.assert_allclose(ys, np.asarray(sol.ys), rtol=1e-7)


def test_batch_solver():
    sys = zero_i_system()
    rng = np.random.default_rng(0)
    N = 32
    params = np.stack([
        MU * np.exp(rng.normal(0, 0.2, N)),
        PHI * np.exp(rng.normal(0, 0.2, N)),
    ], axis=1)
    params = np.concatenate(
        [params, (BETA * params[:, 1])[:, None]], axis=1)
    ys, ok = sys.solve_batch(params, Y0, TS, rtol=1e-8, atol=1e-8)
    assert ys.shape == (N, len(TS), 2)
    assert ok.all()
    # spot check one against a single solve
    y5, ok5 = sys.solve(params[5], Y0, TS, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(ys[5], y5, rtol=1e-12)


def test_failure_nan_semantics():
    # y' = y^2 blow-up -> ok=False, NaN tail
    sys = MassActionODE(1, [Term(target=0, coeff=1.0, pidx=-1, powers=(2,))])
    ys, ok = sys.solve([], [1.0], np.linspace(0, 2, 20), max_steps=2000)
    assert not ok
    assert np.isnan(ys[-1, 0])
    np.testing.assert_allclose(ys[5, 0],
                               1 / (1 - np.linspace(0, 2, 20)[5]), rtol=1e-5)


def test_stiff_trbdf2_robertson():
    k1, k2, k3 = 0.04, 3e7, 1e4
    sys = MassActionODE(3, [
        Term(0, -1.0, 0, (1, 0, 0)), Term(0, +1.0, 2, (0, 1, 1)),
        Term(1, +1.0, 0, (1, 0, 0)), Term(1, -1.0, 1, (0, 2, 0)),
        Term(1, -1.0, 2, (0, 1, 1)),
        Term(2, +1.0, 1, (0, 2, 0)),
    ])
    ts = np.concatenate([[0.0], np.geomspace(1e-5, 1e4, 30)])
    ys, ok = sys.solve([k1, k2, k3], [1.0, 0.0, 0.0], ts,
                       rtol=1e-7, atol=1e-10, stiff=True, max_steps=200000)
    assert ok
    from scipy.integrate import solve_ivp
    ref = solve_ivp(lambda t, y: [-k1*y[0] + k3*y[1]*y[2],
                                  k1*y[0] - k2*y[1]**2 - k3*y[1]*y[2],
                                  k2*y[1]**2],
                    (0, ts[-1]), [1.0, 0.0, 0.0], method="LSODA",
                    t_eval=ts, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(ys, ref.y.T, rtol=5e-3, atol=1e-9)


def test_callback_rhs():
    def f(t, y, p):
        S, V = y
        return [p[0] * S - p[1] * S * V,
                p[2] * p[1] * S * V - p[1] * S * V]

    ys, ok = solve_callback(f, [MU, PHI, BETA], Y0, TS, rtol=1e-9, atol=1e-9)
    assert ok
    np.testing.assert_allclose(ys, scipy_ref(), rtol=1e-6)


def test_native_faster_than_scipy_batch():
    """The zero-callback native path should beat scipy's callback path on a
    batch sweep (this is the point of the native engine)."""
    import time
    sys = zero_i_system()
    N = 100
    params = np.tile([MU, PHI, BETA * PHI], (N, 1))
    t0 = time.perf_counter()
    sys.solve_batch(params, Y0, TS, rtol=1e-8, atol=1e-8)
    t_native = time.perf_counter() - t0

    def f(y, t):
        S, V = y
        return [MU * S - PHI * S * V, BETA * PHI * S * V - PHI * S * V]

    t0 = time.perf_counter()
    for _ in range(N):
        scipy_odeint(f, Y0, TS, rtol=1e-8, atol=1e-8)
    t_scipy = time.perf_counter() - t0
    assert t_native < t_scipy, (t_native, t_scipy)
