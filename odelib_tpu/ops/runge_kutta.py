"""Runge-Kutta steppers: explicit Dormand-Prince 5(4) and implicit Kvaerno 3(2).

These are the TPU-native replacement for the reference's only "native" numeric
engine — scipy.integrate.odeint / LSODA (Fortran ODEPACK) called at
``/root/reference/ODElib/Framework.py:4,656``. LSODA auto-switches between
Adams (non-stiff) and BDF (stiff); here the non-stiff half is Dopri5 with
Hairer's 4th-order dense output and the stiff half is an L-stable ESDIRK
(Kvaerno 3(2)) with a modified-Newton stage solve, both written as pure JAX so
they vmap over thousands of chains and compile into one XLA program.

Every stepper exposes:
    first_stage(func, t, y, args)          -> f0 (stage-reuse / FSAL seed)
    step(func, t, y, f0, h, args)          -> (y_new, f_new, err, dense)
    interp(dense, theta)                   -> y(t + theta*h), theta in [0,1]
    ERROR_ORDER                            -> order for step-size controller
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Dormand-Prince 5(4) — classic DOPRI5 tableau (Hairer, Norsett & Wanner)
# ---------------------------------------------------------------------------

_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
# b(5th) - b(4th): error-estimate weights
_DP_E = (71 / 57600, 0.0, -71 / 16695, 71 / 1920,
         -17253 / 339200, 22 / 525, -1 / 40)
# Dense-output weights for rcont5 (Hairer DOPRI5 CONTD5)
_DP_D = (-12715105075 / 11282082432, 0.0, 87487479700 / 32700410799,
         -10690763975 / 1880347072, 701980252875 / 199316789632,
         -1453857185 / 822651844, 69997945 / 29380423)


class Dopri5:
    """Explicit adaptive RK 5(4) with FSAL and 4th-order dense output."""

    ERROR_ORDER = 5.0
    IMPLICIT = False

    @staticmethod
    def first_stage(func, t, y, args):
        return func(t, y, args)

    @staticmethod
    def step(func, t, y, f0, h, args):
        ks = [f0]
        for i in range(1, 7):
            yi = y + h * sum(a * k for a, k in zip(_DP_A[i], ks) if a != 0.0)
            ti = t + _DP_C[i] * h
            ks.append(func(ti, yi, args))
        y_new = y + h * sum(a * k for a, k in zip(_DP_A[6], ks) if a != 0.0)
        # FSAL: stage 7 IS f(t+h, y_new) because row A[6] == b
        f_new = ks[6]
        err = h * sum(e * k for e, k in zip(_DP_E, ks) if e != 0.0)

        delta = y_new - y
        r1 = y
        r2 = delta
        r3 = h * ks[0] - delta
        r4 = delta - h * f_new - r3
        r5 = h * sum(d * k for d, k in zip(_DP_D, ks) if d != 0.0)
        dense = jnp.stack([r1, r2, r3, r4, r5])
        return y_new, f_new, err, dense

    @staticmethod
    def interp(dense, theta):
        r1, r2, r3, r4, r5 = dense
        th1 = 1.0 - theta
        return r1 + theta * (r2 + th1 * (r3 + theta * (r4 + th1 * r5)))

    @staticmethod
    def dense_zero(y):
        """Dense state that evaluates to y for any theta (pre-first-step)."""
        z = jnp.zeros_like(y)
        return jnp.stack([y, z, z, z, z])


# ---------------------------------------------------------------------------
# Stiffly-accurate, L-stable ESDIRK methods (Kvaerno 2004)
# ---------------------------------------------------------------------------

_NEWTON_ITERS = 6


class _ESDIRK:
    """Implicit adaptive ESDIRK with modified Newton stage solves.

    Subclasses provide the tableau (A with the diagonal gamma as the last
    entry of each row, C, ERROR_ORDER); the solution is the last stage
    (stiffly accurate, B = A[-1]) and the embedded method is the
    second-to-last row.

    The Jacobian is evaluated once per step at (t, y) via jax.jacfwd and its
    LU factorization reused across stages and Newton iterations — state
    dimension is tiny (<= ~16) so the dense solve is cheap and vmap-friendly.
    Dense output is cubic Hermite on (y, f0) -> (y_new, f_new) (4th-order
    interpolation, same as the Dopri5 dense output order).
    """

    IMPLICIT = True
    A: tuple
    C: tuple
    GAMMA: float
    ERROR_ORDER: float

    @classmethod
    def first_stage(cls, func, t, y, args):
        return func(t, y, args)

    @classmethod
    def step(cls, func, t, y, f0, h, args):
        n = y.shape[0]
        n_stages = len(cls.A)
        jac = jax.jacfwd(lambda yy: func(t, yy, args))(y)
        eye = jnp.eye(n, dtype=y.dtype)
        m = eye - (h * cls.GAMMA) * jac
        lu, piv = jax.scipy.linalg.lu_factor(m)

        def solve_stage(i, prev_ks, z_guess):
            """Solve z = y + h*(sum_j<i a_ij k_j) + h*gamma*f(t_i, z)."""
            ti = t + cls.C[i] * h
            base = y + h * sum(a * k for a, k in zip(cls.A[i][:-1], prev_ks)
                               if a != 0.0)

            def newton(_, z):
                fz = func(ti, z, args)
                res = z - base - h * cls.GAMMA * fz
                dz = jax.scipy.linalg.lu_solve((lu, piv), res)
                return z - dz

            z = jax.lax.fori_loop(0, _NEWTON_ITERS, newton, z_guess)
            return z, func(ti, z, args)

        ks = [f0]
        z = y
        for i in range(1, n_stages):
            z, ki = solve_stage(i, ks, z)
            ks.append(ki)

        y_new = z  # stiffly accurate: last stage value is the solution
        f_new = ks[-1]
        b = cls.A[-1]
        bhat = cls.A[-2] + (0.0,)
        err = h * sum((bi - bh) * k for bi, bh, k in zip(b, bhat, ks))
        dense = jnp.stack([y, y_new, h * f0, h * f_new])
        return y_new, f_new, err, dense

    @staticmethod
    def interp(dense, theta):
        """Cubic Hermite interpolation."""
        y0, y1, hf0, hf1 = dense
        t2 = theta * theta
        t3 = t2 * theta
        h00 = 2 * t3 - 3 * t2 + 1
        h10 = t3 - 2 * t2 + theta
        h01 = -2 * t3 + 3 * t2
        h11 = t3 - t2
        return h00 * y0 + h10 * hf0 + h01 * y1 + h11 * hf1

    @staticmethod
    def dense_zero(y):
        z = jnp.zeros_like(y)
        return jnp.stack([y, y, z, z])


class Kvaerno3(_ESDIRK):
    """Kvaerno 3(2): 4-stage ESDIRK, gamma = 0.4358665215."""

    ERROR_ORDER = 3.0
    GAMMA = 0.4358665215084590
    A = (
        (),
        (GAMMA, GAMMA),
        (0.4905633884192052, 0.0735700900723358, GAMMA),
        (0.3088099699294934, 1.4905633884192052, -1.2352398798571576, GAMMA),
    )
    C = (0.0, 2 * GAMMA, 1.0, 1.0)


class Kvaerno5(_ESDIRK):
    """Kvaerno 5(4): 7-stage ESDIRK, gamma = 0.26 (Kvaerno 2004, Table 5.1).

    Higher order means far fewer steps than Kvaerno3 at tight tolerances on
    stiff problems (Robertson et al.) — the better default for
    ``method='kvaerno5'`` production stiff solves.
    """

    ERROR_ORDER = 5.0
    GAMMA = 0.26
    A = (
        (),
        (0.26, 0.26),
        (0.13, 0.84033320996790809, 0.26),
        (0.22371961478320505, 0.47675532319799699, -0.06470895363112615,
         0.26),
        (0.16648564323248321, 0.10450018841591720, 0.03631482272098715,
         -0.13090704451073998, 0.26),
        (0.13855640231268224, 0.0, -0.04245337201752043, 0.02446657898003141,
         0.61943039072480676, 0.26),
        (0.13659751177640291, 0.0, -0.05496908796538376,
         -0.04118626728321046, 0.62993304899016403, 0.06962479448202728,
         0.26),
    )
    C = (0.0, 0.52, 1.230333209967908, 0.8957659843500759,
         0.43639360985864756, 1.0, 1.0)


STEPPERS = {"dopri5": Dopri5, "kvaerno3": Kvaerno3, "kvaerno5": Kvaerno5}


_KV3_NEWTON = 4  # chord-Newton iterations per stage (Jacobian reused)


def kvaerno3_fixed_step(rhs, t, y, h, ps):
    """One FIXED-size Kvaerno3 step on stacked state ``y`` (leading axis =
    state dim; trailing axes are batch lanes — a (S,) vector, a (S, N)
    batch, or the Pallas kernel's (S, sub, 128) tiles all work).

    Mosaic-lowerable by construction: stage solves use chord Newton with ONE
    RHS Jacobian per step (S forward-mode jvp columns), LU-factored by
    explicit Gaussian elimination in registers — no jnp.linalg, no gathers,
    no data-dependent control flow. No pivoting: the iteration matrix
    I - h*gamma*J is diagonally dominant for the dissipative systems a
    stiff solver targets. Shared by the fused MH kernel
    (ops/pallas_mh.py) and :func:`odeint_fixed(method='kvaerno3')` — the
    highest-throughput batched stiff path on TPU (geomspace output grids
    give near-adaptive step distribution with zero per-lane divergence).
    """
    S = y.shape[0]
    g = Kvaerno3.GAMMA

    def f(tt, yy):
        return rhs(tt, yy, ps)

    k1 = f(t, y)
    # Jacobian columns by jvp at (t, y), reused for all stages (chord)
    cols = []
    for j in range(S):
        # one-hot tangent built by stack (Mosaic has no scatter lowering)
        tangent = jnp.stack([jnp.ones_like(y[j]) if s == j
                             else jnp.zeros_like(y[j]) for s in range(S)])
        _, jv = jax.jvp(lambda yy: f(t, yy), (y,), (tangent,))
        cols.append(jv)                      # column j: (S, *lanes)
    # A = I - h*gamma*J as an S x S grid of lane arrays; in-place LU
    A = [[(1.0 if i == j else 0.0) - (h * g) * cols[j][i] for j in range(S)]
         for i in range(S)]
    for k in range(S):
        inv = 1.0 / A[k][k]
        for i in range(k + 1, S):
            m = A[i][k] * inv
            A[i][k] = m
            for jj in range(k + 1, S):
                A[i][jj] = A[i][jj] - m * A[k][jj]

    def lu_solve(r):
        x = [r[s] for s in range(S)]
        for i in range(S):
            for jj in range(i):
                x[i] = x[i] - A[i][jj] * x[jj]
        for i in reversed(range(S)):
            for jj in range(i + 1, S):
                x[i] = x[i] - A[i][jj] * x[jj]
            x[i] = x[i] / A[i][i]
        return x

    ks = [k1]
    z = y
    for i in range(1, len(Kvaerno3.A)):
        a_row = Kvaerno3.A[i]
        b = y + h * sum(a * k for a, k in zip(a_row[:-1], ks) if a != 0.0)
        ti = t + Kvaerno3.C[i] * h
        z = b + (h * g) * ks[-1]             # predictor: last stage slope
        for _ in range(_KV3_NEWTON):
            r = z - (h * g) * f(ti, z) - b
            z = z - jnp.stack(lu_solve(r))
        ks.append((z - b) / (h * g))         # stage slope from the algebra
    return z                                 # stiffly accurate
