"""Multi-start gradient optimization (MAP / maximum-likelihood fitting).

The reference has no optimizer at all — its only route to a point estimate
is "run MCMC and take the min-chi sample" (``Framework.py:725-731``). With
the solve differentiable, the direct route is gradient descent on
``U(z) = chi(exp(z)) - log prior`` in log-parameter space — and the
TPU-native version is EMBARRASSINGLY multi-start: vmap Adam from hundreds
of LHS draws at once, one XLA program, and keep the basin that wins.
Non-finite losses (diverged solves) zero their gradients and the start
simply stalls — the framework's NaN-tolerant failure model.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..model import ModelSpec, ObsData, fit_metrics, integrate_theta


class MAPResult(NamedTuple):
    theta: Any       # (N, P) optimized parameter vectors (linear space)
    chi: Any         # (N,) chi at the optimum
    loss: Any        # (N,) final U (== chi when use_priors=False)
    converged: Any   # (N,) bool: finite loss and small final step


@partial(jax.jit, static_argnames=(
    "spec", "steps", "learning_rate", "use_priors", "prior_logpdf",
    "num_params", "method", "substeps"))
def _map_impl(spec, obs, times, y0_base, theta0, walk_mask, *,
              steps, learning_rate, use_priors, prior_logpdf, num_params,
              method, substeps):
    ikw = dict(method=method, substeps=substeps)

    def chi_of(theta):
        y0 = spec.override_inits(y0_base, theta)
        ys = integrate_theta(spec, theta, y0, times, **ikw)
        return fit_metrics(spec, obs, ys, num_params)[0]

    return _map_core(chi_of, theta0, walk_mask, steps=steps,
                     learning_rate=learning_rate, use_priors=use_priors,
                     prior_logpdf=prior_logpdf)


@partial(jax.jit, static_argnames=(
    "chi_fn", "steps", "learning_rate", "use_priors", "prior_logpdf"))
def _map_custom_impl(chi_fn, theta0, walk_mask, *, steps, learning_rate,
                     use_priors, prior_logpdf):
    return _map_core(chi_fn, theta0, walk_mask, steps=steps,
                     learning_rate=learning_rate, use_priors=use_priors,
                     prior_logpdf=prior_logpdf)


def _map_core(chi_of, theta0, walk_mask, *, steps, learning_rate,
              use_priors, prior_logpdf):
    """Shared multi-start Adam core (runs inside an enclosing jit);
    ``chi_of`` takes theta in LINEAR space."""
    def u_of(z):
        theta = jnp.exp(z)
        chi = chi_of(theta)
        if use_priors:
            chi = chi - prior_logpdf(theta)
        return chi

    grad_u = jax.value_and_grad(u_of)

    # Adam in z-space; masked dims never move.
    b1, b2, eps = 0.9, 0.999, 1e-8

    def one_start(th0):
        z0 = jnp.log(th0)

        def body(carry, i):
            z, m, v, best_z, best_u = carry
            u, g = grad_u(z)
            g = jnp.where(jnp.isfinite(g), g, 0.0) * walk_mask
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mh = m / (1 - b1 ** (i + 1))
            vh = v / (1 - b2 ** (i + 1))
            step = learning_rate * mh / (jnp.sqrt(vh) + eps)
            z_new = z - step
            better = jnp.isfinite(u) & (u < best_u)
            best_z = jnp.where(better, z, best_z)
            best_u = jnp.where(better, u, best_u)
            return (z_new, m, v, best_z, best_u), jnp.max(jnp.abs(step))

        init = (z0, jnp.zeros_like(z0), jnp.zeros_like(z0), z0,
                jnp.asarray(jnp.inf, z0.dtype))
        (z, _, _, best_z, best_u), steps_abs = jax.lax.scan(
            body, init, jnp.arange(steps))
        # evaluate the end point too (scan tracked pre-step values)
        u_end = u_of(z)
        better = jnp.isfinite(u_end) & (u_end < best_u)
        best_z = jnp.where(better, z, best_z)
        best_u = jnp.where(better, u_end, best_u)
        theta = jnp.exp(best_z)
        chi = chi_of(theta)
        converged = jnp.isfinite(best_u) & (steps_abs[-1] < 1e-3)
        return theta, chi, best_u, converged

    return jax.vmap(one_start)(theta0)


def map_fit(spec: ModelSpec, obs: ObsData, times, y0_base, theta0, *,
            steps: int = 500, learning_rate: float = 0.05,
            walk_mask=None, prior_logpdf=None, use_priors: bool = False,
            method: str = "fixed_dopri5", substeps=4) -> MAPResult:
    """Vmapped multi-start Adam on U(z) = chi(exp(z)) [- log prior].

    ``theta0``: (N, P) starting points (e.g. LHS prior draws). Returns the
    per-start optima; pick ``argmin(chi)`` (or keep the whole set to see
    the basin structure). The optimizer tracks the best iterate seen, so a
    late divergence cannot lose an earlier good point.
    """
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    num_params = int(jnp.count_nonzero(theta0[0]))
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    if method not in ("fixed_dopri5", "rk4"):
        raise ValueError("map_fit requires a fixed-step differentiable "
                         "integrator: 'fixed_dopri5' or 'rk4'")
    theta, chi, loss, conv = _map_impl(
        spec, obs, times, y0_base, theta0, walk_mask,
        steps=int(steps), learning_rate=float(learning_rate),
        use_priors=bool(use_priors), prior_logpdf=prior_logpdf,
        num_params=num_params, method=method,
        substeps=substeps if isinstance(substeps, tuple) else int(substeps))
    return MAPResult(theta=theta, chi=chi, loss=loss, converged=conv)


def map_fit_custom(chi_fn, theta0, *, steps: int = 500,
                   learning_rate: float = 0.05, walk_mask=None,
                   prior_logpdf=None,
                   use_priors: bool = False) -> MAPResult:
    """Multi-start Adam on an arbitrary differentiable ``chi_fn(theta)``
    (e.g. the summed multi-experiment chi of a JointFit). ``chi_fn`` is a
    static jit argument hashed by IDENTITY — cache the closure to reuse
    the compiled program."""
    theta0 = jnp.atleast_2d(theta0)
    P = theta0.shape[-1]
    if walk_mask is None:
        walk_mask = jnp.ones((P,), theta0.dtype)
    walk_mask = jnp.asarray(walk_mask, theta0.dtype)
    if use_priors and prior_logpdf is None:
        raise ValueError("use_priors=True requires prior_logpdf")
    theta, chi, loss, conv = _map_custom_impl(
        chi_fn, theta0, walk_mask, steps=int(steps),
        learning_rate=float(learning_rate), use_priors=bool(use_priors),
        prior_logpdf=prior_logpdf)
    return MAPResult(theta=theta, chi=chi, loss=loss, converged=conv)
