"""Pure-JAX probability distributions with scipy-compatible parametrizations.

The reference (SEpapoulis/ODElib) leans on ``scipy.stats`` distributions for
priors (``Framework.py:77,85,100``), Latin-hypercube ``ppf`` transforms
(``Statistics/Samplers.py:40``) and ships three orphaned custom distributions
(``Statistics/distributions.py:5-31``, never exported). This module provides the
TPU-native equivalent: every distribution is a frozen pytree with
``logpdf / pdf / cdf / ppf / rvs / fit``, fully jittable and vmappable, using
the *same hyperparameter names and parametrizations as scipy* so user code that
speaks scipy keeps working through :func:`from_scipy`.

``ppf`` is the workhorse for Latin-hypercube sampling; all implementations are
closed-form (erfinv family) except Gamma, which uses a Wilson-Hilferty seed
plus guarded Newton iterations on the regularized incomplete gamma function.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp


def _dc(cls):
    """Register a frozen dataclass whose fields are all pytree leaves."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


class Distribution:
    """Base class. Subclasses define _logpdf/_cdf/_ppf on standardized input."""

    # ---- public scipy-style surface -------------------------------------
    def logpdf(self, x):
        raise NotImplementedError

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def cdf(self, x):
        raise NotImplementedError

    def ppf(self, q):
        raise NotImplementedError

    def sf(self, x):
        return 1.0 - self.cdf(x)

    def rvs(self, key, shape=()):
        """Draw samples via inverse-CDF on uniforms (jit/vmap-safe)."""
        u = jax.random.uniform(key, shape=shape, dtype=jnp.result_type(float))
        return self.ppf(u)

    # logpmf aliases for discrete distributions
    def logpmf(self, x):
        return self.logpdf(x)

    def pmf(self, x):
        return self.pdf(x)

    @property
    def name(self):
        return type(self).__name__.lower()


@_dc
class Normal(Distribution):
    """scipy.stats.norm(loc, scale)."""
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * jnp.log(2 * jnp.pi)

    def cdf(self, x):
        return jsp.ndtr((x - self.loc) / self.scale)

    def ppf(self, q):
        return self.loc + self.scale * jsp.ndtri(q)

    def fit(self, data):
        data = jnp.asarray(data)
        return Normal(loc=jnp.mean(data), scale=jnp.std(data))


@_dc
class LogNormal(Distribution):
    """scipy.stats.lognorm(s, loc, scale): X = loc + scale * exp(s*Z)."""
    s: Any = 1.0
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        y = (x - self.loc) / self.scale
        logy = jnp.log(y)
        out = (-0.5 * (logy / self.s) ** 2 - logy
               - jnp.log(self.s) - jnp.log(self.scale)
               - 0.5 * jnp.log(2 * jnp.pi))
        return jnp.where(y > 0, out, -jnp.inf)

    def cdf(self, x):
        y = (x - self.loc) / self.scale
        safe = jnp.where(y > 0, y, 1.0)
        return jnp.where(y > 0, jsp.ndtr(jnp.log(safe) / self.s), 0.0)

    def ppf(self, q):
        return self.loc + self.scale * jnp.exp(self.s * jsp.ndtri(q))

    def fit(self, data):
        """MLE with loc fixed at 0 (scipy: lognorm.fit(data, floc=0))."""
        logd = jnp.log(jnp.asarray(data))
        return LogNormal(s=jnp.std(logd), loc=0.0, scale=jnp.exp(jnp.mean(logd)))


@_dc
class TruncNormal(Distribution):
    """scipy.stats.truncnorm(a, b, loc, scale); a, b in standard units."""
    a: Any = 0.0
    b: Any = jnp.inf
    loc: Any = 0.0
    scale: Any = 1.0

    def _phi_ab(self):
        return jsp.ndtr(self.a), jsp.ndtr(self.b)

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        pa, pb = self._phi_ab()
        lognorm_const = jnp.log(pb - pa) + jnp.log(self.scale)
        out = -0.5 * z * z - 0.5 * jnp.log(2 * jnp.pi) - lognorm_const
        return jnp.where((z >= self.a) & (z <= self.b), out, -jnp.inf)

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        pa, pb = self._phi_ab()
        c = (jsp.ndtr(z) - pa) / (pb - pa)
        return jnp.clip(c, 0.0, 1.0)

    def ppf(self, q):
        pa, pb = self._phi_ab()
        return self.loc + self.scale * jsp.ndtri(pa + q * (pb - pa))


def Positive_Normal(loc, scale):
    """Zero-truncated normal, mirroring ``Statistics/distributions.py:5-14``
    (upper bound loc + 100*scale, effectively unbounded)."""
    mu, sigma = loc, scale
    a = (0.0 - mu) / sigma
    b = ((mu + sigma * 100.0) - mu) / sigma
    return TruncNormal(a=a, b=b, loc=mu, scale=sigma)


@_dc
class Uniform(Distribution):
    """scipy.stats.uniform(loc, scale): support [loc, loc+scale]."""
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        inside = (x >= self.loc) & (x <= self.loc + self.scale)
        return jnp.where(inside, -jnp.log(self.scale), -jnp.inf)

    def cdf(self, x):
        return jnp.clip((x - self.loc) / self.scale, 0.0, 1.0)

    def ppf(self, q):
        return self.loc + self.scale * q

    def fit(self, data):
        data = jnp.asarray(data)
        lo = jnp.min(data)
        return Uniform(loc=lo, scale=jnp.max(data) - lo)


@_dc
class Gamma(Distribution):
    """scipy.stats.gamma(a, loc, scale). ppf via Wilson-Hilferty + Newton."""
    a: Any = 1.0
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        y = (x - self.loc) / self.scale
        out = ((self.a - 1.0) * jnp.log(jnp.where(y > 0, y, 1.0)) - y
               - jsp.gammaln(self.a) - jnp.log(self.scale))
        return jnp.where(y > 0, out, -jnp.inf)

    def cdf(self, x):
        y = (x - self.loc) / self.scale
        return jnp.where(y > 0, jsp.gammainc(self.a, jnp.where(y > 0, y, 1.0)), 0.0)

    def ppf(self, q):
        a = self.a
        eps = jnp.finfo(jnp.result_type(float)).eps
        q = jnp.clip(q, eps, 1.0 - eps)
        # Wilson-Hilferty initial guess
        z = jsp.ndtri(q)
        c = 1.0 / (9.0 * a)
        x0 = a * (1.0 - c + z * jnp.sqrt(c)) ** 3
        x0 = jnp.maximum(x0, 1e-8 * a)

        # Newton in log-space for positivity: u = log x
        def body(_, u):
            x = jnp.exp(u)
            f = jsp.gammainc(a, x) - q
            logp = (a - 1.0) * u - x - jsp.gammaln(a)  # pdf at x (scale 1)
            du = f / jnp.exp(logp + u)  # f / (pdf * x)
            du = jnp.clip(du, -1.5, 1.5)
            return u - du

        u = jax.lax.fori_loop(0, 40, body, jnp.log(x0))
        return self.loc + self.scale * jnp.exp(u)

    def fit(self, data):
        """Method-of-moments estimate (a = mean^2/var, scale = var/mean,
        loc fixed 0)."""
        d = jnp.asarray(data)
        m, v = jnp.mean(d), jnp.var(d)
        a = m * m / v
        return Gamma(a=a, loc=0.0, scale=v / m)


@_dc
class Exponential(Distribution):
    """scipy.stats.expon(loc, scale): rate = 1/scale."""
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        y = (x - self.loc) / self.scale
        return jnp.where(y >= 0, -y - jnp.log(self.scale), -jnp.inf)

    def cdf(self, x):
        y = (x - self.loc) / self.scale
        return jnp.where(y >= 0, -jnp.expm1(-jnp.maximum(y, 0.0)), 0.0)

    def ppf(self, q):
        return self.loc - self.scale * jnp.log1p(-q)

    def fit(self, data):
        """MLE with loc fixed at 0 (scipy: expon.fit(data, floc=0))."""
        return Exponential(loc=0.0, scale=jnp.mean(jnp.asarray(data)))


@_dc
class Cauchy(Distribution):
    """scipy.stats.cauchy(loc, scale)."""
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return -jnp.log1p(z * z) - jnp.log(jnp.pi * self.scale)

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        return 0.5 + jnp.arctan(z) / jnp.pi

    def ppf(self, q):
        return self.loc + self.scale * jnp.tan(jnp.pi * (q - 0.5))

    def fit(self, data):
        """Robust quantile estimate (median; half the IQR)."""
        d = jnp.asarray(data)
        q25, q50, q75 = jnp.percentile(d, jnp.asarray([25.0, 50.0, 75.0]))
        return Cauchy(loc=q50, scale=0.5 * (q75 - q25))


@_dc
class HalfNormal(Distribution):
    """scipy.stats.halfnorm(loc, scale): |Z| scaled — a standard weakly-
    informative prior for scales (Gelman 2006)."""
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        out = (0.5 * jnp.log(2.0 / jnp.pi) - jnp.log(self.scale)
               - 0.5 * z * z)
        return jnp.where(z >= 0, out, -jnp.inf)

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        return jnp.where(z >= 0, 2.0 * jsp.ndtr(jnp.maximum(z, 0.0)) - 1.0,
                         0.0)

    def ppf(self, q):
        return self.loc + self.scale * jsp.ndtri(0.5 * (1.0 + q))

    def fit(self, data):
        """MLE with loc fixed at 0: scale^2 = mean(x^2)."""
        d = jnp.asarray(data)
        return HalfNormal(loc=0.0, scale=jnp.sqrt(jnp.mean(d * d)))


@_dc
class Weibull(Distribution):
    """scipy.stats.weibull_min(c, loc, scale)."""
    c: Any = 1.0
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        y = (x - self.loc) / self.scale
        ly = jnp.log(jnp.where(y > 0, y, 1.0))
        out = (jnp.log(self.c) - jnp.log(self.scale)
               + (self.c - 1.0) * ly - jnp.exp(self.c * ly))
        return jnp.where(y > 0, out, -jnp.inf)

    def cdf(self, x):
        y = (x - self.loc) / self.scale
        return jnp.where(y > 0,
                         -jnp.expm1(-jnp.maximum(y, 0.0) ** self.c), 0.0)

    def ppf(self, q):
        return self.loc + self.scale * (-jnp.log1p(-q)) ** (1.0 / self.c)


@_dc
class Beta(Distribution):
    """scipy.stats.beta(a, b, loc, scale): support [loc, loc+scale]."""
    a: Any = 1.0
    b: Any = 1.0
    loc: Any = 0.0
    scale: Any = 1.0

    def _betaln(self):
        return (jsp.gammaln(self.a) + jsp.gammaln(self.b)
                - jsp.gammaln(self.a + self.b))

    def logpdf(self, x):
        y = (x - self.loc) / self.scale
        inside = (y > 0) & (y < 1)
        ys = jnp.where(inside, y, 0.5)
        out = ((self.a - 1.0) * jnp.log(ys)
               + (self.b - 1.0) * jnp.log1p(-ys)
               - self._betaln() - jnp.log(self.scale))
        return jnp.where(inside, out, -jnp.inf)

    def cdf(self, x):
        y = jnp.clip((x - self.loc) / self.scale, 0.0, 1.0)
        return jsp.betainc(self.a, self.b, y)

    def ppf(self, q):
        """Newton on the regularized incomplete beta, in logit space for
        (0, 1) positivity — the same guarded-Newton recipe as
        :meth:`Gamma.ppf`."""
        a, b = self.a, self.b
        eps = jnp.finfo(jnp.result_type(float)).eps
        q = jnp.clip(q, eps, 1.0 - eps)
        betaln = self._betaln()
        # mean as the seed; logit-space Newton reaches the tails anyway
        x0 = jnp.clip(a / (a + b), 1e-6, 1.0 - 1e-6)

        def body(_, u):
            x = jax.nn.sigmoid(u)
            f = jsp.betainc(a, b, x) - q
            logp = ((a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x)
                    - betaln)
            # dx/du = x(1-x): du = f / (pdf * x * (1-x))
            du = f / jnp.exp(logp + jnp.log(x) + jnp.log1p(-x))
            return u - jnp.clip(du, -2.0, 2.0)

        u0 = jnp.zeros_like(q) + (jnp.log(x0) - jnp.log1p(-x0))
        u = jax.lax.fori_loop(0, 50, body, u0)
        return self.loc + self.scale * jax.nn.sigmoid(u)

    def fit(self, data):
        """Method-of-moments on [0, 1] (loc 0, scale 1)."""
        d = jnp.asarray(data)
        m, v = jnp.mean(d), jnp.var(d)
        k = m * (1.0 - m) / v - 1.0
        return Beta(a=m * k, b=(1.0 - m) * k)


@_dc
class DiscreteNormal(Distribution):
    """Integer-valued normal, mirroring ``Statistics/distributions.py:16-19``.

    pmf(k) ∝ exp(-((k-mu)/sigma)^2 / 2) evaluated at integers. cdf/ppf use
    the continuity-corrected normal (P(K <= k) = Phi((k + 1/2 - mu)/sigma)),
    which is window-free — valid for any sigma, unlike a fixed support scan.
    """
    mu: Any = 0.0
    sigma: Any = 1.0

    def logpdf(self, k):
        z = (k - self.mu) / self.sigma
        raw = -0.5 * z * z - jnp.log(self.sigma) - 0.5 * jnp.log(2 * jnp.pi)
        return raw

    def cdf(self, x):
        return jsp.ndtr((jnp.floor(x) + 0.5 - self.mu) / self.sigma)

    def ppf(self, q):
        # smallest integer k with cdf(k) >= q
        return jnp.ceil(self.mu + self.sigma * jsp.ndtri(q) - 0.5)

    def rvs(self, key, shape=()):
        return jnp.round(self.mu + self.sigma
                         * jax.random.normal(key, shape, dtype=jnp.result_type(float)))


# Reference exports a ready-made instance named `gamma`
# (Statistics/distributions.py:31); keep the alias for parity.
gamma = Gamma


_SCIPY_NAME_MAP = {
    "norm": Normal,
    "lognorm": LogNormal,
    "truncnorm": TruncNormal,
    "uniform": Uniform,
    "gamma": Gamma,
    "Gamma Distribution": Gamma,  # reference's custom gamma_gen instance name
    "expon": Exponential,
    "cauchy": Cauchy,
    "halfnorm": HalfNormal,
    "weibull_min": Weibull,
    "beta": Beta,
}


def from_scipy(stats_gen, hyperparameters=None):
    """Build a JAX Distribution from a scipy.stats generator + hp dict.

    Accepts: our own Distribution instances (returned unchanged), scipy
    generators / frozen distributions, or a name string. Mirrors the
    (stats_gen, hyperparameters) calling convention of the reference
    ``parameter`` class (``Framework.py:75-79``).
    """
    if isinstance(stats_gen, Distribution):
        return stats_gen
    hp = dict(hyperparameters or {})
    name = stats_gen if isinstance(stats_gen, str) else getattr(stats_gen, "name", None)
    if name is None and hasattr(stats_gen, "dist"):  # scipy frozen distribution
        name = stats_gen.dist.name
        hp = {**_frozen_kwds(stats_gen), **hp}
    cls = _SCIPY_NAME_MAP.get(name)
    if cls is None:
        raise ValueError(
            f"No JAX equivalent for scipy distribution {name!r}. "
            f"Supported: {sorted(_SCIPY_NAME_MAP)}; or pass an "
            f"odelib_tpu.distributions.Distribution instance.")
    field_names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(hp) - field_names
    if unknown:
        raise ValueError(f"Unknown hyperparameters {unknown} for {name}")
    # Scalar hyperparameters stay plain Python floats so the resulting
    # (frozen, eq) dataclass is hashable — the fused-kernel MH path keys an
    # lru_cache on the priors tuple (ops/pallas_mh.py), and jnp scalars would
    # raise "unhashable type" there. Array-valued hyperparameters (vector
    # loc/scale for array parameters) become device arrays; those priors are
    # not kernel-supported and route to the XLA sampler.
    def _coerce(v):
        import numpy as _np
        if _np.ndim(v) == 0:
            return float(v)
        return jnp.asarray(v, jnp.result_type(float))

    return cls(**{k: _coerce(v) for k, v in hp.items()})


def _frozen_kwds(frozen):
    shapes = frozen.dist.shapes.split(",") if frozen.dist.shapes else []
    names = [s.strip() for s in shapes] + ["loc", "scale"]
    args = list(frozen.args) + [frozen.kwds.get(k) for k in names[len(frozen.args):]]
    return {k: v for k, v in zip(names, args) if v is not None}
