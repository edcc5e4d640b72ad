"""Reference-layout module path: ``odelib_tpu.Statistics.distributions``.

The reference ships ``ODElib/Statistics/distributions.py`` but forgets to
export it (``Statistics/__init__.py:1``; SURVEY.md C17). Here the module
path exists AND is exported — it simply re-exports the first-class JAX
distribution library.
"""
from ..distributions import *  # noqa: F401,F403
from ..distributions import (Beta, Cauchy, DiscreteNormal, Distribution,
                             Exponential, Gamma, HalfNormal, LogNormal,
                             Normal, Positive_Normal, TruncNormal, Uniform,
                             Weibull, from_scipy, gamma)

# reference naming: `discrete_norm` is the class (distributions.py:16-19)
discrete_norm = DiscreteNormal

__all__ = ["Distribution", "Normal", "LogNormal", "TruncNormal",
           "Positive_Normal", "Uniform", "Gamma", "DiscreteNormal",
           "Exponential", "Cauchy", "HalfNormal", "Weibull", "Beta",
           "discrete_norm", "gamma", "from_scipy"]
