"""odelib_tpu — TPU-native Bayesian ODE fitting (JAX / XLA / Pallas).

A ground-up re-design of the capabilities of SEpapoulis/ODElib for TPU:
adaptive ODE integration, Latin-hypercube surveys and Metropolis-Hastings
MCMC all run as one XLA program, vmapped over thousands of chains on a chip
and sharded over a ``jax.sharding.Mesh`` across chips.

Public compatibility surface matches the reference
(``/root/reference/ODElib/__init__.py:1``): ``ModelFramework`` and
``parameter``. The functional core underneath is exported as submodules.
"""

from . import distributions, stats
from . import ops

__version__ = "0.5.0"


def __getattr__(name):
    # Lazy import: the compat API pulls in pandas/matplotlib machinery that
    # the pure device-side modules shouldn't pay for.
    if name in ("ModelFramework", "parameter"):
        from . import api
        return getattr(api, name)
    if name == "JointFit":
        from .joint import JointFit
        return JointFit
    if name == "models":
        import importlib
        return importlib.import_module(".models", __name__)
    raise AttributeError(f"module 'odelib_tpu' has no attribute {name!r}")


__all__ = ["ModelFramework", "parameter", "JointFit", "distributions",
           "stats", "ops", "models", "__version__"]
