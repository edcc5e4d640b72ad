"""odelib_tpu.models — curated library of ready-made ODE model families.

Every model is a :class:`ModelDef`: a TPU-native RHS plus canonical names,
literature defaults, default priors, and one-call constructors for both the
functional core (``spec()``) and the reference-compatible API
(``framework(df)``). The reference has no model library at all — users
re-type RHS functions in notebooks (SURVEY.md C21); this package makes the
common families importable and vmap/Pallas-safe out of the box.

>>> from odelib_tpu import models
>>> models.available()
('chemostat', 'logistic', 'lotka_volterra', 'one_i', 'oregonator',
 'robertson', 'seir', 'sir', 'vanderpol', 'two_i', 'zero_i')
>>> m = models.get("zero_i")
>>> mf = m.framework(dataframe)        # ready ModelFramework
>>> spec = m.spec()                    # or the functional ModelSpec
"""
from .base import ModelDef, available, get, register  # noqa: F401

# Importing the family modules populates the registry.
from . import infection  # noqa: F401,E402
from . import ecology  # noqa: F401,E402
from . import epidemiology  # noqa: F401,E402
from . import chemistry  # noqa: F401,E402
from . import pharmacology  # noqa: F401,E402
from . import neuroscience  # noqa: F401,E402

from .infection import one_i, two_i, zero_i  # noqa: F401,E402
from .ecology import chemostat, logistic, lotka_volterra  # noqa: F401,E402
from .epidemiology import seir, sir  # noqa: F401,E402
from .chemistry import oregonator, robertson, vanderpol  # noqa: F401,E402
from .pharmacology import pk_oral, pk_two_compartment  # noqa: F401,E402
from .neuroscience import fitzhugh_nagumo, hindmarsh_rose  # noqa: F401,E402

__all__ = [
    "ModelDef", "available", "get", "register",
    "zero_i", "one_i", "two_i",
    "lotka_volterra", "logistic", "chemostat",
    "sir", "seir",
    "robertson", "vanderpol", "oregonator",
    "pk_oral", "pk_two_compartment",
    "fitzhugh_nagumo", "hindmarsh_rose",
]
