"""Curated model-family library: ready-made, TPU-native ODE systems.

The reference ships exactly one family — the three host–virus infection
models defined inline in its demo notebook
(``/root/reference/demo/Demo_InfectionStates.ipynb`` cell 4) — and every
user re-types their RHS by hand. Here the common systems biologists and
modellers reach for are packaged as :class:`ModelDef` objects: a
vmap/Pallas-safe JAX right-hand side, canonical parameter/state names,
literature-standard default parameters and initial states, sensible default
priors (as :mod:`odelib_tpu.distributions` objects, usable directly by
:class:`odelib_tpu.parameter`), and one-call constructors for both the
functional core (:meth:`ModelDef.spec`) and the reference-compatible API
(:meth:`ModelDef.framework`).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from ..model import ModelSpec, make_spec


@dataclasses.dataclass(frozen=True)
class ModelDef:
    """A packaged ODE model family member.

    Attributes
    ----------
    name: registry key (``odelib_tpu.models.get(name)``).
    rhs: TPU-native ``f(t, y, ps)`` — ``y`` is the state array (leading axis
        = state, arbitrary trailing batch axes so the same function runs
        under vmap and inside the fused Pallas kernel), ``ps`` the parameter
        list in ``pnames`` order. Elementwise jnp ops only.
    pnames / snames: canonical orderings.
    default_theta: literature-standard parameter values (pnames order).
    default_y0: canonical initial state (snames order).
    default_t_end: a time horizon that shows the model's characteristic
        dynamics from ``default_y0``.
    priors: factory ``() -> {pname: Distribution}`` of broad default priors
        centred on ``default_theta`` (None = improper/flat: no prior).
    state_summations: optional composite-observable map passed through to
        :func:`odelib_tpu.model.make_spec`.
    stiff: True when an implicit method should be the default — selects
        ``kvaerno5``/fixed-``kvaerno3`` paths instead of Dopri5.
    doc: one-paragraph description with the standard citation.
    """
    name: str
    rhs: Callable
    pnames: Tuple[str, ...]
    snames: Tuple[str, ...]
    default_theta: Tuple[float, ...]
    default_y0: Tuple[float, ...]
    default_t_end: float
    priors: Optional[Callable[[], Dict[str, object]]] = None
    state_summations: Optional[dict] = None
    stiff: bool = False
    doc: str = ""

    # -- functional core ----------------------------------------------------
    def spec(self, state_summations: Optional[dict] = "default") -> ModelSpec:
        """Build the static :class:`ModelSpec` for this model."""
        ss = (self.state_summations if state_summations == "default"
              else state_summations)
        return make_spec(self.rhs, self.pnames, self.snames,
                         state_summations=ss)

    def theta(self) -> np.ndarray:
        return np.asarray(self.default_theta, float)

    def y0(self) -> np.ndarray:
        return np.asarray(self.default_y0, float)

    def times(self, n: int = 200) -> np.ndarray:
        return np.linspace(0.0, self.default_t_end, n)

    @property
    def recommended_method(self) -> str:
        """Adaptive solver matched to the model's stiffness."""
        return "kvaerno5" if self.stiff else "dopri5"

    @property
    def recommended_fixed_stepper(self) -> str:
        """Fixed stepper for the fused Pallas MH kernel."""
        return "kvaerno3" if self.stiff else "dopri5"

    # -- reference-compatible API --------------------------------------------
    def framework(self, dataframe, *, use_default_priors: bool = True,
                  random_seed: int = 0, **kwargs):
        """Construct a ready :class:`odelib_tpu.ModelFramework` fitting this
        model to ``dataframe`` (reference data schemas, SURVEY.md C5).

        Default priors (our native distributions — ``parameter`` accepts
        them directly) and default parameter values are pre-wired; any
        ``ModelFramework`` kwarg can be overridden.
        """
        from ..api import ModelFramework, parameter

        kw = dict(kwargs)
        if use_default_priors and self.priors is not None:
            pri = self.priors()
            for pname, d in pri.items():
                if pname not in kw and d is not None:
                    kw[pname] = parameter(
                        stats_gen=d, name=pname,
                        random_seed=random_seed)
        # remaining parameters: fixed at the literature default
        for pname, v in zip(self.pnames, self.default_theta):
            kw.setdefault(pname, float(v))
        kw.setdefault("state_summations", self.state_summations)
        if self.stiff:
            kw.setdefault("method", "kvaerno5")
        return ModelFramework(ODE=self.rhs, parameter_names=list(self.pnames),
                              state_names=list(self.snames),
                              dataframe=dataframe, random_seed=random_seed,
                              **kw)

    def __repr__(self):
        head = self.doc.strip().splitlines()[0] if self.doc else ""
        return (f"ModelDef({self.name!r}, params={list(self.pnames)}, "
                f"states={list(self.snames)}, stiff={self.stiff})"
                + (f"  # {head}" if head else ""))


_REGISTRY: Dict[str, ModelDef] = {}


def register(model: ModelDef) -> ModelDef:
    if model.name in _REGISTRY:
        raise ValueError(f"model {model.name!r} already registered")
    _REGISTRY[model.name] = model
    return model


def get(name: str) -> ModelDef:
    """Look up a packaged model by name (see :func:`available`)."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def available() -> Tuple[str, ...]:
    """Names of all packaged models."""
    return tuple(sorted(_REGISTRY))
