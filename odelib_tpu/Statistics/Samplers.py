"""``ODElib.Statistics.Samplers`` compatible surface.

Reference signatures (``/root/reference/ODElib/Statistics/Samplers.py``)
backed by the batched TPU core:

* :func:`sample_lhs` — ``sample_lhs(parameter_dict, samples)`` -> DataFrame,
  one column per parameter (array-valued parameters get one LHS dimension
  per non-zero entry; reference bug 5 fixed, ``Samplers.py:45``).
* :func:`MetropolisHastings` — ``MetropolisHastings(modelframework, nits,
  burnin, static_parameters, print_progress)`` -> posterior DataFrame for
  ONE chain, with the reference's columns (params..., chi, rsquared, aic,
  iteration, acceptance_ratio). Internally it's the same device sampler that
  runs 10k chains; this entry point exists for drop-in compatibility. The
  per-iteration debug print of the reference (``Samplers.py:123``) is
  intentionally not reproduced.
"""
from __future__ import annotations

import jax
import numpy as np
import pandas as pd

from ..samplers import sample_lhs as _sample_lhs_core
from .. import distributions as _dist


def sample_lhs(parameter_dict, samples, seed=None):
    """LHS draws for a dict of parameter objects (reference signature).

    ``seed=None`` draws a fresh seed from numpy's global RNG — matching the
    reference's reseedable global-state behavior (``Samplers.py:33``), so
    repeated calls give new stratified draws; pass an int for
    reproducibility.
    """
    if seed is None:
        seed = int(np.random.randint(0, 2**31 - 1))
    key = jax.random.PRNGKey(seed)
    names, dists, dims, templates = [], [], [], {}
    for p, par in parameter_dict.items():
        jd = _dist.from_scipy(par.dist, getattr(par, "hp", None))
        val = np.asarray(getattr(par, "val", 1.0))
        n = int(np.count_nonzero(val)) if val.shape else 1
        names.append(p)
        dims.append(n)
        dists.extend([jd] * n)
        templates[p] = val
    draws = np.asarray(_sample_lhs_core(key, dists, samples))
    out = {}
    off = 0
    for p, n in zip(names, dims):
        t = templates[p]
        if not t.shape:
            out[p] = draws[:, off]
        else:
            nz = np.where(t != 0)
            rows = []
            for r in range(samples):
                arr = np.array(t, float)
                arr[nz] = draws[r, off:off + n]
                rows.append(arr)
            out[p] = rows
        off += n
    return pd.DataFrame(out)


def MetropolisHastings(modelframework, nits=1000, burnin=None,
                       static_parameters=set(), print_progress=True):
    """Single-chain MH with the reference's entry-point signature
    (``Samplers.py:53-174``); runs on device via the batched sampler."""
    posterior = modelframework.MCMC(
        chain_inits=pd.DataFrame(
            [modelframework.get_parameters(as_dict=True)]),
        iterations_per_chain=nits, burnin=burnin,
        static_parameters=list(static_parameters),
        print_report=False)
    return posterior.drop(columns=["chain#"]).reset_index(drop=True)
