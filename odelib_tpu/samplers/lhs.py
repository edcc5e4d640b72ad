"""Latin Hypercube Sampling in pure JAX.

Replaces the pyDOE2 dependency of the reference
(``/root/reference/ODElib/Statistics/Samplers.py:3,33``). pyDOE2's default
``lhs(n, samples)`` draws one point uniformly inside each of ``samples``
equal-probability strata per dimension, with independently shuffled strata —
reproduced here with ``jax.random.permutation``, then pushed through each
prior's ``ppf`` exactly like ``Samplers.py:40``.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def lhs_unit(key, n_dims: int, samples: int):
    """(samples, n_dims) Latin-hypercube draw on the unit cube."""
    k_perm, k_u = jax.random.split(key)
    u = jax.random.uniform(k_u, (samples, n_dims),
                           dtype=jnp.result_type(float))
    perm_keys = jax.random.split(k_perm, n_dims)
    strata = jax.vmap(
        lambda k: jax.random.permutation(k, samples), out_axes=1)(perm_keys)
    return (strata.astype(u.dtype) + u) / samples


def sample_lhs(key, dists: Sequence, samples: int):
    """LHS parameter draws: one distribution per (flat) dimension.

    Returns (samples, len(dists)). Each column is ``dists[i].ppf`` applied to
    its LHS stratum — the TPU-native ``Samplers.sample_lhs``.
    """
    cube = lhs_unit(key, len(dists), samples)
    cols = [d.ppf(cube[:, i]) for i, d in enumerate(dists)]
    return jnp.stack(cols, axis=1)
