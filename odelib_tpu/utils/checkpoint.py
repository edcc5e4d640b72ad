"""Posterior / chain-state checkpointing.

The reference has no persistence at all — posteriors exist only as the
returned in-memory DataFrame (SURVEY.md section 5.4). Here large MCMC runs
can checkpoint their posterior and resume chains from the last recorded state.
Plain ``.npz`` container (no extra deps); an orbax-backed variant can layer on
top for multi-host runs.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


def save_posterior(path: str, posterior: pd.DataFrame) -> None:
    """Save a posterior DataFrame to exactly ``<path>`` (npz format).

    Written through a file handle: bare ``np.savez_compressed(path)``
    silently appends ``.npz`` when the extension differs, which would break
    the save->load round trip on the user's own path.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    arrays = {}
    meta = {"columns": list(posterior.columns)}
    for c in posterior.columns:
        v = posterior[c].to_numpy()
        if v.dtype == object:  # array-valued parameter columns
            v = np.stack([np.asarray(x, float) for x in v])
        arrays[f"col_{c}"] = v
    with open(path, "wb") as f:
        np.savez_compressed(f, __meta__=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8), **arrays)


def load_posterior(path: str) -> pd.DataFrame:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        cols = {}
        for c in meta["columns"]:
            v = z[f"col_{c}"]
            cols[c] = list(v) if v.ndim > 1 else v
    return pd.DataFrame(cols)


def resume_theta(posterior: pd.DataFrame, pnames,
                 n_chains: int) -> pd.DataFrame:
    """Last recorded parameter vector of each chain — restart point for a
    continued MCMC run (pass as ``MCMC(chain_inits=<this dataframe>)``)."""
    rows = []
    for c in range(n_chains):
        sub = posterior[posterior["chain#"] == c]
        if len(sub):
            rows.append(sub.iloc[-1][list(pnames)].to_dict())
    return pd.DataFrame(rows)
