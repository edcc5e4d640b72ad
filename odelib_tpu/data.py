"""Pandas data ingestion -> device observation arrays.

Reproduces both input schemas of the reference ``_formatdf``
(``/root/reference/ODElib/Framework.py:281-307``):

1. (organism, time, abundance, replicate): log-mean / log-std computed by
   groupby over replicates;
2. (organism, time, abundance[, log_abundance][, log_sigma]): used directly,
   with a warning + log_sigma=1 default when log_sigma is missing.

and the nearest-grid-point observation indexing of ``_df_fitsetup``
(``Framework.py:309-329``), then flattens everything into the
:class:`~odelib_tpu.model.ObsData` pytree.
"""
from __future__ import annotations

import warnings
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from .model import ObsData


def format_dataframe(df: pd.DataFrame, snames) -> pd.DataFrame:
    """Normalize a user dataframe to organism-indexed log-space columns."""
    df = df.sort_values(by=["organism", "time"])
    if "replicate" in df and "censored" in df:
        raise ValueError(
            "censored observations cannot be aggregated over replicates "
            "(a mean of detection limits is not a limit); provide the "
            "direct schema (organism, time, abundance[, log_sigma]) with "
            "one row per point instead")
    if "replicate" in df:
        _df = df[["organism", "time", "abundance"]].copy()
        _df["log_abundance"] = np.log(_df["abundance"])
        dfagg = _df.groupby(by=["time", "organism"]).mean()
        dfagg["log_sigma"] = _df.groupby(
            by=["time", "organism"]).std()["log_abundance"]
        dfagg = dfagg.reset_index(level="time")
        df = dfagg
    else:
        df = df.set_index("organism")
        if "abundance" in df and "log_abundance" not in df:
            df["log_abundance"] = np.log(df["abundance"].to_numpy())
        if "log_sigma" not in df:
            df["log_sigma"] = 1
            warnings.warn("log_sigma not found, setting log variance to 1")
    return df


def nearest_grid_indices(obs_times: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """First index of the closest grid point for each observation time
    (exactly the reference's argmin-of-abs rule, ``Framework.py:316-319``)."""
    d = np.abs(obs_times[:, None] - grid[None, :])
    return d.argmin(axis=1).astype(np.int32)


def fit_setup(df: pd.DataFrame, times: np.ndarray):
    """Per-state observation dictionaries (host-side mirror of
    ``_df_fitsetup``). Returns (pred_tindex, obs_logabundance, obs_logsigma)."""
    pred_tindex = {}
    obs_logabundance = {}
    obs_logsigma = {}
    # first-appearance order, NOT set(): set order depends on str hashing,
    # which made observed-state ordering (and any duplicate-label Series
    # arithmetic downstream) nondeterministic across processes
    for sname in dict.fromkeys(df.index):
        sub = df.loc[[sname]]
        pred_tindex[sname] = nearest_grid_indices(
            np.atleast_1d(sub["time"].to_numpy(dtype=float)), times)
        obs_logabundance[sname] = np.atleast_1d(
            sub["log_abundance"].to_numpy(dtype=float))
        obs_logsigma[sname] = np.atleast_1d(
            sub["log_sigma"].to_numpy(dtype=float))
    return pred_tindex, obs_logabundance, obs_logsigma


_CENSOR_NAMES = {"": 0, "none": 0, "exact": 0, "no": 0,
                 "left": 1, "lod": 1, "below": 1,
                 "right": 2, "upper": 2, "above": 2}


def parse_censor_column(col) -> np.ndarray:
    """Normalize a user 'censored' column to int32 flags (0 exact, 1 left,
    2 right). Accepts booleans (True = left-censored, the detection-limit
    case), integers {0, 1, 2}, or strings ('left'/'lod'/'below',
    'right'/'upper'/'above', ''/'none'/'exact')."""
    vals = np.atleast_1d(np.asarray(col, object))
    out = np.zeros(len(vals), np.int32)
    for i, v in enumerate(vals):
        if isinstance(v, str):
            key = v.strip().lower()
            if key not in _CENSOR_NAMES:
                raise ValueError(f"unknown censoring label {v!r}; use one "
                                 f"of {sorted(set(_CENSOR_NAMES))}")
            out[i] = _CENSOR_NAMES[key]
        elif isinstance(v, (bool, np.bool_)):
            out[i] = 1 if v else 0
        elif v is None or (isinstance(v, float) and np.isnan(v)):
            out[i] = 0
        else:
            iv = int(v)
            if iv not in (0, 1, 2):
                raise ValueError(f"censoring flag must be 0 (exact), "
                                 f"1 (left) or 2 (right), got {v!r}")
            out[i] = iv
    return out


def build_obsdata_host(df: pd.DataFrame, times: np.ndarray,
                       post_snames) -> Tuple[ObsData, Tuple[str, ...]]:
    """Host-side (numpy) ObsData — no device transfers.

    Kept separate because device->host pulls are expensive to issue on some
    runtimes (and static kernel-planning code like ops/pallas_mh must never
    read device arrays back). Use :func:`to_device` / :func:`build_obsdata`
    for the device pytree.

    A ``censored`` dataframe column (bool / {0,1,2} / 'left'/'right'
    labels, :func:`parse_censor_column`) marks detection-limit rows whose
    ``abundance`` is the LIMIT, not a measurement; they are scored by the
    Tobit likelihood (:func:`odelib_tpu.stats.obs_negloglik`) and excluded
    from the R^2 sums.
    """
    pred_tindex, logab, logsig = fit_setup(df, np.asarray(times))
    observed = tuple(s for s in post_snames if s in pred_tindex)
    if not observed:
        raise ValueError(
            f"No dataframe organisms match model states {post_snames}; "
            f"found organisms {sorted(pred_tindex)}")
    cen_by_state = None
    if "censored" in df.columns:
        cen_by_state = {
            s: parse_censor_column(df.loc[[s]]["censored"].to_numpy())
            for s in observed}
        if not any(c.any() for c in cen_by_state.values()):
            cen_by_state = None
    la, ls, ti, si, ce = [], [], [], [], []
    sstot = 0.0
    for s in observed:
        la.append(logab[s])
        ls.append(logsig[s])
        ti.append(pred_tindex[s])
        si.append(np.full(len(logab[s]), post_snames.index(s), np.int32))
        ab = np.exp(logab[s])
        if cen_by_state is not None:
            ce.append(cen_by_state[s])
            ab = ab[cen_by_state[s] == 0]
        if ab.size:
            sstot += ab.shape[0] * np.var(ab)
    la = np.concatenate(la)
    return ObsData(
        log_abundance=la,
        log_sigma=np.concatenate(ls),
        abundance=np.exp(la),
        t_index=np.concatenate(ti),
        state_index=np.concatenate(si),
        sstot=np.asarray(sstot),
        censor=np.concatenate(ce) if cen_by_state is not None else None,
    ), observed


def obsdata_to_device(obs: ObsData, dtype=None) -> ObsData:
    dtype = dtype or jnp.result_type(float)
    return ObsData(
        log_abundance=jnp.asarray(obs.log_abundance, dtype),
        log_sigma=jnp.asarray(obs.log_sigma, dtype),
        abundance=jnp.asarray(obs.abundance, dtype),
        t_index=jnp.asarray(np.asarray(obs.t_index), jnp.int32),
        state_index=jnp.asarray(np.asarray(obs.state_index), jnp.int32),
        sstot=jnp.asarray(obs.sstot, dtype),
        censor=None if obs.censor is None
        else jnp.asarray(np.asarray(obs.censor), jnp.int32),
    )


def build_obsdata(df: pd.DataFrame, times: np.ndarray,
                  post_snames, dtype=None) -> Tuple[ObsData, Tuple[str, ...]]:
    """Flatten per-state observations into one ObsData pytree (device arrays).

    Observed states are concatenated in ``post_snames`` order (a fixed,
    deterministic order — the reference iterates a set, which only works
    because chi is order-invariant). Returns (obsdata, observed_state_names).
    """
    host, observed = build_obsdata_host(df, times, post_snames)
    return obsdata_to_device(host, dtype), observed


def compact_observation_grid(obs: ObsData, times,
                             extra_times=None) -> Tuple[np.ndarray,
                                                        ObsData]:
    """Shrink the integration grid to observation times only.

    The reference integrates the full ``t_steps`` grid every MCMC iteration
    and then subsets (``Framework.py:656,670-682``); chi only needs the ~20
    unique observed grid times, so the hot loop integrates a compact grid —
    an order-of-magnitude fewer sequential output points per iteration with
    identical chi to solver tolerance. Measured (tests/test_accuracy_gate.py,
    1024 LHS draws from the demo priors, fixed Dopri5 substeps=4 on the
    compact grid vs adaptive rtol 1e-6 on the full grid): max relative chi
    error 6.7e-6 in the near-fit region, median 2.1e-7 globally — see
    BASELINE.md "Accuracy gate". The full grid remains in use for
    trajectory-returning APIs.

    Returns (compact_times, obs-with-remapped-t_index). compact_times[0] is
    always the grid origin (integration start). Operate on a HOST ObsData
    (from :func:`build_obsdata_host`) — reading a device ObsData back would
    issue a device->host transfer.

    ``extra_times``: times that must survive compaction even though no
    observation lands there — dose-event times, most importantly: a dose
    snapped to a grid point that compaction dropped would silently land on
    the wrong time. Each is first snapped to the FULL grid (the same
    nearest-point rule as observations) so compact and full solves fire
    doses at identical times.
    """
    times = np.asarray(times)
    tidx = np.asarray(obs.t_index)
    obs_times = times[tidx]
    keep = obs_times
    if extra_times is not None and len(np.atleast_1d(extra_times)):
        snapped = times[nearest_grid_indices(
            np.atleast_1d(np.asarray(extra_times, float)), times)]
        keep = np.concatenate([keep, snapped])
    uniq = np.unique(keep)
    if uniq[0] != times[0]:
        uniq = np.concatenate([[times[0]], uniq])
    new_tidx = np.searchsorted(uniq, obs_times).astype(np.int32)
    return uniq, obs._replace(t_index=new_tidx)


def demo_data_path() -> str:
    """Path to the demo host/virus dataset.

    Defaults to the synthetic dataset committed inside the package
    (``odelib_tpu/demodata.csv``, generated by
    ``examples/make_demodata.py`` — same shape and schema as the
    reference's ``demo/demodata.csv:1-38`` but freshly generated, not
    copied).  Set ``ODELIB_DEMODATA=/path/to.csv`` to point the demo,
    bench, and test workloads at another file (e.g. the reference's real
    lab data, when mounted).
    """
    import os

    override = os.environ.get("ODELIB_DEMODATA", "")
    if override:
        return override
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "demodata.csv")


def load_demo_dataframe(host: str = "host",
                        virus: str = "virus") -> pd.DataFrame:
    """Load the demo dataset, renaming organisms to model state names.

    ``load_demo_dataframe(host="S", virus="V")`` yields a frame ready for
    the two-state ``zero_i`` model (the reference notebook's
    ``df.replace({'virus': 'V', 'host': 'S'})`` step, cell 7).
    """
    df = pd.read_csv(demo_data_path())
    return df.replace({"host": host, "virus": virus})


def initial_states_from_df(df: pd.DataFrame) -> Dict[str, float]:
    """Initial states from the t==0 rows (``Framework.py:246-249``; first
    occurrence wins)."""
    out = {}
    at0 = df[df["time"] == 0]
    for org, abundance in at0["abundance"].items():
        if org not in out:
            out[org] = abundance
    return out
