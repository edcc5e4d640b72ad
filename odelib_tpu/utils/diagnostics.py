"""MCMC convergence diagnostics: split-R-hat and effective sample size.

The reference ships no convergence tooling at all — users eyeball trace
plots (demo notebook cells 36-38). Here the two standard diagnostics
(Gelman et al., *Bayesian Data Analysis* 3rd ed. §11.4-11.5; Vehtari et
al. 2021 rank-normalization) run as vectorized numpy over the (chains,
draws) posterior layout the samplers already produce:

* :func:`split_rhat` — potential scale reduction on split chains; values
  near 1.0 indicate the chains agree within and between.
* :func:`effective_sample_size` — autocorrelation-corrected sample count
  via FFT autocovariance and Geyer's initial-positive-sequence truncation.
* :func:`summarize` / :meth:`ModelFramework.diagnostics` — per-parameter
  table (mean, std, median, ESS, ESS/draw, R-hat) from a posterior
  DataFrame with the framework's ``chain#`` column convention.

Host-side numpy by design: diagnostics run once per posterior, the arrays
are (chains x recorded draws), and FFTs of that size are microseconds —
keeping them off-device avoids polluting the TPU dispatch path.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd


def _split_chains(x: np.ndarray) -> np.ndarray:
    """(C, N) -> (2C, N//2): split each chain in half (drop odd tail)."""
    C, N = x.shape
    h = N // 2
    if h < 1:
        raise ValueError("need at least 2 draws per chain to split")
    return np.concatenate([x[:, :h], x[:, N - h:]], axis=0)


def split_rhat(x) -> float:
    """Split-chain potential scale reduction factor R-hat.

    ``x``: (chains, draws). Returns NaN when variance degenerates (all
    draws identical — e.g. a chain that never accepted).
    """
    z = _split_chains(np.asarray(x, float))
    M, N = z.shape
    mean_c = z.mean(axis=1)
    var_c = z.var(axis=1, ddof=1)
    W = var_c.mean()
    B = N * mean_c.var(ddof=1)
    if not np.isfinite(W) or W <= 0:
        return float("nan")
    var_plus = (N - 1) / N * W + B / N
    return float(np.sqrt(var_plus / W))


def _autocov_fft(z: np.ndarray) -> np.ndarray:
    """Per-chain autocovariance via FFT; z is (C, N) demeaned."""
    C, N = z.shape
    n_fft = int(2 ** np.ceil(np.log2(2 * N)))
    f = np.fft.rfft(z, n=n_fft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=n_fft, axis=1)[:, :N].real
    return acov / N


def effective_sample_size(x) -> float:
    """Multi-chain ESS (BDA3 eq. 11.8 with Geyer initial positive-sequence
    truncation). ``x``: (chains, draws)."""
    z = np.asarray(x, float)
    if z.ndim == 1:
        z = z[None]
    C, N = z.shape
    if N < 4:
        return float("nan")
    mean_c = z.mean(axis=1, keepdims=True)
    acov = _autocov_fft(z - mean_c)
    W = acov[:, 0].mean()
    var_plus = W * (N - 1) / N + (mean_c[:, 0].var(ddof=1) if C > 1 else 0.0)
    if not np.isfinite(var_plus) or var_plus <= 0:
        return float("nan")
    # combined lag-t correlation across chains
    rho = 1.0 - (W - acov.mean(axis=0)) / var_plus   # rho[0] == 1
    # Geyer: sum consecutive pairs while positive
    tau = 1.0
    t = 1
    while t + 1 < N:
        pair = rho[t] + rho[t + 1]
        if pair < 0:
            break
        tau += 2.0 * pair
        t += 2
    return float(C * N / max(tau, 1.0))


def summarize(posterior: pd.DataFrame, pnames,
              chain_col: str = "chain#") -> pd.DataFrame:
    """Per-parameter diagnostic table from a posterior DataFrame.

    Columns: mean, std, median, ess, ess_per_draw, rhat. Array-valued
    parameter columns are skipped (diagnose their flattened components by
    passing explicit column names).
    """
    if chain_col not in posterior:
        raise ValueError(f"posterior has no {chain_col!r} column")
    chains = posterior[chain_col].to_numpy()
    ids = np.unique(chains[np.isfinite(chains)])
    rows = {}
    for p in pnames:
        col = posterior[p].to_numpy()
        if col.dtype == object:
            continue
        col = np.asarray(col, float)
        per_chain = [col[chains == c] for c in ids]
        n = min((len(v) for v in per_chain), default=0)
        stats: Dict[str, float] = {
            "mean": float(np.nanmean(col)),
            "std": float(np.nanstd(col, ddof=1)),
            "median": float(np.nanmedian(col)),
        }
        if n >= 4 and len(per_chain) >= 1:
            x = np.stack([v[:n] for v in per_chain])
            finite = np.isfinite(x).all()
            ess = effective_sample_size(x) if finite else float("nan")
            stats["ess"] = ess
            stats["ess_per_draw"] = (ess / x.size if np.isfinite(ess)
                                     else float("nan"))
            stats["rhat"] = (split_rhat(x) if finite and len(per_chain) >= 2
                             else float("nan"))
        else:
            stats["ess"] = stats["ess_per_draw"] = stats["rhat"] = \
                float("nan")
        rows[p] = stats
    return pd.DataFrame(rows).T[
        ["mean", "std", "median", "ess", "ess_per_draw", "rhat"]]
