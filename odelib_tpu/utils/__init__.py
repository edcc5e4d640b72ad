"""Auxiliary subsystems: checkpoint/resume, profiling, logging, diagnostics.

The reference has none of these (SURVEY.md section 5); they exist here
because 10k-chain device runs deserve resumability, observability, and
convergence checks.
"""
from .checkpoint import load_posterior, resume_theta, save_posterior
from .diagnostics import effective_sample_size, split_rhat, summarize
from .profiling import StageTimer, get_logger, trace
from .sbc import SBCResult, rank_uniformity_pvalue, sbc_ranks

__all__ = ["save_posterior", "load_posterior", "resume_theta",
           "StageTimer", "get_logger", "trace",
           "effective_sample_size", "split_rhat", "summarize",
           "sbc_ranks", "rank_uniformity_pvalue", "SBCResult"]
