"""``ODElib.Statistics.stats`` compatible surface.

Same function names and semantics as the reference module
(``/root/reference/ODElib/Statistics/stats.py:3-63``), backed by the batched
JAX kernels in :mod:`odelib_tpu.stats`.
"""
from ..stats import (AIC, Rsqrd, chi, get_adjusted_rsquared,
                     predict_logsigma)

__all__ = ["chi", "AIC", "Rsqrd", "get_adjusted_rsquared",
           "predict_logsigma"]
