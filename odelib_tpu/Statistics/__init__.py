"""Reference-layout compatibility subpackage.

The reference exposes ``ODElib.Statistics.stats`` and
``ODElib.Statistics.Samplers`` (``Statistics/__init__.py:1``) and ships —
but forgets to export — ``Statistics.distributions``
(``Statistics/distributions.py``, orphaned; SURVEY.md C17). Here all three
are first-class:

    from odelib_tpu.Statistics import stats, Samplers, distributions
"""
from . import Samplers, distributions, stats

__all__ = ["Samplers", "stats", "distributions"]
