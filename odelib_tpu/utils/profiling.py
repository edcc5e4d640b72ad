"""Tracing, per-stage timing, and structured logging.

The reference has no observability beyond ad-hoc prints
(``/root/reference/ODElib/Framework.py:778,784,1094``; SURVEY.md section
5.1/5.5). Here the same information flows through three first-class tools:

* :func:`get_logger` — one shared ``logging.Logger`` for the package.
  Progress/report messages go through it, so library users can silence or
  redirect them with standard ``logging`` configuration.
* :class:`StageTimer` — named wall-clock stages with an aggregate report;
  the MCMC pipeline uses it when ``profile=True`` (survey / seeding /
  chains / postprocess).
* :func:`trace` — a context manager around ``jax.profiler.trace`` that
  writes a TensorBoard-loadable device trace (XLA op timeline, HBM
  transfers) for any block of framework code.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

_LOGGER_NAME = "odelib_tpu"


def get_logger() -> logging.Logger:
    """The package logger; INFO handler attached once, lazily."""
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[%(name)s] %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class StageTimer:
    """Accumulate named wall-clock stages; jit/dispatch-aware by convention.

    Callers must ``block_until_ready`` device work inside the stage for the
    numbers to be meaningful (the framework's own call sites do).

        timer = StageTimer()
        with timer.stage("survey"):
            ...
        timer.report()   # via the package logger
    """

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = (self.times.get(name, 0.0)
                                + time.perf_counter() - t0)

    def report(self, logger: Optional[logging.Logger] = None) -> str:
        logger = logger or get_logger()
        total = sum(self.times.values()) or 1.0
        lines = ["stage timings:"]
        for name, t in self.times.items():
            lines.append(f"  {name:<14s} {t:8.3f}s  ({100 * t / total:5.1f}%)")
        msg = "\n".join(lines)
        logger.info(msg)
        return msg


@contextlib.contextmanager
def trace(logdir: str):
    """Record a ``jax.profiler`` device trace for the enclosed block.

    View with TensorBoard's profile plugin (or xprof). Example::

        with odelib_tpu.utils.trace("/tmp/odelib-trace"):
            model.MCMC(chain_inits=10_000, iterations_per_chain=1000)
    """
    import jax

    with jax.profiler.trace(logdir):
        yield
