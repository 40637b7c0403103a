"""Observability: convergence logging and profiler hooks.

The reference's entire observability story is ``print *`` of iteration
counts (``src/main.f90:53,55``). Here:

- every solve already returns machine-readable convergence telemetry
  (``DavidsonResult.residual_history`` / ``subspace_dims``);
- :class:`ConvergenceLogger` is a chunk callback for
  :func:`~fortran_davidson_tpu.core.loop.run_chunked` /
  ``eigensolve_checkpointed`` that streams per-chunk residual summaries
  to any logger;
- :func:`profile_trace` wraps ``jax.profiler`` so a solve can be
  captured for TensorBoard/XProf with one context manager.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Optional

import numpy as np

LOGGER = logging.getLogger("fortran_davidson_tpu")


class ConvergenceLogger:
    """Chunk callback: logs iteration, subspace dim, residual extrema.

    Records a host-side history list usable after the solve (the
    device-side history array in the result is the authoritative record).
    """

    def __init__(self, logger: Optional[logging.Logger] = None,
                 level: int = logging.INFO):
        self.logger = logger or LOGGER
        self.level = level
        self.records = []

    def __call__(self, state: dict) -> None:
        it = int(state["it"])
        m = int(state["m"])
        errors = np.asarray(state["errors"])
        n_conv = int(np.asarray(state["has_conv"]).sum())
        rec = dict(iteration=it, subspace_dim=m,
                   max_residual=float(errors.max()),
                   min_residual=float(errors.min()),
                   converged_pairs=n_conv)
        self.records.append(rec)
        self.logger.log(self.level,
                        "davidson it=%d dim=%d resid=[%.3e, %.3e] conv=%d/%d",
                        it, m, rec["min_residual"], rec["max_residual"],
                        n_conv, errors.shape[0])


@contextlib.contextmanager
def profile_trace(logdir: str, host_tracer_level: int = 2):
    """Capture a ``jax.profiler`` trace of the enclosed solve for
    TensorBoard/XProf (device timelines, HLO op breakdown)."""
    import jax

    with jax.profiler.trace(logdir, create_perfetto_link=False):
        yield logdir


def annotate(name: str):
    """Named trace span (shows up on profiler timelines)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
