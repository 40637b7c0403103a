"""Strict-numerics debugging switches.

The reference's CI always builds Debug with runtime checks and FP traps
(``-fcheck=all -ffpe-trap=zero,overflow,underflow -finit-real=nan``,
``src/CMakeLists.txt:15-17``). The JAX equivalents are process-wide
flags; this module bundles them so a reproduction run is one call:

    from fortran_davidson_tpu.utils.debugging import strict_numerics
    strict_numerics()          # NaN checks + x64 everywhere

``jax_debug_nans`` re-runs the offending computation op-by-op and raises
at the first NaN-producing primitive — the moral equivalent of an FPE
trap with a stack trace.
"""

from __future__ import annotations

import contextlib

import jax


def strict_numerics(debug_nans: bool = True, enable_x64: bool = True) -> None:
    """Enable NaN trapping and 64-bit mode globally (call before solves)."""
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    if enable_x64:
        jax.config.update("jax_enable_x64", True)


@contextlib.contextmanager
def nan_trap():
    """Context manager: NaN trapping for the enclosed solves only."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
