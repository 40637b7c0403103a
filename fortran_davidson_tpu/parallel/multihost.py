"""Multi-host initialization and mesh construction.

The TPU-native replacement for a distributed communication backend the
reference never had (SURVEY.md §2: no MPI/NCCL/Gloo — single process).
On a pod slice every host runs the same program:

    from fortran_davidson_tpu.parallel import multihost
    mesh = multihost.initialize()          # jax.distributed + global mesh
    res = eigensolve_sharded(A, k, mesh)   # collectives ride ICI/DCN

``initialize`` is a no-op on single-process setups (tests, one host), so
library code can call it unconditionally.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from fortran_davidson_tpu.parallel.mesh import ROWS_AXIS, default_mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               axis: str = ROWS_AXIS) -> Mesh:
    """Initialize multi-host JAX (idempotent) and return the global mesh.

    With no arguments, relies on the TPU environment's automatic
    coordinator discovery (``jax.distributed.initialize()`` defaults).
    ``initialize`` must be the process's FIRST JAX touch: probing the
    backend (even ``jax.process_count()``) before distributed init would
    initialize the local backend, after which distributed init is
    unsupported — so no such probe happens here. Single-process
    environments (no coordinator discoverable, or a backend already up in
    tests) fall through to a local-device mesh.
    """
    global _initialized
    if not _initialized:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        else:
            try:
                jax.distributed.initialize()
            except (ValueError, RuntimeError):
                pass  # single-process: no coordinator / backend already up
        _initialized = True
    return default_mesh(axis=axis)


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def global_mesh(axis: str = ROWS_AXIS) -> Mesh:
    """1-D mesh over every device in the job (all hosts)."""
    return default_mesh(axis=axis)
