# NOTE: `loop` is intentionally not imported here — it depends on `config`,
# which imports `core.correction`; keep this package init to leaf modules.
from fortran_davidson_tpu.core import correction, krylov, orthogonal, subspace

__all__ = ["correction", "krylov", "orthogonal", "subspace"]
