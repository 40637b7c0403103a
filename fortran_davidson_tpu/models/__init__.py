from fortran_davidson_tpu.models.generators import (
    bse_surrogate,
    generate_diagonal_dominant,
    surrogate_hamiltonian,
    surrogate_overlap,
)

__all__ = [
    "bse_surrogate",
    "generate_diagonal_dominant",
    "surrogate_hamiltonian",
    "surrogate_overlap",
]
