from fortran_davidson_tpu.models.generators import (
    generate_diagonal_dominant,
    surrogate_hamiltonian,
    surrogate_overlap,
)

__all__ = [
    "generate_diagonal_dominant",
    "surrogate_hamiltonian",
    "surrogate_overlap",
]
