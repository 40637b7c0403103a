from fortran_davidson_tpu.ops.operators import (
    DenseOperator,
    DiagonalOperator,
    LinearOperator,
    MatrixFreeOperator,
    as_operator,
    probe_diagonal,
)
from fortran_davidson_tpu.ops.sparse import (
    BSROperator,
    ELLOperator,
    generate_banded_bsr,
    generate_sparse_diagonal_dominant,
)

__all__ = [
    "BSROperator",
    "DenseOperator",
    "DiagonalOperator",
    "ELLOperator",
    "LinearOperator",
    "MatrixFreeOperator",
    "as_operator",
    "generate_banded_bsr",
    "generate_sparse_diagonal_dominant",
    "probe_diagonal",
]
