from fortran_davidson_tpu.ops.operators import (
    DenseOperator,
    DiagonalOperator,
    LinearOperator,
    MatrixFreeOperator,
    as_operator,
    probe_diagonal,
)

__all__ = [
    "DenseOperator",
    "DiagonalOperator",
    "LinearOperator",
    "MatrixFreeOperator",
    "as_operator",
    "probe_diagonal",
]
