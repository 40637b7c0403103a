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
    HybridBandedOperator,
    generate_banded_bsr,
    generate_local_sparse,
    generate_sparse_diagonal_dominant,
    split_band_remainder,
)

__all__ = [
    "BSROperator",
    "HybridBandedOperator",
    "generate_local_sparse",
    "split_band_remainder",
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
