from fortran_davidson_tpu.utils import dtypes, errors
from fortran_davidson_tpu.utils.dtypes import canonical_dtype, ensure_x64, safe_denominator
from fortran_davidson_tpu.utils.errors import (
    DavidsonError,
    InvalidOptionsError,
    OperatorError,
    require,
)

__all__ = [
    "dtypes",
    "errors",
    "canonical_dtype",
    "ensure_x64",
    "safe_denominator",
    "DavidsonError",
    "InvalidOptionsError",
    "OperatorError",
    "require",
]
