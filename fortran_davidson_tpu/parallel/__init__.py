from fortran_davidson_tpu.parallel.halo import (HaloBSROperator,
                                                HaloQuantizedOperator)
from fortran_davidson_tpu.parallel.mesh import (ROWS_AXIS, default_mesh,
                                                replicated, row_sharding)
from fortran_davidson_tpu.parallel.sharded import (RowShardConstraint,
                                                   eigensolve_sharded,
                                                   shard_operator)

__all__ = [
    "HaloBSROperator",
    "HaloQuantizedOperator",
    "ROWS_AXIS",
    "RowShardConstraint",
    "default_mesh",
    "eigensolve_sharded",
    "replicated",
    "row_sharding",
    "shard_operator",
]
