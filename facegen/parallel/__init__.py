from facegen.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    make_parallel_epoch,
    make_parallel_step,
    replicate,
    shard_pool,
)
