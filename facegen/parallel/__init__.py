from facegen.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    make_parallel_epoch,
    make_parallel_segment,
    make_parallel_step,
    replicate,
    shard_pool,
)
from facegen.parallel.gspmd import (  # noqa: F401
    MODEL_AXIS,
    ensure_mesh2d,
    gspmd_infer_jit,
    gspmd_jit,
    make_gspmd_c2f_epoch,
    make_gspmd_epoch,
    make_gspmd_segment,
    make_gspmd_step,
    make_mesh2d,
    mesh2d_from_shape,
    shard_pool_2d,
    shard_state,
    state_shardings,
)
