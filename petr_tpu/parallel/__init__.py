from petr_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    constrain,
    DATA_AXIS,
    MODEL_AXIS,
)
