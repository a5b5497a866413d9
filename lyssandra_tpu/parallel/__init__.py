from lyssandra_tpu.parallel.mesh import (
    make_mesh,
    shard_patches,
    replicate,
    ksvd_train_step,
    sharded_ksvd_step,
)
from lyssandra_tpu.parallel.model_sharded import omp_model_sharded
