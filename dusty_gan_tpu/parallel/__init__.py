from dusty_gan_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    local_batch_slice,
)
