from wavthruvec_pytorch_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
