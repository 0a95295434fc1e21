from wavthruvec_pytorch_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    mesh_for_batch,
    replicated,
    shard_batch,
)
