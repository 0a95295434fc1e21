from wavthruvec_pytorch_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    globalize_state,
    local_batch_size,
    maybe_distributed_init,
    mesh_for_batch,
    process_shard,
    replicated,
    shard_batch,
)
