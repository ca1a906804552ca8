from accflow_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    clip_batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)
