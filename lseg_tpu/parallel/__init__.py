from lseg_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
    shard_state,
)
