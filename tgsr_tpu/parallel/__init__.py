from tgsr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicate,
    shard_batch,
)
