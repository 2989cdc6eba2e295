from tgsr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicate,
    shard_batch,
)
from tgsr_tpu.parallel.multihost import (  # noqa: F401
    global_batch_from_local,
    initialize_distributed,
    process_local_slice,
)
