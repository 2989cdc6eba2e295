from tgsr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicate,
    shard_batch,
)
from tgsr_tpu.parallel.pipeline import (  # noqa: F401
    extract_chain,
    make_stage_mesh,
    pipeline_apply,
    stack_block_variables,
)
from tgsr_tpu.parallel.multihost import (  # noqa: F401
    global_batch_from_local,
    initialize_distributed,
    process_local_slice,
)
