from tgsr_tpu.ops.blocks import (  # noqa: F401
    GLU,
    glu,
    Conv1x1,
    Conv3x3,
    Conv5x5,
    UpBlock,
    UpBlockNoBN,
    DownBlock,
    Block3x3Relu,
    ResBlock,
    depth_to_space,
    space_to_depth,
    upsample_nearest2x,
    leaky_relu,
)
from tgsr_tpu.ops.attention import (  # noqa: F401
    word_region_attention,
    func_attention,
    WordPixelAttention,
)
