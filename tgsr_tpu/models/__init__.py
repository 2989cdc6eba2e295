from tgsr_tpu.models.text_encoder import TextEncoder  # noqa: F401
from tgsr_tpu.models.generator import (  # noqa: F401
    CANet,
    InitStageGImgUp,
    NextStageG,
    GetImageG,
    GSRNetLow,
    GSRNetLowStage1,
)
from tgsr_tpu.models.generator_hf import (  # noqa: F401
    NetGHigh,
    NetGHighWeight,
    NetGHighSRWeight,
)
from tgsr_tpu.models.discriminator import DNet  # noqa: F401
