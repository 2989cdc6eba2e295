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
from tgsr_tpu.models.discriminator import DNet, ESRGANDNet  # noqa: F401
from tgsr_tpu.models.image_encoder import (  # noqa: F401
    CNNEncoder,
    InceptionV3Backbone,
    SimpleCNNEncoder,
)
from tgsr_tpu.models.models16 import (  # noqa: F401
    GSRNetLow16,
    NetGHigh16,
    NetGHighWeight16,
)
from tgsr_tpu.models.vgg import VGG16Features  # noqa: F401
