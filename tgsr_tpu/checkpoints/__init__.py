from tgsr_tpu.checkpoints.convert_torch import (  # noqa: F401
    convert_netg_low,
    convert_netgh_weight,
    convert_text_encoder,
)
from tgsr_tpu.checkpoints.io import load_variables, save_variables  # noqa: F401
