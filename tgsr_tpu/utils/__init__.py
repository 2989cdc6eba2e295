from tgsr_tpu.utils.visualize import (  # noqa: F401
    build_super_images,
    build_super_images_all,
    draw_caption,
)
from tgsr_tpu.utils.init import orthogonal_reinit  # noqa: F401
