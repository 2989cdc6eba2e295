from tgsr_tpu.utils.visualize import (  # noqa: F401
    build_super_images,
    build_super_images2,
    build_super_images_all,
    build_super_imagesall,
    draw_caption,
)
from tgsr_tpu.utils.init import orthogonal_reinit  # noqa: F401
