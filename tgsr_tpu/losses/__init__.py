from tgsr_tpu.losses.damsm import (  # noqa: F401
    cosine_similarity,
    sent_loss,
    words_loss,
    sent_similarity,
    words_similarity,
)
from tgsr_tpu.losses.gan import (  # noqa: F401
    discriminator_loss,
    generator_loss,
    discriminator_loss_sigmoid,
    generator_loss_sigmoid,
    generator_loss_uncond,
    discriminator_loss_uncond,
    esrgan_d_loss,
    esrgan_g_loss,
)
from tgsr_tpu.losses.pixel import (  # noqa: F401
    mse_pyramid,
    cycle_mse,
    weight_mse,
    kl_loss,
)
