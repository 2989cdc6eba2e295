import os


def maybe_force_platform():
    """Honor TGSR_PLATFORM=cpu|tpu|axon. The axon sitecustomize overrides
    JAX_PLATFORMS via jax.config at interpreter start, so a plain env var
    is not enough -- this must run before any backend use."""
    plat = os.environ.get("TGSR_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


maybe_force_platform()
