from tgsr_tpu.engine.inference import SRPipeline  # noqa: F401
