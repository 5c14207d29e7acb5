from libcontinual_tpu.config.config import Config, load_config  # noqa: F401
