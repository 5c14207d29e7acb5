from libcontinual_tpu.ops.attention import fused_attention  # noqa: F401
