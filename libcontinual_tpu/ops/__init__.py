from libcontinual_tpu.ops.attention import attention, fused_attention  # noqa: F401
