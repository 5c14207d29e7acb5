from libcontinual_tpu.core.metrics import compute_bwt, compute_frgt  # noqa: F401
