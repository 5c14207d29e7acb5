from libcontinual_tpu.data.continual import (  # noqa: F401
    ContinualStream,
    TaskData,
    build_stream,
    build_class_map,
)
from libcontinual_tpu.data.transforms import build_transform  # noqa: F401
