from libcontinual_tpu.parallel.mesh import (  # noqa: F401
    MeshContext,
    make_mesh,
    shard_batch,
    replicate,
)
