"""Device mesh + sharding utilities — the working replacement for the
reference's dead DDP/NCCL path (reference core/trainer.py:37-40, 206-241).

Single-controller JAX: build a ``Mesh`` over ``('data', 'model')``, shard the
batch dimension over ``data``, replicate (or shard, for TP-aware modules)
parameters, and let XLA insert the collectives (psum over ICI for gradient
and metric reduction). Multi-host entry goes through
``jax.distributed.initialize`` before mesh construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshContext:
    mesh: Mesh
    batch_spec: P
    replicated_spec: P

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    @property
    def model_size(self) -> int:
        return self.mesh.shape["model"]

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.batch_spec)

    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.replicated_spec)

    def param_sharding(self, tree: Any) -> Any:
        """Per-leaf shardings: TP rules over the 'model' axis (parallel/tp.py),
        replicated everywhere else. Identity-cheap when model == 1."""
        from libcontinual_tpu.parallel import tp

        return tp.sharding_tree(self, tree)


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[list] = None
) -> MeshContext:
    """Create a ('data', 'model') mesh. ``data=-1`` uses all devices / model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model < 1:
        model = 1
    if data == -1:
        data = n // model
    if data < 1 or data * model > n:
        # data < 1 happens when model > device count under data=-1: fail here
        # with the misconfiguration instead of building a 0-device Mesh that
        # dies later in XLA with an unrelated-looking sharding error
        raise ValueError(f"mesh {data}x{model} needs {max(data, 1) * model} devices, have {n}")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    mesh = Mesh(dev_array, axis_names=("data", "model"))
    return MeshContext(mesh=mesh, batch_spec=P("data"), replicated_spec=P())


def shard_batch(ctx: MeshContext, batch: Any) -> Any:
    """Place a host batch onto the mesh, sharded along the leading dim.

    Pads nothing: callers must make batch divisible by the data-axis size
    (the trainer pads epochs to full batches already).
    """
    sharding = ctx.batch_sharding()
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(ctx: MeshContext, tree: Any) -> Any:
    sharding = ctx.replicated_sharding()
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
