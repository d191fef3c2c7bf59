"""Device mesh construction and sharding rules.

The reference's distribution story is HF Accelerate DDP over NCCL
(reference ddpm.py:1281-1284, train.qsub.sh:17).  The TPU-native equivalent
is single-program pjit over a `jax.sharding.Mesh`; XLA compiles the gradient
all-reduce / eval all-gathers onto ICI.  Axes:

  data  — batch data parallelism (DDP equivalent); with Trainer(fsdp=True)
          the training state is also ZeRO-3-sharded over it (parallel/fsdp.py)
  patch — branch/patch parallelism for branched & tiled sampling
          (the novel scale-out axis; BASELINE.json config 5)
  model — tensor parallelism: params stay sharded during compute and XLA
          partitions the matmuls/convs themselves (parallel/fsdp.py
          tp_param_shardings); only present when model > 1
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, patch: int = 1, model: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'patch'[, 'model']) mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data == -1:
        assert n % (patch * model) == 0, (
            f"{n} devices not divisible by patch*model={patch * model}"
        )
        data = n // (patch * model)
    assert data * patch * model <= n
    if model == 1:
        arr = np.array(devs[: data * patch]).reshape(data, patch)
        return Mesh(arr, ("data", "patch"))
    arr = np.array(devs[: data * patch * model]).reshape(data, patch, model)
    return Mesh(arr, ("data", "patch", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data' (NHWC batches)."""
    return NamedSharding(mesh, P("data"))


def branch_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [branch/patch, batch, H, W, C]: patch axis over 'patch',
    batch over 'data'."""
    return NamedSharding(mesh, P("patch", "data"))


def shard_batch(mesh: Mesh, *arrays):
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
