"""Parameter sharding: FSDP (ZeRO-style) training state and tensor-parallel
inference params.

The reference's only distribution mode is DDP (HF Accelerate over NCCL,
reference ddpm.py:1281-1284): every GPU holds a full replica of params,
grads, Adam moments and the EMA copy.  On TPU the idiomatic alternative is
GSPMD: annotate a sharding for every leaf of the training state and let XLA
insert the all-gathers (params before use) and reduce-scatters (grads after
the backward) on ICI.  Nothing about the step function changes — the same
pure `train_step` runs replicated, DP, or FSDP depending only on the
in/out shardings.

Sharding rule: for each array leaf we shard ONE dimension — the last
dimension divisible by the axis size (conv kernels HWIO shard O, dense
kernels (I, O) shard O, biases/scales of divisible width shard their only
dim); leaves with no divisible dim (scalars, odd widths) stay replicated.
Adam moments and the EMA copy mirror param shapes, so deriving the spec
from the *shape alone* gives every mirror the same sharding for free.

Axes:
  * FSDP uses the existing 'data' axis — each data-parallel group member
    holds 1/N of the state (ZeRO-3 memory scaling at DP width).
  * Tensor parallelism uses a dedicated 'model' axis (make_mesh(model=K)):
    params stay sharded *during* compute and XLA partitions the matmuls /
    convs themselves, trading ICI collectives inside the step for 1/K-width
    per-chip kernels.  Same spec function, different mesh axis.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spec_for_shape(shape, axis_name: str, axis_size: int,
                   min_elems: int = 2) -> P:
    """PartitionSpec sharding the LAST dimension divisible by axis_size;
    replicated when none is (scalars, odd widths, tiny leaves)."""
    if axis_size <= 1 or len(shape) == 0:
        return P()
    total = 1
    for d in shape:
        total *= d
    if total < min_elems * axis_size:
        return P()
    for i in range(len(shape) - 1, -1, -1):
        if shape[i] % axis_size == 0 and shape[i] >= axis_size:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def tree_shardings(tree: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Pytree of NamedShardings mirroring `tree` (arrays or ShapeDtypeStructs),
    derived from leaf shapes alone — works identically for params, Adam
    moments, EMA copies, and whole TrainStates."""
    size = mesh.shape[axis_name]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, spec_for_shape(shape, axis_name, size))

    return jax.tree_util.tree_map(leaf_sharding, tree)


def state_shardings(trainer, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shardings for a full TrainState (step scalar replicated, everything
    else sharded per `spec_for_shape`) without materializing one: shapes via
    eval_shape on the trainer's init."""
    state_shape = jax.eval_shape(trainer._build_state, jax.random.PRNGKey(0))
    return tree_shardings(state_shape, mesh, axis_name)


def put_tree_sharded(tree: Any, shardings: Any) -> Any:
    """Place a host pytree onto per-leaf shardings (multi-host safe:
    every process assembles only its addressable shards via
    multihost.put_tree's per-leaf contract)."""
    from localdiffusion_tpu.parallel.multihost import put_tree

    return jax.tree_util.tree_map(
        lambda x, sh: put_tree(x, sh), tree, shardings
    )


def gather_tree(tree: Any, mesh: Mesh) -> Any:
    """All-gather a sharded pytree back to full replicas (e.g. params for a
    sampler compiled with replicated shardings, or host-side checkpointing
    of an FSDP state).

    Compiled jit identity with replicated out_shardings rather than
    per-leaf device_put: under a multi-process runtime the gather is then
    a single collective program every process participates in (ALL
    processes must call this together there)."""
    rep = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: rep, tree)
    return jax.jit(lambda x: x, out_shardings=shardings)(tree)


def shard_info(tree: Any) -> dict:
    """Diagnostic: global vs per-device addressable bytes of a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    glob = sum(l.size * l.dtype.itemsize for l in leaves)
    local = 0
    for l in leaves:
        shards = getattr(l, "addressable_shards", None)
        if shards:
            local += shards[0].data.size * l.dtype.itemsize
        else:
            local += l.size * l.dtype.itemsize
    return {"global_bytes": int(glob), "per_device_bytes": int(local),
            "memory_scaling": glob / max(local, 1)}


def tp_param_shardings(params: Any, mesh: Mesh,
                       axis_name: str = "model") -> Any:
    """Tensor-parallel param shardings (sharded-compute; see module doc)."""
    return tree_shardings(params, mesh, axis_name)
