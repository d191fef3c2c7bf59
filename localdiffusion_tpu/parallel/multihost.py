"""Multi-host (multi-process) runtime: distributed init + global data feeding.

The reference scales out with HF Accelerate DDP over NCCL, launched by SGE
(reference train.qsub.sh:15-17, ddpm.py:1281-1284).  The TPU-native
equivalent is a single-program-multiple-data launch: every host runs the
SAME script, `jax.distributed.initialize` joins them into one runtime, and
the existing pjit train/sample programs — written against a global
`jax.sharding.Mesh` — run unchanged, with XLA placing the gradient
all-reduce on ICI/DCN.

What changes on multi-host is only ARRAY CONSTRUCTION: a host cannot
`jax.device_put` onto devices it does not address, so replicated state and
sharded batches are assembled with `jax.make_array_from_callback`, each
process contributing the shards it owns.  Data feeding uses the
every-host-loads-the-global-batch pattern (our loaders are deterministic
and seeded, so every host computes identical batches and keeps only its
rows); a sharded-at-source loader can slot in by implementing the same
callback contract.

Single-process behavior is unchanged: every helper degrades to plain
`device_put` when `jax.process_count() == 1`, so the Trainer uses these
unconditionally.

Validated by tests/test_multihost.py: two real OS processes (CPU backend,
2 virtual devices each) join a 4-device mesh, run the sharded gradient
program, and bit-match the single-process gradients.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join this process into a multi-host JAX runtime.

    Call BEFORE any device access.  No-op when num_processes is None/1
    (single-host: the default everywhere in this repo).  On TPU pods with
    standard env metadata all three args may be None and are auto-detected
    by jax.distributed.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_tree(tree: Any, sharding) -> Any:
    """Place a host-local pytree onto a (possibly multi-host) sharding.

    Single-process: plain `jax.device_put`.  Multi-process: every process
    must hold the same full-size host values (replicated state, or the
    deterministic global batch); each assembles only its addressable
    shards via `jax.make_array_from_callback`.
    """
    if not is_multiprocess():
        return jax.device_put(tree, sharding)

    def put_leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree_util.tree_map(put_leaf, tree)


def warmup_collectives(mesh) -> None:
    """Establish cross-process communicator contexts with a tiny all-reduce.

    Communicator setup (Gloo on CPU, ICI/DCN rings on TPU) happens lazily at
    the first collective dispatch and carries a connection timeout; if ranks
    reach that first dispatch far apart — e.g. each is compiling a large
    program — setup can time out spuriously.  Running one trivial psum over
    the mesh right after construction pins the context while ranks are still
    aligned, and surfaces real connectivity errors immediately instead of
    minutes into the first step.  No-op single-process.
    """
    if not is_multiprocess():
        return
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = int(mesh.devices.size)
    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    ones = np.ones((n,), np.float32)
    x = jax.make_array_from_callback((n,), sh, lambda idx: ones[idx])
    out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    np.testing.assert_allclose(np.asarray(out), n)


def sync(name: str = "sync") -> None:
    """Barrier across processes (no-op single-process)."""
    if is_multiprocess():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
