"""Worker process for tests/test_multihost.py.

One rank of a real multi-process JAX runtime on the CPU backend: each of
the two OS processes owns 2 virtual devices and joins a single 4-device
('data', 'patch') mesh via `jax.distributed` — the same launch shape as a
multi-host TPU pod slice (one process per host, devices global).  Rank 0
writes the gradients/losses for the parent test to compare against a
single-process run.

Not a pytest module (underscore prefix): invoked via subprocess only.
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    # env before jax import: CPU backend, 2 virtual devices per process
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    # the session's TPU plugin prepends itself to jax_platforms even over
    # the env var (CLAUDE.md) — force CPU at config level too
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from localdiffusion_tpu.parallel.multihost import (
        init_distributed,
        is_primary,
        sync,
        warmup_collectives,
    )

    init_distributed(f"localhost:{args.port}", args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * args.num_processes

    import jax.numpy as jnp
    import numpy as np

    from localdiffusion_tpu.config import DiffusionConfig, ModelConfig, TrainConfig
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from localdiffusion_tpu.parallel.mesh import make_mesh
    from localdiffusion_tpu.train.trainer import Trainer

    # identical tiny setup to the parent's single-process reference
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    dcfg = DiffusionConfig(image_size=8, timesteps=10)
    gd = GaussianDiffusion(mcfg, dcfg)
    rng = np.random.default_rng(0)
    hr = rng.uniform(0, 2, (8, 8, 8, 1)).astype(np.float32)
    lr = rng.uniform(0, 2, (8, 8, 8, 1)).astype(np.float32)

    mesh = make_mesh(data=4, patch=1)  # global mesh: spans BOTH processes
    warmup_collectives(mesh)  # pin Gloo contexts before the big compiles
    tr = Trainer(gd, TrainConfig(lr=1e-3), mesh=mesh)
    key = jax.random.PRNGKey(0)
    state = tr.init_state(key)

    # gradient program (the DDP-equivalent all-reduce crosses processes)
    accum = tr.accum_grad_fn()
    zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    hr_g, lr_g = tr.put_batch(hr, lr)
    g, loss = accum(
        state.params, zero, tr._put_rep(jnp.zeros(())), hr_g, lr_g,
        tr._put_rep(key), tr._put_rep(jnp.asarray(1.0)),
    )

    # one full optimizer step: exercises donation + EMA under multihost
    state2, loss2 = tr.train_batch_step(state, hr, lr, key)
    assert int(np.asarray(state2.step)) == 1

    # FSDP under a REAL multi-process runtime: init_state goes through
    # put_tree_sharded's make_array_from_callback branch (each process
    # assembles only its addressable shards), and the step's
    # all-gather/reduce-scatter collectives cross processes
    from localdiffusion_tpu.parallel.fsdp import shard_info

    tr_f = Trainer(
        gd,
        TrainConfig(lr=1e-3, results_dir=args.out, project_name="fsdp_mh"),
        mesh=mesh,
        fsdp=True,
    )
    state_f = tr_f.init_state(key)
    assert shard_info(state_f)["memory_scaling"] > 1.5
    state_f2, loss_f = tr_f.train_batch_step(state_f, hr, lr, key)
    assert int(np.asarray(state_f2.step)) == 1

    # FSDP checkpoint round-trip across processes: save() gathers
    # collectively (every rank calls it; rank-0 writes), load() restores
    # from a host template and re-shards — the recovery path the watchdog
    # relies on
    from localdiffusion_tpu.parallel.fsdp import gather_tree

    tr_f.save(state_f2, "rt")
    sync("fsdp_ckpt")
    restored = tr_f.load("rt")
    assert shard_info(restored)["memory_scaling"] > 1.5
    a = jax.device_get(gather_tree(state_f2.params, mesh))
    b = jax.device_get(gather_tree(restored.params, mesh))
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    if is_primary():
        leaves = [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g)]
        np.save(os.path.join(args.out, "grads.npy"), np.concatenate(leaves))
        with open(os.path.join(args.out, "loss.txt"), "w") as f:
            f.write(f"{float(loss)} {float(loss2)} {float(loss_f)}")
    sync("done")


if __name__ == "__main__":
    main()
