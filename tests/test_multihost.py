"""Multi-host runtime validation with REAL processes.

Two OS processes (2 virtual CPU devices each) join one 4-device mesh via
`jax.distributed` and run the sharded gradient + train-step programs
(tests/_multihost_worker.py); the cross-process gradient all-reduce must
reproduce a single-process run of the same program — the multi-node
analogue of test_trainer.py::test_dp_matches_single_device.

This is the launch shape of a multi-host TPU pod slice (reference
counterpart: HF Accelerate DDP over NCCL, train.qsub.sh:15-17).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_grads():
    """Single-process gradients for the worker's exact setup."""
    from localdiffusion_tpu.config import DiffusionConfig, ModelConfig, TrainConfig
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from localdiffusion_tpu.train.trainer import Trainer

    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    dcfg = DiffusionConfig(image_size=8, timesteps=10)
    gd = GaussianDiffusion(mcfg, dcfg)
    rng = np.random.default_rng(0)
    hr = rng.uniform(0, 2, (8, 8, 8, 1)).astype(np.float32)
    lr = rng.uniform(0, 2, (8, 8, 8, 1)).astype(np.float32)

    tr = Trainer(gd, TrainConfig(lr=1e-3))
    key = jax.random.PRNGKey(0)
    state = tr.init_state(key)
    accum = tr.accum_grad_fn()
    zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    g, loss = accum(
        state.params, zero, jnp.zeros(()), jnp.asarray(hr), jnp.asarray(lr),
        key, jnp.asarray(1.0),
    )
    flat = np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g)]
    )
    return flat, float(loss)


def test_two_process_grad_parity(tmp_path):
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # the workers set their own backend env; drop the parent's 8-device flag
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    worker = os.path.join(root, "tests", "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [
                sys.executable, worker,
                "--process-id", str(i), "--num-processes", "2",
                "--port", str(port), "--out", str(tmp_path),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-4000:]}"

    g_multi = np.load(tmp_path / "grads.npy")
    loss_multi, loss_step, loss_fsdp = map(
        float, (tmp_path / "loss.txt").read_text().split()
    )
    assert np.isfinite(loss_step)
    # FSDP step under the 2-process runtime sees the same loss as the
    # replicated step (same params/batch/key; sharded state, same math)
    np.testing.assert_allclose(loss_fsdp, loss_step, rtol=1e-5)

    g_ref, loss_ref = _reference_grads()
    np.testing.assert_allclose(loss_multi, loss_ref, rtol=1e-5)
    gmax = float(np.max(np.abs(g_ref)))
    np.testing.assert_allclose(g_multi, g_ref, rtol=1e-4, atol=1e-5 * gmax)
