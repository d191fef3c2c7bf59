"""FSDP (ZeRO-3 state sharding) and tensor-parallel param sharding tests.

The reference's only distribution mode is replicated DDP (reference
ddpm.py:1281-1284); parallel/fsdp.py adds GSPMD state sharding — same pure
step functions, different in/out shardings.  Runs on the 8-virtual-device
CPU mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from localdiffusion_tpu.config import DiffusionConfig, ModelConfig, TrainConfig
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
from localdiffusion_tpu.parallel import (
    gather_tree,
    make_mesh,
    shard_info,
    spec_for_shape,
    tp_param_shardings,
)
from localdiffusion_tpu.train.trainer import Trainer

S = 8


def _gd():
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    dcfg = DiffusionConfig(image_size=S, timesteps=10, objective="pred_x0")
    return GaussianDiffusion(mcfg, dcfg)


def _data(n=16):
    rng = np.random.default_rng(0)
    hr = rng.uniform(0, 2, (n, S, S, 1)).astype(np.float32)
    lr = rng.uniform(0, 2, (n, S, S, 1)).astype(np.float32)
    return hr, lr


def test_spec_for_shape_rules():
    # conv kernel HWIO: shard O (last divisible dim)
    assert spec_for_shape((3, 3, 32, 64), "data", 8) == P(None, None, None, "data")
    # O not divisible → falls back to I
    assert spec_for_shape((3, 3, 32, 65), "data", 8) == P(None, None, "data", None)
    # nothing divisible / scalars / tiny → replicated
    assert spec_for_shape((5, 7), "data", 8) == P()
    assert spec_for_shape((), "data", 8) == P()
    assert spec_for_shape((8,), "data", 8) == P()  # 8 elems < min_elems*8
    assert spec_for_shape((64,), "data", 8) == P("data")


def test_fsdp_state_actually_sharded():
    mesh = make_mesh(data=8)
    tr = Trainer(_gd(), TrainConfig(), mesh=mesh, fsdp=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    info = shard_info(state)
    # the bulk of params/moments/EMA is sharded 8× — overall state memory
    # per device must shrink by a lot (small odd-width leaves stay replicated)
    assert info["memory_scaling"] > 3.0, info
    # spot-check one conv kernel leaf is distributed
    leaves = [
        l for l in jax.tree_util.tree_leaves(state.params) if l.ndim == 4
    ]
    assert any(
        l.addressable_shards[0].data.shape != l.shape for l in leaves
    )


def test_fsdp_training_matches_replicated():
    """Same data, same rngs: FSDP gradients equal the replicated-DP
    gradients (XLA all-gather/reduce-scatter vs all-reduce — same math).
    Gradients, not post-Adam params: Adam's early steps are sign-like and
    amplify summation-order noise on near-zero weights (see
    tests/test_trainer.py DP parity)."""
    hr, lr = _data()
    mesh = make_mesh(data=8)
    key = jax.random.PRNGKey(1)

    def grads_and_losses(fsdp):
        tr = Trainer(_gd(), TrainConfig(), mesh=mesh, fsdp=fsdp)
        state = tr.init_state(jax.random.PRNGKey(0))
        accum = tr.accum_grad_fn()
        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        g, loss = accum(state.params, zero, jnp.zeros(()), jnp.asarray(hr),
                        jnp.asarray(lr), key, jnp.asarray(1.0))
        g = gather_tree(g, mesh) if fsdp else g
        # and the losses over a few real optimizer steps track
        losses = []
        for i in range(3):
            state, l = tr.train_batch_step(
                state, hr, lr, jax.random.fold_in(key, i)
            )
            losses.append(l)
        return g, losses

    g_rep, losses_rep = grads_and_losses(False)
    g_fsdp, losses_fsdp = grads_and_losses(True)
    np.testing.assert_allclose(losses_rep, losses_fsdp, rtol=1e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_rep),
        jax.tree_util.tree_leaves(g_fsdp),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fsdp_epoch_resident_runs():
    hr, lr = _data()
    mesh = make_mesh(data=8)
    tr = Trainer(_gd(), TrainConfig(), mesh=mesh, fsdp=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    epoch = tr.epoch_resident_fn(n=len(hr), batch_size=8)
    state, loss = epoch(state, jnp.asarray(hr), jnp.asarray(lr),
                        jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert int(state.step) == 1


def test_fsdp_save_load_roundtrip(tmp_path):
    mesh = make_mesh(data=8)
    tr = Trainer(_gd(), TrainConfig(results_dir=str(tmp_path), project_name="f"),
                 mesh=mesh, fsdp=True)
    hr, lr = _data()
    state = tr.init_state(jax.random.PRNGKey(0))
    state, _ = tr.train_batch_step(state, hr, lr, jax.random.PRNGKey(3))
    tr.save(state, "rt")
    restored = tr.load("rt")
    for a, b in zip(
        jax.tree_util.tree_leaves(gather_tree(state, mesh).params),
        jax.tree_util.tree_leaves(gather_tree(restored, mesh).params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored state is sharded again
    assert shard_info(restored)["memory_scaling"] > 3.0


def test_tp_forward_parity():
    """Params sharded over a 'model' axis (sharded compute): forward equals
    the replicated forward."""
    gd = _gd()
    mesh = make_mesh(data=2, patch=1, model=4)
    params = gd.init_params(jax.random.PRNGKey(0), batch_size=1)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (4, S, S, 1)),
                    jnp.float32)
    cond = jnp.asarray(np.random.default_rng(2).uniform(0, 2, (4, S, S, 1)),
                       jnp.float32)
    t = jnp.zeros((4,), jnp.int32)

    ref = gd.apply_model(params, x, cond, t)

    tp_sh = tp_param_shardings(params, mesh, "model")
    rep = NamedSharding(mesh, P())
    params_tp = jax.tree_util.tree_map(jax.device_put, params, tp_sh)
    fn = jax.jit(
        gd.apply_model,
        in_shardings=(tp_sh, rep, rep, rep),
        out_shardings=rep,
    )
    out = fn(params_tp, jax.device_put(x, rep), jax.device_put(cond, rep),
             jax.device_put(t, rep))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    # params really live sharded on the model axis
    assert shard_info(params_tp)["memory_scaling"] > 2.0
