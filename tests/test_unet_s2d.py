"""Exact s2d layout execution (models/unet_s2d.py) vs the standard UNet.

The transform must be numerically exact up to float reassociation: same
param tree, same outputs.  Covers the kernel-construction algebra, the
layout-level GroupNorm/attention equivalents, and the full forward for
3- and 4-stage configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.config import DiffusionConfig, ModelConfig
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
from localdiffusion_tpu.models.unet import UNet
from localdiffusion_tpu.models.unet_s2d import (
    apply_unet_s2d,
    depth_to_space,
    s2d_conv_kernel,
    s2d_upsample_kernel,
    space_to_depth,
)


def _conv(x, k, pad):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x, 2), 2), x)


@pytest.mark.parametrize("ksize", [3, 7])
def test_s2d_conv_kernel_exact(ksize):
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 16, 16, 5).astype(np.float32))
    W = jnp.asarray(rs.randn(ksize, ksize, 5, 7).astype(np.float32))
    ref = _conv(x, W, ksize // 2)
    ks2d, ppad = s2d_conv_kernel(W, 2)
    got = depth_to_space(_conv(space_to_depth(x, 2), ks2d, ppad), 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_s2d_conv_kernel_segments():
    # concat of two independently s2d'd segments == s2d of the concat
    rs = np.random.RandomState(2)
    a = jnp.asarray(rs.randn(1, 8, 8, 3).astype(np.float32))
    b = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32))
    W = jnp.asarray(rs.randn(3, 3, 7, 6).astype(np.float32))
    ref = _conv(jnp.concatenate([a, b], axis=-1), W, 1)
    ks2d, ppad = s2d_conv_kernel(W, 2, cin_sizes=[3, 4])
    x_s2d = jnp.concatenate([space_to_depth(a, 2), space_to_depth(b, 2)], axis=-1)
    got = depth_to_space(_conv(x_s2d, ks2d, ppad), 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_s2d_upsample_kernel_exact():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    W = jnp.asarray(rs.randn(3, 3, 4, 6).astype(np.float32))
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = _conv(up, W, 1)
    kup, ppad = s2d_upsample_kernel(W, 2)
    got = depth_to_space(_conv(x, kup, ppad), 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _forward_pair(mcfg: ModelConfig, size: int, seed: int = 0):
    model = UNet(mcfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (2, size, size, mcfg.channels))
    cond = jax.random.normal(
        jax.random.PRNGKey(seed + 2), (2, size, size, mcfg.resolved_cond_channels)
    )
    t = jnp.asarray([3.0, 11.0])
    params = model.init(rng, x, cond, t)
    ref = model.apply(params, x, cond, t)
    s2d_cfg = ModelConfig(
        **{**mcfg.__dict__, "exact_layout_s2d": 2}
    )
    got = apply_unet_s2d(params, s2d_cfg, x, cond, t)
    return np.asarray(ref), np.asarray(got)


def test_full_forward_4stage():
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2, 4, 8), channels=1,
                       full_attn=(False, False, False, True))
    ref, got = _forward_pair(mcfg, 32)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_full_forward_3stage_mnist_like():
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2, 4), channels=1,
                       full_attn=(False, False, True),
                       cond_encoder_depth="shallow")
    ref, got = _forward_pair(mcfg, 16)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_full_forward_stage0_full_attention():
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), channels=2,
                       full_attn=(True, True))
    ref, got = _forward_pair(mcfg, 8)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_full_forward_self_condition():
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), channels=1,
                       full_attn=(False, True), self_condition=True)
    model = UNet(mcfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 1))
    xsc = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 1))
    t = jnp.asarray([5.0])
    params = model.init(jax.random.PRNGKey(0), x, cond, t)
    ref = model.apply(params, x, cond, t, x_self_cond=xsc)
    s2d_cfg = ModelConfig(**{**mcfg.__dict__, "exact_layout_s2d": 2})
    got = apply_unet_s2d(params, s2d_cfg, x, cond, t, x_self_cond=xsc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_gaussian_diffusion_apply_model_routes():
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), channels=1, full_attn=(False, True),
                       exact_layout_s2d=2)
    mref = ModelConfig(dim=8, dim_mults=(1, 2), channels=1, full_attn=(False, True))
    dcfg = DiffusionConfig(image_size=8, timesteps=10)
    gd = GaussianDiffusion(mcfg, dcfg)
    gd_ref = GaussianDiffusion(mref, dcfg)
    params = gd_ref.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 1))
    t = jnp.zeros((1,))
    # cond_feat path (what the samplers use)
    cf = gd.encode_cond(params, cond)
    got = gd.apply_model(params, x, None, t, cond_feat=cf)
    ref = gd_ref.apply_model(params, x, None, t, cond_feat=cf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_config_rejects_stem_plus_exact():
    with pytest.raises(ValueError):
        ModelConfig(stem_space_to_depth=2, exact_layout_s2d=2)


def test_gradients_match_through_transform():
    """The transform is linear in the params (einsums with constant routing
    tensors), so loss gradients must match the standard path — validates
    exact_layout_s2d for training, not just inference."""
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), channels=1, full_attn=(False, True))
    scfg = ModelConfig(**{**mcfg.__dict__, "exact_layout_s2d": 2})
    dcfg = DiffusionConfig(image_size=8, timesteps=10)
    gd_ref = GaussianDiffusion(mcfg, dcfg)
    gd_s2d = GaussianDiffusion(scfg, dcfg)
    params = gd_ref.init_params(jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    rng = jax.random.PRNGKey(3)

    g_ref = jax.grad(lambda p: gd_ref.loss(p, rng, x0, cond))(params)
    g_s2d = jax.grad(lambda p: gd_s2d.loss(p, rng, x0, cond))(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_s2d = jax.tree_util.tree_leaves(g_s2d)
    assert len(flat_ref) == len(flat_s2d)
    for a, b in zip(flat_ref, flat_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-5)


def test_resolve_auto_by_input_size():
    cfg = ModelConfig(dim=8, dim_mults=(1, 2, 4, 8), full_attn=(False,) * 4)
    assert cfg.exact_layout_s2d == 0  # default: auto
    assert cfg.resolve_exact_layout_s2d(28, 28) == 1   # small input: off
    assert cfg.resolve_exact_layout_s2d(64, 64) == 1
    assert cfg.resolve_exact_layout_s2d(128, 128) == 2  # large: on
    assert cfg.resolve_exact_layout_s2d(256, 256) == 2
    assert cfg.resolve_exact_layout_s2d(136, 136) == 1  # not divisible by 16
    off = ModelConfig(dim=8, dim_mults=(1, 2, 4, 8), full_attn=(False,) * 4,
                      exact_layout_s2d=1)
    assert off.resolve_exact_layout_s2d(256, 256) == 1
    forced = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, False),
                         exact_layout_s2d=2)
    assert forced.resolve_exact_layout_s2d(32, 32) == 2
    stem = ModelConfig(dim=8, dim_mults=(1, 2, 4, 8), full_attn=(False,) * 4,
                       stem_space_to_depth=2)
    assert stem.resolve_exact_layout_s2d(256, 256) == 1


def test_exact_s2d_under_data_parallel_mesh():
    """The transform must compose with pjit sharding (batch over 'data')."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), channels=1,
                       full_attn=(False, True), exact_layout_s2d=2)
    dcfg = DiffusionConfig(image_size=8, timesteps=10)
    gd = GaussianDiffusion(mcfg, dcfg)
    params = gd.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 1))
    t = jnp.zeros((8,))
    ref = gd.apply_model(params, x, cond, t)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data"))
    fn = jax.jit(
        lambda p, xx, cc, tt: gd.apply_model(p, xx, cc, tt),
        in_shardings=(None, sh, sh, sh),
        out_shardings=sh,
    )
    with mesh:
        got = fn(params, x, cond, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_cond_encoder_s2d_parity():
    """encode_cond_s2d == CondEncoder.apply (narrow blocks folded, wide ones
    on the original module, maxpool == phase collapse)."""
    from localdiffusion_tpu.models.cond_encoder import CondEncoder
    from localdiffusion_tpu.models.unet_s2d import encode_cond_s2d

    for num_blocks, size in ((4, 32), (3, 16)):
        enc = CondEncoder(num_blocks=num_blocks, base_dim=32, group_num=16)
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, size, size, 1))
        params = enc.init(jax.random.PRNGKey(0), cond)["params"]
        ref = enc.apply({"params": params}, cond)
        got = encode_cond_s2d(params, num_blocks, 32, 16, cond, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5,
            err_msg=f"num_blocks={num_blocks} size={size}",
        )


@pytest.mark.parametrize("stages", [1, 2, 3])
def test_full_forward_4stage_fold_stages(stages):
    """Multi-level fold (exact_layout_s2d_stages): folding interior levels
    must stay numerically exact — same params, same outputs."""
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2, 4, 8), channels=1,
                       full_attn=(False, False, False, True))
    model = UNet(mcfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 1))
    t = jnp.asarray([3.0, 11.0])
    params = model.init(jax.random.PRNGKey(0), x, cond, t)
    ref = model.apply(params, x, cond, t)
    s2d_cfg = ModelConfig(**{**mcfg.__dict__, "exact_layout_s2d": 2})
    got = apply_unet_s2d(params, s2d_cfg, x, cond, t, s2d_stages=stages)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_full_forward_fold_stages_full_attn_interior():
    """Folded interior level with FULL attention (token-permutation
    invariance at level 1)."""
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2, 4), channels=1,
                       full_attn=(False, True, True))
    model = UNet(mcfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 1))
    t = jnp.asarray([5.0])
    params = model.init(jax.random.PRNGKey(0), x, cond, t)
    ref = model.apply(params, x, cond, t)
    s2d_cfg = ModelConfig(**{**mcfg.__dict__, "exact_layout_s2d": 2})
    got = apply_unet_s2d(params, s2d_cfg, x, cond, t, s2d_stages=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_gradients_match_multi_fold():
    """Gradients through the 2-level fold (training-path validity)."""
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2, 4), channels=1,
                       full_attn=(False, False, True))
    scfg = ModelConfig(**{**mcfg.__dict__, "exact_layout_s2d": 2,
                          "exact_layout_s2d_stages": 2})
    dcfg = DiffusionConfig(image_size=16, timesteps=10)
    gd_ref = GaussianDiffusion(mcfg, dcfg)
    gd_s2d = GaussianDiffusion(scfg, dcfg)
    params = gd_ref.init_params(jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1))
    rng = jax.random.PRNGKey(3)
    g_ref = jax.grad(lambda p: gd_ref.loss(p, rng, x0, cond))(params)
    g_s2d = jax.grad(lambda p: gd_s2d.loss(p, rng, x0, cond))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_s2d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)


def test_resolve_s2d_stages_auto():
    """auto = 1 level (deeper folds measured slower on-chip, see
    resolve_s2d_stages); explicit values clamp to num_stages-1."""
    cfg = ModelConfig(dim=32, init_dim=32, dim_mults=(1, 2, 4, 8),
                      full_attn=(False,) * 4)
    assert cfg.resolve_s2d_stages() == 1
    two = ModelConfig(dim=32, dim_mults=(1, 2, 4, 8), full_attn=(False,) * 4,
                      exact_layout_s2d_stages=2)
    assert two.resolve_s2d_stages() == 2
    explicit = ModelConfig(dim=32, dim_mults=(1, 2), full_attn=(False, False),
                           exact_layout_s2d_stages=5)
    assert explicit.resolve_s2d_stages() == 1  # clamped to num_stages-1
