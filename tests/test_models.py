"""Shape, dtype and invariant tests for the model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.config import ModelConfig
from localdiffusion_tpu.models import (
    CondEncoder,
    RMSNorm,
    SegUNet,
    SimpleCNN,
    SinusoidalPosEmb,
    UNet,
    encode_cond,
)
from localdiffusion_tpu.models.blocks import (
    Attention,
    Downsample,
    LinearAttention,
    ResnetBlock,
    Upsample,
)

KEY = jax.random.PRNGKey(0)


def test_rmsnorm_matches_torch_formula():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).standard_normal((2, 4, 4, 8)).astype(np.float32)
    m = RMSNorm()
    params = m.init(KEY, jnp.asarray(x))
    got = m.apply(params, jnp.asarray(x))
    # oracle: reference ddpm.py:131-132 in NCHW
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (F.normalize(xt, dim=1) * 1.0 * (xt.shape[1] ** 0.5)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_sinusoidal_pos_emb_matches_torch():
    import math

    import torch

    dim = 32
    t = np.array([0.0, 1.0, 10.0, 249.0], dtype=np.float32)
    got = SinusoidalPosEmb(dim).apply({}, jnp.asarray(t))
    # oracle: reference ddpm.py:142-149
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half) * -emb)
    emb = torch.from_numpy(t)[:, None] * emb[None, :]
    want = torch.cat((emb.sin(), emb.cos()), dim=-1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_downsample_space_to_depth_order():
    """Channel order must match einops 'b c (h p1) (w p2) -> b (c p1 p2) h w'."""
    import torch
    from einops.layers.torch import Rearrange

    x = np.random.default_rng(1).standard_normal((1, 4, 4, 3)).astype(np.float32)
    m = Downsample(dim_out=12)
    params = m.init(KEY, jnp.asarray(x))

    # isolate the rearrange by checking conv input == torch rearrange output
    b, h, w, c = x.shape
    ours = (
        jnp.asarray(x)
        .reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 5, 2, 4)
        .reshape(b, h // 2, w // 2, c * 4)
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = Rearrange("b c (h p1) (w p2) -> b (c p1 p2) h w", p1=2, p2=2)(xt)
    np.testing.assert_allclose(
        np.asarray(ours), want.permute(0, 2, 3, 1).numpy(), rtol=1e-6
    )
    out = m.apply(params, jnp.asarray(x))
    assert out.shape == (1, 2, 2, 12)


@pytest.mark.parametrize("attn_cls", [LinearAttention, Attention])
def test_attention_shapes(attn_cls):
    x = jnp.ones((2, 8, 8, 32))
    m = attn_cls(heads=4, dim_head=16)
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == x.shape


def test_resnet_block_residual_and_film():
    x = jnp.ones((2, 8, 8, 16))
    t = jnp.ones((2, 64))
    m = ResnetBlock(dim_out=32)
    params = m.init(KEY, x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 8, 8, 32)


def test_upsample_doubles():
    x = jnp.ones((1, 4, 4, 8))
    m = Upsample(dim_out=4)
    out = m.apply(m.init(KEY, x), x)
    assert out.shape == (1, 8, 8, 4)


def test_cond_encoder_shapes():
    # shallow (mnist): 28 → 7, 128ch (reference unet_model.py:131-132)
    enc = CondEncoder(num_blocks=3, base_dim=32)
    x = jnp.ones((2, 28, 28, 1))
    out = enc.apply(enc.init(KEY, x), x)
    assert out.shape == (2, 7, 7, 128)
    # deep (mri): 32 → 4, 256ch
    enc = CondEncoder(num_blocks=4, base_dim=32)
    x = jnp.ones((1, 32, 32, 1))
    out = enc.apply(enc.init(KEY, x), x)
    assert out.shape == (1, 4, 4, 256)


@pytest.fixture(scope="module")
def mnist_unet():
    cfg = ModelConfig(
        dim=16,
        init_dim=16,
        dim_mults=(1, 2, 4),
        full_attn=(False, False, True),
        channels=1,
        cond_encoder_depth="shallow",
    )
    model = UNet(cfg)
    x = jnp.ones((2, 28, 28, 1))
    cond = jnp.ones((2, 28, 28, 1))
    t = jnp.ones((2,))
    params = model.init(KEY, x, cond, t)
    return cfg, model, params


def test_unet_mnist_variant(mnist_unet):
    cfg, model, params = mnist_unet
    x = jnp.ones((2, 28, 28, 1))
    cond = jnp.ones((2, 28, 28, 1))
    t = jnp.ones((2,))
    out = model.apply(params, x, cond, t)
    assert out.shape == (2, 28, 28, 1)
    assert out.dtype == jnp.float32


def test_unet_precomputed_cond_feat_matches_inline(mnist_unet):
    cfg, model, params = mnist_unet
    x = jax.random.normal(KEY, (2, 28, 28, 1))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 1))
    t = jnp.array([3.0, 7.0])
    inline = model.apply(params, x, cond, t)
    feat = encode_cond(params, cfg, cond)
    pre = model.apply(params, x, None, t, cond_feat=feat)
    np.testing.assert_allclose(np.asarray(inline), np.asarray(pre), rtol=1e-5, atol=1e-5)


def test_unet_mri_variant():
    cfg = ModelConfig(
        dim=8,
        init_dim=8,
        dim_mults=(1, 2, 4, 8),
        full_attn=(False, False, False, True),
        channels=1,
        cond_encoder_depth="deep",
    )
    model = UNet(cfg)
    x = jnp.ones((1, 32, 32, 1))
    cond = jnp.ones((1, 32, 32, 1))
    t = jnp.ones((1,))
    params = model.init(KEY, x, cond, t)
    out = model.apply(params, x, cond, t)
    assert out.shape == (1, 32, 32, 1)


def test_unet_divisibility_assert(mnist_unet):
    cfg, model, params = mnist_unet
    with pytest.raises(AssertionError):
        model.apply(
            params, jnp.ones((1, 27, 27, 1)), jnp.ones((1, 27, 27, 1)), jnp.ones((1,))
        )


def test_unet_bf16_compute():
    cfg = ModelConfig(
        dim=8,
        dim_mults=(1, 2),
        full_attn=(False, True),
    )
    model = UNet(cfg, dtype=jnp.bfloat16)
    x = jnp.ones((1, 8, 8, 1))
    cond = jnp.ones((1, 8, 8, 1))
    t = jnp.ones((1,))
    params = model.init(KEY, x, cond, t)
    out = model.apply(params, x, cond, t)
    assert out.dtype == jnp.float32  # final conv upcasts
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)  # params stay f32


def test_seg_unet():
    m = SegUNet()
    x = jnp.ones((1, 32, 32, 1))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (1, 32, 32, 1)


def test_simple_cnn():
    m = SimpleCNN()
    x = jnp.ones((3, 28, 28, 1))
    out = m.apply(m.init(KEY, x), x)
    assert out.shape == (3, 10)


def test_random_or_learned_sinusoidal_pos_emb_matches_torch():
    """Oracle: reference ddpm.py:151-166 — freqs = t·w·2π, output
    [t, sin, cos] of width dim+1."""
    import math

    import torch

    from localdiffusion_tpu.models.blocks import RandomOrLearnedSinusoidalPosEmb

    m = RandomOrLearnedSinusoidalPosEmb(dim=8)
    t = jnp.asarray([0.0, 3.0, 49.0])
    params = m.init(KEY, t)
    got = np.asarray(m.apply(params, t))
    assert got.shape == (3, 9)  # dim + 1
    w = torch.from_numpy(np.asarray(params["params"]["weights"]))
    tt = torch.tensor([0.0, 3.0, 49.0])[:, None]
    freqs = tt * w[None, :] * 2 * math.pi
    want = torch.cat([tt, freqs.sin(), freqs.cos()], dim=-1)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)


def test_unet_learned_sinusoidal_variant():
    cfg = ModelConfig(
        dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1,
        learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
    )
    m = UNet(cfg)
    x = jnp.ones((1, 8, 8, 1))
    cond = jnp.ones((1, 8, 8, 1))
    t = jnp.asarray([3.0])
    params = m.init(KEY, x, cond, t)
    assert "pos_emb" in params["params"]["time_mlp"]
    out = m.apply(params, x, cond, t)
    assert out.shape == (1, 8, 8, 1)


def test_unet_self_condition():
    """self_condition doubles the input channels (reference ddpm.py:406-408):
    zeros by default, and a non-zero x_self_cond changes the output."""
    cfg = ModelConfig(
        dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1,
        self_condition=True,
    )
    m = UNet(cfg)
    x = jnp.ones((1, 8, 8, 1))
    cond = jnp.ones((1, 8, 8, 1))
    t = jnp.asarray([3.0])
    params = m.init(KEY, x, cond, t)
    # init conv consumes 2·C input channels
    assert params["params"]["init_conv"]["kernel"].shape[2] == 2
    out0 = m.apply(params, x, cond, t)
    out_zero = m.apply(params, x, cond, t, x_self_cond=jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out_zero))
    out_sc = m.apply(params, x, cond, t, x_self_cond=jnp.full_like(x, 0.7))
    assert not np.allclose(np.asarray(out0), np.asarray(out_sc))


def test_self_condition_training_loss_runs():
    from localdiffusion_tpu.config import DiffusionConfig
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion

    mcfg = ModelConfig(
        dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1,
        self_condition=True,
    )
    gd = GaussianDiffusion(mcfg, DiffusionConfig(image_size=8, timesteps=10))
    params = gd.init_params(KEY)
    x = jnp.ones((2, 8, 8, 1)) * 0.5
    cond = jnp.ones((2, 8, 8, 1))
    l = jax.jit(gd.loss)(params, KEY, x, cond)
    assert np.isfinite(float(l))


def test_unet_s2d_stem_variant():
    """TPU-first stem: f=2 space-to-depth in, depth-to-space out — output
    shape equals input shape; bottleneck aligns with the deeper cond
    encoder."""
    cfg = ModelConfig(
        dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1,
        stem_space_to_depth=2,
    )
    m = UNet(cfg)
    x = jnp.ones((1, 16, 16, 1))
    cond = jnp.ones((1, 16, 16, 1))
    t = jnp.asarray([3.0])
    params = m.init(KEY, x, cond, t)
    out = m.apply(params, x, cond, t)
    assert out.shape == (1, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    # d2s/s2d are exact inverses: a pure-identity check on the reshape pair
    f = 2
    v = jnp.arange(1 * 8 * 8 * 4.0).reshape(1, 8, 8, 4)
    b, h, w, c = v.shape
    s2d = v.reshape(b, h // f, f, w // f, f, c).transpose(0, 1, 3, 5, 2, 4)
    s2d = s2d.reshape(b, h // f, w // f, c * f * f)
    bb, hh, ww, cc = s2d.shape
    back = s2d.reshape(bb, hh, ww, cc // (f * f), f, f).transpose(0, 1, 4, 2, 5, 3)
    back = back.reshape(bb, hh * f, ww * f, cc // (f * f))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(v))
