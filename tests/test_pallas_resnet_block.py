"""Fused s2d ResnetBlock kernel: parity vs the XLA exact-layout block and
gradient flow through the custom_vjp (Mosaic interpreter on CPU; chip
numbers in docs/PERFORMANCE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.ops.pallas_resnet_block import (
    _reference,
    resnet_block_s2d_fused,
    supports,
)

GROUPS, F, C = 8, 2, 32


def _block_params(key, cin_orig, dim_out=C, with_res=None, with_mlp=True):
    """A ResnetBlock param subtree with the original (non-s2d) conv shapes."""
    ks = jax.random.split(key, 8)
    p = {
        "block1": {
            "proj": {
                "kernel": jax.random.normal(ks[0], (3, 3, cin_orig, dim_out)) * 0.1,
                "bias": jax.random.normal(ks[1], (dim_out,)) * 0.05,
            },
            "norm": {
                "scale": jax.random.normal(ks[2], (dim_out,)) * 0.2 + 1.0,
                "bias": jax.random.normal(ks[3], (dim_out,)) * 0.1,
            },
        },
        "block2": {
            "proj": {
                "kernel": jax.random.normal(ks[4], (3, 3, dim_out, dim_out)) * 0.1,
                "bias": jax.random.normal(ks[5], (dim_out,)) * 0.05,
            },
            "norm": {
                "scale": jax.random.normal(ks[6], (dim_out,)) * 0.2 + 1.0,
                "bias": jax.random.normal(ks[7], (dim_out,)) * 0.1,
            },
        },
    }
    if with_res is None:
        with_res = cin_orig != dim_out
    if with_res:
        p["res_conv"] = {
            "kernel": jax.random.normal(
                jax.random.fold_in(key, 99), (1, 1, cin_orig, dim_out)
            ) * 0.1,
            "bias": jax.random.normal(
                jax.random.fold_in(key, 98), (dim_out,)
            ) * 0.05,
        }
    return p


CASES = [
    # (shape, cin_sizes, with_mlp)   shape is the s2d tensor
    ((2, 8, 8, 128), None, True),          # identity residual + FiLM
    ((2, 8, 8, 128), None, False),         # no time embedding
    ((1, 16, 8, 256), (32, 32), True),     # skip-concat segments + res_conv
]


@pytest.mark.parametrize("shape,cin_sizes,with_mlp", CASES)
def test_fused_matches_reference(shape, cin_sizes, with_mlp):
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(jax.random.fold_in(key, 1), shape) * 0.5).astype(
        jnp.bfloat16
    )
    cin_orig = shape[-1] // (F * F)
    p = _block_params(key, cin_orig)
    assert supports(shape, C, GROUPS, F)

    ss = None
    if with_mlp:
        ss = (
            jax.random.normal(jax.random.fold_in(key, 2), (shape[0], C)) * 0.3,
            jax.random.normal(jax.random.fold_in(key, 3), (shape[0], C)) * 0.3,
        )

    ref = _reference(x, p, ss, C, GROUPS, F, cin_sizes)
    got = resnet_block_s2d_fused(x, p, ss, C, GROUPS, F, cin_sizes, True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.06,
    )
    r = np.corrcoef(
        np.asarray(got, np.float32).ravel(), np.asarray(ref, np.float32).ravel()
    )[0, 1]
    assert r > 0.999


def test_vjp_matches_reference_exactly():
    key = jax.random.PRNGKey(4)
    shape = (1, 8, 8, 128)
    x = (jax.random.normal(jax.random.fold_in(key, 1), shape) * 0.5).astype(
        jnp.bfloat16
    )
    p = _block_params(key, 32)
    ss = (
        jax.random.normal(jax.random.fold_in(key, 2), (1, C)) * 0.3,
        jax.random.normal(jax.random.fold_in(key, 3), (1, C)) * 0.3,
    )
    ct = jax.random.normal(jax.random.fold_in(key, 7), shape).astype(jnp.bfloat16)

    _, vjp_f = jax.vjp(
        lambda xx, pp, s: resnet_block_s2d_fused(
            xx, pp, s, C, GROUPS, F, None, True
        ),
        x, p, ss,
    )
    _, vjp_r = jax.vjp(
        lambda xx, pp, s: _reference(xx, pp, s, C, GROUPS, F, None),
        x, p, ss,
    )
    gf, gr = vjp_f(ct), vjp_r(ct)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=1e-5,
        )


WFOLD_CASES = [
    # (shape, dim_out, with_mlp)   shape is the NORMAL-layout tensor
    ((2, 8, 32, 32), 32, True),    # int_down1 geometry: r=4, identity res
    ((2, 8, 32, 32), 32, False),   # no time embedding
    ((1, 8, 16, 96), 64, True),    # int_up2 geometry: r=2, res_conv 96→64
    ((1, 8, 8, 192), 128, True),   # int_up1 geometry: r=1 (pure fusion)
]


@pytest.mark.parametrize("shape,dim_out,with_mlp", WFOLD_CASES)
def test_wfold_matches_reference(shape, dim_out, with_mlp):
    from localdiffusion_tpu.ops.pallas_resnet_block import (
        _reference_normal,
        resnet_block_wfold_fused,
        supports_normal,
    )

    key = jax.random.PRNGKey(7)
    x = (jax.random.normal(jax.random.fold_in(key, 1), shape) * 0.5).astype(
        jnp.bfloat16
    )
    p = _block_params(key, shape[-1], dim_out=dim_out)
    assert supports_normal(shape, dim_out, GROUPS)

    ss = None
    if with_mlp:
        ss = (
            jax.random.normal(jax.random.fold_in(key, 2), (shape[0], dim_out))
            * 0.3,
            jax.random.normal(jax.random.fold_in(key, 3), (shape[0], dim_out))
            * 0.3,
        )

    ref = _reference_normal(x, p, ss, dim_out, GROUPS)
    got = resnet_block_wfold_fused(x, p, ss, dim_out, GROUPS, True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.06,
    )
    r = np.corrcoef(
        np.asarray(got, np.float32).ravel(), np.asarray(ref, np.float32).ravel()
    )[0, 1]
    assert r > 0.999


def test_wfold_vjp_matches_reference_exactly():
    from localdiffusion_tpu.ops.pallas_resnet_block import (
        _reference_normal,
        resnet_block_wfold_fused,
    )

    key = jax.random.PRNGKey(8)
    shape, dim_out = (1, 8, 16, 96), 64
    x = (jax.random.normal(jax.random.fold_in(key, 1), shape) * 0.5).astype(
        jnp.bfloat16
    )
    p = _block_params(key, shape[-1], dim_out=dim_out)
    ss = (
        jax.random.normal(jax.random.fold_in(key, 2), (1, dim_out)) * 0.3,
        jax.random.normal(jax.random.fold_in(key, 3), (1, dim_out)) * 0.3,
    )
    ct = jax.random.normal(
        jax.random.fold_in(key, 7), (1, 8, 16, dim_out)
    ).astype(jnp.bfloat16)

    _, vjp_f = jax.vjp(
        lambda xx, pp, s: resnet_block_wfold_fused(
            xx, pp, s, dim_out, GROUPS, True
        ),
        x, p, ss,
    )
    _, vjp_r = jax.vjp(
        lambda xx, pp, s: _reference_normal(xx, pp, s, dim_out, GROUPS),
        x, p, ss,
    )
    gf, gr = vjp_f(ct), vjp_r(ct)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=1e-5,
        )


def test_resnet_block_module_dispatches_wfold(monkeypatch):
    """The flax ResnetBlock routes big bf16 tensors through the W-fold
    kernel (LOCALDIFF_FUSED_BLOCK=interpret) and matches the unfused path."""
    import localdiffusion_tpu.models.blocks as B

    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (1, 64, 64, 32), jnp.float32) * 0.5
    t_emb = jax.random.normal(jax.random.fold_in(key, 1), (1, 128))
    mod = B.ResnetBlock(dim_out=32, groups=8, dtype=jnp.bfloat16)

    monkeypatch.setenv("LOCALDIFF_FUSED_BLOCK", "0")
    monkeypatch.setattr(B, "_FUSED_BLOCK_N", None)
    params = mod.init(jax.random.PRNGKey(0), x, t_emb)
    ref = mod.apply(params, x, t_emb)
    assert B._FUSED_BLOCK_N is False

    monkeypatch.setenv("LOCALDIFF_FUSED_BLOCK", "interpret")
    monkeypatch.setattr(B, "_FUSED_BLOCK_N", None)
    got = mod.apply(params, x, t_emb)
    assert B._FUSED_BLOCK_N not in (None, False)
    monkeypatch.setattr(B, "_FUSED_BLOCK_N", None)

    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.06, rtol=0.08,
    )
    r = np.corrcoef(
        np.asarray(got, np.float32).ravel(),
        np.asarray(ref, np.float32).ravel(),
    )[0, 1]
    assert r > 0.999


def test_unet_s2d_dispatch_uses_fused_block(monkeypatch):
    """With LOCALDIFF_FUSED_BLOCK=interpret the s2d UNet routes its folded
    ResnetBlocks through the kernel and still matches the plain UNet."""
    import localdiffusion_tpu.models.unet_s2d as U
    from localdiffusion_tpu.config import ModelConfig
    from localdiffusion_tpu.models.unet import UNet

    monkeypatch.setenv("LOCALDIFF_FUSED_BLOCK", "interpret")
    monkeypatch.setattr(U, "_FUSED_BLOCK", None)

    mcfg = ModelConfig(
        dim=32, init_dim=32, dim_mults=(1, 2), full_attn=(False, True),
        channels=1, exact_layout_s2d=2,
    )
    model = UNet(mcfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 1), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 1), jnp.float32)
    t = jnp.asarray([5.0])
    params = model.init(jax.random.PRNGKey(0), x, cond, t)

    got = U.apply_unet_s2d(params, mcfg, x, cond, t, dtype=jnp.bfloat16)
    assert U._FUSED_BLOCK not in (None, False)

    ref = model.apply(params, x, cond, t)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.08, rtol=0.08,
    )
    monkeypatch.setattr(U, "_FUSED_BLOCK", None)
