"""Fused s2d linear-attention kernel: parity vs the XLA reference and
gradient flow through the custom_vjp.

The kernel (ops/pallas_linear_attention.py) replaces the three-pass
402 MB-qkv XLA lowering of `_attention_s2d` (one third of the 256px chain's
device time — docs/PERFORMANCE.md round-3 attribution).  These tests run
the Mosaic interpreter on CPU; the real-chip numbers live in
docs/PERFORMANCE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.ops.pallas_linear_attention import (
    linear_attention_s2d_fused,
    linear_attention_s2d_reference,
    supports,
)

HEADS, DIM_HEAD, F = 4, 32, 2
C = 32
HIDDEN = HEADS * DIM_HEAD


def _params(key, c=C):
    ks = jax.random.split(key, 5)
    return dict(
        g_in=jax.random.normal(ks[0], (c,), jnp.float32) * 0.2 + 1.0,
        w_qkv=jax.random.normal(ks[1], (c, 3 * HIDDEN), jnp.float32) * 0.1,
        w_out=jax.random.normal(ks[2], (HIDDEN, c), jnp.float32) * 0.1,
        b_out=jax.random.normal(ks[3], (c,), jnp.float32) * 0.05,
        g_out=jax.random.normal(ks[4], (c,), jnp.float32) * 0.2 + 1.0,
    )


@pytest.mark.parametrize("shape", [(2, 8, 8, 128), (1, 16, 8, 128)])
@pytest.mark.parametrize("add_residual", [True, False])
def test_fused_matches_reference(shape, add_residual):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 9), shape).astype(jnp.bfloat16)
    p = _params(key)
    assert supports(shape, HEADS, DIM_HEAD, F)

    ref = linear_attention_s2d_reference(
        x, p["g_in"], p["w_qkv"], p["w_out"], p["b_out"], p["g_out"],
        HEADS, DIM_HEAD, F, add_residual,
    )
    got = linear_attention_s2d_fused(
        x, p["g_in"], p["w_qkv"], p["w_out"], p["b_out"], p["g_out"],
        HEADS, DIM_HEAD, F, add_residual, True,  # interpret
    )
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.04, rtol=0.05,
    )
    # and well-correlated (bf16 rounding differs slightly in path order)
    r = np.corrcoef(
        np.asarray(got, np.float32).ravel(), np.asarray(ref, np.float32).ravel()
    )[0, 1]
    assert r > 0.999


def test_gradients_flow_through_custom_vjp():
    """Backward recomputes through the XLA reference — grads must match a
    pure-reference differentiation exactly."""
    key = jax.random.PRNGKey(1)
    shape = (1, 8, 8, 128)
    x = jax.random.normal(jax.random.fold_in(key, 3), shape).astype(jnp.bfloat16)
    p = _params(key)
    args = (x, p["g_in"], p["w_qkv"], p["w_out"], p["b_out"], p["g_out"])

    # fixed cotangent → the fused backward (recompute-through-reference)
    # must match differentiating the reference exactly
    ct = jax.random.normal(jax.random.fold_in(key, 7), shape).astype(jnp.bfloat16)

    _, vjp_fused = jax.vjp(
        lambda *a: linear_attention_s2d_fused(*a, HEADS, DIM_HEAD, F, True, True),
        *args,
    )
    _, vjp_ref = jax.vjp(
        lambda *a: linear_attention_s2d_reference(*a, HEADS, DIM_HEAD, F, True),
        *args,
    )
    for gf, gr in zip(vjp_fused(ct), vjp_ref(ct)):
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(gr, np.float32),
            atol=1e-5, rtol=1e-5,
        )


@pytest.mark.parametrize("c", [32, 64, 128])
def test_normal_layout_fold_matches_module(c):
    """linear_attention_fused on a NORMAL-layout [B,H,W,C] tensor (pixel
    folding to 128 lanes) == the flax LinearAttention module math."""
    from localdiffusion_tpu.models.blocks import LinearAttention
    from localdiffusion_tpu.ops.pallas_linear_attention import (
        linear_attention_fused,
        supports_normal_layout,
    )

    key = jax.random.PRNGKey(5)
    shape = (1, 8, 16, c)
    assert supports_normal_layout(shape, HEADS, DIM_HEAD)
    x = jax.random.normal(jax.random.fold_in(key, 1), shape).astype(jnp.bfloat16)
    mod = LinearAttention(HEADS, DIM_HEAD, jnp.bfloat16)
    params = mod.init(key, x)["params"]

    ref = mod.apply({"params": params}, x)  # CPU → XLA path inside
    got = linear_attention_fused(
        x, params["norm"]["g"], params["to_qkv"]["kernel"][0, 0],
        params["to_out"]["kernel"][0, 0], params["to_out"]["bias"],
        params["out_norm"]["g"], HEADS, DIM_HEAD, False, True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.04, rtol=0.05,
    )


def test_blocks_dispatch_engages_fused(monkeypatch):
    """LinearAttention routes through the kernel at >=4096 tokens under
    LOCALDIFF_FUSED_LINATT=interpret and matches its own XLA path."""
    import localdiffusion_tpu.models.blocks as B

    monkeypatch.setenv("LOCALDIFF_FUSED_LINATT", "interpret")
    monkeypatch.setattr(B, "_FUSED_LINATT", None)

    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (1, 64, 64, 32)).astype(jnp.bfloat16)
    mod = B.LinearAttention(HEADS, DIM_HEAD, jnp.bfloat16)
    params = mod.init(key, x)
    got = mod.apply(params, x)
    assert B._FUSED_LINATT not in (None, False)

    monkeypatch.setattr(B, "_FUSED_LINATT", False)  # force XLA path
    ref = mod.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.04, rtol=0.05,
    )
    monkeypatch.setattr(B, "_FUSED_LINATT", None)


def test_unet_s2d_dispatch_uses_fused(monkeypatch):
    """With LOCALDIFF_FUSED_LINATT=interpret the s2d UNet routes its
    stage-0 linear attention through the kernel and still matches the
    plain-layout UNet forward."""
    import localdiffusion_tpu.models.unet_s2d as U
    from localdiffusion_tpu.config import ModelConfig
    from localdiffusion_tpu.models.unet import UNet

    monkeypatch.setenv("LOCALDIFF_FUSED_LINATT", "interpret")
    monkeypatch.setattr(U, "_FUSED_LINATT", None)

    # dim=32 → stage-0 s2d channels 32·4 = 128: the kernel's shape domain
    mcfg = ModelConfig(
        dim=32, init_dim=32, dim_mults=(1, 2), full_attn=(False, True),
        channels=1, exact_layout_s2d=2,
    )
    model = UNet(mcfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 1), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 1), jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    params = model.init(jax.random.PRNGKey(0), x, cond, t)

    # confirm the dispatcher actually engaged (probe resolved to the kernel)
    got = U.apply_unet_s2d(params, mcfg, x, cond, t, dtype=jnp.bfloat16)
    assert U._FUSED_LINATT not in (None, False)

    ref = model.apply(params, x, cond, t)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.08, rtol=0.08,
    )
    monkeypatch.setattr(U, "_FUSED_LINATT", None)  # reset for other tests
