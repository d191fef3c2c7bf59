"""Integration: the branched DDPM sampling chain with BOTH fused Pallas
kernels active (Mosaic interpreter) vs the pure-XLA chain.

The kernels replace ops inside a lax.scan body; this test proves they
compose with the sampler (tracing, custom_vjp boundaries, per-step reuse)
and keep the chain's outputs at bf16-rounding distance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from localdiffusion_tpu.config import (
    DiffusionConfig,
    ModelConfig,
    SamplerConfig,
)
from localdiffusion_tpu.diffusion import sampler as S
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion


def _chain(monkeypatch, linatt_mode, block_mode):
    import localdiffusion_tpu.models.blocks as B
    import localdiffusion_tpu.models.unet_s2d as U

    monkeypatch.setenv("LOCALDIFF_FUSED_LINATT", linatt_mode)
    monkeypatch.setenv("LOCALDIFF_FUSED_BLOCK", block_mode)
    monkeypatch.setattr(U, "_FUSED_LINATT", None)
    monkeypatch.setattr(U, "_FUSED_BLOCK", None)
    monkeypatch.setattr(B, "_FUSED_LINATT", None)

    mcfg = ModelConfig(
        dim=32, init_dim=32, dim_mults=(1, 2), full_attn=(False, True),
        channels=1, exact_layout_s2d=2,
    )
    gd = GaussianDiffusion(
        mcfg,
        DiffusionConfig(image_size=32, timesteps=6, objective="pred_x0"),
        dtype=jnp.bfloat16,
    )
    params = gd.init_params(jax.random.PRNGKey(0))
    cond = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1), maxval=2.0)
    mask = np.ones((2, 32, 32, 1), np.float32)
    mask[:, :, :16] = 0.5
    out = S.ddpm_sample_branched(
        gd, params, cond, jnp.asarray(mask), jax.random.PRNGKey(7),
        SamplerConfig(start_timestep=2), (0.0, 2.0),
    )
    # reset probes so other tests see a fresh environment
    monkeypatch.setattr(U, "_FUSED_LINATT", None)
    monkeypatch.setattr(U, "_FUSED_BLOCK", None)
    monkeypatch.setattr(B, "_FUSED_LINATT", None)
    return np.asarray(out, np.float32)


def test_branched_chain_with_fused_kernels(monkeypatch):
    ref = _chain(monkeypatch, "0", "0")
    got = _chain(monkeypatch, "interpret", "interpret")
    assert np.isfinite(got).all()
    # same chain, same keys; kernels differ only in bf16 rounding order —
    # after 6 steps demand close agreement
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.1)
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.99
