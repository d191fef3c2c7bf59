"""Patch-parallel tiling, stitching and mesh-sharded sampling tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.config import DiffusionConfig, ModelConfig, SamplerConfig
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
from localdiffusion_tpu.parallel import (
    extract_patches,
    patch_parallel_sample,
    patch_parallel_sample_bucketed,
    plan_patches,
    stitch_patches,
)

KEY = jax.random.PRNGKey(0)


def test_plan_patches_full_coverage():
    g = plan_patches(28, 28, 14, overlap=0)
    assert g.num_patches == 4
    g2 = plan_patches(30, 30, 14, overlap=0)  # clamped last row/col
    ys = {y for y, x in g2.origins}
    assert 16 in ys  # 30 - 14
    g3 = plan_patches(28, 28, 16, overlap=4)
    assert g3.num_patches == 4


def test_extract_stitch_roundtrip_no_overlap():
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 3)).astype(np.float32)
    )
    g = plan_patches(16, 16, 8, overlap=0)
    p = extract_patches(img, g)
    assert p.shape == (2 * 4, 8, 8, 3)
    rec = stitch_patches(p, g, batch=2, overlap=0)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(img), rtol=1e-6)


def test_extract_stitch_roundtrip_with_overlap():
    img = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 16, 16, 1)).astype(np.float32)
    )
    g = plan_patches(16, 16, 8, overlap=4)
    p = extract_patches(img, g)
    rec = stitch_patches(p, g, batch=1, overlap=4)
    # consistent patches → exact reconstruction after feather-normalize
    np.testing.assert_allclose(np.asarray(rec), np.asarray(img), rtol=1e-5, atol=1e-6)


def test_patch_parallel_sample_on_mesh(mesh8):
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    dcfg = DiffusionConfig(image_size=16, timesteps=4)
    gd = GaussianDiffusion(mcfg, dcfg)
    params = gd.init_params(KEY)
    cond = jnp.asarray(
        np.random.default_rng(2).uniform(0, 2, (2, 16, 16, 1)).astype(np.float32)
    )
    mask = np.zeros((2, 16, 16, 1), np.float32)
    mask[:, :, :5, :] = 1.0
    scfg = SamplerConfig(start_timestep=1)
    out = patch_parallel_sample(
        gd, params, cond, jnp.asarray(mask), KEY, scfg, (0.0, 2.0),
        patch=8, overlap=0, mesh=mesh8,
    )
    assert out.shape == (2, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def _echo_gd(timesteps=6, image_size=16):
    """Oracle whose pred_x0 echoes the conditioning features: both plain and
    branched chains converge to the (mask-recombined) conditioning, making
    bucketed vs unbucketed outputs comparable without shared noise."""
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    dcfg = DiffusionConfig(image_size=image_size, timesteps=timesteps)
    gd = GaussianDiffusion(mcfg, dcfg)
    gd.encode_cond = lambda params, cond: cond
    gd.apply_model = lambda params, x, cond, t, cond_feat=None: cond_feat
    return gd


def test_bucketed_sampling_routes_and_matches():
    """Sparse-mask bucketing: OOD-free patches run the plain chain, OOD
    patches the branched one; the stitched result matches the unbucketed
    patch-parallel program on the echo oracle (both reconstruct cond)."""
    gd = _echo_gd()
    cond = np.random.default_rng(3).uniform(0.2, 1.8, (1, 16, 16, 1)).astype(np.float32)
    # OOD only in the top-left patch → 3 of 4 patches are OOD-free
    mask = np.zeros((1, 16, 16, 1), np.float32)
    mask[:, :4, :4, :] = 1.0
    scfg = SamplerConfig(start_timestep=1)

    cache = {}
    out_b = patch_parallel_sample_bucketed(
        gd, {}, cond, mask, KEY, scfg, (0.0, 2.0), patch=8, overlap=0,
        _cache=cache,
    )
    # one fused program whose static buckets are 3 plain + 1 branched patch
    (ck,) = cache.keys()
    plain_idx, ood_idx = ck[-2], ck[-1]
    assert len(plain_idx) == 3 and len(ood_idx) == 1
    assert ood_idx == (0,)  # the top-left patch carries the OOD region

    out_u = patch_parallel_sample(
        gd, {}, jnp.asarray(cond), jnp.asarray(mask), KEY, scfg, (0.0, 2.0),
        patch=8, overlap=0,
    )
    # echo oracle: both reconstruct cond (the OOD patch reconstructs the
    # mask-recombined cond, which equals cond)
    np.testing.assert_allclose(out_b, cond, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_u), cond, rtol=1e-4, atol=1e-5)


def test_bucketed_all_plain_and_all_branched():
    gd = _echo_gd()
    cond = np.random.default_rng(4).uniform(0.2, 1.8, (1, 16, 16, 1)).astype(np.float32)
    scfg = SamplerConfig(start_timestep=1)
    # no OOD anywhere → plain bucket covers all 4 patches
    cache = {}
    out = patch_parallel_sample_bucketed(
        gd, {}, cond, np.zeros((1, 16, 16, 1), np.float32), KEY, scfg,
        (0.0, 2.0), patch=8, _cache=cache,
    )
    (ck,) = cache.keys()
    assert len(ck[-2]) == 4 and len(ck[-1]) == 0
    np.testing.assert_allclose(out, cond, rtol=1e-4, atol=1e-5)
    # OOD in every patch → branched bucket covers all 4 patches
    cache = {}
    mask = np.zeros((1, 16, 16, 1), np.float32)
    mask[:, ::8, ::8, :] = 1.0  # one OOD pixel per patch corner
    out2 = patch_parallel_sample_bucketed(
        gd, {}, cond, mask, KEY, scfg, (0.0, 2.0), patch=8, _cache=cache,
    )
    (ck2,) = cache.keys()
    assert len(ck2[-2]) == 0 and len(ck2[-1]) == 4
    assert out2.shape == (1, 16, 16, 1)


def test_branch_axis_sharding(mesh8):
    """IND/OOD pair split over the mesh 'patch' axis via sharding constraint."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from localdiffusion_tpu.diffusion import sampler as S

    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    dcfg = DiffusionConfig(image_size=8, timesteps=4)
    gd = GaussianDiffusion(mcfg, dcfg)
    params = gd.init_params(KEY)
    cond = jnp.ones((4, 8, 8, 1))
    mask = np.zeros((4, 8, 8, 1), np.float32)
    mask[:, :, :3, :] = 1.0
    scfg = SamplerConfig(start_timestep=1)
    bs = NamedSharding(mesh8, P(("patch", "data")))
    with mesh8:
        fn = jax.jit(
            lambda p, c, m, k: S.ddpm_sample_branched(
                gd, p, c, m, k, scfg, (0.0, 2.0), branch_sharding=bs
            )
        )
        out = fn(params, cond, jnp.asarray(mask), KEY)
    assert out.shape == (4, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
