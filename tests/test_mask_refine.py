"""Per-image adaptive mask refinement (ood/thresholds.py refine_mask_*):
hysteresis growth from ladder/fwhm seeds, component filtering, bypass
pass-through, and the frontend wiring (VERDICT r4 next #1 — raw mask
quality without the isotropic-dilation crutch)."""

import numpy as np
import pytest

from localdiffusion_tpu.ood.thresholds import (
    ThresholdLadder,
    LadderRung,
    refine_mask_single,
    refine_masks,
    soft_mask_from_map,
)


def _blob_map(size=64, cx=40, cy=24, r=10, peak=30.0, bg=1.0, seed=0):
    """Anomaly map: smooth radial blob over a noisy background, plus the
    ground-truth support (the disk where the blob is above half-peak)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    blob = peak * np.exp(-d2 / (2.0 * (r / 1.177) ** 2))  # half-max at r
    a = bg + 0.2 * rng.standard_normal((size, size)) + blob
    gt = (d2 <= r * r).astype(np.float32)[..., None]
    return a.astype(np.float32)[..., None], gt


def _iou(b, gt):
    inter = float((b * gt).sum())
    union = float(((b + gt) > 0).sum())
    return inter / max(union, 1.0)


def test_fwhm_refinement_recovers_blob_support():
    """A tight ladder mask (only the very peak) grows to ~the blob's
    half-max support — the under-segmentation the dilate-16 crutch papered
    over, fixed from the image's own score distribution."""
    a, gt = _blob_map()
    # tight seed: ladder threshold just below the max → a few pixels
    ladder = ThresholdLadder(gate=5.0, rungs=(LadderRung(-np.inf, "max-1std"),))
    soft, binary = soft_mask_from_map(a[None], ladder)
    tight = _iou(binary[0], gt)
    soft2, refined = refine_mask_single(
        a, soft[0], binary[0], seed="fwhm", hi_frac=0.5, lo_frac=0.4
    )
    grown = _iou(refined, gt)
    assert tight < 0.35  # the raw ladder mask really is tight
    assert grown > 0.75  # FWHM segmentation recovers the support
    # soft mask is floored at 1 inside the refined region
    assert float(soft2[refined > 0].min()) == 1.0


def test_hysteresis_does_not_leak_to_disconnected_noise():
    """A second above-lo region NOT connected to any seed must not join
    the mask (hysteresis growth ≠ global re-threshold)."""
    a, gt = _blob_map()
    a[4:8, 4:8, 0] = 8.0  # disconnected bump: above lo, below hi
    ladder = ThresholdLadder(gate=5.0, rungs=(LadderRung(-np.inf, "max-1std"),))
    soft, binary = soft_mask_from_map(a[None], ladder)
    _, refined = refine_mask_single(
        a, soft[0], binary[0], seed="fwhm", hi_frac=0.5, lo_frac=0.2
    )
    assert refined[4:8, 4:8, 0].sum() == 0.0
    # lo=0.2 grows to the 20%-of-max contour (~1.5× the half-max radius,
    # ~2.3× the gt area) → IoU ~0.45 is the CORRECT value here; the point
    # of this test is the no-leak assertion above
    assert _iou(refined, gt) > 0.4


def test_min_area_drops_speck_components():
    a, gt = _blob_map()
    a[4:6, 4:6, 0] = 40.0  # tiny speck ABOVE the seed level (4 px)
    ladder = ThresholdLadder(gate=5.0, rungs=(LadderRung(-np.inf, "max-1std"),))
    soft, binary = soft_mask_from_map(a[None], ladder)
    _, keep_all = refine_mask_single(
        a, soft[0], binary[0], seed="fwhm", hi_frac=0.5, lo_frac=0.4,
        min_area=0,
    )
    assert keep_all[4:6, 4:6, 0].sum() > 0  # speck seeds itself...
    _, filtered = refine_mask_single(
        a, soft[0], binary[0], seed="fwhm", hi_frac=0.5, lo_frac=0.4,
        min_area=50,
    )
    assert filtered[4:6, 4:6, 0].sum() == 0.0  # ...and min_area drops it
    assert _iou(filtered, gt) > 0.75


def test_bypass_sentinel_passes_through():
    ones = np.ones((16, 16, 1), np.float32)
    a = np.zeros((16, 16, 1), np.float32)
    soft, binary = refine_mask_single(a, ones, ones)
    np.testing.assert_array_equal(binary, ones)
    np.testing.assert_array_equal(soft, ones)


def test_ladder_seed_mode_grows_from_ladder_pixels():
    a, gt = _blob_map()
    ladder = ThresholdLadder(gate=5.0, rungs=(LadderRung(-np.inf, "max-1std"),))
    soft, binary = soft_mask_from_map(a[None], ladder)
    _, refined = refine_mask_single(
        a, soft[0], binary[0], seed="ladder", hi_frac=0.5, lo_frac=0.4
    )
    # growth is a superset of the ladder seeds
    assert (refined >= binary[0]).all()
    assert _iou(refined, gt) > 0.7


def test_refine_masks_batch_and_config_validation():
    a, gt = _blob_map()
    ladder = ThresholdLadder(gate=5.0, rungs=(LadderRung(-np.inf, "max-1std"),))
    amap = np.stack([a, a])
    soft, binary = soft_mask_from_map(amap, ladder)
    m, b = refine_masks(amap, soft, binary, hi_frac=0.5, lo_frac=0.4)
    assert m.shape == b.shape == amap.shape
    np.testing.assert_array_equal(b[0], b[1])

    from localdiffusion_tpu.config import OODConfig

    with pytest.raises(ValueError):
        OODConfig(mask_refine="nope")
    with pytest.raises(ValueError):
        OODConfig(refine_seed="nope")
    with pytest.raises(ValueError):
        OODConfig(refine_lo_frac=0.8, refine_hi_frac=0.5)


def test_frontend_applies_refinement(tmp_path):
    """detector='patchcore' + mask_refine='hysteresis' routes through
    refine_masks (and any residual mask_dilate after it)."""
    import dataclasses

    import jax

    from localdiffusion_tpu.config import (
        Config,
        DataConfig,
        DiffusionConfig,
        ModelConfig,
        OODConfig,
    )
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from localdiffusion_tpu.ood.features import DenoiserFeatureSource
    from localdiffusion_tpu.ood.frontend import OODFrontend
    from localdiffusion_tpu.ood.patchcore import PatchCore

    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True),
                       channels=1)
    dcfg = DiffusionConfig(image_size=32, timesteps=20)
    gd = GaussianDiffusion(mcfg, dcfg)
    params = gd.init_params(jax.random.PRNGKey(0))
    src = DenoiserFeatureSource(gd, params, t=2, layers=("down0_block2",))
    ood = OODConfig(
        input_size=32, feature_source="denoiser", detector="patchcore",
        mask_refine="hysteresis", refine_hi_frac=0.5, refine_lo_frac=0.25,
        mask_dilate=0, coreset_ratio=0.25, num_neighbors=3,
    )
    cfg = Config(
        model=mcfg, diffusion=dataclasses.replace(dcfg),
        data=DataConfig(name="synthetic_brain"), ood=ood,
    )
    pc = PatchCore(ood, source=src)
    rng = np.random.default_rng(0)
    normal = rng.normal(size=(4, 32, 32, 1)).astype(np.float32)
    pc.build_memory_bank([normal])
    fe = OODFrontend(cfg, patchcore=pc)
    anom = normal[:2].copy()
    anom[:, 8:20, 8:20, :] += 25.0  # gross off-manifold square
    mask, binary, amap = fe.detect(anom)
    assert mask.shape == binary.shape == (2, 32, 32, 1)
    assert set(np.unique(binary)) <= {0.0, 1.0}
    # soft mask floored at 1 wherever the binary fired (refinement wiring)
    fired = binary > 0
    if fired.any():
        assert float(mask[fired].min()) == 1.0
