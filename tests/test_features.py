"""Pluggable PatchCore feature sources (ood/features.py): tap extraction,
raw-preprocess routing, and PatchCore integration at toy sizes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.config import (
    Config,
    DataConfig,
    DiffusionConfig,
    ModelConfig,
    OODConfig,
)
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
from localdiffusion_tpu.ood.features import (
    DenoiserFeatureSource,
    SegEncoderFeatureSource,
)
from localdiffusion_tpu.ood.patchcore import PatchCore

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def tiny_gd():
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True),
                       channels=1)
    dcfg = DiffusionConfig(image_size=32, timesteps=20)
    gd = GaussianDiffusion(mcfg, dcfg)
    params = gd.init_params(KEY)
    return gd, params


def test_denoiser_source_taps(tiny_gd):
    gd, params = tiny_gd
    src = DenoiserFeatureSource(gd, params, t=2,
                                layers=("down0_block2", "down1_block2"))
    x = jax.random.normal(KEY, (2, 32, 32, 1))
    feats = src.apply(x)
    assert set(feats) == {"down0_block2", "down1_block2"}
    assert feats["down0_block2"].shape == (2, 32, 32, 8)
    assert feats["down1_block2"].shape == (2, 16, 16, 8)
    assert feats["down0_block2"].dtype == jnp.float32
    assert src.strides["down0_block2"] == 1
    assert src.strides["down1_block2"] == 2


def test_denoiser_source_multi_t_ensemble(tiny_gd):
    """feature_t as a tuple exposes taps at every t as separate layers
    ('t{t}:{tap}'), concatenated into one embedding by PatchCore
    (VERDICT r4 next #1: multi-t feature ensembles)."""
    gd, params = tiny_gd
    src = DenoiserFeatureSource(gd, params, t=(2, 10),
                                layers=("down0_block2", "down1_block2"))
    assert src.layers == ("t2:down0_block2", "t2:down1_block2",
                          "t10:down0_block2", "t10:down1_block2")
    assert src.strides["t10:down1_block2"] == 2
    x = jax.random.normal(KEY, (2, 32, 32, 1))
    feats = src.apply(x)
    assert set(feats) == set(src.layers)
    assert feats["t2:down0_block2"].shape == (2, 32, 32, 8)
    # different t → different FiLM conditioning → different activations
    assert not np.allclose(np.asarray(feats["t2:down0_block2"]),
                           np.asarray(feats["t10:down0_block2"]))

    cfg = OODConfig(input_size=32, num_neighbors=3, coreset_ratio=0.25,
                    feature_source="denoiser", feature_t=(2, 10))
    pc = PatchCore(cfg, source=src)
    normal = np.random.default_rng(0).normal(
        size=(4, 32, 32, 1)
    ).astype(np.float32)
    pc.build_memory_bank([normal])
    out = pc(jnp.asarray(normal[:2]))
    assert out["anomaly_map"].shape == (2, 32, 32, 1)
    assert np.isfinite(np.asarray(out["anomaly_map"])).all()


def test_seg_encoder_source_taps():
    from localdiffusion_tpu.models.seg_unet import SegUNet

    model = SegUNet()
    x = np.zeros((1, 32, 32, 1), np.float32)
    params = model.init(KEY, x)
    src = SegEncoderFeatureSource(params, layers=("inc", "down1"))
    feats = src.apply(jnp.asarray(x))
    assert feats["inc"].shape == (1, 32, 32, 64)
    assert feats["down1"].shape == (1, 16, 16, 128)


def test_patchcore_with_denoiser_source_end_to_end(tiny_gd):
    gd, params = tiny_gd
    src = DenoiserFeatureSource(gd, params, t=2,
                                layers=("down0_block2", "down1_block2"))
    cfg = OODConfig(input_size=32, num_neighbors=3, coreset_ratio=0.25,
                    feature_source="denoiser")
    pc = PatchCore(cfg, source=src)
    normal = np.random.default_rng(0).normal(
        size=(4, 32, 32, 1)
    ).astype(np.float32)
    pc.build_memory_bank([normal])
    out = pc(jnp.asarray(normal[:2]))
    assert out["anomaly_map"].shape == (2, 32, 32, 1)
    assert out["pred_score"].shape == (2,)
    assert np.isfinite(np.asarray(out["anomaly_map"])).all()


def test_frontend_raw_preprocess_passthrough(tiny_gd):
    from localdiffusion_tpu.ood.frontend import OODFrontend

    gd, params = tiny_gd
    src = DenoiserFeatureSource(gd, params, t=2,
                                layers=("down0_block2",))
    ood = OODConfig(input_size=32, feature_source="denoiser",
                    detector="patchcore")
    cfg = Config(
        model=gd.model_cfg,
        diffusion=dataclasses.replace(gd.diff_cfg),
        data=DataConfig(name="synthetic_brain"),
        ood=ood,
    )
    pc = PatchCore(ood, source=src)
    fe = OODFrontend(cfg, patchcore=pc)
    lr = np.random.default_rng(1).normal(size=(2, 32, 32, 1)).astype(
        np.float32
    )
    got = np.asarray(fe._preprocess_patchcore(jnp.asarray(lr)))
    np.testing.assert_array_equal(got, lr)  # no imagenet path for raw


def test_load_seg_params_npz_roundtrip(tmp_path):
    """load_seg_params accepts slim npz snapshots (the shipped
    results/seg256_params.npz format) as well as Orbax dirs."""
    from localdiffusion_tpu.models.seg_unet import SegUNet
    from localdiffusion_tpu.ood.features import load_seg_params
    from localdiffusion_tpu.utils.params_io import save_params_npz

    model = SegUNet()
    params = model.init(KEY, np.zeros((1, 32, 32, 1), np.float32))
    p = str(tmp_path / "seg.npz")
    save_params_npz(p, params)
    path, loaded = load_seg_params(p, 32)
    assert path == p and loaded is not None
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 1)).astype(
        np.float32
    )
    a = model.apply(params, x)
    b = model.apply(loaded, x)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=0.05, rtol=0.05
    )
    path2, none = load_seg_params(str(tmp_path / "missing"), 32)
    assert none is None


def test_feature_source_config_validation():
    with pytest.raises(ValueError):
        OODConfig(feature_source="nope")
    # auto mask-dilate uses source-appropriate strides
    cfg = OODConfig(feature_source="denoiser", mask_dilate=-1,
                    input_size=256,
                    feature_layers=("down2_block2", "down3_block2"))
    assert cfg.resolved_mask_dilate(256) == 8  # stride 8 tap, scale 1
    # ADVICE r4: the fallback (no feature_layers) must match
    # make_feature_source's per-source defaults, raw sources must not be
    # rescaled by input_size, and an instantiated source's strides dict
    # (which knows the stem factor) must win over the config heuristic
    nolayers = OODConfig(feature_source="denoiser", mask_dilate=-1,
                         input_size=224)
    assert nolayers.resolved_mask_dilate(256) == 8  # down3_block2, no rescale
    stem = nolayers.resolved_mask_dilate(
        256, strides={"down2_block2": 8, "down3_block2": 16}
    )
    assert stem == 16  # stem_space_to_depth=2 doubles every tap stride
    segsrc = OODConfig(feature_source="seg_encoder", mask_dilate=-1,
                       input_size=224)
    assert segsrc.resolved_mask_dilate(256) == 8  # down3 stride, no rescale
