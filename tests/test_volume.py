"""Whole-volume translation: pipe.translate_volume over a per-volume
dataset (the reference's SingleMedDataset use-case, data.py:549-604)."""

import jax
import numpy as np
import pytest

from localdiffusion_tpu.config import (
    Config,
    DataConfig,
    DiffusionConfig,
    ModelConfig,
    OODConfig,
    SamplerConfig,
    TrainConfig,
)
from localdiffusion_tpu.data import BRATSVolumeDataset
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
from localdiffusion_tpu.pipeline import LocalDiffusionPipeline

S = 8
D = 5  # slices — deliberately not divisible by the batch size


@pytest.fixture(scope="module")
def pipe():
    mcfg = ModelConfig(dim=8, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    dcfg = DiffusionConfig(image_size=S, timesteps=10, objective="pred_x0")
    gd = GaussianDiffusion(mcfg, dcfg)
    params = gd.init_params(jax.random.PRNGKey(0), batch_size=1)
    cfg = Config(
        model=mcfg,
        diffusion=dcfg,
        sampler=SamplerConfig(start_timestep=2),
        ood=OODConfig(detector="manual", input_size=S),
        data=DataConfig(name="brats", mean_t1=0.0, std_t1=1.0,
                        mean_flair=0.0, std_flair=1.0, translate_zero=False),
        train=TrainConfig(),
    )
    return LocalDiffusionPipeline(cfg, gd, params)


def _volume(seed, tumor=False):
    rng = np.random.default_rng(seed)
    t1 = rng.uniform(0, 2, (D, S, S)).astype(np.float32)
    flair = rng.uniform(0, 2, (D, S, S)).astype(np.float32)
    seg = np.zeros((D, S, S), np.float32)
    if tumor:
        seg[:, 2:5, 2:5] = 1.0
    return t1, flair, seg


def test_translate_volume_shapes_and_padding(pipe):
    t1, flair, seg = _volume(0, tumor=True)
    ds = BRATSVolumeDataset.single_volume(pipe.config.data, t1, flair, seg=seg,
                                          crop=S, mode="flair")
    assert len(ds) == D
    out = pipe.translate_volume(ds, batch_size=4, verbose=False,
                                key=jax.random.PRNGKey(1))
    # 5 slices → batches of 4+1(padded to 4); pad rows dropped
    assert out["pred_volume"].shape == (D, S, S, 1)
    assert out["mask_volume"].shape == (D, S, S, 1)
    assert np.isfinite(float(out["mse"]))
    assert "mean_mse_ood_region" in out  # seg given → region metric


def test_translate_volume_deterministic(pipe):
    t1, flair, seg = _volume(2)
    ds = BRATSVolumeDataset.single_volume(pipe.config.data, t1, flair, seg=seg,
                                          crop=S, mode="flair")
    k = jax.random.PRNGKey(3)
    out4 = pipe.translate_volume(ds, batch_size=4, verbose=False, key=k)
    out4b = pipe.translate_volume(ds, batch_size=4, verbose=False, key=k)
    np.testing.assert_allclose(out4["pred_volume"], out4b["pred_volume"])


def test_translate_volume_pad_rows_align(pipe):
    """The de-padded tail must equal a direct translate of the padded
    batch: pred_volume[4] is row 0 of translate(lr[[4,4,4,4]]) under the
    second key split — a misaligned `keep` slice would break this."""
    t1, flair, seg = _volume(2)
    ds = BRATSVolumeDataset.single_volume(pipe.config.data, t1, flair, seg=seg,
                                          crop=S, mode="flair")
    k = jax.random.PRNGKey(3)
    out4 = pipe.translate_volume(ds, batch_size=4, verbose=False, key=k)

    items = [ds[i] for i in range(len(ds))]
    hr = np.stack([it[0] for it in items])
    lr = np.stack([it[1] for it in items])
    k1, sub0 = jax.random.split(k)
    _, sub1 = jax.random.split(k1)
    idx = np.array([4, 4, 4, 4])
    r = pipe.translate(lr[idx], hr=hr[idx], key=sub1)
    np.testing.assert_allclose(out4["pred_volume"][4],
                               np.asarray(r["pred"])[0])


def test_translate_volume_no_seg(pipe):
    t1, flair, _ = _volume(4)
    ds = BRATSVolumeDataset.single_volume(pipe.config.data, t1, flair, seg=None,
                                          crop=S, mode="flair")
    out = pipe.translate_volume(ds, batch_size=8, verbose=False)
    assert out["pred_volume"].shape == (D, S, S, 1)
    assert "mean_mse_ood_region" not in out
