"""End-to-end slice: train a tiny model on synthetic digits, then run the
full local-diffusion pipeline (detect → branch → fuse) and check it learns.

The CPU-runnable equivalent of the reference's manual integration test
(test.py as a whole — SURVEY.md §4), hermetic via synthetic data.
"""

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
    SamplerConfig,
    TrainConfig,
)
from localdiffusion_tpu.data import MNISTDataset, synthetic_digits
from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
from localdiffusion_tpu.pipeline import LocalDiffusionPipeline
from localdiffusion_tpu.train.trainer import EmaConfig, Trainer
from localdiffusion_tpu.utils.metrics import ssim

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_train_then_pipeline_end_to_end(tmp_path):
    # tiny model, tiny synthetic dataset, short schedule
    mcfg = ModelConfig(dim=16, dim_mults=(1, 2), full_attn=(False, True), channels=1)
    dcfg = DiffusionConfig(image_size=16, timesteps=16, objective="pred_x0")
    gd = GaussianDiffusion(mcfg, dcfg)

    imgs, labels = synthetic_digits(96, size=16, seed=0, digit=8)
    ds = MNISTDataset(imgs, labels, lr_mode="full")
    hr, lr, _ = ds.as_arrays()

    tr = Trainer(
        gd,
        TrainConfig(lr=2e-3, results_dir=str(tmp_path), project_name="e2e"),
        ema_cfg=EmaConfig(update_after_step=0, update_every=1, beta=0.9),
    )
    state = tr.init_state(KEY)
    epoch_fn = tr.epoch_resident_fn(len(hr), 32)
    data_hr, data_lr = jnp.asarray(hr), jnp.asarray(lr)
    rng = KEY
    first = None
    for step in range(30):
        rng, sub = jax.random.split(rng)
        state, loss = epoch_fn(state, data_hr, data_lr, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, f"loss did not drop: {first} → {float(loss)}"

    # checkpoint round trip through the pipeline path
    tr.save(state, "best")
    state = tr.load("best")

    cfg = Config(
        model=mcfg,
        diffusion=dcfg,
        sampler=SamplerConfig(start_timestep=2, cond_in_floor=0.5),
        ood=OODConfig(detector="manual", manual_mask_cols=4, input_size=16),
        data=DataConfig(name="mnist"),
        train=TrainConfig(results_dir=str(tmp_path), project_name="e2e"),
    )
    from localdiffusion_tpu.ood.frontend import OODFrontend

    pipe = LocalDiffusionPipeline(
        cfg, gd, state.ema_params, frontend=OODFrontend(cfg)
    )
    r = pipe.translate(lr[:2], hr=hr[:2], key=jax.random.PRNGKey(1))
    assert r["pred"].shape == (2, 16, 16, 1)
    assert bool(r["branched"])
    assert np.isfinite(r["mse"])
    # a 30-epoch toy model won't be great; just require clear signal
    assert float(r["ssim"]) > 0.2, f"ssim {float(r['ssim'])}"

    # uniform mask (no detector) must route through the plain chain
    ones = np.ones((2, 16, 16, 1), np.float32)
    r2 = pipe.translate(lr[:2], hr=hr[:2], key=jax.random.PRNGKey(1), mask=ones)
    assert not bool(r2["branched"])
