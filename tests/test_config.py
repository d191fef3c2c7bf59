"""Config system tests incl. the reference flat-YAML compatibility layer."""

import dataclasses

import pytest
import yaml

from localdiffusion_tpu.config import (
    Config,
    SamplerConfig,
    min_max_val_for,
    reference_dict_to_config,
)


REFERENCE_STYLE_YAML = """
ProjectName: '/mnist_x50_zero2two/'
data: 'mnist'
mnist_cls: '8to3'
start_intermediate: True
start_timestep: 2
branch_out: True
ood: True
ood_AD: True
mask_cond: False
mask_x: True
classifier: False
classifier_obj: 'tile'
ood_detector:
    seg: False
    seg_model: '/tmp/t1seg.pth'
translate_zero: True
pred_objective: 'pred_x0'
img_size: 28
timestep: 50
ddim_timestep: 50
dim: 32
scheduler: 'sigmoid'
use_gt: False
use_gt_timestep: 100
anomaly_name: 3
"""


def test_reference_yaml_roundtrip():
    raw = yaml.safe_load(REFERENCE_STYLE_YAML)
    cfg = reference_dict_to_config(raw)
    assert cfg.data.name == "mnist"
    assert cfg.model.dim == 32
    assert cfg.model.dim_mults == (1, 2, 4)  # mnist preset (reference test.py:121)
    assert cfg.model.full_attn == (False, False, True)
    assert cfg.diffusion.timesteps == 50
    # ddim_timestep == timestep → ancestral sampling (reference ddpm.py:562)
    assert cfg.diffusion.sampling_timesteps is None
    assert not cfg.diffusion.is_ddim_sampling
    assert cfg.sampler.branch_out and cfg.sampler.start_intermediate
    assert cfg.sampler.start_timestep == 2
    assert cfg.sampler.cond_in_floor == 0.5  # mnist (reference ddpm.py:683-684)
    assert cfg.sampler.mask_x_policy == "cond"  # mnist path (ddpm.py:704-708)
    assert cfg.ood.input_size == 84  # mnist patchcore size (test.py:164-167)


def test_reference_yaml_ddim():
    raw = yaml.safe_load(REFERENCE_STYLE_YAML)
    raw["timestep"] = 250
    raw["ddim_timestep"] = 50
    cfg = reference_dict_to_config(raw)
    assert cfg.diffusion.is_ddim_sampling
    assert cfg.diffusion.resolved_sampling_timesteps == 50


def test_mri_presets():
    raw = yaml.safe_load(REFERENCE_STYLE_YAML)
    raw["data"] = "mri"
    raw["img_size"] = 224
    cfg = reference_dict_to_config(raw)
    assert cfg.model.dim_mults == (1, 2, 4, 8)
    assert cfg.sampler.cond_in_floor == 0.95  # non-mnist (ddpm.py:686)
    assert cfg.sampler.mask_x_policy == "minval"
    assert cfg.ood.input_size == 224
    assert cfg.ood.detector == "patchcore"


def test_config_is_frozen_and_hashable():
    cfg = Config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.model.dim = 64  # type: ignore
    hash(cfg.sampler)  # must be usable as a static jit arg


def test_sampler_validation():
    with pytest.raises(ValueError):
        SamplerConfig(mask_x_policy="nope")
    with pytest.raises(ValueError):
        SamplerConfig(fusion_route="nope")


def test_min_max_val():
    cfg = Config()
    assert min_max_val_for(cfg) == (0.0, 2.0)  # mnist (reference test.py:30-33)
    mri = yaml.safe_load(REFERENCE_STYLE_YAML)
    mri["data"] = "mri"
    cfg2 = reference_dict_to_config(mri)
    lo, hi = min_max_val_for(cfg2)
    assert lo == 0.0 and hi > 8.0  # translate_zero shifted range (test.py:23-28)


def test_yaml_save_load_roundtrip(tmp_path):
    cfg = Config()
    p = tmp_path / "cfg.yaml"
    cfg.save_yaml(str(p))
    cfg2 = Config.load_yaml(str(p))
    assert cfg2 == cfg


def test_load_actual_reference_config():
    """The mounted reference config.yaml must load through the compat layer."""
    import os

    from localdiffusion_tpu.config import load_reference_yaml

    p = "/root/reference/config.yaml"
    if not os.path.exists(p):
        pytest.skip("reference not mounted")
    cfg = load_reference_yaml(p)
    assert cfg.data.name == "mnist"
    assert cfg.diffusion.timesteps == 50
    assert cfg.sampler.start_timestep == 2
    assert cfg.sampler.branch_out and cfg.sampler.mask_x
    assert cfg.model.dim == 32


def test_load_actual_reference_train_config():
    import os

    from localdiffusion_tpu.config import load_reference_yaml

    p = "/root/reference/config_train.yaml"
    if not os.path.exists(p):
        pytest.skip("reference not mounted")
    cfg = load_reference_yaml(p)
    assert cfg.diffusion.timesteps == 250
    assert cfg.diffusion.objective == "pred_x0"
