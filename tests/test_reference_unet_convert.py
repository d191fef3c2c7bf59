"""Reference (torch) UNet checkpoint → flax conversion parity.

Imports the ACTUAL reference denoiser (`/root/reference/ddpm.py` Unet +
unet_model.py ResUnet) as the oracle — unavailable heavy deps (torchvision,
ema_pytorch, idx2numpy, the reference `data` module) are stubbed in
sys.modules since only the nn.Module definitions are needed.  A random-init
reference model's state_dict is converted with
utils/reference_ckpt.convert_unet_state_dict and both forwards are compared
end-to-end, the same strategy tests/test_weight_convert.py uses for the WRN
backbone (there via a functional transcription; here the reference code
itself is importable).
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from localdiffusion_tpu.config import ModelConfig
from localdiffusion_tpu.models.unet import UNet
from localdiffusion_tpu.utils.reference_ckpt import (
    convert_trainer_checkpoint,
    convert_unet_state_dict,
)

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not present"
)


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _import_reference_ddpm():
    """Import /root/reference/ddpm.py with its unused heavy deps stubbed."""
    if "ddpm" in sys.modules:
        return sys.modules["ddpm"]
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tr = _stub(
            "torchvision.transforms", ToPILImage=object, Compose=object
        )
        tr.functional = _stub("torchvision.transforms.functional")
        tv.transforms = tr
        tv.utils = _stub("torchvision.utils")
    _stub("ema_pytorch", EMA=object)
    _stub("idx2numpy")
    _stub("timm")
    anl = _stub("anomalib")
    anl.models = _stub("anomalib.models")
    anl.models.components = _stub(
        "anomalib.models.components",
        DynamicBufferModule=object,
        FeatureExtractor=object,
        KCenterGreedy=object,
    )
    anl.models.patchcore = _stub("anomalib.models.patchcore")
    anl.models.patchcore.anomaly_map = _stub(
        "anomalib.models.patchcore.anomaly_map", AnomalyMapGenerator=object
    )
    anl.pre_processing = _stub("anomalib.pre_processing", Tiler=object)
    _stub("train_fusion", SimpleCNN_Fusion=object)
    _stub(
        "models",
        SimpleCNN=object,
        PatchcoreModel=object,
        Classifier_PatchCore=object,
    )
    _stub(
        "data",
        MedDataset_png=object,
        MNIST=object,
        ImageNetDatasetSR=object,
        MvtecDatasetSR=object,
        OCTID=object,
    )
    sys.path.insert(0, REF)
    try:
        import ddpm  # noqa: F401
    finally:
        sys.path.remove(REF)
    return sys.modules["ddpm"]


def _forward_pair(mode, dim_mults, full_attn, size, seed=0):
    """Build a random-init reference Unet, convert, forward both sides."""
    ddpm = _import_reference_ddpm()
    torch.manual_seed(seed)
    tmodel = ddpm.Unet(
        dim=32,
        dim_mults=dim_mults,
        channels=1,
        full_attn=full_attn,
        flash_attn=False,
        mode=mode,
    ).eval()

    rng = np.random.default_rng(seed + 1)
    x = rng.standard_normal((2, 1, size, size)).astype(np.float32)
    cond = rng.uniform(0.0, 2.0, (2, 1, size, size)).astype(np.float32)
    t = np.array([3, 47], np.int64)

    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t)
        ).numpy()

    cfg = ModelConfig(
        dim=32,
        dim_mults=dim_mults,
        full_attn=full_attn,
        channels=1,
        cond_encoder_depth="shallow" if mode in ("mnist", "mvtecSR") else "deep",
    )
    params = convert_unet_state_dict(tmodel.state_dict(), cfg)
    got = UNet(cfg).apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(cond.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    return want, got, tmodel, cfg


def test_convert_mnist_3stage_forward_parity():
    """3-stage MNIST variant (reference config_train.yaml mnist: dim 32,
    mults (1,2,4), shallow cond encoder exits after block 3)."""
    want, got, _, _ = _forward_pair("mnist", (1, 2, 4), (False, False, True), 16)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_convert_mri_4stage_forward_parity():
    """4-stage MRI variant (dim 32, mults (1,2,4,8), deep cond encoder with
    the 4th pooled block, unet_model.py:116-118)."""
    want, got, _, _ = _forward_pair(
        "mri", (1, 2, 4, 8), (False, False, False, True), 16
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_convert_trainer_checkpoint_dict():
    """Full Trainer.save format (reference ddpm.py:1495-1507): model state
    under the GaussianDiffusion 'model.' prefix next to schedule buffers,
    EMA under 'ema_model.model.'; both convert and the EMA side forwards."""
    want, got, tmodel, cfg = _forward_pair(
        "mnist", (1, 2, 4), (False, False, True), 16, seed=3
    )
    sd = tmodel.state_dict()
    gd_sd = {f"model.{k}": v for k, v in sd.items()}
    # GaussianDiffusion schedule buffers (recomputed on our side, skipped)
    gd_sd["betas"] = torch.linspace(1e-4, 2e-2, 10)
    gd_sd["alphas_cumprod"] = torch.cumprod(1 - gd_sd["betas"], 0)
    ema_sd = {f"ema_model.model.{k}": v for k, v in sd.items()}
    ema_sd["initted"] = torch.tensor(True)
    ema_sd["step"] = torch.tensor(123)
    data = {"step": 77, "model": gd_sd, "opt": {}, "ema": ema_sd, "scaler": None}

    out = convert_trainer_checkpoint(data, cfg)
    assert out["step"] == 77
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 16, 16, 1)).astype(np.float32)
    cond = rng.uniform(0.0, 2.0, (1, 16, 16, 1)).astype(np.float32)
    t = jnp.asarray([5])
    a = UNet(cfg).apply(out["params"], jnp.asarray(x), jnp.asarray(cond), t)
    b = UNet(cfg).apply(out["ema_params"], jnp.asarray(x), jnp.asarray(cond), t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_convert_cli_roundtrip(tmp_path):
    """scripts/convert_reference_ckpt.py: .pt → npz loadable back into the
    flax param template with forward parity preserved."""
    import subprocess

    ddpm = _import_reference_ddpm()
    torch.manual_seed(9)
    tmodel = ddpm.Unet(
        dim=32, dim_mults=(1, 2, 4), channels=1,
        full_attn=(False, False, True), flash_attn=False, mode="mnist",
    ).eval()
    sd = tmodel.state_dict()
    data = {
        "step": 5,
        "model": {f"model.{k}": v for k, v in sd.items()},
        "opt": {},
        "ema": {f"ema_model.model.{k}": v for k, v in sd.items()},
        "scaler": None,
    }
    pt = tmp_path / "model-5.pt"
    torch.save(data, pt)

    out = tmp_path / "converted"
    r = subprocess.run(
        [
            sys.executable,
            "scripts/convert_reference_ckpt.py",
            str(pt),
            "--out", str(out),
            "--dim", "32", "--dim-mults", "1,2,4",
            "--full-attn", "0,0,1", "--mode", "mnist",
        ],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "converted-params.npz").exists()
    assert (tmp_path / "converted-ema.npz").exists()

    from localdiffusion_tpu.utils.params_io import load_params_npz

    cfg = ModelConfig(
        dim=32, dim_mults=(1, 2, 4), full_attn=(False, False, True),
        channels=1, cond_encoder_depth="shallow",
    )
    template = convert_unet_state_dict(sd, cfg)
    loaded = load_params_npz(str(tmp_path / "converted-params.npz"), template)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 1)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 2, (1, 16, 16, 1)).astype(np.float32))
    a = UNet(cfg).apply(template, x, cond, jnp.asarray([2]))
    b = UNet(cfg).apply(loaded, x, cond, jnp.asarray([2]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
