"""Reference (torch) checkpoint → flax param-tree conversion for the UNet.

The reference trainer saves ``{'step', 'model', 'opt', 'ema', 'scaler'}``
(reference ddpm.py:1495-1507), where ``model`` is the GaussianDiffusion
state dict (schedule buffers + ``model.*`` UNet weights, ddpm.py:286-451)
and ``ema`` is the ema_pytorch state dict (``ema_model.model.*`` holds the
EMA UNet).  This module maps those torch tensors onto the flax param tree
of models/unet.py so reference-trained weights run under this framework —
the missing piece flagged in VERDICT r2 item 2 (without it the
SSIM-vs-reference gate is unmeasurable even when weights surface).

Layout rules (verified by tests/test_reference_unet_convert.py, which runs
a functional torch transcription of the reference forward against the
converted flax forward):

  * Conv2d  [O, I, kh, kw] → kernel [kh, kw, I, O]
  * Linear  [O, I]         → kernel [I, O]
  * GroupNorm weight/bias  → scale/bias (our fused GN uses torch eps 1e-5)
  * RMSNorm g [1, C, 1, 1] → g [C]
  * Downsample space-to-depth channel order matches einops '(c p1 p2)'
    (models/blocks.py:198-214), so its 1×1 conv ports directly.
  * ``conv_fusion.mlp`` is ZEROED, not copied: the reference constructs the
    FiLM mlp but calls ``conv_fusion(x)`` with no time embedding
    (ddpm.py:434-436), so its torch weights are untrained noise; our UNet
    passes t there (models/unet.py:141), and a zero mlp makes the FiLM
    x·(scale+1)+shift an exact identity — bit-matching the reference call.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from localdiffusion_tpu.config import ModelConfig


def _np(v) -> np.ndarray:
    """torch.Tensor | np.ndarray → float32 numpy (host)."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _conv(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _dense(sd, key) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{key}.weight"]).T,
        "bias": _np(sd[f"{key}.bias"]),
    }


def _gn(sd, key) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _rms(sd, key) -> Dict[str, np.ndarray]:
    return {"g": _np(sd[f"{key}.g"]).reshape(-1)}


def _resnet_block(sd, prefix, zero_mlp: bool = False) -> Dict[str, Any]:
    """Reference ResnetBlock (ddpm.py:188-212) → flax ResnetBlock params."""
    out: Dict[str, Any] = {
        "block1": {"proj": _conv(sd, f"{prefix}.block1.proj"),
                   "norm": _gn(sd, f"{prefix}.block1.norm")},
        "block2": {"proj": _conv(sd, f"{prefix}.block2.proj"),
                   "norm": _gn(sd, f"{prefix}.block2.norm")},
    }
    if f"{prefix}.mlp.1.weight" in sd:
        mlp = _dense(sd, f"{prefix}.mlp.1")
        if zero_mlp:
            mlp = {"kernel": np.zeros_like(mlp["kernel"]),
                   "bias": np.zeros_like(mlp["bias"])}
        out["mlp"] = mlp
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = _conv(sd, f"{prefix}.res_conv")
    return out


def _attention(sd, prefix, full: bool) -> Dict[str, Any]:
    """Attention (ddpm.py:253-282) / LinearAttention (ddpm.py:214-251)."""
    out: Dict[str, Any] = {
        "norm": _rms(sd, f"{prefix}.norm"),
        "to_qkv": {"kernel": _np(sd[f"{prefix}.to_qkv.weight"]).transpose(2, 3, 1, 0)},
    }
    if full:
        out["to_out"] = _conv(sd, f"{prefix}.to_out")
    else:
        out["to_out"] = _conv(sd, f"{prefix}.to_out.0")
        out["out_norm"] = _rms(sd, f"{prefix}.to_out.1")
    return out


def _basic_block(sd, prefix) -> Dict[str, Any]:
    """ResUnet BasicBlock (unet_model.py:8-51) → flax cond BasicBlock."""
    out: Dict[str, Any] = {
        "conv1": _conv(sd, f"{prefix}.convblock.0"),
        "gn1": _gn(sd, f"{prefix}.convblock.1"),
        "conv2": _conv(sd, f"{prefix}.convblock.3"),
        "gn2": _gn(sd, f"{prefix}.convblock.4"),
    }
    if f"{prefix}.identity.0.weight" in sd:
        out["id_conv"] = _conv(sd, f"{prefix}.identity.0")
        out["id_gn"] = _gn(sd, f"{prefix}.identity.1")
    return out


def convert_unet_state_dict(sd: Dict[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    """Reference ``Unet.state_dict()`` (keys like ``init_conv.weight``,
    ``downs.0.0.block1.proj.weight``, ``cond_model.residual_conv1.0...``) →
    ``{"params": ...}`` for models/unet.py UNet with the same ModelConfig."""
    num_stages = len(cfg.dim_mults)
    p: Dict[str, Any] = {}

    p["init_conv"] = _conv(sd, "init_conv")

    tm: Dict[str, Any] = {}
    if "time_mlp.0.weights" in sd:
        # learned/random Fourier variant (ddpm.py:151-166)
        tm["pos_emb"] = {"weights": _np(sd["time_mlp.0.weights"])}
    tm["fc1"] = _dense(sd, "time_mlp.1")
    tm["fc2"] = _dense(sd, "time_mlp.3")
    p["time_mlp"] = tm

    for i in range(num_stages):
        is_last = i >= num_stages - 1
        p[f"down{i}_block1"] = _resnet_block(sd, f"downs.{i}.0")
        p[f"down{i}_block2"] = _resnet_block(sd, f"downs.{i}.1")
        p[f"down{i}_attn"] = _attention(sd, f"downs.{i}.2", cfg.full_attn[i])
        if is_last:
            # plain 3×3 conv at the deepest stage (ddpm.py:372)
            p[f"down{i}_down"] = _conv(sd, f"downs.{i}.3")
        else:
            # Downsample = Sequential(Rearrange, Conv2d) → keys '...3.1'
            p[f"down{i}_down"] = {"conv": _conv(sd, f"downs.{i}.3.1")}

    p["mid_block1"] = _resnet_block(sd, "mid_block1")
    p["mid_attn"] = _attention(sd, "mid_attn", True)
    p["mid_block2"] = _resnet_block(sd, "mid_block2")
    p["conv_fusion"] = _resnet_block(sd, "conv_fusion", zero_mlp=True)

    for j in range(num_stages):
        stage = num_stages - 1 - j
        is_last = j == num_stages - 1
        p[f"up{j}_block1"] = _resnet_block(sd, f"ups.{j}.0")
        p[f"up{j}_block2"] = _resnet_block(sd, f"ups.{j}.1")
        p[f"up{j}_attn"] = _attention(sd, f"ups.{j}.2", cfg.full_attn[stage])
        if is_last:
            p[f"up{j}_up"] = _conv(sd, f"ups.{j}.3")
        else:
            # Upsample = Sequential(nn.Upsample, Conv2d) → keys '...3.1'
            p[f"up{j}_up"] = {"conv": _conv(sd, f"ups.{j}.3.1")}

    p["final_res_block"] = _resnet_block(sd, "final_res_block")
    p["final_conv"] = _conv(sd, "final_conv")

    # condition encoder (unet_model.py:91-137): residual_conv{1..3}.0 and
    # mid_conv.0 → cond_model.block{1..4}
    cm: Dict[str, Any] = {}
    for b, tp in enumerate(
        ["residual_conv1", "residual_conv2", "residual_conv3", "mid_conv"]
    ):
        if f"cond_model.{tp}.0.convblock.0.weight" not in sd:
            continue
        cm[f"block{b + 1}"] = _basic_block(sd, f"cond_model.{tp}.0")
    p["cond_model"] = cm

    return {"params": p}


def _strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_trainer_checkpoint(
    data: Dict[str, Any], cfg: ModelConfig
) -> Dict[str, Any]:
    """Full reference ``Trainer.save`` dict → converted trees.

    Returns {'step', 'params', 'ema_params'} (ema_params None when the
    checkpoint carries no EMA).  ``data['model']`` is the GaussianDiffusion
    state dict: the UNet lives under the ``model.`` prefix (its schedule
    buffers — betas, alphas_cumprod, ... — are recomputed by our Schedule
    from config and skipped).  ``data['ema']`` is ema_pytorch's dict with
    the averaged weights under ``ema_model.model.``."""
    unet_sd = _strip_prefix(data["model"], "model.")
    params = convert_unet_state_dict(unet_sd, cfg)
    ema_params: Optional[Dict[str, Any]] = None
    if data.get("ema"):
        ema_sd = _strip_prefix(data["ema"], "ema_model.model.")
        if ema_sd:
            ema_params = convert_unet_state_dict(ema_sd, cfg)
    return {
        "step": int(data.get("step", 0)),
        "params": params,
        "ema_params": ema_params,
    }


def load_reference_checkpoint(path: str, cfg: ModelConfig) -> Dict[str, Any]:
    """torch.load a reference ``model-<milestone>.pt`` and convert it."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    return convert_trainer_checkpoint(data, cfg)
