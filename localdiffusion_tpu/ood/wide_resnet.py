"""WideResNet-50-2 feature extractor for PatchCore (flax, NHWC).

Equivalent of the reference's anomalib FeatureExtractor over torchvision
wide_resnet50_2 (reference models.py:62-63), exposing layer2 (512ch, H/8)
and layer3 (1024ch, H/16) activations.

BatchNorm is frozen (inference-only affine with stored running stats) —
PatchCore never trains the backbone, so every apply stays a pure function.
Pretrained ImageNet weights are loaded via `convert_torch_state_dict` when a
torch checkpoint is supplied (this environment has no torchvision/timm and
no network egress, so the default init is deterministic-random; anomaly maps
then exercise the full pipeline but are not ImageNet-calibrated — see
OODConfig.backbone_weights_path).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: affine transform with running statistics."""

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = jnp.asarray(scale, self.dtype) * jax_rsqrt(var + self.eps, self.dtype)
        return x * inv + (jnp.asarray(bias, self.dtype) - mean * inv)


def jax_rsqrt(x, dtype):
    import jax

    return jax.lax.rsqrt(jnp.asarray(x, dtype))


class Bottleneck(nn.Module):
    """torchvision Bottleneck with base_width=128 (the 'wide' variant)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    base_width: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0))
        out_ch = self.planes * 4

        h = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            width,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(h)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn3")(h)

        if self.downsample:
            idn = nn.Conv(
                out_ch,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="ds_conv",
            )(x)
            idn = FrozenBatchNorm(dtype=self.dtype, name="ds_bn")(idn)
        else:
            idn = x
        return nn.relu(h + idn)


class WideResNet50Features(nn.Module):
    """Stem + layer1..layerN, returning the requested layer activations.

    layers: subset of ('layer1', 'layer2', 'layer3', 'layer4').  Only the
    stages needed to produce the deepest requested layer are executed.
    """

    layers: Tuple[str, ...] = ("layer2", "layer3")
    base_width: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        blocks_per_stage = [3, 4, 6, 3]
        planes_per_stage = [64, 128, 256, 512]
        deepest = max(int(l[-1]) for l in self.layers)

        h = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x.astype(self.dtype))
        h = FrozenBatchNorm(dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))

        feats: Dict[str, jnp.ndarray] = {}
        for stage in range(deepest):
            planes = planes_per_stage[stage]
            stride = 1 if stage == 0 else 2
            for b in range(blocks_per_stage[stage]):
                h = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    base_width=self.base_width,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(h)
            name = f"layer{stage + 1}"
            if name in self.layers:
                feats[name] = h
        return feats


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torchvision wide_resnet50_2 state dict onto the flax params.

    Conv weights transpose OIHW → HWIO; BN (weight, bias, running_mean,
    running_var) → (scale, bias, mean, var).
    """

    def conv(w):
        return np.asarray(w).transpose(2, 3, 1, 0)

    def bn(prefix):
        return {
            "scale": np.asarray(state_dict[f"{prefix}.weight"]),
            "bias": np.asarray(state_dict[f"{prefix}.bias"]),
            "mean": np.asarray(state_dict[f"{prefix}.running_mean"]),
            "var": np.asarray(state_dict[f"{prefix}.running_var"]),
        }

    params: Dict[str, Any] = {}
    if "conv1.weight" in state_dict:
        params["conv1"] = {"kernel": conv(state_dict["conv1.weight"])}
        params["bn1"] = bn("bn1")
    blocks_per_stage = [3, 4, 6, 3]
    for stage in range(4):
        for b in range(blocks_per_stage[stage]):
            tp = f"layer{stage + 1}.{b}"
            fp = f"layer{stage + 1}_block{b}"
            if f"{tp}.conv1.weight" not in state_dict:
                continue
            entry = {
                "conv1": {"kernel": conv(state_dict[f"{tp}.conv1.weight"])},
                "bn1": bn(f"{tp}.bn1"),
                "conv2": {"kernel": conv(state_dict[f"{tp}.conv2.weight"])},
                "bn2": bn(f"{tp}.bn2"),
                "conv3": {"kernel": conv(state_dict[f"{tp}.conv3.weight"])},
                "bn3": bn(f"{tp}.bn3"),
            }
            if f"{tp}.downsample.0.weight" in state_dict:
                entry["ds_conv"] = {
                    "kernel": conv(state_dict[f"{tp}.downsample.0.weight"])
                }
                entry["ds_bn"] = bn(f"{tp}.downsample.1")
            params[fp] = entry
    return {"params": params}
