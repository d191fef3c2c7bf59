"""Image resize / crop / blur primitives (device-side, XLA-fused).

Equivalents of the reference's torch F.interpolate / transforms.CenterCrop /
anomalib gaussian blur usages (e.g. reference test.py:237, data.py:369,
models.py:123).  jax.image.resize uses half-pixel centers, matching
torch's align_corners=False convention.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) images to `size` = (H, W)."""
    if x.ndim == 3:
        return jax.image.resize(x, (size[0], size[1], x.shape[-1]), "bilinear")
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), "bilinear"
    )


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    if x.ndim == 3:
        return jax.image.resize(x, (size[0], size[1], x.shape[-1]), "nearest")
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), "nearest"
    )


def center_crop(x: jnp.ndarray, size) -> jnp.ndarray:
    """Center crop NHWC (or HWC) to (H, W), padding if smaller
    (torchvision CenterCrop semantics)."""
    spatial_off = 1 if x.ndim == 4 else 0
    h, w = x.shape[spatial_off], x.shape[spatial_off + 1]
    th, tw = size
    pad_h = max(th - h, 0)
    pad_w = max(tw - w, 0)
    if pad_h or pad_w:
        pads = [(0, 0)] * x.ndim
        pads[spatial_off] = (pad_h // 2, pad_h - pad_h // 2)
        pads[spatial_off + 1] = (pad_w // 2, pad_w - pad_w // 2)
        x = jnp.pad(x, pads)
        h, w = x.shape[spatial_off], x.shape[spatial_off + 1]
    # torchvision rounds the crop origin like round((h - th) / 2)
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    if x.ndim == 4:
        return x[:, i : i + th, j : j + tw, :]
    return x[i : i + th, j : j + tw, :]


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, sigma: float, kernel_size: int | None = None):
    """Separable gaussian blur over NHWC images (reflect padding).

    Matches the anomaly-map smoothing of anomalib's AnomalyMapGenerator
    (consumed at reference models.py:123): kernel_size = 2·ceil(4σ)+1 by
    default (kornia convention).
    """
    if kernel_size is None:
        radius = int(math.ceil(4.0 * sigma))
    else:
        radius = kernel_size // 2
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))

    def corr_axis(img, axis):
        pad = [(0, 0)] * img.ndim
        pad[axis] = (radius, radius)
        padded = jnp.pad(img, pad, mode="reflect")
        out = jnp.zeros_like(img, dtype=jnp.float32)
        for i in range(2 * radius + 1):
            sl = [slice(None)] * img.ndim
            sl[axis] = slice(i, i + img.shape[axis])
            out = out + k[i] * padded[tuple(sl)].astype(jnp.float32)
        return out

    x = corr_axis(x, 1 if x.ndim == 4 else 0)
    x = corr_axis(x, 2 if x.ndim == 4 else 1)
    return x


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """transforms.Normalize(ImageNet mean/std) on NHWC RGB in [0,1]
    (reference test.py:242)."""
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    return (x - mean) / std
