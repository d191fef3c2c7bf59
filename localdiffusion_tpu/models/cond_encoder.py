"""Condition encoder: residual conv tower producing bottleneck features.

TPU-native equivalent of the reference's ResUnet condition model
(reference unet_model.py:91-137), which the denoiser UNet instantiates
internally and feeds the conditioning image at full resolution every forward
(reference ddpm.py:312, 434).

The reference hard-codes filters [32,32,64,128,256] and two depths: an
early-exit after 3 blocks for mnist/mvtecSR (unet_model.py:131-132) and a
4th pooled block for mri/mvtec (unet_model.py:116-118, 133-135).  Here depth
and width are derived from (num_blocks, base_dim); at base_dim=32 the
channel progression (32, 64, 128, 256) matches the reference exactly, and
the spatial reduction 2^(num_blocks-1) aligns with the denoiser bottleneck.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _groups(group_num: int, channels: int) -> int:
    g = min(group_num, channels)
    while channels % g != 0:
        g -= 1
    return max(g, 1)


class BasicBlock(nn.Module):
    """conv3×3-GN(16)-ReLU → conv3×3-GN(16), residual, ReLU
    (reference unet_model.py:8-51)."""

    mid_dim: int
    out_dim: int
    group_num: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        h = nn.Conv(self.mid_dim, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = nn.GroupNorm(
            num_groups=_groups(self.group_num, self.mid_dim),
            epsilon=1e-5,  # torch GroupNorm eps (flax default is 1e-6)
            dtype=self.dtype,
            name="gn1",
        )(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = nn.GroupNorm(
            num_groups=_groups(self.group_num, self.out_dim),
            epsilon=1e-5,
            dtype=self.dtype,
            name="gn2",
        )(h)
        if in_dim != self.out_dim:
            idn = nn.Conv(
                self.out_dim, (3, 3), padding=1, dtype=self.dtype, name="id_conv"
            )(x)
            idn = nn.GroupNorm(
                num_groups=_groups(self.group_num, self.out_dim),
                epsilon=1e-5,
                dtype=self.dtype,
                name="id_gn",
            )(idn)
        else:
            idn = x
        return nn.relu(h + idn)


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class CondEncoder(nn.Module):
    """Residual conv tower over the conditioning image.

    num_blocks blocks with a 2× maxpool between consecutive blocks; output
    spatial size H/2^(num_blocks-1), output channels base_dim·2^(num_blocks-2)
    (base_dim for num_blocks=1).  At base_dim=32: 3 blocks → 128ch at H/4
    (reference shallow), 4 blocks → 256ch at H/8 (reference deep).
    """

    num_blocks: int = 4
    base_dim: int = 32
    group_num: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        b = self.base_dim
        # filters like the reference [32, 32, 64, 128, 256] generalized
        outs = [b] + [b * (2**k) for k in range(1, self.num_blocks)]
        mids = [b] + outs[:-1]
        x = cond
        for i in range(self.num_blocks):
            if i > 0:
                x = _maxpool2(x)
            x = BasicBlock(
                mids[i], outs[i], self.group_num, self.dtype, name=f"block{i + 1}"
            )(x)
        return x
