"""Segmentation UNet — the alternative OOD detector for tumor masks.

TPU-native equivalent of reference unet_model.py:142-243 (classic 4-down/
4-up UNet, 64→1024 channels) used at inference when ood_detector.seg is set
(reference test.py:215-222, 284-289), trained by train_seg.py.

BatchNorm is replaced by GroupNorm(32): functionally equivalent for this
detector, and it removes the mutable batch-stats collection, keeping every
apply a pure function (jit/pjit-friendly; no running-stat syncs across the
mesh).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class DoubleConv(nn.Module):
    """(conv3×3 → norm → ReLU) ×2 (reference unet_model.py:142-159)."""

    out_ch: int
    mid_ch: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.mid_ch or self.out_ch
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(32, mid), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(32, self.out_ch), dtype=self.dtype)(x)
        return nn.relu(x)


class SegUNet(nn.Module):
    """4-down/4-up segmentation UNet producing per-pixel logits."""

    n_classes: int = 1
    base: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base
        x1 = DoubleConv(b, dtype=self.dtype, name="inc")(x)
        x2 = DoubleConv(b * 2, dtype=self.dtype, name="down1")(
            nn.max_pool(x1, (2, 2), strides=(2, 2))
        )
        x3 = DoubleConv(b * 4, dtype=self.dtype, name="down2")(
            nn.max_pool(x2, (2, 2), strides=(2, 2))
        )
        x4 = DoubleConv(b * 8, dtype=self.dtype, name="down3")(
            nn.max_pool(x3, (2, 2), strides=(2, 2))
        )
        x5 = DoubleConv(b * 16, dtype=self.dtype, name="down4")(
            nn.max_pool(x4, (2, 2), strides=(2, 2))
        )

        def up(xs, skip, out_ch, name):
            h = nn.ConvTranspose(
                out_ch, (2, 2), strides=(2, 2), dtype=self.dtype, name=f"{name}_up"
            )(xs)
            h = jnp.concatenate([skip, h], axis=-1)
            return DoubleConv(out_ch, dtype=self.dtype, name=f"{name}_conv")(h)

        h = up(x5, x4, b * 8, "up1")
        h = up(h, x3, b * 4, "up2")
        h = up(h, x2, b * 2, "up3")
        h = up(h, x1, b, "up4")
        return nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32, name="outc")(
            h.astype(jnp.float32)
        )


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-6):
    """Soft Dice loss on sigmoid probabilities (reference train_seg.py DiceLoss)."""
    probs = nn.sigmoid(logits)
    num = 2.0 * jnp.sum(probs * targets, axis=(1, 2, 3))
    den = jnp.sum(probs, axis=(1, 2, 3)) + jnp.sum(targets, axis=(1, 2, 3))
    return 1.0 - jnp.mean((num + eps) / (den + eps))


def bce_dice_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, pos_weight: float = 10.0
) -> jnp.ndarray:
    """BCEWithLogits(pos_weight=10) + Dice, matching reference train_seg.py:64-73."""
    log_p = nn.log_sigmoid(logits)
    log_not_p = nn.log_sigmoid(-logits)
    bce = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    return jnp.mean(bce) + dice_loss(logits, targets)
