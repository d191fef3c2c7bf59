"""Fidelity metrics: MSE, PSNR, SSIM (jittable).

The reference reports only MSE (reference test.py:416, 443-444); SSIM/PSNR
are added because the driver's parity gate is per-sample SSIM vs reference
outputs at fixed seeds (BASELINE.md).  SSIM follows Wang et al. 2004 with
the standard 11×11 gaussian window, σ=1.5.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    m = mse(a, b)
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(m, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 2.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over NHWC batches (per-sample scalar, averaged over batch).

    Gaussian-weighted local statistics, K1=0.01, K2=0.03.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    c = a.shape[-1]
    # depthwise filter: same window per channel
    kern = jnp.tile(win[:, :, None, None], (1, 1, 1, c))  # HWIO with groups=c

    import jax

    def filt(x):
        return jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_a = filt(a)
    mu_b = filt(b)
    mu_aa = filt(a * a)
    mu_bb = filt(b * b)
    mu_ab = filt(a * b)

    va = mu_aa - mu_a**2
    vb = mu_bb - mu_b**2
    cov = mu_ab - mu_a * mu_b

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    ssim_map = num / den
    return jnp.mean(ssim_map, axis=(1, 2, 3)).mean()
