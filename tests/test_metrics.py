"""Metric sanity tests (SSIM/PSNR against skimage-style expectations)."""

import jax.numpy as jnp
import numpy as np

from localdiffusion_tpu.utils.metrics import mse, psnr, ssim


def test_identical_images():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 2, (2, 32, 32, 1)))
    assert float(mse(x, x)) == 0.0
    assert float(ssim(x, x)) > 0.9999
    assert float(psnr(x, x)) > 100.0


def test_noise_lowers_ssim_monotonically():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0.5, 1.5, (1, 32, 32, 1)).astype(np.float32))
    vals = []
    for sigma in (0.01, 0.1, 0.5):
        y = x + sigma * jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
        vals.append(float(ssim(x, y)))
    assert vals[0] > vals[1] > vals[2]
    assert vals[0] > 0.9


def test_ssim_structural_not_just_pointwise():
    """Constant offset keeps structure: SSIM stays high while MSE grows."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0.5, 1.5, (1, 32, 32, 1)).astype(np.float32))
    y = x + 0.1
    assert float(ssim(x, y)) > 0.8
    assert float(mse(x, y)) > 0.009
