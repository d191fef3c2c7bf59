"""Native data-kernel parity tests (C++ vs numpy reference)."""

import numpy as np
import pytest

from localdiffusion_tpu import native
from localdiffusion_tpu.data.mnist import degrade


def test_native_builds():
    assert native.have_native(), "g++ toolchain expected in this image"


def test_gather_normalize_parity():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (20, 28, 28), dtype=np.uint8)
    idx = np.asarray([3, 0, 19, 7])
    got = native.gather_normalize(imgs, idx, 2.0 / 255.0)
    want = imgs[idx].astype(np.float32) * (2.0 / 255.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("h_only", [True, False])
def test_degrade_batch_parity(h_only):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (5, 28, 28), dtype=np.uint8)
    got = native.degrade_batch(imgs, h_only=h_only, scale=2.0 / 255.0)
    want = np.stack(
        [
            degrade(imgs[i].astype(np.float32), "h_only" if h_only else "full")
            for i in range(5)
        ]
    ) * (2.0 / 255.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
