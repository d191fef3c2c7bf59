"""Pallas kernel parity tests (interpreter mode — no TPU needed).

Validates the kernel programs themselves against the XLA reference
implementations; on-chip numerics are additionally spot-checked by
scripts on real hardware (see commit logs for measured errors).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localdiffusion_tpu.ops.attention import xla_attention
from localdiffusion_tpu.ops.pallas_attention import flash_attention
from localdiffusion_tpu.ops.pallas_groupnorm import (
    groupnorm_film_silu,
    groupnorm_film_silu_reference,
)


@pytest.mark.parametrize("n", [64, 256])
def test_flash_attention_parity_interpret(n):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, n, 2, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, n, 2, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, n, 2, 32)).astype(np.float32))
    a = xla_attention(q, k, v)
    b = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_flash_attention_grad_falls_back_to_reference():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 64, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 64, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 64, 2, 16)).astype(np.float32))
    g1 = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v, interpret=True)))(q)
    g2 = jax.grad(lambda q: jnp.sum(xla_attention(q, k, v)))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("film", [True, False])
def test_groupnorm_kernel_parity_interpret(film):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32)) if film else None
    shift = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32)) if film else None
    a = groupnorm_film_silu_reference(x, gamma, beta, scale, shift, groups=8)
    b = groupnorm_film_silu(x, gamma, beta, scale, shift, groups=8, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_groupnorm_matches_torch():
    """Reference oracle: torch GroupNorm + FiLM + SiLU (reference ddpm.py:177-186)."""
    import torch

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6, 6, 16)).astype(np.float32)
    gamma = rng.standard_normal(16).astype(np.float32)
    beta = rng.standard_normal(16).astype(np.float32)
    scale = rng.standard_normal((2, 16)).astype(np.float32)
    shift = rng.standard_normal((2, 16)).astype(np.float32)

    got = groupnorm_film_silu_reference(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
        jnp.asarray(scale), jnp.asarray(shift), groups=8,
    )

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    gn = torch.nn.GroupNorm(8, 16)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(gamma))
        gn.bias.copy_(torch.from_numpy(beta))
        y = gn(xt)
        y = y * (torch.from_numpy(scale)[:, :, None, None] + 1.0) + torch.from_numpy(
            shift
        )[:, :, None, None]
        want = torch.nn.functional.silu(y).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("film", [True, False])
def test_tiled_groupnorm_parity_interpret(film):
    from localdiffusion_tpu.ops.pallas_groupnorm import _gn_tiled

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32)) if film else None
    shift = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32)) if film else None
    want = groupnorm_film_silu_reference(x, gamma, beta, scale, shift, groups=8)
    got = _gn_tiled(x, gamma, beta, scale, shift, 8, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)
