"""Bit-level branched-step parity vs a torch transcription of the reference.

Oracle: the reference's per-step math (ddpm.py:668-838) re-evaluated with
torch ops from the formulas — model outputs and noise INJECTED identically on
both sides, so the comparison is exact (the SURVEY §7 'inject reference noise
arrays' harness).  Covers: cond partitioning, mask_x 'cond' and 'minval'
policies, per-branch posterior step with shared noise, and the fusion step
(x_start merge + zero-sentinel state merge + fused posterior).
"""

import numpy as np
import pytest
import torch

from localdiffusion_tpu.diffusion import sampler as S
from localdiffusion_tpu.ops import diffusion_math as dm
from localdiffusion_tpu.ops import make_schedule

import jax.numpy as jnp

T = 20
B, H, W, C = 1, 6, 6, 1
LO, HI = 0.0, 2.0


@pytest.fixture(scope="module")
def sched():
    return make_schedule(T, beta_schedule="sigmoid", objective="pred_x0")


def torch_buffers(sched):
    return {
        "posterior_mean_coef1": torch.from_numpy(np.asarray(sched.posterior_mean_coef1)),
        "posterior_mean_coef2": torch.from_numpy(np.asarray(sched.posterior_mean_coef2)),
        "posterior_log_variance_clipped": torch.from_numpy(
            np.asarray(sched.posterior_log_variance_clipped)
        ),
    }


def torch_branched_step(buf, x_out, x_in, cond, mask, model_out_pair, t,
                        noise, policy, floor):
    """Reference ddpm.py:668-855 one branched step, torch transcription."""
    binary = (mask >= 1.0).float()
    cond_out = cond * binary
    # mask_x (ddpm.py:697-708)
    mo_out, mo_in = model_out_pair
    if policy == "cond":
        mo_out = cond_out
    else:
        mo_out = mo_out * binary
        mo_out = torch.where(binary == 0.0, torch.tensor(LO), mo_out)
    xs_out = mo_out.clamp(LO, HI)
    xs_in = mo_in.clamp(LO, HI)

    def posterior(x0, xt):
        mean = buf["posterior_mean_coef1"][t] * x0 + buf["posterior_mean_coef2"][t] * xt
        logvar = buf["posterior_log_variance_clipped"][t]
        return mean, logvar

    mean_out, logvar = posterior(xs_out, x_out)
    mean_in, _ = posterior(xs_in, x_in)
    n = noise if t > 0 else torch.zeros_like(noise)
    return (
        mean_out + (0.5 * logvar).exp() * n,
        mean_in + (0.5 * logvar).exp() * n,
    )


def torch_fusion_step(buf, x_out, x_in, cond, mask, model_out_pair, t, noise,
                      policy):
    """Reference ddpm.py:779-810 fusion, torch transcription."""
    binary = (mask >= 1.0).float()
    cond_out = cond * binary
    mo_out, mo_in = model_out_pair
    if policy == "cond":
        mo_out = cond_out
    else:
        mo_out = mo_out * binary
        mo_out = torch.where(binary == 0.0, torch.tensor(LO), mo_out)
    xs_out = mo_out.clamp(LO, HI)
    xs_in = mo_in.clamp(LO, HI)
    x_start = xs_in * (1.0 - binary) + xs_out
    xo = x_out * binary
    xi = x_in * (1.0 - binary)
    x = torch.where(xo == 0.0, xi, xo)
    x_start = x_start.clamp(LO, HI)
    mean = buf["posterior_mean_coef1"][t] * x_start + buf["posterior_mean_coef2"][t] * x
    logvar = buf["posterior_log_variance_clipped"][t]
    n = noise if t > 0 else torch.zeros_like(noise)
    return mean + (0.5 * logvar).exp() * n


def _jax_branched_step(sched, x_out, x_in, cond, mask, model_out_pair, t,
                       noise, policy, floor):
    """Same step composed from the framework's exposed pieces."""
    m = S.binarize_mask(jnp.asarray(mask))
    cond_out, _ = S.partition_cond(jnp.asarray(cond), m, floor)
    tb = jnp.full((B,), t, dtype=jnp.int32)
    xs_out = S.apply_mask_x(jnp.asarray(model_out_pair[0]), m, cond_out, LO, policy)
    xs_out = jnp.clip(xs_out, LO, HI)
    xs_in = jnp.clip(jnp.asarray(model_out_pair[1]), LO, HI)
    mean_out, _, logvar = dm.q_posterior(sched, xs_out, jnp.asarray(x_out), tb)
    mean_in, _, _ = dm.q_posterior(sched, xs_in, jnp.asarray(x_in), tb)
    n = jnp.asarray(noise) if t > 0 else jnp.zeros_like(jnp.asarray(noise))
    return (
        np.asarray(mean_out + jnp.exp(0.5 * logvar) * n),
        np.asarray(mean_in + jnp.exp(0.5 * logvar) * n),
    )


def _jax_fusion_step(sched, x_out, x_in, cond, mask, model_out_pair, t, noise,
                     policy, floor):
    m = S.binarize_mask(jnp.asarray(mask))
    cond_out, _ = S.partition_cond(jnp.asarray(cond), m, floor)
    tb = jnp.full((B,), t, dtype=jnp.int32)
    xs_out = S.apply_mask_x(jnp.asarray(model_out_pair[0]), m, cond_out, LO, policy)
    xs_out = jnp.clip(xs_out, LO, HI)
    xs_in = jnp.clip(jnp.asarray(model_out_pair[1]), LO, HI)
    x_start = xs_in * (1.0 - m) + xs_out
    xo = jnp.asarray(x_out) * m
    xi = jnp.asarray(x_in) * (1.0 - m)
    x = S.fuse_noisy_states(xo, xi, m, "zero_sentinel")
    x_start = jnp.clip(x_start, LO, HI)
    mean, _, logvar = dm.q_posterior(sched, x_start, x, tb)
    n = jnp.asarray(noise) if t > 0 else jnp.zeros_like(jnp.asarray(noise))
    return np.asarray(mean + jnp.exp(0.5 * logvar) * n)


def _inputs(seed):
    rng = np.random.default_rng(seed)
    shape = (B, H, W, C)
    x_out = rng.uniform(LO, HI, shape).astype(np.float32)
    x_in = rng.uniform(LO, HI, shape).astype(np.float32)
    cond = rng.uniform(0.1, HI, shape).astype(np.float32)
    mask = np.zeros(shape, np.float32)
    mask[:, :, :2, :] = 1.0
    mo = (
        rng.uniform(-0.5, 2.5, shape).astype(np.float32),
        rng.uniform(-0.5, 2.5, shape).astype(np.float32),
    )
    noise = rng.standard_normal(shape).astype(np.float32)
    return x_out, x_in, cond, mask, mo, noise


@pytest.mark.parametrize("policy,floor", [("cond", 0.5), ("minval", 0.95)])
@pytest.mark.parametrize("t", [0, 5, T - 1])
def test_branched_step_bit_parity(sched, policy, floor, t):
    x_out, x_in, cond, mask, mo, noise = _inputs(t + 1)
    buf = torch_buffers(sched)
    want = torch_branched_step(
        buf,
        *(torch.from_numpy(a) for a in (x_out, x_in, cond, mask)),
        (torch.from_numpy(mo[0]), torch.from_numpy(mo[1])),
        t, torch.from_numpy(noise), policy, floor,
    )
    got = _jax_branched_step(sched, x_out, x_in, cond, mask, mo, t, noise,
                             policy, floor)
    np.testing.assert_allclose(got[0], want[0].numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[1], want[1].numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("policy,floor", [("cond", 0.5), ("minval", 0.95)])
@pytest.mark.parametrize("t", [0, 2])
def test_fusion_step_bit_parity(sched, policy, floor, t):
    x_out, x_in, cond, mask, mo, noise = _inputs(t + 11)
    buf = torch_buffers(sched)
    want = torch_fusion_step(
        buf,
        *(torch.from_numpy(a) for a in (x_out, x_in, cond, mask)),
        (torch.from_numpy(mo[0]), torch.from_numpy(mo[1])),
        t, torch.from_numpy(noise), policy,
    )
    got = _jax_fusion_step(sched, x_out, x_in, cond, mask, mo, t, noise,
                           policy, floor)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)
