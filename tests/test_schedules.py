"""Golden-value tests for beta schedules and Schedule buffers.

Oracle: the reference's float64 torch formulas (reference ddpm.py:460-494,
547-615) re-evaluated here with torch on CPU.  This pins bit-level parity of
the schedule math without importing any reference code.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from localdiffusion_tpu.ops import (
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    sigmoid_beta_schedule,
)


def torch_linear(timesteps):
    scale = 1000 / timesteps
    return torch.linspace(scale * 0.0001, scale * 0.02, timesteps, dtype=torch.float64)


def torch_cosine(timesteps, s=0.008):
    steps = timesteps + 1
    t = torch.linspace(0, timesteps, steps, dtype=torch.float64) / timesteps
    ac = torch.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0, 0.999)


def torch_sigmoid(timesteps, start=-3, end=3, tau=1):
    steps = timesteps + 1
    t = torch.linspace(0, timesteps, steps, dtype=torch.float64) / timesteps
    v_start = torch.tensor(start / tau).sigmoid()
    v_end = torch.tensor(end / tau).sigmoid()
    ac = (-((t * (end - start) + start) / tau).sigmoid() + v_end) / (v_end - v_start)
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0, 0.999)


@pytest.mark.parametrize("timesteps", [50, 250, 1000])
@pytest.mark.parametrize(
    "ours,oracle",
    [
        (linear_beta_schedule, torch_linear),
        (cosine_beta_schedule, torch_cosine),
        (sigmoid_beta_schedule, torch_sigmoid),
    ],
    ids=["linear", "cosine", "sigmoid"],
)
def test_beta_schedule_parity(timesteps, ours, oracle):
    got = ours(timesteps)
    want = oracle(timesteps).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def torch_buffers(timesteps, schedule="sigmoid", objective="pred_x0"):
    """The reference's buffer derivations, float64 (ddpm.py:547-615)."""
    betas = {"linear": torch_linear, "cosine": torch_cosine, "sigmoid": torch_sigmoid}[
        schedule
    ](timesteps)
    alphas = 1.0 - betas
    ac = torch.cumprod(alphas, dim=0)
    ac_prev = F.pad(ac[:-1], (1, 0), value=1.0)
    out = {
        "betas": betas,
        "alphas_cumprod": ac,
        "alphas_cumprod_prev": ac_prev,
        "sqrt_alphas_cumprod": torch.sqrt(ac),
        "sqrt_one_minus_alphas_cumprod": torch.sqrt(1.0 - ac),
        "log_one_minus_alphas_cumprod": torch.log(1.0 - ac),
        "sqrt_recip_alphas_cumprod": torch.sqrt(1.0 / ac),
        "sqrt_recipm1_alphas_cumprod": torch.sqrt(1.0 / ac - 1),
    }
    pv = betas * (1.0 - ac_prev) / (1.0 - ac)
    out["posterior_variance"] = pv
    out["posterior_log_variance_clipped"] = torch.log(pv.clamp(min=1e-20))
    out["posterior_mean_coef1"] = betas * torch.sqrt(ac_prev) / (1.0 - ac)
    out["posterior_mean_coef2"] = (1.0 - ac_prev) * torch.sqrt(alphas) / (1.0 - ac)
    snr = ac / (1 - ac)
    out["snr"] = snr
    out["loss_weight"] = {
        "pred_noise": snr / snr,
        "pred_x0": snr,
        "pred_v": snr / (snr + 1),
    }[objective]
    return out


@pytest.mark.parametrize("schedule", ["linear", "cosine", "sigmoid"])
@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_schedule_buffers_parity(schedule, objective):
    T = 250
    sched = make_schedule(T, beta_schedule=schedule, objective=objective)
    oracle = torch_buffers(T, schedule, objective)
    for name, want in oracle.items():
        got = np.asarray(getattr(sched, name))
        # buffers are stored f32 (like the reference's register_buffer cast)
        np.testing.assert_allclose(
            got, want.numpy().astype(np.float32), rtol=2e-6, atol=1e-7, err_msg=name
        )


def test_min_snr_clipping():
    T = 100
    sched = make_schedule(T, min_snr_loss_weight=True, min_snr_gamma=5.0)
    assert float(np.max(np.asarray(sched.loss_weight))) <= 5.0 + 1e-6


def test_schedule_is_static_hashable_metadata():
    s = make_schedule(10)
    assert s.num_timesteps == 10
    assert s.objective == "pred_x0"
    import jax

    leaves = jax.tree_util.tree_leaves(s)
    assert all(l.dtype == np.float32 for l in leaves)
