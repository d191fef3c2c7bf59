"""Beta schedules and the frozen Schedule pytree.

The reference computes schedule buffers in float64 on the host and registers
them as float32 module buffers (reference ddpm.py:460-494, 547-615).  Here the
same math runs in numpy float64 at construction time and is frozen into an
immutable pytree of float32 device arrays; everything downstream is a pure
function of (Schedule, t).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Linear schedule, scaled for the step count (reference ddpm.py:460-467)."""
    scale = 1000.0 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (Nichol & Dhariwal; reference ddpm.py:469-479)."""
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1.0
) -> np.ndarray:
    """Sigmoid schedule (arXiv:2212.11972 fig. 8; reference ddpm.py:481-494).

    This is the reference's default (`scheduler: 'sigmoid'`, config.yaml:52).
    """

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    # the reference evaluates the endpoint sigmoids in float32
    # (torch.tensor(start/tau).sigmoid(), ddpm.py:489-490) — replicate that
    # rounding exactly for bit parity of the f64 schedule.
    v_start = np.float64(sigmoid(np.float32(start / tau)).astype(np.float32))
    v_end = np.float64(sigmoid(np.float32(end / tau)).astype(np.float32))
    alphas_cumprod = (-sigmoid((t * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


@struct.dataclass
class Schedule:
    """Immutable pytree of diffusion-process coefficients.

    One row per training timestep; gathered per-batch-element with
    `diffusion_math.extract`.  Field set mirrors the reference's registered
    buffers (ddpm.py:569-615).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    snr: jnp.ndarray
    loss_weight: jnp.ndarray
    num_timesteps: int = struct.field(pytree_node=False, default=0)
    objective: str = struct.field(pytree_node=False, default="pred_x0")


def make_schedule(
    timesteps: int,
    beta_schedule: str = "sigmoid",
    objective: str = "pred_x0",
    min_snr_loss_weight: bool = False,
    min_snr_gamma: float = 5.0,
    dtype=jnp.float32,
    **schedule_kwargs,
) -> Schedule:
    """Build all diffusion coefficients (float64 host math → f32 device arrays).

    Formula parity with reference ddpm.py:547-615.
    """
    if beta_schedule not in _SCHEDULES:
        raise ValueError(f"unknown beta schedule {beta_schedule}")
    betas = _SCHEDULES[beta_schedule](timesteps, **schedule_kwargs)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.pad(alphas_cumprod[:-1], (1, 0), constant_values=1.0)

    posterior_variance = (
        betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))
    posterior_mean_coef1 = (
        betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    posterior_mean_coef2 = (
        (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    )

    snr = alphas_cumprod / (1.0 - alphas_cumprod)
    maybe_clipped_snr = np.minimum(snr, min_snr_gamma) if min_snr_loss_weight else snr
    if objective == "pred_noise":
        loss_weight = maybe_clipped_snr / snr
    elif objective == "pred_x0":
        loss_weight = maybe_clipped_snr
    elif objective == "pred_v":
        loss_weight = maybe_clipped_snr / (snr + 1)
    else:
        raise ValueError(f"unknown objective {objective}")

    as_dev = lambda a: jnp.asarray(a, dtype=dtype)
    return Schedule(
        betas=as_dev(betas),
        alphas_cumprod=as_dev(alphas_cumprod),
        alphas_cumprod_prev=as_dev(alphas_cumprod_prev),
        sqrt_alphas_cumprod=as_dev(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=as_dev(posterior_variance),
        posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dev(posterior_mean_coef1),
        posterior_mean_coef2=as_dev(posterior_mean_coef2),
        snr=as_dev(snr),
        loss_weight=as_dev(loss_weight),
        num_timesteps=int(timesteps),
        objective=objective,
    )
