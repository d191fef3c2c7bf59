"""Pure diffusion math: q(x_t|x_0), posterior, and parameterization conversions.

Everything is a pure function of (Schedule, arrays) — directly jit/vmap/scan
composable.  Formula parity with reference ddpm.py:455-458 (extract),
631-666 (conversions, posterior), 1147-1154 (q_sample).

Array layout is NHWC; `t` is an int32 vector of shape [B].
"""

from __future__ import annotations

import jax.numpy as jnp

from localdiffusion_tpu.ops.schedules import Schedule


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an image batch.

    Equivalent of reference ddpm.py:455-458: a[t] reshaped to [B, 1, 1, ...]
    with (ndim - 1) trailing singleton axes.
    """
    out = a[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def q_sample(
    schedule: Schedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Forward-process sample x_t = sqrt(ᾱ_t)·x₀ + sqrt(1-ᾱ_t)·ε (ddpm.py:1147-1154)."""
    nd = x_start.ndim
    return (
        extract(schedule.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(schedule.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(
    schedule: Schedule, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """x₀ = sqrt(1/ᾱ_t)·x_t − sqrt(1/ᾱ_t − 1)·ε (ddpm.py:631-635)."""
    nd = x_t.ndim
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def predict_noise_from_start(
    schedule: Schedule, x_t: jnp.ndarray, t: jnp.ndarray, x0: jnp.ndarray
) -> jnp.ndarray:
    """ε = (sqrt(1/ᾱ_t)·x_t − x₀) / sqrt(1/ᾱ_t − 1) (ddpm.py:637-641)."""
    nd = x_t.ndim
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
    ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_v(
    schedule: Schedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """v = sqrt(ᾱ_t)·ε − sqrt(1−ᾱ_t)·x₀ (ddpm.py:643-647)."""
    nd = x_start.ndim
    return (
        extract(schedule.sqrt_alphas_cumprod, t, nd) * noise
        - extract(schedule.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
    )


def predict_start_from_v(
    schedule: Schedule, x_t: jnp.ndarray, t: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """x₀ = sqrt(ᾱ_t)·x_t − sqrt(1−ᾱ_t)·v (ddpm.py:649-653)."""
    nd = x_t.ndim
    return (
        extract(schedule.sqrt_alphas_cumprod, t, nd) * x_t
        - extract(schedule.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


def q_posterior(
    schedule: Schedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
):
    """Posterior q(x_{t-1} | x_t, x₀): (mean, variance, log-variance) (ddpm.py:659-666)."""
    nd = x_t.ndim
    posterior_mean = (
        extract(schedule.posterior_mean_coef1, t, nd) * x_start
        + extract(schedule.posterior_mean_coef2, t, nd) * x_t
    )
    posterior_variance = extract(schedule.posterior_variance, t, nd)
    posterior_log_variance = extract(schedule.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


def model_output_to_x_start(
    schedule: Schedule,
    model_output: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Convert a raw model output to an x₀ estimate per the objective."""
    if schedule.objective == "pred_x0":
        return model_output
    if schedule.objective == "pred_noise":
        return predict_start_from_noise(schedule, x_t, t, model_output)
    if schedule.objective == "pred_v":
        return predict_start_from_v(schedule, x_t, t, model_output)
    raise ValueError(f"unknown objective {schedule.objective}")


def normalize_to_neg_one_to_one(img: jnp.ndarray) -> jnp.ndarray:
    return img * 2.0 - 1.0


def unnormalize_to_zero_to_one(t: jnp.ndarray) -> jnp.ndarray:
    return (t + 1.0) * 0.5
