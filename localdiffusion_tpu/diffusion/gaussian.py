"""Gaussian diffusion engine: training loss + model-prediction plumbing.

TPU-native equivalent of the reference `GaussianDiffusion` (reference
ddpm.py:496-1214), re-designed as a stateless bundle of pure functions:

  * no mutable sampler flags — sampling lives in diffusion/sampler.py as
    lax.scan programs,
  * the loss is a pure function of (params, rng, batch) → scalar,
  * branched model predictions run as ONE batched UNet call over a leading
    branch axis instead of the reference's two sequential calls
    (ddpm.py:694-695).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from localdiffusion_tpu.config import DiffusionConfig, ModelConfig
from localdiffusion_tpu.models.unet import UNet, encode_cond
from localdiffusion_tpu.ops import diffusion_math as dm
from localdiffusion_tpu.ops.schedules import Schedule, make_schedule


class ModelPrediction(NamedTuple):
    pred_noise: jnp.ndarray
    pred_x_start: jnp.ndarray


class GaussianDiffusion:
    """Stateless diffusion engine bound to a denoiser UNet.

    Mirrors the constructor surface of reference ddpm.py:496-513 but holds
    only immutable pieces (model module, Schedule pytree, configs).
    """

    def __init__(
        self,
        model_cfg: ModelConfig,
        diff_cfg: DiffusionConfig,
        dtype=jnp.float32,
    ):
        self.model_cfg = model_cfg
        self.diff_cfg = diff_cfg
        self.model = UNet(model_cfg, dtype=dtype)
        self.schedule: Schedule = make_schedule(
            diff_cfg.timesteps,
            beta_schedule=diff_cfg.beta_schedule,
            objective=diff_cfg.objective,
            min_snr_loss_weight=diff_cfg.min_snr_loss_weight,
            min_snr_gamma=diff_cfg.min_snr_gamma,
        )
        self.num_timesteps = diff_cfg.timesteps
        self.sampling_timesteps = diff_cfg.resolved_sampling_timesteps
        self.is_ddim_sampling = diff_cfg.is_ddim_sampling
        self.objective = diff_cfg.objective
        self.image_size = diff_cfg.image_size

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def init_params(self, rng, batch_size: int = 1):
        s = self.image_size
        c = self.model_cfg.channels
        cc = self.model_cfg.resolved_cond_channels
        x = jnp.zeros((batch_size, s, s, c))
        cond = jnp.zeros((batch_size, s, s, cc))
        t = jnp.zeros((batch_size,))
        return self.model.init(rng, x, cond, t)

    # ------------------------------------------------------------------
    # model application
    # ------------------------------------------------------------------
    def apply_model(self, params, x, cond, t, cond_feat=None, x_self_cond=None):
        # exact space-to-depth layout execution (models/unet_s2d.py): same
        # params and outputs, full-res stage runs lane-occupied.  Resolved
        # per call from the (static) input shape so small inputs and
        # patch-parallel tiles keep the standard path.
        f = self.model_cfg.resolve_exact_layout_s2d(x.shape[1], x.shape[2])
        if f > 1:
            from localdiffusion_tpu.models.unet_s2d import apply_unet_s2d

            return apply_unet_s2d(
                params,
                self.model_cfg,
                x,
                cond,
                t,
                cond_feat=cond_feat,
                x_self_cond=x_self_cond,
                dtype=self.model.dtype,
                factor=f,
            )
        return self.model.apply(
            params, x, cond, t, cond_feat=cond_feat, x_self_cond=x_self_cond
        )

    def encode_cond(self, params, cond):
        f = self.model_cfg.resolve_exact_layout_s2d(cond.shape[1], cond.shape[2])
        if f > 1:
            from localdiffusion_tpu.models.unet_s2d import encode_cond_s2d

            return encode_cond_s2d(
                params["params"]["cond_model"],
                self.model_cfg.cond_num_blocks,
                self.model_cfg.cond_base_dim,
                self.model_cfg.cond_group_num,
                cond,
                self.model.dtype,
                f=f,
            )
        return encode_cond(params, self.model_cfg, cond, dtype=self.model.dtype)

    # ------------------------------------------------------------------
    # training loss (reference ddpm.py:1156-1214)
    # ------------------------------------------------------------------
    def p_losses(
        self,
        params,
        x_start: jnp.ndarray,
        cond: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
        offset_noise: Optional[jnp.ndarray] = None,
        self_cond_key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Noise-injection training loss (reference ddpm.py:1156-1201).

        offset_noise: optional [B, C] per-channel shift added at
        `offset_noise_strength` (the crosslabs offset-noise trick,
        ddpm.py:1165-1167).
        self_cond_key: PRNG key for the 50% self-conditioning pre-pass
        (only used when model_cfg.self_condition).
        """
        sched = self.schedule
        if offset_noise is not None and self.diff_cfg.offset_noise_strength > 0.0:
            noise = noise + self.diff_cfg.offset_noise_strength * offset_noise[
                :, None, None, :
            ]

        x = dm.q_sample(sched, x_start, t, noise)

        x_self_cond = None
        if self.model_cfg.self_condition and self_cond_key is not None:
            # 50%-of-steps self-conditioning pre-pass (reference
            # ddpm.py:1176-1182): predict x₀ without gradient, feed it back.
            # lax.cond keeps the branch data-dependent-free for jit; the
            # whole-batch coin flip mirrors the reference's single random().
            pre = jax.lax.stop_gradient(
                dm.model_output_to_x_start(
                    sched, self.apply_model(params, x, cond, t), x, t
                )
            )
            use = jax.random.bernoulli(self_cond_key)
            x_self_cond = jnp.where(use, pre, jnp.zeros_like(pre))

        model_out = self.apply_model(params, x, cond, t, x_self_cond=x_self_cond)

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        elif self.objective == "pred_v":
            target = dm.predict_v(sched, x_start, t, noise)
        else:
            raise ValueError(self.objective)

        loss = jnp.mean((model_out - target) ** 2, axis=(1, 2, 3))
        loss = loss * sched.loss_weight[t]
        return jnp.mean(loss)

    def loss(self, params, rng, x_start, cond) -> jnp.ndarray:
        """Sample t ~ U[0,T) and noise, then p_losses (reference ddpm.py:1203-1214)."""
        b = x_start.shape[0]
        sc_key = None
        if self.model_cfg.self_condition:
            # extra split only in self-cond mode — keeps the t/noise streams
            # of default configs bit-identical to prior checkpoints
            rng, sc_key = jax.random.split(rng)
        t_key, n_key, o_key = jax.random.split(rng, 3)
        t = jax.random.randint(t_key, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(n_key, x_start.shape, dtype=x_start.dtype)
        offset_noise = None
        if self.diff_cfg.offset_noise_strength > 0.0:
            offset_noise = jax.random.normal(
                o_key, (b, x_start.shape[-1]), dtype=x_start.dtype
            )
        if self.diff_cfg.auto_normalize:
            x_start = dm.normalize_to_neg_one_to_one(x_start)
        return self.p_losses(
            params, x_start, cond, t, noise, offset_noise, self_cond_key=sc_key
        )

    # ------------------------------------------------------------------
    # prediction conversion (reference ddpm.py:668-766, non-branched path)
    # ------------------------------------------------------------------
    def model_predictions(
        self,
        params,
        x: jnp.ndarray,
        t: jnp.ndarray,
        cond_feat: jnp.ndarray,
        min_max_val: Tuple[float, float],
        clip_x_start: bool = False,
        rederive_pred_noise: bool = False,
    ) -> ModelPrediction:
        sched = self.schedule
        model_output = self.apply_model(params, x, None, t, cond_feat=cond_feat)
        lo, hi = min_max_val

        if self.objective == "pred_noise":
            pred_noise = model_output
            x_start = dm.predict_start_from_noise(sched, x, t, pred_noise)
            if clip_x_start:
                x_start = jnp.clip(x_start, lo, hi)
                if rederive_pred_noise:
                    pred_noise = dm.predict_noise_from_start(sched, x, t, x_start)
        elif self.objective == "pred_x0":
            x_start = model_output
            if clip_x_start:
                x_start = jnp.clip(x_start, lo, hi)
            pred_noise = dm.predict_noise_from_start(sched, x, t, x_start)
        else:  # pred_v
            x_start = dm.predict_start_from_v(sched, x, t, model_output)
            if clip_x_start:
                x_start = jnp.clip(x_start, lo, hi)
            pred_noise = dm.predict_noise_from_start(sched, x, t, x_start)
        return ModelPrediction(pred_noise, x_start)
