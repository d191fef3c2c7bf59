"""Conditional denoiser UNet with bottleneck condition fusion.

TPU-native re-design of the reference denoiser (reference ddpm.py:286-451):
a 3/4-stage UNet whose bottleneck concatenates features from a condition
encoder run on the conditioning image at full resolution (ddpm.py:434-436),
followed by a fusion ResnetBlock.

Differences from the reference by design:
  * NHWC layout, parameterized compute dtype (bf16 on TPU).
  * The condition encoder is an explicit submodule; its features can also be
    precomputed once per sampling chain and passed in via `cond_feat`
    (the conditioning image is constant across all T reverse steps, so
    re-encoding it every step — as the reference does — wastes T-1
    encoder passes; see diffusion/sampler.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from localdiffusion_tpu.config import ModelConfig
from localdiffusion_tpu.models.blocks import (
    Attention,
    Downsample,
    LinearAttention,
    ResnetBlock,
    TimeMlp,
    Upsample,
)
from localdiffusion_tpu.models.cond_encoder import CondEncoder

Dtype = Any


class UNet(nn.Module):
    """Denoiser: model(x_t, cond, t) → prediction (x₀ / ε / v per objective).

    Stage structure mirrors reference ddpm.py:404-451:
      init conv7×7 → per-stage [Res, Res, attn(+res), down] → mid Res/attn/Res
      → concat(cond_feat) + fusion Res → ups with skip concats → final Res+1×1.
    """

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: Optional[jnp.ndarray],
        time: jnp.ndarray,
        cond_feat: Optional[jnp.ndarray] = None,
        x_self_cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dim = cfg.dim
        init_dim = cfg.resolved_init_dim
        dims = [init_dim] + [dim * m for m in cfg.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_stages = len(in_out)
        time_dim = dim * 4
        groups = cfg.resnet_block_groups

        f = cfg.stem_space_to_depth
        factor = cfg.downsample_factor * f
        assert x.shape[1] % factor == 0 and x.shape[2] % factor == 0, (
            f"input dims {x.shape[1:3]} must be divisible by {factor}"
        )

        x = x.astype(self.dtype)
        if cfg.self_condition:
            # previous x₀ estimate as extra input channels (reference
            # ddpm.py:406-408; zeros when absent)
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond.astype(self.dtype), x], axis=-1)
        if f > 1:
            # TPU-first stem (config.stem_space_to_depth): fold f×f spatial
            # blocks into channels so no full-resolution C≈32 tensor exists
            # — those drive XLA into transposing conv-layout copies at 256px
            bb, hh, ww, cc = x.shape
            x = x.reshape(bb, hh // f, f, ww // f, f, cc)
            x = x.transpose(0, 1, 3, 5, 2, 4).reshape(bb, hh // f, ww // f, cc * f * f)
        x = nn.Conv(init_dim, (7, 7), padding=3, dtype=self.dtype, name="init_conv")(x)
        r = x

        t = TimeMlp(
            dim, time_dim, cfg.time_emb_theta, self.dtype,
            learned_sinusoidal_cond=cfg.learned_sinusoidal_cond,
            random_fourier_features=cfg.random_fourier_features,
            learned_sinusoidal_dim=cfg.learned_sinusoidal_dim,
            name="time_mlp",
        )(time)

        def attn_layer(full: bool, name: str):
            if full:
                return Attention(
                    cfg.attn_heads, cfg.attn_dim_head, self.dtype, name=name
                )
            return LinearAttention(
                cfg.attn_heads, cfg.attn_dim_head, self.dtype, name=name
            )

        skips = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_stages - 1
            x = ResnetBlock(dim_in, groups, dtype=self.dtype, name=f"down{i}_block1")(
                x, t
            )
            skips.append(x)
            x = ResnetBlock(dim_in, groups, dtype=self.dtype, name=f"down{i}_block2")(
                x, t
            )
            x = attn_layer(cfg.full_attn[i], f"down{i}_attn")(x) + x
            skips.append(x)
            if not is_last:
                x = Downsample(dim_out, self.dtype, name=f"down{i}_down")(x)
            else:
                x = nn.Conv(
                    dim_out, (3, 3), padding=1, dtype=self.dtype, name=f"down{i}_down"
                )(x)

        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, groups, dtype=self.dtype, name="mid_block1")(x, t)
        x = attn_layer(True, "mid_attn")(x) + x
        x = ResnetBlock(mid_dim, groups, dtype=self.dtype, name="mid_block2")(x, t)

        # ---- bottleneck condition fusion (reference ddpm.py:434-436) ----
        if cond_feat is None:
            cond_feat = CondEncoder(
                num_blocks=cfg.cond_num_blocks,
                base_dim=cfg.cond_base_dim,
                group_num=cfg.cond_group_num,
                dtype=self.dtype,
                name="cond_model",
            )(cond.astype(self.dtype))
        x = jnp.concatenate([x, cond_feat.astype(self.dtype)], axis=-1)
        x = ResnetBlock(mid_dim, groups, dtype=self.dtype, name="conv_fusion")(x, t)

        for j, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = j == num_stages - 1
            stage = num_stages - 1 - j
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups, dtype=self.dtype, name=f"up{j}_block1")(
                x, t
            )
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups, dtype=self.dtype, name=f"up{j}_block2")(
                x, t
            )
            x = attn_layer(cfg.full_attn[stage], f"up{j}_attn")(x) + x
            if not is_last:
                x = Upsample(dim_in, self.dtype, name=f"up{j}_up")(x)
            else:
                x = nn.Conv(
                    dim_in, (3, 3), padding=1, dtype=self.dtype, name=f"up{j}_up"
                )(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(dim, groups, dtype=self.dtype, name="final_res_block")(x, t)
        out = nn.Conv(
            cfg.resolved_out_dim * f * f, (1, 1), dtype=jnp.float32,
            name="final_conv",
        )(x.astype(jnp.float32))
        if f > 1:
            # depth-to-space back to the input resolution
            bb, hh, ww, cc = out.shape
            co = cc // (f * f)
            out = out.reshape(bb, hh, ww, co, f, f)
            out = out.transpose(0, 1, 4, 2, 5, 3).reshape(bb, hh * f, ww * f, co)
        return out


def encode_cond(params, cfg: ModelConfig, cond: jnp.ndarray, dtype=jnp.float32):
    """Run only the condition encoder on its param subtree.

    The conditioning image is constant across a sampling chain, so its
    bottleneck features are computed once and reused for all T steps
    (vs. the reference recomputing them every UNet forward, ddpm.py:434).
    """
    enc = CondEncoder(
        num_blocks=cfg.cond_num_blocks,
        base_dim=cfg.cond_base_dim,
        group_num=cfg.cond_group_num,
        dtype=dtype,
    )
    sub = {"params": params["params"]["cond_model"]}
    return enc.apply(sub, cond.astype(dtype))
