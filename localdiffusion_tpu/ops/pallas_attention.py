"""Pallas TPU fused attention kernel.

The TPU-native equivalent of the reference's CUDA SDPA dispatch
(reference attend.py:35-112).  Image-denoiser attention operates on short
token sequences (bottleneck H·W ≤ ~4K), so the kernel keeps each
(batch·head)'s full K/V resident in VMEM and fuses QKᵀ → softmax → PV into
one pass over Q blocks — one HBM read per operand, no materialized [N, N]
attention matrix in HBM.

Gradients: forward runs the Pallas kernel; backward recomputes through the
XLA einsum reference (small N makes recompute cheap) via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from localdiffusion_tpu.ops.attention import xla_attention


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One Q block vs full K/V for one (batch·head) slice."""
    q = q_ref[0].astype(jnp.float32)  # [BLK_Q, D]
    k = k_ref[0].astype(jnp.float32)  # [N, D]
    v = v_ref[0].astype(jnp.float32)  # [N, D]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BLK_Q, N]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, scale, interpret=False):
    """q, k, v: [B, N, H, D] → [B, N, H, D]."""
    b, n, h, d = q.shape
    bh = b * h
    # [B, N, H, D] -> [B*H, N, D]
    qf = q.transpose(0, 2, 1, 3).reshape(bh, n, d)
    kf = k.transpose(0, 2, 1, 3).reshape(bh, n, d)
    vf = v.transpose(0, 2, 1, 3).reshape(bh, n, d)

    blk_q = min(n, 512)
    num_q = pl.cdiv(n, blk_q)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(bh, num_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * n * n * d,
            bytes_accessed=3 * bh * n * d * 4 + bh * n * d * 4,
            transcendentals=bh * n * n,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale, interpret=False):
    return _flash_fwd_impl(q, k, v, scale, interpret)


def _flash_fwd(q, k, v, scale, interpret=False):
    return _flash_fwd_impl(q, k, v, scale, interpret), (q, k, v)


def _flash_bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, scale=None, interpret=False):
    """Fused attention for [B, N, H, D] (Pallas fwd, recompute bwd).

    `interpret=True` runs the kernel in the Pallas interpreter (CPU) — used
    by the parity tests without TPU hardware.
    """
    d = q.shape[-1]
    scale = float(d**-0.5 if scale is None else scale)
    return _flash(q, k, v, scale, interpret)
