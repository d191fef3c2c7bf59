"""Attention kernels: fused Pallas flash attention + XLA einsum fallback.

Replaces the reference's CUDA SDPA dispatch (reference attend.py:35-112,
which picks torch flash/mem-efficient kernels per-GPU).  On TPU the
equivalent native kernel is a Pallas flash-attention; the XLA einsum path is
the always-correct fallback used for interpret-mode parity tests and tiny
sequences where kernel launch overhead dominates.

Layout: q, k, v are [B, N, H, D] (batch, tokens, heads, head_dim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float | None = None
) -> jnp.ndarray:
    """Reference einsum softmax attention (parity with attend.py:84-112)."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    # [B, N, H, D] -> [B, H, N, D]
    qh = jnp.swapaxes(q, 1, 2)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    sim = jnp.einsum(
        "bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vh, preferred_element_type=jnp.float32)
    return jnp.swapaxes(out.astype(q.dtype), 1, 2)


# Populated by localdiffusion_tpu.ops.pallas_attention when imported on TPU.
_PALLAS_IMPL = None
# Below this token count the einsum path beats a kernel launch; image
# denoisers at 7×7–28×28 bottlenecks sit here.
_PALLAS_MIN_TOKENS = 256


def register_pallas_impl(fn) -> None:
    global _PALLAS_IMPL
    _PALLAS_IMPL = fn


_TRIED_PALLAS = False


def full_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float | None = None
) -> jnp.ndarray:
    """Dispatch full attention: Pallas kernel on TPU for long sequences,
    XLA einsum otherwise (the TPU analog of attend.py's flash dispatch)."""
    global _TRIED_PALLAS
    if not _TRIED_PALLAS:
        try_enable_pallas()
        _TRIED_PALLAS = True
    n = q.shape[1]
    if _PALLAS_IMPL is not None and n >= _PALLAS_MIN_TOKENS:
        return _PALLAS_IMPL(q, k, v, scale)
    return xla_attention(q, k, v, scale)


def try_enable_pallas() -> bool:
    """Attempt to register the Pallas flash kernel (TPU backend only)."""
    try:
        if jax.default_backend() != "tpu":
            return False
        from localdiffusion_tpu.ops.pallas_attention import flash_attention

        register_pallas_impl(flash_attention)
        return True
    except Exception:
        return False
