"""Exact space-to-depth layout execution of the full-resolution UNet stage.

Motivation (docs/PERFORMANCE.md): the faithful reference architecture keeps
C=32 tensors at full resolution (reference ddpm.py:286-451 with dim=32 at
224-256px, test.py:108), which maps terribly onto 128-lane TPU hardware —
profiled at 25% of device time in XLA conv-layout copies, 24% in GroupNorm
statistics at ≤25% lane occupancy, MFU 0.4%.  The `stem_space_to_depth`
variant fixes the geometry but changes the architecture (needs retraining).

This module instead runs the SAME trained network with the full-resolution
stage computed in a space-to-depth ("s2d") layout: every [B, H, W, C] tensor
of the first down stage and last up stage is held as [B, H/f, W/f, f²·C]
(phase-major channel order: index = phase·C + c, phase = a·f + b for pixel
offset (a, b) inside the f×f block), and each op is replaced by its exact
algebraic equivalent in that layout:

  * conv K×K, pad K//2  → conv P×P over the s2d tensor with a kernel
    constructed from the original weights: output phase a at block I needs
    input pixel f·I + a + (k − pad) = f·(I + p) + q, so original tap k
    contributes to s2d tap p, input phase q iff a + k − pad = f·p + q.
    The s2d kernel is 1/f² dense → f²× the FLOPs, but C·f² channels run at
    full lane occupancy (measured 7.5× more efficient per FLOP at
    C=128/128px vs C=32/256px — scripts/bench_quant.py) and no layout
    copies remain.
  * GroupNorm(G) over C → GroupNorm over f²·C pooling each group's channels
    across all phases (identical statistics: same pixel set).  FiLM
    scale/shift and conv biases broadcast per phase.
  * RMSNorm / 1×1 convs / attention qkv → per-phase matmuls on
    [B, H/f, W/f, f², C] (free reshape in phase-major order).
  * linear & full attention → token order becomes (block, phase) instead of
    raster; both are permutation-invariant over tokens (linear attention
    reduces k/v over all tokens; full attention is tokenwise softmax), so
    results are unchanged.
  * the reference Downsample (space-to-depth + 1×1, ddpm.py:120-124) applied
    to an s2d tensor is just a channel permutation of its 1×1 kernel — the
    stage exits to the untouched interior stages at zero cost.
  * nearest ×f Upsample + conv K×K (ddpm.py:114-118) fuses into one conv
    from the low-res tensor straight into the s2d layout.

Everything here consumes the ORIGINAL UNet param tree (models/unet.py) —
checkpoints are interchangeable; outputs match bit-close (float
reassociation only).  Enable via `ModelConfig.exact_layout_s2d = 2`.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from localdiffusion_tpu.config import ModelConfig
from localdiffusion_tpu.models.blocks import (
    Attention,
    Downsample,
    LinearAttention,
    ResnetBlock,
    TimeMlp,
    Upsample,
    _fallback_watch_size,
    warn_fused_fallback,
)
from localdiffusion_tpu.ops.attention import full_attention

Dtype = Any


# ---------------------------------------------------------------------------
# layout primitives (phase-major: channel index = (a·f + b)·C + c)
# ---------------------------------------------------------------------------
def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    b, hb, wb, cc = x.shape
    c = cc // (f * f)
    x = x.reshape(b, hb, wb, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb * f, wb * f, c)


def tile_phase(v: jnp.ndarray, f: int) -> jnp.ndarray:
    """Per-original-channel vector [.., C] → per-s2d-channel [.., f²·C]."""
    return jnp.tile(v, (f * f,) if v.ndim == 1 else (1, f * f))


def _phase_map(k_size: int, pad: int, f: int) -> np.ndarray:
    """M[p_idx, q, k, a] = 1 iff a + (k − pad) == f·(p_idx − p_pad) + q.

    Returns (M, p_pad): the tap/phase routing tensor for one spatial axis.
    """
    o_min, o_max = -pad, (f - 1) + (k_size - 1) - pad
    p_min = o_min // f  # floor division (negative-safe)
    p_max = o_max // f
    P = p_max - p_min + 1
    p_pad = -p_min
    M = np.zeros((P, f, k_size, f), dtype=np.float32)
    for a in range(f):
        for k in range(k_size):
            o = a + k - pad
            p, q = o // f, o % f
            M[p + p_pad, q, k, a] = 1.0
    return M, p_pad


def s2d_conv_kernel(W: jnp.ndarray, f: int, cin_sizes: Optional[Sequence[int]] = None):
    """Original conv kernel [K, K, Cin, Cout] (pad K//2) → s2d kernel
    [P, P, f²·Cin, f²·Cout] (pad p_pad), phase-major on both sides.

    cin_sizes: when the s2d input is a channel-concat of independently
    phase-major segments (skip connections), pass the per-segment original
    channel counts; the kernel rows are built per segment and concatenated.
    """
    K = W.shape[0]
    M_np, p_pad = _phase_map(K, K // 2, f)
    M = jnp.asarray(M_np)
    sizes = list(cin_sizes) if cin_sizes is not None else [W.shape[2]]
    assert sum(sizes) == W.shape[2], (sizes, W.shape)
    parts = []
    off = 0
    for cs in sizes:
        Wseg = W[:, :, off : off + cs, :]
        off += cs
        t = jnp.einsum("iqka,jrlb,klcd->ijqrcabd", M, M, Wseg)
        P = t.shape[0]
        parts.append(t.reshape(P, P, f * f * cs, f * f * W.shape[3]))
    return jnp.concatenate(parts, axis=2), p_pad


def s2d_upsample_kernel(W: jnp.ndarray, f: int):
    """Kernel for (nearest ×f upsample → conv K×K) fused into one conv from
    the low-res tensor [B, Hb, Wb, Cin] to the s2d layout [.., f²·Cout].

    Output pixel f·I + a reads upsampled pixel f·I + a + (k − pad), which is
    source block ⌊(a + k − pad)/f⌋ — the phase q collapses (nearest repeats).
    """
    K = W.shape[0]
    M_np, p_pad = _phase_map(K, K // 2, f)
    M2 = jnp.asarray(M_np.sum(axis=1))  # [P, K, f]
    t = jnp.einsum("ika,jlb,klcd->ijcabd", M2, M2, W)
    P = t.shape[0]
    return t.reshape(P, P, W.shape[2], f * f * W.shape[3]), p_pad


def _conv(x, kernel, pad):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def s2d_conv(x, conv_params, f, cin_sizes=None, dtype=jnp.float32):
    kern, p_pad = s2d_conv_kernel(conv_params["kernel"], f, cin_sizes)
    y = _conv(x.astype(dtype), kern.astype(dtype), p_pad)
    if "bias" in conv_params:
        y = y + tile_phase(conv_params["bias"], f).astype(dtype)
    return y


def s2d_matmul_1x1(x, conv_params, f, cin_sizes=None, dtype=jnp.float32):
    """1×1 conv as per-phase matmul (no f²× block-diagonal waste)."""
    b, h, w, cc = x.shape
    ff = f * f
    W = conv_params["kernel"][0, 0].astype(dtype)  # [Cin, Cout]
    sizes = list(cin_sizes) if cin_sizes is not None else [cc // ff]
    out = None
    x_off, w_off = 0, 0
    for cs in sizes:
        seg = x[..., x_off : x_off + ff * cs].reshape(b, h, w, ff, cs)
        contrib = jnp.einsum("bhwpc,cd->bhwpd", seg.astype(dtype), W[w_off : w_off + cs])
        out = contrib if out is None else out + contrib
        x_off += ff * cs
        w_off += cs
    if "bias" in conv_params:
        out = out + conv_params["bias"].astype(dtype)
    return out.reshape(b, h, w, ff * W.shape[1])


# ---------------------------------------------------------------------------
# op equivalents
# ---------------------------------------------------------------------------
def gn_film_silu_s2d(x, gamma, beta, scale, shift, groups, f, eps=1e-5):
    """GroupNorm(G over original C) + FiLM + SiLU on a phase-major s2d tensor.

    Statistics pool over (H/f, W/f, f² phases, C/G group channels) — the
    identical pixel set as GroupNorm on the full-res tensor.  Channel-sum
    formulation (one pass over x) like ops/pallas_groupnorm.xla_fast.
    """
    b, h, w, cc = x.shape
    ff = f * f
    c = cc // ff
    cg = c // groups
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2))  # [B, ff·C]
    ss = jnp.sum(xf * xf, axis=(1, 2))
    gs = jnp.sum(s.reshape(b, ff, groups, cg), axis=(1, 3))  # [B, G]
    gss = jnp.sum(ss.reshape(b, ff, groups, cg), axis=(1, 3))
    n = jnp.float32(h * w * ff * cg)
    mean = gs / n
    var = jnp.maximum(gss / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)  # [B, G]
    # per-group → per-s2d-channel (phase-major: tile after channel repeat)
    mean_c = jnp.tile(jnp.repeat(mean, cg, axis=1), (1, ff))  # [B, ff·C]
    inv_c = jnp.tile(jnp.repeat(inv, cg, axis=1), (1, ff))
    g_c = tile_phase(gamma.astype(jnp.float32), f)
    b_c = tile_phase(beta.astype(jnp.float32), f)
    a_c = inv_c * g_c[None, :]
    y = (xf - mean_c[:, None, None, :]) * a_c[:, None, None, :] + b_c
    if scale is not None:
        sc = tile_phase(scale.astype(jnp.float32), f)
        sh = tile_phase(shift.astype(jnp.float32), f)
        y = y * (sc[:, None, None, :] + 1.0) + sh[:, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def gn_act_s2d(x, gamma, beta, groups, f, eps, act=None):
    """Plain GroupNorm (+ optional activation) on a phase-major s2d tensor
    — same statistics pooling as gn_film_silu_s2d, flax nn.GroupNorm
    convention (eps 1e-6 default there; pass explicitly for parity)."""
    b, h, w, cc = x.shape
    ff = f * f
    c = cc // ff
    cg = c // groups
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2))
    ss = jnp.sum(xf * xf, axis=(1, 2))
    gs = jnp.sum(s.reshape(b, ff, groups, cg), axis=(1, 3))
    gss = jnp.sum(ss.reshape(b, ff, groups, cg), axis=(1, 3))
    n = jnp.float32(h * w * ff * cg)
    mean = gs / n
    var = jnp.maximum(gss / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.tile(jnp.repeat(mean, cg, axis=1), (1, ff))
    inv_c = jnp.tile(jnp.repeat(inv, cg, axis=1), (1, ff))
    g_c = tile_phase(gamma.astype(jnp.float32), f)
    b_c = tile_phase(beta.astype(jnp.float32), f)
    a_c = inv_c * g_c[None, :]
    y = (xf - mean_c[:, None, None, :]) * a_c[:, None, None, :] + b_c
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def phase_max_collapse(x, f):
    """2×2 max-pool (stride 2) of the underlying full-res tensor, given its
    phase-major s2d representation: the pool window IS the phase block, so
    pooling = max over the phase axis → a normal-layout half-res tensor."""
    b, h, w, cc = x.shape
    ff = f * f
    return jnp.max(x.reshape(b, h, w, ff, cc // ff), axis=3)


def _cond_groups(group_num: int, channels: int) -> int:
    g = min(group_num, channels)
    while channels % g != 0:
        g -= 1
    return max(g, 1)


def basic_block_s2d(x, p, mid_dim, out_dim, group_num, f, dtype, in_dim):
    """CondEncoder BasicBlock (models/cond_encoder.py:33-69) on a phase-major
    s2d tensor.  flax nn.GroupNorm eps (1e-6) reproduced."""
    eps = 1e-6
    h = s2d_conv(x, p["conv1"], f, None, dtype)
    h = gn_act_s2d(
        h, p["gn1"]["scale"], p["gn1"]["bias"],
        _cond_groups(group_num, mid_dim), f, eps, act="relu",
    )
    h = s2d_conv(h, p["conv2"], f, None, dtype)
    h = gn_act_s2d(
        h, p["gn2"]["scale"], p["gn2"]["bias"],
        _cond_groups(group_num, out_dim), f, eps,
    )
    if in_dim != out_dim:
        idn = s2d_conv(x, p["id_conv"], f, None, dtype)
        idn = gn_act_s2d(
            idn, p["id_gn"]["scale"], p["id_gn"]["bias"],
            _cond_groups(group_num, out_dim), f, eps,
        )
    else:
        idn = x
    return jnp.maximum(h + idn, 0.0).astype(h.dtype)


def encode_cond_s2d(cond_params, num_blocks, base_dim, group_num, cond, dtype, f=2):
    """CondEncoder (models/cond_encoder.py:76-103) with narrow-channel blocks
    executed in s2d layout.

    Blocks whose output channels underfill the 128-lane VPU/MXU (C·f² ≤ 128)
    run s2d; the inter-block 2×2 maxpool collapses the phase axis for free
    (phase_max_collapse), handing the next block a normal-layout tensor.
    Wide blocks run the original flax module.  Same params, same outputs.
    """
    from localdiffusion_tpu.models.cond_encoder import BasicBlock

    b = base_dim
    outs = [b] + [b * (2**k) for k in range(1, num_blocks)]
    mids = [b] + outs[:-1]
    x = cond.astype(dtype)
    in_s2d = False
    for i in range(num_blocks):
        p = cond_params[f"block{i + 1}"]
        in_dim = x.shape[-1] // (f * f) if in_s2d else x.shape[-1]
        if i > 0:
            if in_s2d:
                x = phase_max_collapse(x, f)  # pool == phase collapse
                in_s2d = False
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        fold = (
            outs[i] < 128  # narrow block: C_out underfills the 128 lanes
            and x.shape[1] % f == 0
            and x.shape[2] % f == 0
            and x.shape[1] // f >= 8
        )
        if fold:
            x = space_to_depth(x, f)
            x = basic_block_s2d(x, p, mids[i], outs[i], group_num, f, dtype, in_dim)
            in_s2d = True
        else:
            x = BasicBlock(mids[i], outs[i], group_num, dtype).apply(
                {"params": p}, x
            )
            in_s2d = False
    if in_s2d:
        x = depth_to_space(x, f)
    return x


def rmsnorm_s2d(x5, g, dtype):
    """RMSNorm over the original channel axis of [B, H, W, f², C]."""
    c = x5.shape[-1]
    x32 = x5.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    normed = x32 / jnp.maximum(norm, 1e-12)
    return (normed * g * math.sqrt(c)).astype(dtype)


_FUSED_BLOCK = None  # tri-state like _FUSED_LINATT


def _fused_resnet_block():
    """Fused Pallas ResnetBlock (ops/pallas_resnet_block.py) on the TPU
    backend; LOCALDIFF_FUSED_BLOCK=0 disables, =interpret forces the
    interpreter (CPU parity tests)."""
    global _FUSED_BLOCK
    if _FUSED_BLOCK is None:
        import os

        mode = os.environ.get("LOCALDIFF_FUSED_BLOCK", "1")
        try:
            if mode == "0":
                _FUSED_BLOCK = False
            elif mode == "1" and (
                jax.default_backend() == "tpu" and jax.device_count() > 1
            ):
                # see _fused_linear_attention: kernels don't GSPMD-shard
                _FUSED_BLOCK = False
            elif mode in ("interpret", "force") or jax.default_backend() == "tpu":
                from localdiffusion_tpu.ops.pallas_resnet_block import (
                    resnet_block_s2d_fused,
                    supports,
                )

                _FUSED_BLOCK = (
                    resnet_block_s2d_fused, supports, mode == "interpret"
                )
            else:
                _FUSED_BLOCK = False
        except Exception:
            _FUSED_BLOCK = False
    return _FUSED_BLOCK


def resnet_block_s2d(x, t_emb, p, dim_out, groups, f, dtype, cin_sizes):
    """ResnetBlock (models/blocks.py:170-195) on a phase-major s2d tensor."""
    scale_shift = (None, None)
    if t_emb is not None and "mlp" in p:
        ht = nn.silu(t_emb)
        ht = ht @ p["mlp"]["kernel"].astype(dtype) + p["mlp"]["bias"].astype(dtype)
        scale_shift = tuple(jnp.split(ht, 2, axis=-1))

    fused = _fused_resnet_block()
    if fused and dtype == jnp.bfloat16:
        if fused[1](x.shape, dim_out, groups, f):
            fn, _, interpret = fused
            ss = None
            if scale_shift[0] is not None:
                ss = (scale_shift[0].astype(jnp.float32),
                      scale_shift[1].astype(jnp.float32))
            return fn(
                x.astype(jnp.bfloat16), p, ss, dim_out, groups, f,
                tuple(cin_sizes) if cin_sizes is not None else None, interpret,
            )
        if x.shape[1] * x.shape[2] * f * f >= _fallback_watch_size():
            warn_fused_fallback(
                "resnet_block", x.shape, f"s2d dim_out={dim_out} f={f}"
            )
    h = s2d_conv(x, p["block1"]["proj"], f, cin_sizes, dtype)
    h = gn_film_silu_s2d(
        h,
        p["block1"]["norm"]["scale"],
        p["block1"]["norm"]["bias"],
        scale_shift[0],
        scale_shift[1],
        groups,
        f,
    ).astype(dtype)
    h = s2d_conv(h, p["block2"]["proj"], f, None, dtype)
    h = gn_film_silu_s2d(
        h,
        p["block2"]["norm"]["scale"],
        p["block2"]["norm"]["bias"],
        None,
        None,
        groups,
        f,
    ).astype(dtype)
    if "res_conv" in p:
        x = s2d_matmul_1x1(x, p["res_conv"], f, cin_sizes, dtype)
    return h + x


_FUSED_LINATT = None  # tri-state: None = probe, False = unavailable


def _fused_linear_attention():
    """Fused Pallas linear attention (ops/pallas_linear_attention.py) on the
    TPU backend; LOCALDIFF_FUSED_LINATT=0 disables, =interpret forces the
    interpreter (CPU parity tests)."""
    global _FUSED_LINATT
    if _FUSED_LINATT is None:
        import os

        mode = os.environ.get("LOCALDIFF_FUSED_LINATT", "1")
        try:
            if mode == "0":
                _FUSED_LINATT = False
            elif mode == "1" and (
                jax.default_backend() == "tpu" and jax.device_count() > 1
            ):
                # pallas_call is not GSPMD-partitionable: on a multi-chip
                # mesh the XLA path shards transparently, the kernel would
                # not.  mode=force opts in (e.g. shard_map integration).
                _FUSED_LINATT = False
            elif mode in ("interpret", "force") or jax.default_backend() == "tpu":
                from localdiffusion_tpu.ops.pallas_linear_attention import (
                    linear_attention_s2d_fused,
                    supports,
                )

                _FUSED_LINATT = (
                    linear_attention_s2d_fused, supports, mode == "interpret"
                )
            else:
                _FUSED_LINATT = False
        except Exception:
            _FUSED_LINATT = False
    return _FUSED_LINATT


def _attention_s2d(x, p, heads, dim_head, f, dtype, full: bool,
                   add_residual: bool = False):
    """Linear or full attention (blocks.py:230-291) in s2d layout.

    Tokens enumerate (block, phase) pairs instead of raster order; both
    attention forms are permutation-invariant over tokens, so the result
    equals the full-res computation.

    add_residual=True fuses the caller's `+ x`; the fused Pallas path
    (one third of chain device time as three XLA softmax passes over a
    402 MB qkv tensor — docs/PERFORMANCE.md round-3 attribution) handles
    the residual in its final tile write.
    """
    b, h, w, cc = x.shape
    fused = _fused_linear_attention()
    if not full and fused and dtype == jnp.bfloat16:
        if fused[1](x.shape, heads, dim_head, f * f):
            fn, _, interpret = fused
            return fn(
                x.astype(jnp.bfloat16),
                p["norm"]["g"],
                p["to_qkv"]["kernel"][0, 0],
                p["to_out"]["kernel"][0, 0],
                p["to_out"]["bias"],
                p["out_norm"]["g"],
                heads, dim_head, f, add_residual, interpret,
            )
        if h * w * f * f >= _fallback_watch_size():
            warn_fused_fallback(
                "linear_attention", x.shape,
                f"s2d heads={heads} dim_head={dim_head} f={f}",
            )
    ff = f * f
    c = cc // ff
    n = h * w * ff
    hidden = heads * dim_head

    x5 = x.reshape(b, h, w, ff, c)
    xn = rmsnorm_s2d(x5, p["norm"]["g"], dtype)
    Wqkv = p["to_qkv"]["kernel"][0, 0].astype(dtype)  # [C, 3·hidden]
    qkv = jnp.einsum("bhwpc,cd->bhwpd", xn, Wqkv)

    if full:
        qkv = qkv.reshape(b, n, 3, heads, dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = full_attention(q, k, v)  # [b, n, H, d]
    else:
        # spatial-major like blocks.LinearAttention: no [b, n, 3, H, d]
        # token flatten (profiled as the dominant layout-copy source)
        qkv = qkv.reshape(b, h, w, ff, 3, heads, dim_head)
        q = qkv[..., 0, :, :]  # [b, h, w, ff, H, d]
        k = qkv[..., 1, :, :]
        v = qkv[..., 2, :, :]
        scale = dim_head**-0.5
        q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(dtype) * scale
        k = jax.nn.softmax(k.astype(jnp.float32), axis=(1, 2, 3)).astype(dtype)
        context = jnp.einsum("bhwpqd,bhwpqe->bqde", k, v)
        out = jnp.einsum("bqde,bhwpqd->bhwpqe", context, q)

    out = out.reshape(b, h, w, ff, hidden)
    Wout = p["to_out"]["kernel"][0, 0].astype(dtype)
    out = jnp.einsum("bhwpd,de->bhwpe", out, Wout) + p["to_out"]["bias"].astype(dtype)
    if not full:  # LinearAttention has an output RMSNorm
        out = rmsnorm_s2d(out, p["out_norm"]["g"], dtype)
    out = out.reshape(b, h, w, ff * c)
    return out + x if add_residual else out


def downsample_from_s2d(x, conv_params, f, dtype):
    """Reference Downsample (s2d ×2 + 1×1 conv, c-major channel order) applied
    to a tensor ALREADY in phase-major s2d layout: a kernel-row permutation
    followed by the 1×1 conv.  Output is a normal-layout low-res tensor.
    """
    assert f == 2, "Downsample is a fixed ×2 space-to-depth"
    b, h, w, cc = x.shape
    c = cc // 4
    K = conv_params["kernel"][0, 0]  # [4·C, dout], input index c·4 + phase
    dout = K.shape[1]
    Kp = K.reshape(c, 4, dout).transpose(1, 0, 2).reshape(4 * c, dout)
    y = jnp.einsum("bhwc,cd->bhwd", x.astype(dtype), Kp.astype(dtype))
    return y + conv_params["bias"].astype(dtype)


def upsample_to_s2d(x, conv_params, f, dtype):
    """Reference Upsample (nearest ×2 + conv3×3) emitting directly into the
    phase-major s2d layout (one fused conv, no full-res tensor)."""
    kern, p_pad = s2d_upsample_kernel(conv_params["kernel"], f)
    y = _conv(x.astype(dtype), kern.astype(dtype), p_pad)
    return y + tile_phase(conv_params["bias"], f).astype(dtype)


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------
def apply_unet_s2d(
    variables,
    cfg: ModelConfig,
    x: jnp.ndarray,
    cond: Optional[jnp.ndarray],
    time: jnp.ndarray,
    cond_feat: Optional[jnp.ndarray] = None,
    x_self_cond: Optional[jnp.ndarray] = None,
    dtype: Dtype = jnp.float32,
    factor: Optional[int] = None,
    s2d_stages: Optional[int] = None,
) -> jnp.ndarray:
    """UNet.apply (models/unet.py) with the leading resolution level(s)
    executed in s2d layout (`exact_layout_s2d_stages` levels; level 0
    always).  Consumes the unmodified UNet param tree; unfolded interior
    stages run the original flax modules on their param subtrees.
    """
    p = variables["params"]
    f = factor if factor is not None else cfg.resolve_exact_layout_s2d(
        x.shape[1], x.shape[2]
    )
    n_fold = (
        s2d_stages if s2d_stages is not None else cfg.resolve_s2d_stages()
    )
    assert f > 1 and cfg.stem_space_to_depth == 1, (
        "exact_layout_s2d applies to the faithful (stem_space_to_depth=1) arch"
    )
    dim = cfg.dim
    init_dim = cfg.resolved_init_dim
    dims = [init_dim] + [dim * m for m in cfg.dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    num_stages = len(in_out)
    assert num_stages >= 2, "exact_layout_s2d needs ≥2 stages"
    n_fold = max(1, min(n_fold, num_stages - 1))
    groups = cfg.resnet_block_groups
    factor = cfg.downsample_factor * f
    assert x.shape[1] % factor == 0 and x.shape[2] % factor == 0, (
        f"input dims {x.shape[1:3]} must be divisible by {factor}"
    )

    x = x.astype(dtype)
    if cfg.self_condition:
        if x_self_cond is None:
            x_self_cond = jnp.zeros_like(x)
        x = jnp.concatenate([x_self_cond.astype(dtype), x], axis=-1)

    with jax.named_scope("s2d_init_conv"):
        x = space_to_depth(x, f)
        x = s2d_conv(x, p["init_conv"], f, None, dtype)  # 7×7 → 5×5 s2d (f=2)
    r = x

    t = TimeMlp(
        dim,
        dim * 4,
        cfg.time_emb_theta,
        dtype,
        learned_sinusoidal_cond=cfg.learned_sinusoidal_cond,
        random_fourier_features=cfg.random_fourier_features,
        learned_sinusoidal_dim=cfg.learned_sinusoidal_dim,
    ).apply({"params": p["time_mlp"]}, time)

    def attn_mod(full: bool):
        ctor = Attention if full else LinearAttention
        return ctor(cfg.attn_heads, cfg.attn_dim_head, dtype)

    # ---- stage 0 (full res, s2d layout) ----
    dim0_in, dim0_out = in_out[0]
    with jax.named_scope("s2d_down0"):
        x = resnet_block_s2d(x, t, p["down0_block1"], dim0_in, groups, f, dtype, None)
        skip_a = x
        x = resnet_block_s2d(x, t, p["down0_block2"], dim0_in, groups, f, dtype, None)
        x = _attention_s2d(
            x, p["down0_attn"], cfg.attn_heads, cfg.attn_dim_head, f, dtype,
            full=cfg.full_attn[0], add_residual=True,
        )
        skip_b = x
        x = downsample_from_s2d(x, p["down0_down"]["conv"], f, dtype)

    # ---- interior down stages ----
    # levels 1..n_fold-1 also execute in s2d layout (exact_layout_s2d_stages):
    # their C·f² channels still fit the 128 TPU lanes, so the same
    # kernel-transform math applies one level down.  Boundaries between a
    # folded and an unfolded level cross via a single s2d/d2s copy of a
    # half/quarter-res tensor (~µs — unlike the per-conv layout copies the
    # fold removes).  Skips of folded levels stay phase-major; the up path
    # concatenates them segment-wise via cin_sizes.
    skips: List[jnp.ndarray] = []
    for i in range(1, num_stages):
        dim_in, dim_out = in_out[i]
        is_last = i >= num_stages - 1
        folded = i < n_fold
        with jax.named_scope(f"int_down{i}"):
            if folded:
                x = space_to_depth(x, f)
                x = resnet_block_s2d(
                    x, t, p[f"down{i}_block1"], dim_in, groups, f, dtype, None
                )
                skips.append(x)
                x = resnet_block_s2d(
                    x, t, p[f"down{i}_block2"], dim_in, groups, f, dtype, None
                )
                x = _attention_s2d(
                    x, p[f"down{i}_attn"], cfg.attn_heads, cfg.attn_dim_head,
                    f, dtype, full=cfg.full_attn[i], add_residual=True,
                )
                skips.append(x)
                # n_fold ≤ num_stages-1 ⇒ a folded stage is never the last
                x = downsample_from_s2d(x, p[f"down{i}_down"]["conv"], f, dtype)
                continue
            x = ResnetBlock(dim_in, groups, dtype=dtype).apply(
                {"params": p[f"down{i}_block1"]}, x, t
            )
            skips.append(x)
            x = ResnetBlock(dim_in, groups, dtype=dtype).apply(
                {"params": p[f"down{i}_block2"]}, x, t
            )
            x = attn_mod(cfg.full_attn[i]).apply({"params": p[f"down{i}_attn"]}, x) + x
            skips.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype).apply({"params": p[f"down{i}_down"]}, x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=dtype).apply(
                    {"params": p[f"down{i}_down"]}, x
                )

    # ---- mid + bottleneck condition fusion ----
    mid_dim = dims[-1]
    with jax.named_scope("mid"):
        x = ResnetBlock(mid_dim, groups, dtype=dtype).apply({"params": p["mid_block1"]}, x, t)
        x = attn_mod(True).apply({"params": p["mid_attn"]}, x) + x
        x = ResnetBlock(mid_dim, groups, dtype=dtype).apply({"params": p["mid_block2"]}, x, t)
    if cond_feat is None:
        with jax.named_scope("cond_encoder"):
            cond_feat = encode_cond_s2d(
                p["cond_model"],
                cfg.cond_num_blocks,
                cfg.cond_base_dim,
                cfg.cond_group_num,
                cond,
                dtype,
                f=f,
            )
    with jax.named_scope("mid_fusion"):
        x = jnp.concatenate([x, cond_feat.astype(dtype)], axis=-1)
        x = ResnetBlock(mid_dim, groups, dtype=dtype).apply({"params": p["conv_fusion"]}, x, t)

    # ---- interior up stages ----
    rev = list(reversed(in_out))
    for j in range(num_stages - 1):
        dim_in, dim_out = rev[j]
        L = num_stages - 1 - j  # resolution level of this iteration's blocks
        folded = L < n_fold
        with jax.named_scope(f"int_up{j}"):
            if folded:
                # x entered via upsample_to_s2d (per-phase channels dim_out);
                # the popped skips are stage-L down skips kept phase-major
                # (per-phase channels dim_in)
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = resnet_block_s2d(
                    x, t, p[f"up{j}_block1"], dim_out, groups, f, dtype,
                    [dim_out, dim_in],
                )
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = resnet_block_s2d(
                    x, t, p[f"up{j}_block2"], dim_out, groups, f, dtype,
                    [dim_out, dim_in],
                )
                x = _attention_s2d(
                    x, p[f"up{j}_attn"], cfg.attn_heads, cfg.attn_dim_head,
                    f, dtype, full=cfg.full_attn[L], add_residual=True,
                )
            else:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResnetBlock(dim_out, groups, dtype=dtype).apply(
                    {"params": p[f"up{j}_block1"]}, x, t
                )
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResnetBlock(dim_out, groups, dtype=dtype).apply(
                    {"params": p[f"up{j}_block2"]}, x, t
                )
                x = attn_mod(cfg.full_attn[L]).apply({"params": p[f"up{j}_attn"]}, x) + x
            # exit toward level L-1: fuse nearest-×f + conv3×3 into one conv
            # straight into the target's s2d layout when the target is folded
            # (level 0 always is); a folded source first collapses its own
            # phase axis (one cheap half-res copy)
            if (L - 1) < n_fold:
                if folded:
                    x = depth_to_space(x, f)
                x = upsample_to_s2d(x, p[f"up{j}_up"]["conv"], f, dtype)
            else:
                x = Upsample(dim_in, dtype).apply({"params": p[f"up{j}_up"]}, x)

    # ---- last up stage (full res, s2d layout) ----
    j = num_stages - 1
    dim_in, dim_out = rev[j]  # == in_out[0]
    up_in_c = dims[1]  # channels delivered by the j-1 Upsample
    with jax.named_scope("s2d_up_last"):
        x = jnp.concatenate([x, skip_b], axis=-1)
        x = resnet_block_s2d(
            x, t, p[f"up{j}_block1"], dim_out, groups, f, dtype, [up_in_c, dim0_in]
        )
        x = jnp.concatenate([x, skip_a], axis=-1)
        x = resnet_block_s2d(
            x, t, p[f"up{j}_block2"], dim_out, groups, f, dtype, [dim_out, dim0_in]
        )
        x = _attention_s2d(
            x, p[f"up{j}_attn"], cfg.attn_heads, cfg.attn_dim_head, f, dtype,
            full=cfg.full_attn[0], add_residual=True,
        )
        x = s2d_conv(x, p[f"up{j}_up"], f, None, dtype)  # is_last: plain conv3×3

    # ---- final ---- (two scopes so profiles attribute the fused final
    # ResnetBlock separately from the f32 output projection + d2s)
    with jax.named_scope("s2d_final_res"):
        x = jnp.concatenate([x, r], axis=-1)
        x = resnet_block_s2d(
            x, t, p["final_res_block"], dim, groups, f, dtype, [dim_in, init_dim]
        )
    with jax.named_scope("s2d_final_conv"):
        out = s2d_matmul_1x1(
            x.astype(jnp.float32), p["final_conv"], f, None, jnp.float32
        )
        return depth_to_space(out, f)
