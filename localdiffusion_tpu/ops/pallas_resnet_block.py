"""Pallas TPU fused ResnetBlock: conv3×3 + GroupNorm + FiLM + SiLU ×2
+ residual in three streaming passes.

Two public entries share the same three-pass kernel pipeline:

  * `resnet_block_s2d_fused` — phase-major s2d tensors ([B, H/2, W/2, 4C],
    dim_out=32), the exact-layout stage-0 path (models/unet_s2d.py).
  * `resnet_block_wfold_fused` — NORMAL-layout [B, H, W, C] tensors with
    dim_out ∈ {32, 64, 128}: folds r = 128/dim_out adjacent W pixels into
    the lane axis (lane = p·C + c — a FREE reshape, unlike the 2×2 s2d
    transpose) and runs the identical pipeline.  This is the round-4
    kernel for the level-1 stages of the 256px exact-s2d chain
    (int_down1 C=32@128², int_up2 C=64@128² — 22% of device time as XLA
    GN `convert_reduce` fusions, docs/PERFORMANCE.md round-3) and any
    other normal-layout ResnetBlock whose dim_out divides 128.

    Why the tap structure survives the fold: for a K=3 / pad-1 conv and
    any fold factor r, output phase a at folded column X reads original
    column r·X + a + (l − 1) = r·(X + p) + q with p ∈ {−1, 0, 1} — the
    folded kernel is always 3×3 with pad 1 (1/r dense in W → r× FLOPs,
    but C·r lanes run at full occupancy and every GN/FiLM/SiLU pass rides
    the conv's VMEM residency).

After the fused linear attention landed, the re-profiled 256px exact-s2d
chain (docs/PERFORMANCE.md round-3) spends its folded-stage time in the
ResnetBlock lowering: each block is 8+ XLA passes over the [2B, H/2, W/2,
4C] tensor (conv write, GN stats read, GN apply read+write, ×2, residual
matmul + add) ≈ 500 MB of HBM traffic — and the GN statistic reduces run
at ~85 GB/s.  The convolutions themselves are fine (94 TF/s inside the
scan), so the win is structural: compute the GN statistics WHILE the conv
output is still in VMEM and apply the normalize+FiLM+SiLU epilogue on the
next conv's input read.

  pass 1:  x  → conv1 (9-tap shifted matmuls, f32 accum) → h1 (bf16)
           + per-lane sum/sumsq of h1 accumulated across row tiles
  (XLA)    group-fold stats → per-(b, lane) affine A1/B1 (GN ⊕ FiLM)
  pass 2:  h1 → silu(h1·A1+B1) on the tile (incl. halo rows) → conv2
           → h2 (bf16) + sum/sumsq of h2
  (XLA)    A2/B2
  pass 3:  h2, x → silu(h2·A2+B2) + residual (identity or the per-phase
           1×1 res_conv as a block-embedded matmul) → out

Total ≈ 235 MB vs ≈ 500 MB, and every reduction rides the conv pass.

Halo handling without manual DMA: x is viewed as [B, nT, Th, W, C] and the
kernel receives three blocks — the tile plus single-row halo blocks from
the neighbouring tiles (clamped index maps; edge rows zeroed in-kernel).
The W halo is assembled into a zero-padded VMEM scratch.  Conv kernels
arrive already s2d-transformed ([3, 3, Cin, Cout·ff] from
models/unet_s2d.s2d_conv_kernel), so segments/skip-concats need no
in-kernel logic.

Same restrictions as the attention kernel (32-channel groups, f=2, bf16);
gradients via custom_vjp recompute through the XLA reference.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# ---------------------------------------------------------------------------
# conv + stats kernel (used for pass 1 and, with the input affine, pass 2)
# ---------------------------------------------------------------------------
def _conv_stats_kernel(
    xm_ref, xu_ref, xd_ref, w_ref, bias_ref, a_ref, b_ref,
    h_ref, s_ref, ss_ref, xbuf,
    *, th: int, wdim: int, cin: int, apply_in_affine: bool,
):
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    # --- assemble the zero-padded [Th+2, W+2, Cin] input tile -------------
    xbuf[:, 0, :] = jnp.zeros((th + 2, cin), xbuf.dtype)
    xbuf[:, wdim + 1, :] = jnp.zeros((th + 2, cin), xbuf.dtype)
    mid = xm_ref[0, 0].astype(jnp.float32)  # [Th, W, Cin]
    up = xu_ref[0, 0].astype(jnp.float32)  # [1, W, Cin]
    dn = xd_ref[0, 0].astype(jnp.float32)
    if apply_in_affine:
        a = a_ref[0].astype(jnp.float32)  # [1, LANES] → broadcasts
        b = b_ref[0].astype(jnp.float32)

        def ep(v):
            y = v * a + b
            return (y * jax.nn.sigmoid(y)).astype(xbuf.dtype)
    else:
        def ep(v):
            return v.astype(xbuf.dtype)

    xbuf[1 : th + 1, 1 : wdim + 1, :] = ep(mid)
    zrow = jnp.zeros((1, wdim, cin), xbuf.dtype)
    xbuf[0:1, 1 : wdim + 1, :] = jnp.where(t > 0, ep(up), zrow)
    xbuf[th + 1 : th + 2, 1 : wdim + 1, :] = jnp.where(t < nt - 1, ep(dn), zrow)

    # --- 9-tap shifted matmuls, f32 accumulation --------------------------
    acc = jnp.zeros((th * wdim, LANES), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            src = xbuf[ky : ky + th, kx : kx + wdim, :].reshape(
                th * wdim, cin
            )
            acc = acc + jax.lax.dot(
                src, w_ref[ky, kx], preferred_element_type=jnp.float32
            )
    h = (acc + bias_ref[0:1]).astype(jnp.bfloat16)
    h_ref[0, 0] = h.reshape(th, wdim, LANES)

    # --- GN statistics from the rounded output (parity with the XLA path) -
    hf = h.astype(jnp.float32)
    s_t = jnp.sum(hf, axis=0, keepdims=True)
    ss_t = jnp.sum(hf * hf, axis=0, keepdims=True)

    @pl.when(t == 0)
    def _():
        s_ref[0] = s_t
        ss_ref[0] = ss_t

    @pl.when(t > 0)
    def _():
        s_ref[0] = s_ref[0] + s_t
        ss_ref[0] = ss_ref[0] + ss_t


def _epilogue_kernel(h_ref, x_ref, a_ref, b_ref, wres_ref, bres_ref, out_ref,
                     *, has_res_conv: bool):
    hf = h_ref[0].astype(jnp.float32)  # [T, LANES]
    y = hf * a_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    xf = x_ref[0]
    if has_res_conv:
        res = (
            jax.lax.dot(xf, wres_ref[...], preferred_element_type=jnp.float32)
            + bres_ref[0:1]
        ).astype(jnp.bfloat16).astype(jnp.float32)
    else:
        res = xf.astype(jnp.float32)
    out_ref[0] = (y.astype(jnp.bfloat16).astype(jnp.float32) + res).astype(
        out_ref.dtype
    )


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------
def _row_tile(h: int) -> int:
    for cand in (16, 8, 4, 2, 1):  # 16 keeps VMEM < ~8 MB at Cin=256
        if h % cand == 0:
            return cand
    return h


def _gn_affine(s, ss, gamma, beta, scale, shift, groups, n, ff, c, eps=1e-5):
    """Per-lane sum/sumsq [B, LANES] → fused GN⊕FiLM affine A, B [B, LANES].

    Matches models/unet_s2d.gn_film_silu_s2d: statistics pool over phases
    and group channels; lane = p·C + c, group = c // (C/groups).
    """
    bsz = s.shape[0]
    cg = c // groups
    gs = jnp.sum(s.reshape(bsz, ff, groups, cg), axis=(1, 3))
    gss = jnp.sum(ss.reshape(bsz, ff, groups, cg), axis=(1, 3))
    mean = gs / n
    var = jnp.maximum(gss / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.tile(jnp.repeat(mean, cg, axis=1), (1, ff))
    inv_c = jnp.tile(jnp.repeat(inv, cg, axis=1), (1, ff))
    g_c = jnp.tile(gamma.astype(jnp.float32), ff)[None, :]
    b_c = jnp.tile(beta.astype(jnp.float32), ff)[None, :]
    a = inv_c * g_c
    b = b_c - mean_c * a
    if scale is not None:
        sc = jnp.tile(scale.astype(jnp.float32), (1, ff)) + 1.0
        sh = jnp.tile(shift.astype(jnp.float32), (1, ff))
        a = a * sc
        b = b * sc + sh
    return a, b


def _res_conv_bd(w, bias, ff, cin_sizes, c):
    """Per-phase 1×1 res_conv (s2d_matmul_1x1 semantics) as one [Cin_s2d,
    ff·C] block matrix + bias tiled per phase."""
    cout = w.shape[1]
    total = sum(cin_sizes) * ff
    bd = jnp.zeros((total, ff * cout), jnp.bfloat16)
    x_off, w_off = 0, 0
    for cs in cin_sizes:
        seg = w[w_off : w_off + cs].astype(jnp.bfloat16)
        for p in range(ff):
            bd = bd.at[
                x_off + p * cs : x_off + (p + 1) * cs,
                p * cout : (p + 1) * cout,
            ].set(seg)
        x_off += ff * cs
        w_off += cs
    return bd, jnp.tile(bias.astype(jnp.float32), ff)[None, :]


def supports(x_shape, dim_out: int, groups: int, f: int) -> bool:
    b, h, w, cc = x_shape
    return (
        f == 2
        and dim_out == 32
        and cc in (128, 256)
        and (dim_out * f * f) == LANES
        and h >= 2
        and w >= 8
        and (h * w) % 8 == 0
    )


def supports_normal(x_shape, dim_out: int, groups: int) -> bool:
    """W-fold entry: normal-layout [B, H, W, C], r = 128/dim_out W pixels
    folded into lanes."""
    b, h, w, cin = x_shape
    if dim_out not in (32, 64, 128):
        return False
    r = LANES // dim_out
    return (
        dim_out % groups == 0
        and w % r == 0
        and (w // r) >= 8
        and h >= 2
        and r * cin <= 512  # VMEM guard (xbuf + two conv kernels)
        and (h * (w // r)) % 8 == 0
    )


def wfold_conv_kernel(W: jnp.ndarray, r: int) -> jnp.ndarray:
    """Original conv kernel [3, 3, Cin, Cout] (pad 1) → W-fold kernel
    [3, 3, r·Cin, r·Cout] (pad 1) for tensors with r adjacent W pixels
    folded into the lane axis (lane = p·C + c).  H taps are untouched."""
    from localdiffusion_tpu.models.unet_s2d import _phase_map

    K = W.shape[0]
    M_np, p_pad = _phase_map(K, K // 2, r)
    assert M_np.shape[0] == 3 and p_pad == 1, (K, r)  # K=3 ⇒ P=3 for any r
    M = jnp.asarray(M_np)  # [j, q, l, a]
    t = jnp.einsum("jqla,klcd->kjqcad", M, W)
    return t.reshape(K, 3, r * W.shape[2], r * W.shape[3])


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def resnet_block_s2d_fused(
    x, params, scale_shift,
    dim_out, groups, f, cin_sizes, interpret=False,
):
    """Fused s2d ResnetBlock.  x: [B, H, W, Cin_s2d] bf16 phase-major;
    params is the unmodified ResnetBlock subtree (block1/block2 proj+norm,
    optional res_conv); scale_shift = (scale, shift) [B, dim_out] or None.
    Consumes the same already-s2d-transformed conv kernels as
    models/unet_s2d.resnet_block_s2d via s2d_conv_kernel.
    """
    return _forward(x, params, scale_shift, dim_out, groups, f, cin_sizes,
                    interpret)


def _conv_stats_call(x, wk, bias_t, a, b, *, apply_in_affine, interpret):
    bsz, h, wdim, cin = x.shape
    th = _row_tile(h)
    nt = h // th
    xv = x.reshape(bsz, nt, th, wdim, cin)

    def clamp(i, lo, hi):
        return jnp.clip(i, lo, hi)

    mid_spec = pl.BlockSpec(
        (1, 1, th, wdim, cin), lambda i, t: (i, t, 0, 0, 0)
    )
    up_spec = pl.BlockSpec(
        (1, 1, 1, wdim, cin),
        lambda i, t: (i, clamp(t - 1, 0, nt - 1), th - 1, 0, 0),
    )
    dn_spec = pl.BlockSpec(
        (1, 1, 1, wdim, cin),
        lambda i, t: (i, clamp(t + 1, 0, nt - 1), 0, 0, 0),
    )
    # affines ride as [B, 1, LANES]: a (1, LANES) block over a [B, LANES]
    # array violates Mosaic's 8-row minimum; a leading 1-sized block dim
    # with last-two dims equal to the array's is always legal
    vec_spec = pl.BlockSpec((1, 1, LANES), lambda i, t: (i, 0, 0))

    kern = functools.partial(
        _conv_stats_kernel, th=th, wdim=wdim, cin=cin,
        apply_in_affine=apply_in_affine,
    )
    h_out, s, ss = pl.pallas_call(
        kern,
        grid=(bsz, nt),
        in_specs=[
            mid_spec, up_spec, dn_spec,
            pl.BlockSpec((3, 3, cin, LANES), lambda i, t: (0, 0, 0, 0)),
            pl.BlockSpec((1, LANES), lambda i, t: (0, 0)),
            vec_spec, vec_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, th, wdim, LANES), lambda i, t: (i, t, 0, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda i, t: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nt, th, wdim, LANES), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, 1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 2, wdim + 2, cin), jnp.bfloat16)
        ],
        interpret=interpret,
    )(xv, xv, xv, wk, bias_t, a[:, None, :], b[:, None, :])
    return h_out.reshape(bsz, h, wdim, LANES), s[:, 0], ss[:, 0]


def _three_pass(xb, params, scale_shift, w1, w2, wres, bres, has_res,
                groups, ff, dim_out, out_dtype, interpret):
    """Shared pipeline: xb is the folded [B, H', W', cin_lanes] bf16 view
    (phase-major lanes), w1/w2 are the already-transformed conv kernels
    producing LANES output lanes (ff phases × dim_out channels)."""
    bsz, h, wdim, cin = xb.shape
    n = jnp.float32(h * wdim * ff * (dim_out // groups))

    b1 = jnp.tile(
        params["block1"]["proj"]["bias"].astype(jnp.float32), ff
    )[None, :]
    b2 = jnp.tile(
        params["block2"]["proj"]["bias"].astype(jnp.float32), ff
    )[None, :]
    zero_vec = jnp.zeros((bsz, LANES), jnp.float32)
    one_vec = jnp.ones((bsz, LANES), jnp.float32)

    # pass 1: conv1 + stats
    h1, s1, ss1 = _conv_stats_call(
        xb, w1.astype(jnp.bfloat16), b1, one_vec, zero_vec,
        apply_in_affine=False, interpret=interpret,
    )
    sc, sh = scale_shift if scale_shift is not None else (None, None)
    a1, bb1 = _gn_affine(
        s1, ss1, params["block1"]["norm"]["scale"],
        params["block1"]["norm"]["bias"], sc, sh, groups, n, ff, dim_out,
    )

    # pass 2: affine+silu on read → conv2 + stats
    h2, s2, ss2 = _conv_stats_call(
        h1, w2.astype(jnp.bfloat16), b2, a1, bb1,
        apply_in_affine=True, interpret=interpret,
    )
    a2, bb2 = _gn_affine(
        s2, ss2, params["block2"]["norm"]["scale"],
        params["block2"]["norm"]["bias"], None, None, groups, n, ff, dim_out,
    )

    # pass 3: GN2 affine + SiLU + residual
    hw = h * wdim
    t3 = 2048
    while hw % t3:
        t3 //= 2
    nt3 = hw // t3
    row = pl.BlockSpec((1, t3, LANES), lambda i, t: (i, t, 0))
    rowx = pl.BlockSpec((1, t3, cin), lambda i, t: (i, t, 0))
    vec = pl.BlockSpec((1, 1, LANES), lambda i, t: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_epilogue_kernel, has_res_conv=has_res),
        grid=(bsz, nt3),
        in_specs=[
            row, rowx, vec, vec,
            pl.BlockSpec((cin, LANES), lambda i, t: (0, 0)),
            pl.BlockSpec((1, LANES), lambda i, t: (0, 0)),
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((bsz, hw, LANES), out_dtype),
        interpret=interpret,
    )(h2.reshape(bsz, hw, LANES), xb.reshape(bsz, hw, cin),
      a2[:, None, :], bb2[:, None, :], wres, bres)
    return out.reshape(bsz, h, wdim, LANES)


def _forward(x, params, scale_shift, dim_out, groups, f, cin_sizes,
             interpret):
    from localdiffusion_tpu.models.unet_s2d import s2d_conv_kernel

    assert supports(x.shape, dim_out, groups, f), (x.shape, dim_out, f)
    bsz, h, wdim, cin = x.shape
    ff = f * f
    xb = x.astype(jnp.bfloat16)

    w1, _ = s2d_conv_kernel(params["block1"]["proj"]["kernel"], f, cin_sizes)
    w2, _ = s2d_conv_kernel(params["block2"]["proj"]["kernel"], f, None)
    has_res = "res_conv" in params
    if has_res:
        wres, bres = _res_conv_bd(
            params["res_conv"]["kernel"][0, 0], params["res_conv"]["bias"],
            ff, list(cin_sizes) if cin_sizes is not None else [cin // ff],
            dim_out,
        )
    else:
        wres = jnp.zeros((cin, LANES), jnp.bfloat16)
        bres = jnp.zeros((1, LANES), jnp.float32)
    return _three_pass(
        xb, params, scale_shift, w1, w2, wres, bres, has_res,
        groups, ff, dim_out, x.dtype, interpret,
    )


def _forward_wfold(x, params, scale_shift, dim_out, groups, interpret):
    assert supports_normal(x.shape, dim_out, groups), (x.shape, dim_out)
    bsz, h, w, cin_orig = x.shape
    r = LANES // dim_out
    wdim = w // r
    xb = x.astype(jnp.bfloat16).reshape(bsz, h, wdim, r * cin_orig)

    w1 = wfold_conv_kernel(params["block1"]["proj"]["kernel"], r)
    w2 = wfold_conv_kernel(params["block2"]["proj"]["kernel"], r)
    has_res = "res_conv" in params
    if has_res:
        wres, bres = _res_conv_bd(
            params["res_conv"]["kernel"][0, 0], params["res_conv"]["bias"],
            r, [cin_orig], dim_out,
        )
    else:
        wres = jnp.zeros((r * cin_orig, LANES), jnp.bfloat16)
        bres = jnp.zeros((1, LANES), jnp.float32)
    out = _three_pass(
        xb, params, scale_shift, w1, w2, wres, bres, has_res,
        groups, r, dim_out, x.dtype, interpret,
    )
    return out.reshape(bsz, h, w, dim_out)


def _reference(x, params, scale_shift, dim_out, groups, f, cin_sizes):
    """XLA reference = the existing exact-layout block (for vjp/parity)."""
    from localdiffusion_tpu.models import unet_s2d as U

    h = U.s2d_conv(x, params["block1"]["proj"], f, cin_sizes, jnp.bfloat16)
    sc, sh = scale_shift if scale_shift is not None else (None, None)
    h = U.gn_film_silu_s2d(
        h, params["block1"]["norm"]["scale"], params["block1"]["norm"]["bias"],
        sc, sh, groups, f,
    ).astype(jnp.bfloat16)
    h = U.s2d_conv(h, params["block2"]["proj"], f, None, jnp.bfloat16)
    h = U.gn_film_silu_s2d(
        h, params["block2"]["norm"]["scale"], params["block2"]["norm"]["bias"],
        None, None, groups, f,
    ).astype(jnp.bfloat16)
    if "res_conv" in params:
        xr = U.s2d_matmul_1x1(x, params["res_conv"], f, cin_sizes, jnp.bfloat16)
    else:
        xr = x
    return (h + xr).astype(x.dtype)


def _fwd(x, params, scale_shift, dim_out, groups, f, cin_sizes, interpret):
    out = _forward(x, params, scale_shift, dim_out, groups, f, cin_sizes,
                   interpret)
    return out, (x, params, scale_shift)


def _bwd(dim_out, groups, f, cin_sizes, interpret, res, grad):
    x, params, scale_shift = res
    if scale_shift is None:
        _, vjp = jax.vjp(
            lambda xx, pp: _reference(xx, pp, None, dim_out, groups, f,
                                      cin_sizes),
            x, params,
        )
        dx, dp = vjp(grad)
        return dx, dp, None
    _, vjp = jax.vjp(
        lambda xx, pp, ss: _reference(xx, pp, ss, dim_out, groups, f,
                                      cin_sizes),
        x, params, scale_shift,
    )
    return vjp(grad)


resnet_block_s2d_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# normal-layout W-fold entry
# ---------------------------------------------------------------------------
def _reference_normal(x, params, scale_shift, dim_out, groups):
    """XLA reference for the normal-layout block (= the flax ResnetBlock
    math, models/blocks.py:170-195): the s2d reference at f=1 degenerates
    to the plain conv/GN/FiLM/SiLU chain."""
    return _reference(x, params, scale_shift, dim_out, groups, 1, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def resnet_block_wfold_fused(
    x, params, scale_shift, dim_out, groups, interpret=False
):
    """Fused normal-layout ResnetBlock.  x: [B, H, W, Cin] bf16; params is
    the unmodified flax ResnetBlock subtree (block1/block2 proj+norm,
    optional res_conv); scale_shift = (scale, shift) [B, dim_out] or None.
    Folds r = 128/dim_out adjacent W pixels into lanes (free reshape) and
    runs the same three-pass pipeline as the s2d entry."""
    return _forward_wfold(x, params, scale_shift, dim_out, groups, interpret)


def _fwd_wfold(x, params, scale_shift, dim_out, groups, interpret):
    out = _forward_wfold(x, params, scale_shift, dim_out, groups, interpret)
    return out, (x, params, scale_shift)


def _bwd_wfold(dim_out, groups, interpret, res, grad):
    x, params, scale_shift = res
    if scale_shift is None:
        _, vjp = jax.vjp(
            lambda xx, pp: _reference_normal(xx, pp, None, dim_out, groups),
            x, params,
        )
        dx, dp = vjp(grad)
        return dx, dp, None
    _, vjp = jax.vjp(
        lambda xx, pp, ss: _reference_normal(xx, pp, ss, dim_out, groups),
        x, params, scale_shift,
    )
    return vjp(grad)


resnet_block_wfold_fused.defvjp(_fwd_wfold, _bwd_wfold)
