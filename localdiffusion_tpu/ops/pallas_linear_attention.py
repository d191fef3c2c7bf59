"""Pallas TPU fused linear attention for the s2d (phase-major) layout.

Why: profiling the 256px exact-s2d branched chain (docs/PERFORMANCE.md,
round-3 attribution) showed the stage-0 `_attention_s2d` path is ~one third
of total device time: the per-phase qkv einsum materializes a 402 MB
[B, H, W, ff, 3, heads, d] tensor and the k-softmax / q-softmax / context
einsums make repeated passes over it (~2 GB of HBM traffic per call against
a ~100 MB information need).

This kernel computes the identical math (reference ddpm.py:214-251, s2d
equivalent in models/unet_s2d.py:_attention_s2d) in two streaming passes
over x, never materializing q/k/v in HBM:

  pass 1 (kv):  per row-tile — RMSNorm → k,v projections → online-softmax
                accumulation of the per-(head,d) k statistics (running max
                m, exp-sum l) and the transposed context Σ softmax(k)ᵀ·v,
                all VMEM-resident.
  (tiny XLA):   ctxᵀ / l, cross-head mask, cast bf16.   [B, 128, 128]
  pass 2 (q):   per row-tile — RMSNorm → q projection → q softmax →
                out = q·ctx → output projection → out RMSNorm → +x
                (residual fused), write the tile.

Mosaic-safety notes (hard-won, see CLAUDE.md):
  * NO lane-crossing reshapes: tokens stay rows, channels stay the 128
    lanes.  Per-phase / per-head structure is handled with block-diagonal
    weight embeddings (built on host) and a 32-block 0/1 mask matmul for
    intra-group sums (same trick as ops/pallas_groupnorm.py).
  * q softmax over d within a head uses a full-row max as the stability
    shift (any per-token constant is exact for softmax) + the block-mask
    matmul for the per-head denominator — no 32-lane-group reductions.
  * the context is accumulated TRANSPOSED (ctxᵀ[e, d]) so the online
    rescale factor (per d) broadcasts along rows, not columns.

Restrictions (dispatcher falls back to the XLA path otherwise):
C == dim_head == 32, heads == 4, f == 2  →  ff·C == heads·d == 128 lanes.
Gradients: custom_vjp recomputes through the XLA reference.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_NEG = -1e30


# ---------------------------------------------------------------------------
# XLA reference (the exact _attention_s2d math, self-contained) — used for
# parity tests and as the recompute backward.
# ---------------------------------------------------------------------------
def linear_attention_s2d_reference(
    x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head, f, add_residual=True
):
    b, h, w, cc = x.shape
    ff = f * f
    c = cc // ff
    hidden = heads * dim_head
    dtype = x.dtype

    def rms(x5, g):
        x32 = x5.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
        normed = x32 / jnp.maximum(norm, 1e-12)
        return (normed * g * math.sqrt(x5.shape[-1])).astype(dtype)

    x5 = x.reshape(b, h, w, ff, c)
    xn = rms(x5, g_in)
    qkv = jnp.einsum("bhwpc,cd->bhwpd", xn, w_qkv.astype(dtype))
    qkv = qkv.reshape(b, h, w, ff, 3, heads, dim_head)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    scale = dim_head**-0.5
    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(dtype) * scale
    k = jax.nn.softmax(k.astype(jnp.float32), axis=(1, 2, 3)).astype(dtype)
    context = jnp.einsum("bhwpqd,bhwpqe->bqde", k, v)
    out = jnp.einsum("bqde,bhwpqd->bhwpqe", context, q)
    out = out.reshape(b, h, w, ff, hidden)
    out = jnp.einsum("bhwpd,de->bhwpe", out, w_out.astype(dtype))
    out = out + b_out.astype(dtype)
    out = rms(out, g_out).reshape(b, h, w, ff * c)
    return out + x if add_residual else out


# ---------------------------------------------------------------------------
# host-side constants
# ---------------------------------------------------------------------------
def _block_mask32() -> jnp.ndarray:
    """[128, 128] 0/1 mask: 1 iff same 32-wide block (phase / head group)."""
    idx = jnp.arange(LANES) // 32
    return (idx[:, None] == idx[None, :]).astype(jnp.float32)


def _embed_bd(wseg: jnp.ndarray, ff: int) -> jnp.ndarray:
    """Block-diagonal embedding: [c, m] per-phase weight → [ff·c, ff·m]."""
    return jax.scipy.linalg.block_diag(*([wseg] * ff))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _rms_in(x_ref, mblk_ref, gt_ref):
    xf = x_ref[0].astype(jnp.float32)  # [T, 128]
    sq = xf * xf
    s_ph = jax.lax.dot(sq, mblk_ref[...], preferred_element_type=jnp.float32)
    xn = xf * (gt_ref[...] / jnp.maximum(jnp.sqrt(s_ph), 1e-12))
    return xf, xn.astype(jnp.bfloat16)


def _kv_kernel(x_ref, wk_ref, wv_ref, mblk_ref, gt_ref,
               l_ref, ctxt_ref, m_scr):
    t = pl.program_id(1)
    _, xb = _rms_in(x_ref, mblk_ref, gt_ref)
    k = jax.lax.dot(xb, wk_ref[...], preferred_element_type=jnp.float32)
    k = k.astype(jnp.bfloat16).astype(jnp.float32)  # match einsum rounding
    v = jax.lax.dot(xb, wv_ref[...], preferred_element_type=jnp.float32)
    v = v.astype(jnp.bfloat16)  # [T, 4·128]

    # tile max per (head, d) lane, folded over the 4 phase column-blocks
    m_tile = jnp.full((1, LANES), _NEG, jnp.float32)
    for p in range(4):
        kp = k[:, p * LANES : (p + 1) * LANES]
        m_tile = jnp.maximum(m_tile, jnp.max(kp, axis=0, keepdims=True))

    @pl.when(t == 0)
    def _():
        m_scr[0:1] = m_tile

    @pl.when(t > 0)
    def _():
        m_scr[0:1] = jnp.maximum(m_scr[0:1], m_tile)

    m_new = m_scr[0:1]  # [1, 128]

    l_tile = jnp.zeros((1, LANES), jnp.float32)
    ctx_tile = jnp.zeros((LANES, LANES), jnp.float32)  # ctxᵀ[e, d]
    for p in range(4):
        kp = k[:, p * LANES : (p + 1) * LANES]
        vp = v[:, p * LANES : (p + 1) * LANES]
        e = jnp.exp(kp - m_new)  # [T, 128]
        l_tile = l_tile + jnp.sum(e, axis=0, keepdims=True)
        # ctxᵀ[e, d] += Σ_t v[t, e]·expk[t, d]   (contract rows)
        ctx_tile = ctx_tile + jax.lax.dot_general(
            vp, e.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # online rescale: previous accumulations used the old running max.
    # m_scr already holds m_new; reconstruct the factor from the old max
    # via a second scratch row carrying it.
    @pl.when(t == 0)
    def _():
        l_ref[0] = l_tile
        ctxt_ref[0] = ctx_tile

    @pl.when(t > 0)
    def _():
        fct = jnp.exp(m_scr[1:2] - m_new)  # [1, 128] old max − new max
        l_ref[0] = l_ref[0] * fct + l_tile
        ctxt_ref[0] = ctxt_ref[0] * fct + ctx_tile  # per-d = per-lane ✓

    m_scr[1:2] = m_new  # stash current max for the next tile's rescale


def _q_kernel(x_ref, wq_ref, wout_ref, mblk_ref, gt_ref, gout_ref, bout_ref,
              ctxn_ref, out_ref, *, scale: float, add_residual: bool):
    xf, xb = _rms_in(x_ref, mblk_ref, gt_ref)
    q = jax.lax.dot(xb, wq_ref[...], preferred_element_type=jnp.float32)
    q = q.astype(jnp.bfloat16).astype(jnp.float32)  # [T, 4·128]
    mblk = mblk_ref[...]
    ctxn = ctxn_ref[0]  # ctxᵀ[e, d] bf16

    out_acc = jnp.zeros((x_ref.shape[1], LANES), jnp.float32)
    for p in range(4):
        qp = q[:, p * LANES : (p + 1) * LANES]
        # stability shift: full-row max (any per-token constant is exact)
        rmax = jnp.max(qp, axis=1, keepdims=True)  # [T, 1]
        e = jnp.exp(qp - rmax)
        den = jax.lax.dot(e, mblk, preferred_element_type=jnp.float32)
        qs = (e / den).astype(jnp.bfloat16) * jnp.bfloat16(scale)
        # out[t, e] = Σ_d qs[t, d]·ctxᵀ[e, d]   (contract lanes with lanes)
        op = jax.lax.dot_general(
            qs, ctxn,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        out_acc = out_acc + jax.lax.dot(
            op, wout_ref[p], preferred_element_type=jnp.float32
        )
    out_acc = out_acc + bout_ref[...]

    # output RMSNorm over each 32-lane phase group (+ fused residual)
    ob = out_acc.astype(jnp.bfloat16).astype(jnp.float32)
    sq = ob * ob
    s_ph = jax.lax.dot(sq, mblk, preferred_element_type=jnp.float32)
    on = ob * (gout_ref[...] / jnp.maximum(jnp.sqrt(s_ph), 1e-12))
    y = on + xf if add_residual else on
    out_ref[0] = y.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------
def supports(x_shape: Tuple[int, ...], heads: int, dim_head: int, f: int) -> bool:
    b, h, w, cc = x_shape
    return (
        f == 2
        and heads == 4
        and dim_head == 32
        and cc == 128
        and cc // (f * f) == 32
        and (h * w) % 8 == 0
    )


def _row_tile(hw: int) -> int:
    for cand in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if hw % cand == 0:
            return cand
    return hw


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10)
)
def linear_attention_s2d_fused(
    x, g_in, w_qkv, w_out, b_out, g_out,
    heads=4, dim_head=32, f=2, add_residual=True, interpret=False,
):
    """Fused s2d linear attention (+ residual).  x: [B, H, W, ff·C] bf16
    phase-major; params are the unmodified LinearAttention tree leaves:
    g_in=norm.g [C], w_qkv=to_qkv.kernel[0,0] [C, 3·hidden],
    w_out=to_out.kernel[0,0] [hidden, C], b_out [C], g_out=out_norm.g [C].
    """
    return _forward(
        x, g_in, w_qkv, w_out, b_out, g_out,
        heads, dim_head, f, add_residual, interpret,
    )


def _forward(x, g_in, w_qkv, w_out, b_out, g_out,
             heads, dim_head, f, add_residual, interpret):
    assert supports(x.shape, heads, dim_head, f), (x.shape, heads, dim_head, f)
    b, h, w, cc = x.shape
    ff = f * f
    c = cc // ff
    hidden = heads * dim_head
    hw = h * w
    T = _row_tile(hw)
    nt = hw // T
    scale = dim_head**-0.5

    wq = _embed_bd(w_qkv[:, 0 * hidden : 1 * hidden], ff).astype(jnp.bfloat16)
    wk = _embed_bd(w_qkv[:, 1 * hidden : 2 * hidden], ff).astype(jnp.bfloat16)
    wv = _embed_bd(w_qkv[:, 2 * hidden : 3 * hidden], ff).astype(jnp.bfloat16)
    # wout_emb[p]: [hidden, 128] with w_out placed at columns 32p..32p+32
    wout_emb = jnp.zeros((ff, hidden, LANES), jnp.bfloat16)
    for p in range(ff):
        wout_emb = wout_emb.at[p, :, p * c : (p + 1) * c].set(
            w_out.astype(jnp.bfloat16)
        )
    mblk = _block_mask32()
    g_t = jnp.tile(g_in.astype(jnp.float32), ff)[None, :] * math.sqrt(c)
    gout_t = jnp.tile(g_out.astype(jnp.float32), ff)[None, :] * math.sqrt(c)
    bout_t = jnp.tile(b_out.astype(jnp.float32), ff)[None, :]

    xr = x.reshape(b, hw, cc)
    row_spec = pl.BlockSpec((1, T, cc), lambda i, t: (i, t, 0))
    full = lambda shape: pl.BlockSpec(shape, lambda i, t: tuple(0 for _ in shape))

    l, ctxt = pl.pallas_call(
        _kv_kernel,
        grid=(b, nt),
        in_specs=[
            row_spec,
            full((cc, ff * hidden)),
            full((cc, ff * hidden)),
            full((LANES, LANES)),
            full((1, LANES)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, LANES), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, LANES, LANES), lambda i, t: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, LANES, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32)],
        interpret=interpret,
    )(xr, wk, wv, mblk, g_t)

    # softmax(k) denominator + cross-head mask (ctxᵀ[e, d]: divide per d
    # lane, zero (e, d) pairs from different heads), cast for the q matmul
    ctxn = (ctxt / l).astype(jnp.bfloat16) * mblk.astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_q_kernel, scale=scale, add_residual=add_residual),
        grid=(b, nt),
        in_specs=[
            row_spec,
            full((cc, ff * hidden)),
            full((ff, hidden, LANES)),
            full((LANES, LANES)),
            full((1, LANES)),
            full((1, LANES)),
            full((1, LANES)),
            pl.BlockSpec((1, LANES, LANES), lambda i, t: (i, 0, 0)),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, hw, cc), x.dtype),
        interpret=interpret,
    )(xr, wq, wout_emb, mblk, g_t, gout_t, bout_t, ctxn)
    return out.reshape(b, h, w, cc)


def _fwd(x, g_in, w_qkv, w_out, b_out, g_out,
         heads, dim_head, f, add_residual, interpret):
    out = _forward(x, g_in, w_qkv, w_out, b_out, g_out,
                   heads, dim_head, f, add_residual, interpret)
    return out, (x, g_in, w_qkv, w_out, b_out, g_out)


def _bwd(heads, dim_head, f, add_residual, interpret, res, grad):
    x, g_in, w_qkv, w_out, b_out, g_out = res
    _, vjp = jax.vjp(
        lambda *a: linear_attention_s2d_reference(
            *a, heads, dim_head, f, add_residual
        ),
        x, g_in, w_qkv, w_out, b_out, g_out,
    )
    return vjp(grad)


linear_attention_s2d_fused.defvjp(_fwd, _bwd)
