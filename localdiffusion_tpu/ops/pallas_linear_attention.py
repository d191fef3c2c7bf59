"""Pallas TPU fused linear attention (streaming, never materializes qkv).

Why: profiling the 256px exact-s2d branched chain (docs/PERFORMANCE.md,
round-3 attribution) showed the stage-0 `_attention_s2d` path is ~one third
of total device time: the per-phase qkv einsum materializes a 402 MB
[B, H, W, ff, 3, heads, d] tensor and the k-softmax / q-softmax / context
einsums make repeated passes over it (~2 GB of HBM traffic per call against
a ~100 MB information need).

This kernel computes the identical math (reference ddpm.py:214-251) in two
streaming passes over x, never materializing q/k/v in HBM:

  pass 1 (kv):  per row-tile — RMSNorm → k projection → online-softmax
                accumulation of the per-(head,d) k statistics (running max
                m, exp-sum l) and the per-phase Gram Gₚ = Σ xnᵀ·exp(k)
                ([nph·128, 128]), all VMEM-resident.  The v PROJECTION IS
                NEVER COMPUTED: v = xn·Wv is linear, so
                ctxᵀ = Σₚ Wvᵀ·(Gₚ rows of phase p) — Wv is applied ONCE
                per call in XLA instead of once per token (round-4 lean
                rewrite: −4T of the 31T MXU row units).
  (tiny XLA):   ctxᵀ = Σₚ Wvᵀ·Aₚ, /l, cross-head mask, cast bf16, then
                W̃ₚ = ctxnᵀ-contracted output projection
                (W̃ₚ[d, c] = Σₑ ctxn[e, d]·Wout_emb[p][e, c]) — the q·ctx
                and out-projection matmuls fused into ONE data-dependent
                weight per phase (−4T more).
  pass 2 (q):   per row-tile — RMSNorm → q projection → q softmax →
                out = qs·W̃ₚ → out RMSNorm → (+x) (optional fused
                residual), write the tile.

Token folding: the kernel consumes [B, H, W', 128] rows whose 128 lanes
hold `nph` independent tokens of C = 128/nph channels each (C ∈ {32, 64,
128}).  Two callers produce that view for free:

  * the exact-s2d layout ([B, H/2, W/2, 4C] phase-major, nph = f² = 4) via
    `linear_attention_s2d_fused` — models/unet_s2d._attention_s2d;
  * the NORMAL layout ([B, H, W, C]) by folding r = 128/C adjacent row
    pixels into the channel axis via `linear_attention_fused` —
    models/blocks.LinearAttention.  Valid because both token reductions
    are position-order invariant (the same argument that makes the s2d
    layout exact).

Mosaic-safety notes (hard-won, see CLAUDE.md):
  * NO lane-crossing reshapes: tokens stay rows, channels stay the 128
    lanes.  Per-token-group / per-head structure is handled with
    block-diagonal weight embeddings (built on host) and block 0/1 mask
    matmuls for intra-group sums (same trick as ops/pallas_groupnorm.py).
  * q softmax over d within a head uses a full-row max as the stability
    shift (any per-token constant is exact for softmax) + the head-mask
    matmul for the per-head denominator — no 32-lane-group reductions.
  * the context is accumulated TRANSPOSED (ctxᵀ[e, d]) so the online
    rescale factor (per d) broadcasts along rows, not columns.

Restrictions (dispatchers fall back to XLA otherwise): heads == 4,
dim_head == 32, C·nph == 128, bf16.  Gradients: custom_vjp recompute
through the XLA reference.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_NEG = -1e30


# ---------------------------------------------------------------------------
# XLA reference (exact _attention_s2d / LinearAttention math on the folded
# view) — used for parity tests and as the recompute backward.
# ---------------------------------------------------------------------------
def linear_attention_folded_reference(
    x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head, nph,
    add_residual=True,
):
    b, h, w, cc = x.shape
    c = cc // nph
    hidden = heads * dim_head
    dtype = x.dtype

    def rms(x5, g):
        x32 = x5.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
        normed = x32 / jnp.maximum(norm, 1e-12)
        return (normed * g * math.sqrt(x5.shape[-1])).astype(dtype)

    x5 = x.reshape(b, h, w, nph, c)
    xn = rms(x5, g_in)
    qkv = jnp.einsum("bhwpc,cd->bhwpd", xn, w_qkv.astype(dtype))
    qkv = qkv.reshape(b, h, w, nph, 3, heads, dim_head)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    scale = dim_head**-0.5
    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(dtype) * scale
    k = jax.nn.softmax(k.astype(jnp.float32), axis=(1, 2, 3)).astype(dtype)
    context = jnp.einsum("bhwpqd,bhwpqe->bqde", k, v)
    out = jnp.einsum("bqde,bhwpqd->bhwpqe", context, q)
    out = out.reshape(b, h, w, nph, hidden)
    out = jnp.einsum("bhwpd,de->bhwpe", out, w_out.astype(dtype))
    out = out + b_out.astype(dtype)
    out = rms(out, g_out).reshape(b, h, w, cc)
    return out + x if add_residual else out


# kept under the original name for existing tests/callers (nph = f²)
def linear_attention_s2d_reference(
    x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head, f, add_residual=True
):
    return linear_attention_folded_reference(
        x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head, f * f,
        add_residual,
    )


# ---------------------------------------------------------------------------
# host-side constants
# ---------------------------------------------------------------------------
def _block_mask(block: int) -> jnp.ndarray:
    """[128, 128] 0/1 mask: 1 iff same `block`-wide lane group."""
    idx = jnp.arange(LANES) // block
    return (idx[:, None] == idx[None, :]).astype(jnp.float32)


def _embed_bd(wseg: jnp.ndarray, nph: int) -> jnp.ndarray:
    """Block-diagonal embedding: [c, m] per-token-group weight → [nph·c, nph·m]."""
    return jax.scipy.linalg.block_diag(*([wseg] * nph))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _rms_in(x_ref, mnorm_ref, gt_ref):
    xf = x_ref[0].astype(jnp.float32)  # [T, 128]
    # the group-sum mask matmul runs in bf16 (f32×f32 matmuls execute at a
    # fraction of the MXU's bf16 rate — round-5 finding): sq is exact in
    # bf16 up to 8-bit-mantissa rounding of each square, the f32
    # accumulation keeps the 32-term sum exact, and the ±0.2% norm error
    # is far inside the kernel's bf16 output rounding
    sq = (xf * xf).astype(jnp.bfloat16)
    s_g = jax.lax.dot(sq, mnorm_ref[...], preferred_element_type=jnp.float32)
    xn = xf * (gt_ref[...] / jnp.maximum(jnp.sqrt(s_g), 1e-12))
    return xf, xn.astype(jnp.bfloat16)


def _kv_kernel(x_ref, wk_ref, mnorm_ref, gt_ref,
               l_ref, gram_ref, m_scr, *, nph: int):
    t = pl.program_id(1)
    _, xb = _rms_in(x_ref, mnorm_ref, gt_ref)
    k = jax.lax.dot(xb, wk_ref[...], preferred_element_type=jnp.float32)
    k = k.astype(jnp.bfloat16).astype(jnp.float32)  # match einsum rounding

    # tile max per (head, d) lane, folded over the nph token-group blocks
    m_tile = jnp.full((1, LANES), _NEG, jnp.float32)
    for p in range(nph):
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
    g_rows = []
    for p in range(nph):
        kp = k[:, p * LANES : (p + 1) * LANES]
        e = jnp.exp(kp - m_new)  # [T, 128]
        l_tile = l_tile + jnp.sum(e, axis=0, keepdims=True)
        # Gₚ[c, d] += Σ_t xn[t, c]·expk[t, p, d]  (contract rows) — the v
        # projection folds out of the kernel: ctxᵀ = Σₚ Wvᵀ·Gₚ[pc:(p+1)c]
        g_rows.append(jax.lax.dot_general(
            xb, e.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    g_tile = g_rows[0] if nph == 1 else jnp.concatenate(g_rows, axis=0)

    @pl.when(t == 0)
    def _():
        l_ref[0] = l_tile
        gram_ref[0] = g_tile

    @pl.when(t > 0)
    def _():
        fct = jnp.exp(m_scr[1:2] - m_new)  # [1, 128] old max − new max
        l_ref[0] = l_ref[0] * fct + l_tile
        gram_ref[0] = gram_ref[0] * fct + g_tile  # per-d = per-lane ✓

    m_scr[1:2] = m_new  # stash current max for the next tile's rescale


def _q_kernel(x_ref, wq_ref, mnorm_ref, mhead_ref, gt_ref,
              gout_ref, bout_ref, wtil_ref, out_ref,
              *, scale: float, add_residual: bool, nph: int):
    xf, xb = _rms_in(x_ref, mnorm_ref, gt_ref)
    q = jax.lax.dot(xb, wq_ref[...], preferred_element_type=jnp.float32)
    q = q.astype(jnp.bfloat16).astype(jnp.float32)  # [T, nph·128]
    mhead = mhead_ref[...]

    out_acc = jnp.zeros((x_ref.shape[1], LANES), jnp.float32)
    for p in range(nph):
        qp = q[:, p * LANES : (p + 1) * LANES]
        # stability shift: full-row max (any per-token constant is exact)
        rmax = jnp.max(qp, axis=1, keepdims=True)  # [T, 1]
        e = jnp.exp(qp - rmax)
        # bf16 operands for the per-head denominator mask matmul (MXU
        # bf16-rate); division stays f32
        den = jax.lax.dot(e.astype(jnp.bfloat16), mhead,
                          preferred_element_type=jnp.float32)
        qs = (e / den).astype(jnp.bfloat16) * jnp.bfloat16(scale)
        # out[t, c] = Σ_d qs[t, d]·W̃ₚ[d, c] — q·ctx and the output
        # projection fused into one data-dependent weight (built per call
        # in XLA: W̃ₚ = Σ_e ctxn[e, d]·Wout_emb[p][e, c])
        out_acc = out_acc + jax.lax.dot(
            qs, wtil_ref[0, p], preferred_element_type=jnp.float32
        )
    out_acc = out_acc + bout_ref[...]

    # output RMSNorm over each C-lane token group (+ optional residual)
    ob = out_acc.astype(jnp.bfloat16).astype(jnp.float32)
    sq = (ob * ob).astype(jnp.bfloat16)
    s_g = jax.lax.dot(sq, mnorm_ref[...], preferred_element_type=jnp.float32)
    on = ob * (gout_ref[...] / jnp.maximum(jnp.sqrt(s_g), 1e-12))
    y = on + xf if add_residual else on
    out_ref[0] = y.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------
def supports(x_shape, heads: int, dim_head: int, nph: int) -> bool:
    b, h, w, cc = x_shape
    return (
        heads == 4
        and dim_head == 32
        and cc == LANES
        and nph in (1, 2, 4)
        and (h * w) % 8 == 0
    )


def _row_tile(hw: int) -> int:
    # Largest divisor wins: swept on-chip at the chain shape (hw=16384) —
    # T=2048 2.10 ms vs 1024 2.27 / 512 2.26 / 256 2.42 (per-program
    # overhead dominates below 2048; VMEM fits comfortably at all of them).
    # LOCALDIFF_LINATT_T overrides for sweeps (scripts/check_pallas_lowering).
    pref = int(os.environ.get("LOCALDIFF_LINATT_T", "0"))
    cands = ([pref] if pref > 0 else []) + [2048, 1024, 512, 256, 128,
                                            64, 32, 16, 8]
    for cand in cands:
        if hw % cand == 0:
            return cand
    return hw


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused_core(x, g_in, w_qkv, w_out, b_out, g_out,
                heads, dim_head, nph, add_residual, interpret):
    """x: [B, H, W', 128] bf16 with nph tokens of C = 128/nph channels per
    row; params are the unmodified LinearAttention tree leaves."""
    return _forward(x, g_in, w_qkv, w_out, b_out, g_out,
                    heads, dim_head, nph, add_residual, interpret)


def _forward(x, g_in, w_qkv, w_out, b_out, g_out,
             heads, dim_head, nph, add_residual, interpret):
    assert supports(x.shape, heads, dim_head, nph), (x.shape, heads, nph)
    b, h, w, cc = x.shape
    c = cc // nph
    hidden = heads * dim_head
    hw = h * w
    T = _row_tile(hw)
    nt = hw // T
    scale = dim_head**-0.5

    wq = _embed_bd(w_qkv[:, 0 * hidden : 1 * hidden], nph).astype(jnp.bfloat16)
    wk = _embed_bd(w_qkv[:, 1 * hidden : 2 * hidden], nph).astype(jnp.bfloat16)
    # wout_emb[p]: [hidden, 128] with w_out placed at columns p·c..(p+1)·c
    wout_emb = jnp.zeros((nph, hidden, LANES), jnp.bfloat16)
    for p in range(nph):
        wout_emb = wout_emb.at[p, :, p * c : (p + 1) * c].set(
            w_out.astype(jnp.bfloat16)
        )
    # 0/1 masks are exact in bf16; bf16 operands keep every in-kernel mask
    # matmul at the MXU's native bf16 rate (f32 matmuls run 4-8× slower)
    mnorm = _block_mask(c).astype(jnp.bfloat16)
    mhead = _block_mask(dim_head).astype(jnp.bfloat16)
    g_t = jnp.tile(g_in.astype(jnp.float32), nph)[None, :] * math.sqrt(c)
    gout_t = jnp.tile(g_out.astype(jnp.float32), nph)[None, :] * math.sqrt(c)
    bout_t = jnp.tile(b_out.astype(jnp.float32), nph)[None, :]

    xr = x.reshape(b, hw, cc)
    row_spec = pl.BlockSpec((1, T, cc), lambda i, t: (i, t, 0))
    full = lambda shape: pl.BlockSpec(shape, lambda i, t: tuple(0 for _ in shape))

    l, gram = pl.pallas_call(
        functools.partial(_kv_kernel, nph=nph),
        grid=(b, nt),
        in_specs=[
            row_spec,
            full((cc, nph * hidden)),
            full((LANES, LANES)),
            full((1, LANES)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, LANES), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, nph * cc, LANES), lambda i, t: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, nph * cc, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32)],
        interpret=interpret,
    )(xr, wk, mnorm, g_t)

    # apply the deferred v projection (ctxᵀ = Σₚ Wvᵀ·Gₚ[pc:(p+1)c]), the
    # softmax(k) denominator and the cross-head mask (ctxᵀ[e, d]: divide
    # per d lane, zero (e, d) pairs from different heads), then contract
    # the output projection in: W̃ₚ[d, c] = Σ_e ctxn[e, d]·Wout_emb[p][e, c]
    wv = w_qkv[:, 2 * hidden : 3 * hidden].astype(jnp.float32)  # [c, hidden]
    gblk = gram.reshape(b, nph, cc, LANES)
    ctxt = sum(
        jnp.einsum("ce,bcd->bed", wv, gblk[:, p, p * c : (p + 1) * c, :])
        for p in range(nph)
    )
    ctxn = (ctxt / l).astype(jnp.bfloat16) * mhead.astype(jnp.bfloat16)
    wtil = jnp.einsum(
        "bed,pec->bpdc", ctxn, wout_emb, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(
            _q_kernel, scale=scale, add_residual=add_residual, nph=nph
        ),
        grid=(b, nt),
        in_specs=[
            row_spec,
            full((cc, nph * hidden)),
            full((LANES, LANES)),
            full((LANES, LANES)),
            full((1, LANES)),
            full((1, LANES)),
            full((1, LANES)),
            pl.BlockSpec((1, nph, LANES, LANES), lambda i, t: (i, 0, 0, 0)),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, hw, cc), x.dtype),
        interpret=interpret,
    )(xr, wq, mnorm, mhead, g_t, gout_t, bout_t, wtil)
    return out.reshape(b, h, w, cc)


def _fwd(x, g_in, w_qkv, w_out, b_out, g_out,
         heads, dim_head, nph, add_residual, interpret):
    out = _forward(x, g_in, w_qkv, w_out, b_out, g_out,
                   heads, dim_head, nph, add_residual, interpret)
    return out, (x, g_in, w_qkv, w_out, b_out, g_out)


def _bwd(heads, dim_head, nph, add_residual, interpret, res, grad):
    x, g_in, w_qkv, w_out, b_out, g_out = res
    _, vjp = jax.vjp(
        lambda *a: linear_attention_folded_reference(
            *a, heads, dim_head, nph, add_residual
        ),
        x, g_in, w_qkv, w_out, b_out, g_out,
    )
    return vjp(grad)


_fused_core.defvjp(_fwd, _bwd)


def linear_attention_s2d_fused(
    x, g_in, w_qkv, w_out, b_out, g_out,
    heads=4, dim_head=32, f=2, add_residual=True, interpret=False,
):
    """Fused linear attention on a phase-major s2d tensor
    ([B, H/f, W/f, f²·C], models/unet_s2d._attention_s2d)."""
    return _fused_core(x, g_in, w_qkv, w_out, b_out, g_out,
                       heads, dim_head, f * f, add_residual, interpret)


def linear_attention_fused(
    x, g_in, w_qkv, w_out, b_out, g_out,
    heads=4, dim_head=32, add_residual=False, interpret=False,
):
    """Fused linear attention on a NORMAL-layout [B, H, W, C] tensor
    (models/blocks.LinearAttention): folds r = 128/C adjacent row pixels
    into the lane axis (free reshape), runs the streaming kernel, unfolds.
    Token order changes are irrelevant — both reductions are
    position-order invariant."""
    b, h, w, c = x.shape
    r = LANES // c
    assert w % r == 0, (x.shape, r)
    xf = x.reshape(b, h, w // r, LANES)
    out = _fused_core(xf, g_in, w_qkv, w_out, b_out, g_out,
                      heads, dim_head, r, add_residual, interpret)
    return out.reshape(b, h, w, c)


def supports_normal_layout(x_shape, heads: int, dim_head: int) -> bool:
    b, h, w, c = x_shape
    if c not in (32, 64, 128):
        return False
    r = LANES // c
    return w % r == 0 and supports((b, h, w // r, LANES), heads, dim_head, r)
