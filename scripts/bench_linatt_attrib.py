#!/usr/bin/env python
"""Linear-attention kernel time attribution (VERDICT r5 #3).

Times the fused kernel's two Pallas passes separately, and each pass with
its transcendentals (exp) replaced by a cheap linear op, at the 256px
exact-s2d chain shape.  Decides whether the measured ~2.0-2.2 ms/call is
MXU-bound (the lane-group-sparsity story, ~0.5 ms roofline) or VPU-bound
(exp + f32 elementwise, which no layout change can remove) — the evidence
PERFORMANCE.md needs to either spend the headroom or close the frontier.

    python scripts/bench_linatt_attrib.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.check_pallas_lowering import _amortized_ms

from localdiffusion_tpu.ops import pallas_linear_attention as L

B, H, W, CC = 8, 128, 128, 128
NPH, HEADS, DIM_HEAD = 4, 4, 32


def _variant_forward(x, g_in, w_qkv, w_out, b_out, g_out, *,
                     run_kv=True, run_q=True, use_exp=True):
    """_forward with pass/transcendental switches (same specs/tiles)."""
    import math

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    exp = jnp.exp if use_exp else (lambda v: v * 0.5 + 1.0)
    nph, heads, dim_head = NPH, HEADS, DIM_HEAD
    b, h, w, cc = x.shape
    c = cc // nph
    hidden = heads * dim_head
    hw = h * w
    T = L._row_tile(hw)
    nt = hw // T
    scale = dim_head**-0.5

    wq = L._embed_bd(w_qkv[:, :hidden], nph).astype(jnp.bfloat16)
    wk = L._embed_bd(w_qkv[:, hidden : 2 * hidden], nph).astype(jnp.bfloat16)
    wout_emb = jnp.zeros((nph, hidden, L.LANES), jnp.bfloat16)
    for p in range(nph):
        wout_emb = wout_emb.at[p, :, p * c : (p + 1) * c].set(
            w_out.astype(jnp.bfloat16))
    mnorm = L._block_mask(c).astype(jnp.bfloat16)
    mhead = L._block_mask(dim_head).astype(jnp.bfloat16)
    g_t = jnp.tile(g_in.astype(jnp.float32), nph)[None, :] * math.sqrt(c)
    gout_t = jnp.tile(g_out.astype(jnp.float32), nph)[None, :] * math.sqrt(c)
    bout_t = jnp.tile(b_out.astype(jnp.float32), nph)[None, :]

    xr = x.reshape(b, hw, cc)
    row_spec = pl.BlockSpec((1, T, cc), lambda i, t: (i, t, 0))
    full = lambda s: pl.BlockSpec(s, lambda i, t: tuple(0 for _ in s))

    def kv_kernel(x_ref, wk_ref, mnorm_ref, gt_ref, l_ref, gram_ref, m_scr):
        t = pl.program_id(1)
        _, xb = L._rms_in(x_ref, mnorm_ref, gt_ref)
        k = jax.lax.dot(xb, wk_ref[...], preferred_element_type=jnp.float32)
        k = k.astype(jnp.bfloat16).astype(jnp.float32)
        m_tile = jnp.full((1, L.LANES), L._NEG, jnp.float32)
        for p in range(nph):
            kp = k[:, p * L.LANES : (p + 1) * L.LANES]
            m_tile = jnp.maximum(m_tile, jnp.max(kp, axis=0, keepdims=True))

        @pl.when(t == 0)
        def _():
            m_scr[0:1] = m_tile

        @pl.when(t > 0)
        def _():
            m_scr[0:1] = jnp.maximum(m_scr[0:1], m_tile)

        m_new = m_scr[0:1]
        l_tile = jnp.zeros((1, L.LANES), jnp.float32)
        g_rows = []
        for p in range(nph):
            kp = k[:, p * L.LANES : (p + 1) * L.LANES]
            e = exp(kp - m_new)
            l_tile = l_tile + jnp.sum(e, axis=0, keepdims=True)
            g_rows.append(jax.lax.dot_general(
                xb, e.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        g_tile = jnp.concatenate(g_rows, axis=0)

        @pl.when(t == 0)
        def _():
            l_ref[0] = l_tile
            gram_ref[0] = g_tile

        @pl.when(t > 0)
        def _():
            fct = exp(m_scr[1:2] - m_new)
            l_ref[0] = l_ref[0] * fct + l_tile
            gram_ref[0] = gram_ref[0] * fct + g_tile

        m_scr[1:2] = m_new

    def q_kernel(x_ref, wq_ref, mnorm_ref, mhead_ref, gt_ref,
                 gout_ref, bout_ref, wtil_ref, out_ref):
        xf, xb = L._rms_in(x_ref, mnorm_ref, gt_ref)
        q = jax.lax.dot(xb, wq_ref[...], preferred_element_type=jnp.float32)
        q = q.astype(jnp.bfloat16).astype(jnp.float32)
        mh = mhead_ref[...]
        out_acc = jnp.zeros((x_ref.shape[1], L.LANES), jnp.float32)
        for p in range(nph):
            qp = q[:, p * L.LANES : (p + 1) * L.LANES]
            rmax = jnp.max(qp, axis=1, keepdims=True)
            e = exp(qp - rmax)
            den = jax.lax.dot(e.astype(jnp.bfloat16), mh,
                              preferred_element_type=jnp.float32)
            qs = (e / den).astype(jnp.bfloat16) * jnp.bfloat16(scale)
            out_acc = out_acc + jax.lax.dot(
                qs, wtil_ref[0, p], preferred_element_type=jnp.float32)
        out_acc = out_acc + bout_ref[...]
        ob = out_acc.astype(jnp.bfloat16).astype(jnp.float32)
        sq = (ob * ob).astype(jnp.bfloat16)
        s_g = jax.lax.dot(sq, mnorm_ref[...],
                          preferred_element_type=jnp.float32)
        on = ob * (gout_ref[...] / jnp.maximum(jnp.sqrt(s_g), 1e-12))
        out_ref[0] = (on + xf).astype(out_ref.dtype)

    l = gram = None
    if run_kv:
        l, gram = pl.pallas_call(
            kv_kernel,
            grid=(b, nt),
            in_specs=[row_spec, full((cc, nph * hidden)),
                      full((L.LANES, L.LANES)), full((1, L.LANES))],
            out_specs=[
                pl.BlockSpec((1, 1, L.LANES), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((1, nph * cc, L.LANES), lambda i, t: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 1, L.LANES), jnp.float32),
                jax.ShapeDtypeStruct((b, nph * cc, L.LANES), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((8, L.LANES), jnp.float32)],
        )(xr, wk, mnorm, g_t)
        if not run_q:
            return gram

    if run_kv:
        wv = w_qkv[:, 2 * hidden :].astype(jnp.float32)
        gblk = gram.reshape(b, nph, cc, L.LANES)
        ctxt = sum(
            jnp.einsum("ce,bcd->bed", wv, gblk[:, p, p * c : (p + 1) * c, :])
            for p in range(nph))
        ctxn = (ctxt / l).astype(jnp.bfloat16) * mhead
        wtil = jnp.einsum("bed,pec->bpdc", ctxn, wout_emb,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    else:
        # constant wtil is fine: xr (scan-varied) still feeds the call
        wtil = jnp.zeros((b, nph, L.LANES, L.LANES), jnp.bfloat16)

    out = pl.pallas_call(
        q_kernel,
        grid=(b, nt),
        in_specs=[row_spec, full((cc, nph * hidden)),
                  full((L.LANES, L.LANES)), full((L.LANES, L.LANES)),
                  full((1, L.LANES)), full((1, L.LANES)), full((1, L.LANES)),
                  pl.BlockSpec((1, nph, L.LANES, L.LANES),
                               lambda i, t: (i, 0, 0, 0))],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, hw, cc), x.dtype),
    )(xr, wq, mnorm, mhead, g_t, gout_t, bout_t, wtil)
    return out.reshape(b, h, w, cc)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CC)), jnp.bfloat16)
    c = CC // NPH
    hidden = HEADS * DIM_HEAD
    g_in = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    w_qkv = jnp.asarray(rng.normal(size=(c, 3 * hidden)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(hidden, c)) * 0.1, jnp.float32)
    b_out = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    g_out = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    args = (x, g_in, w_qkv, w_out, b_out, g_out)

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind}), shape {x.shape}", flush=True)

    full_fused = lambda *a: L.linear_attention_s2d_fused(
        *a, heads=HEADS, dim_head=DIM_HEAD, f=2)
    # per-pallas_call floor probes: a trivial copy kernel at the same grid,
    # and the full kernel called TWICE per scan step (if a fixed per-call
    # floor dominates, 2× calls ≈ 2× time; if work dominates, less)
    from jax.experimental import pallas as pl

    def _copy_kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0]

    def copy_call_t(T):
        def fn(xx, *_):
            hw = xx.shape[1] * xx.shape[2]
            xr = xx.reshape(xx.shape[0], hw, xx.shape[3])
            spec = pl.BlockSpec((1, T, xx.shape[3]), lambda i, t: (i, t, 0))
            return pl.pallas_call(
                _copy_kernel, grid=(xx.shape[0], hw // T),
                in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(xr.shape, xx.dtype),
            )(xr).reshape(xx.shape)
        return fn

    rows = [
        ("full fused (shipping)", full_fused),
        ("full fused called 2x", lambda *a: full_fused(full_fused(*a),
                                                       *a[1:])),
        ("xla elementwise (x*1.0001)", lambda xx, *_: xx * 1.0001),
        ("copy pallas_call T=2048 (64 prg)", copy_call_t(2048)),
        ("copy pallas_call T=16384 (8 prg)", copy_call_t(16384)),
        ("copy pallas_call T=256 (512 prg)", copy_call_t(256)),
        ("both passes, exp->linear",
         functools.partial(_variant_forward, use_exp=False)),
        ("kv pass only", functools.partial(_variant_forward, run_q=False)),
        ("kv pass only, exp->linear",
         functools.partial(_variant_forward, run_q=False, use_exp=False)),
        ("q pass only (zero wtil)",
         functools.partial(_variant_forward, run_kv=False)),
        ("q pass only, exp->linear",
         functools.partial(_variant_forward, run_kv=False, use_exp=False)),
    ]
    for name, fn in rows:
        ms = _amortized_ms(fn, *args)
        print(f"{name:34s} {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
