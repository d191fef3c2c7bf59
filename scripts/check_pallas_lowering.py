#!/usr/bin/env python
"""Standalone on-chip Mosaic lowering check for every fused Pallas kernel.

Run this BEFORE landing any Pallas kernel change (CLAUDE.md round-3 lesson:
interpret-mode CPU tests do NOT catch Mosaic block-shape constraints — the
fused ResnetBlock shipped with (1, LANES) blocks over [B, LANES] arrays and
crashed on first real-chip contact).  For each kernel this script:

  1. jits the kernel at the REAL chain shape (the shapes the 256px exact-s2d
     chain dispatches at),
  2. compares against the XLA reference (correlation + max abs diff),
  3. times it scan-amortized (a lax.scan of CHAIN_ITERS calls, one dispatch)
     next to the XLA reference under the same harness.

Takes ~1-2 min on the chip per kernel.  Usage:

    python scripts/check_pallas_lowering.py            # all kernels
    python scripts/check_pallas_lowering.py linatt     # substring filter

Exit code is non-zero if any kernel fails to lower or misses parity.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN_ITERS = 20  # scan length for amortized timing (~2 ms dispatch floor)
CORR_MIN = 0.999
ATOL = 0.08  # bf16 rounding-order differences on unit-scale activations


def _amortized_ms(fn, *args) -> float:
    """Median wall ms/call of fn over a device-side scan (dispatch-amortized).

    The carry is a tiny data-dependent scalar folded into the input so XLA
    cannot hoist the loop-invariant call out of the scan; it works for any
    output shape (skip-concat blocks change channel count)."""

    def body(s, _):
        x = args[0] + s.astype(args[0].dtype)
        out = fn(x, *args[1:])
        return jnp.mean(out.astype(jnp.float32)) * 1e-20, None

    def scanned(x0_unused):
        s, _ = jax.lax.scan(
            body, jnp.float32(0.0), None, length=CHAIN_ITERS
        )
        return s

    j = jax.jit(scanned)
    out = jax.block_until_ready(j(args[0]))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(j(args[0]))
        times.append((time.perf_counter() - t0) / CHAIN_ITERS * 1e3)
    del out
    return float(np.median(times))


def _harness_overhead_ms(x) -> float:
    """Per-scan-iteration cost of the harness itself (the carry fold-in +
    reduce over x-sized tensors), measured with an identity kernel.

    Round-5 finding (scripts/bench_linatt_attrib.py): this is ~1.25 ms at
    [8,128,128,128] on this chip — comparable to the kernels under test —
    so gross ms/call numbers overstate both sides.  Net = gross − overhead
    is the true in-chain cost (the real sampler has no such per-call
    barrier)."""
    return _amortized_ms(lambda v: v * jnp.asarray(1.0001, v.dtype), x)


def _report(name, got, ref, ms_fused, ms_ref, ms_ovh=None):
    g = np.asarray(got, np.float32).ravel()
    r = np.asarray(ref, np.float32).ravel()
    corr = float(np.corrcoef(g, r)[0, 1])
    mad = float(np.max(np.abs(g - r)))
    ok = corr > CORR_MIN and mad < ATOL * max(1.0, float(np.std(r)) * 3)
    speed = ms_ref / ms_fused if ms_fused else float("nan")
    net = ""
    if ms_ovh is not None:
        nf = max(ms_fused - ms_ovh, 1e-3)
        nr = max(ms_ref - ms_ovh, 1e-3)
        net = (f" | net of {ms_ovh:.2f}ms harness: "
               f"fused={nf:.2f}ms xla={nr:.2f}ms ({nr / nf:.2f}x)")
    print(
        f"[{'OK' if ok else 'FAIL'}] {name}: corr={corr:.6f} maxabs={mad:.4f} "
        f"fused={ms_fused:.2f}ms xla={ms_ref:.2f}ms ({speed:.2f}x){net}"
    )
    return ok


def check_linear_attention_s2d() -> bool:
    """Fused linear attention at the 256px exact-s2d stage-0 shape."""
    from localdiffusion_tpu.ops.pallas_linear_attention import (
        linear_attention_s2d_fused,
        linear_attention_s2d_reference,
    )

    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (8, 128, 128, 128)) * 0.5).astype(jnp.bfloat16)
    ks = jax.random.split(key, 5)
    g_in = jnp.ones((32,)) + jax.random.normal(ks[0], (32,)) * 0.1
    w_qkv = jax.random.normal(ks[1], (32, 384)) * 0.1
    w_out = jax.random.normal(ks[2], (128, 32)) * 0.1
    b_out = jax.random.normal(ks[3], (32,)) * 0.05
    g_out = jnp.ones((32,)) + jax.random.normal(ks[4], (32,)) * 0.1

    fused = lambda xx: linear_attention_s2d_fused(
        xx, g_in, w_qkv, w_out, b_out, g_out, 4, 32, 2, True, False
    )
    ref = lambda xx: linear_attention_s2d_reference(
        xx, g_in, w_qkv, w_out, b_out, g_out, 4, 32, 2, True
    )
    got = jax.block_until_ready(jax.jit(fused)(x))
    want = jax.block_until_ready(jax.jit(ref)(x))
    return _report(
        "linatt_s2d [8,128,128,128]", got, want,
        _amortized_ms(fused, x), _amortized_ms(ref, x),
        ms_ovh=_harness_overhead_ms(x),
    )


def check_resnet_block_s2d() -> bool:
    """Fused s2d ResnetBlock at the 256px stage-0 shape (skip-concat case)."""
    from localdiffusion_tpu.ops.pallas_resnet_block import (
        _reference,
        resnet_block_s2d_fused,
    )

    key = jax.random.PRNGKey(1)
    x = (jax.random.normal(key, (8, 128, 128, 256)) * 0.5).astype(jnp.bfloat16)
    cin_sizes = (32, 32)
    p = _rb_params(key, 64, 32)
    ss = (
        jax.random.normal(jax.random.fold_in(key, 2), (8, 32)) * 0.3,
        jax.random.normal(jax.random.fold_in(key, 3), (8, 32)) * 0.3,
    )
    fused = lambda xx: resnet_block_s2d_fused(
        xx, p, ss, 32, 8, 2, cin_sizes, False
    )
    ref = lambda xx: _reference(xx, p, ss, 32, 8, 2, cin_sizes)
    got = jax.block_until_ready(jax.jit(fused)(x))
    want = jax.block_until_ready(jax.jit(ref)(x))
    return _report(
        "resnet_block_s2d [8,128,128,256]", got, want,
        _amortized_ms(fused, x), _amortized_ms(ref, x),
    )


def check_resnet_block_wfold() -> bool:
    """W-fold fused ResnetBlock at the level-1 int_up2 shape (C=64@128²)."""
    try:
        from localdiffusion_tpu.ops.pallas_resnet_block import (
            _reference_normal,
            resnet_block_wfold_fused,
        )
    except ImportError:
        print("[skip] resnet_block_wfold: not implemented yet")
        return True

    key = jax.random.PRNGKey(2)
    ok = True
    for cin, dim_out, name in ((96, 64, "int_up2"), (32, 32, "int_down1"),
                               (192, 128, "int_up1@64px")):
        hw = 128 if dim_out in (32, 64) else 64
        x = (jax.random.normal(key, (8, hw, hw, cin)) * 0.5).astype(
            jnp.bfloat16
        )
        p = _rb_params(jax.random.fold_in(key, dim_out), cin, dim_out)
        ss = (
            jax.random.normal(jax.random.fold_in(key, 4), (8, dim_out)) * 0.3,
            jax.random.normal(jax.random.fold_in(key, 5), (8, dim_out)) * 0.3,
        )
        fused = lambda xx: resnet_block_wfold_fused(xx, p, ss, dim_out, 8, False)
        ref = lambda xx: _reference_normal(xx, p, ss, dim_out, 8)
        got = jax.block_until_ready(jax.jit(fused)(x))
        want = jax.block_until_ready(jax.jit(ref)(x))
        ok &= _report(
            f"resnet_block_wfold {name} [8,{hw},{hw},{cin}]->{dim_out}",
            got, want, _amortized_ms(fused, x), _amortized_ms(ref, x),
        )
    return ok


def check_flash_attention() -> bool:
    """Fused full attention at the mid-stage token count."""
    from localdiffusion_tpu.ops.attention import full_attention, xla_attention

    key = jax.random.PRNGKey(3)
    q, k, v = (
        (jax.random.normal(jax.random.fold_in(key, i), (8, 1024, 4, 32)) * 0.5)
        .astype(jnp.bfloat16)
        for i in range(3)
    )
    got = jax.block_until_ready(jax.jit(full_attention)(q, k, v))
    want = jax.block_until_ready(jax.jit(xla_attention)(q, k, v))
    return _report(
        "full_attention [8,1024,4,32]", got, want,
        _amortized_ms(lambda qq: full_attention(qq, k, v), q),
        _amortized_ms(lambda qq: xla_attention(qq, k, v), q),
    )


def _rb_params(key, cin, dim_out):
    ks = jax.random.split(key, 8)
    p = {
        "block1": {
            "proj": {
                "kernel": jax.random.normal(ks[0], (3, 3, cin, dim_out)) * 0.1,
                "bias": jax.random.normal(ks[1], (dim_out,)) * 0.05,
            },
            "norm": {
                "scale": jax.random.normal(ks[2], (dim_out,)) * 0.2 + 1.0,
                "bias": jax.random.normal(ks[3], (dim_out,)) * 0.1,
            },
        },
        "block2": {
            "proj": {
                "kernel": jax.random.normal(ks[4], (3, 3, dim_out, dim_out)) * 0.1,
                "bias": jax.random.normal(ks[5], (dim_out,)) * 0.05,
            },
            "norm": {
                "scale": jax.random.normal(ks[6], (dim_out,)) * 0.2 + 1.0,
                "bias": jax.random.normal(ks[7], (dim_out,)) * 0.1,
            },
        },
    }
    if cin != dim_out:
        p["res_conv"] = {
            "kernel": jax.random.normal(
                jax.random.fold_in(key, 99), (1, 1, cin, dim_out)
            ) * 0.1,
            "bias": jax.random.normal(jax.random.fold_in(key, 98), (dim_out,))
            * 0.05,
        }
    return p


CHECKS = {
    "linatt_s2d": check_linear_attention_s2d,
    "resnet_block_s2d": check_resnet_block_s2d,
    "resnet_block_wfold": check_resnet_block_wfold,
    "full_attention": check_flash_attention,
}


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else ""
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind})")
    if backend != "tpu":
        print("WARNING: not on TPU — this checks nothing Mosaic-specific")
    selected = [n for n in CHECKS if not pat or pat in n]
    if not selected:
        # a wrong filter must not silently check nothing (VERDICT r4 weak
        # #6: 'linear' matched nothing where 'linatt_s2d' was meant)
        print(f"ERROR: filter {pat!r} matches no check. "
              f"Available: {', '.join(CHECKS)}")
        sys.exit(2)
    ok = True
    for name in selected:
        try:
            ok &= CHECKS[name]()
        except Exception as e:  # lowering failures land here
            print(f"[FAIL] {name}: {type(e).__name__}: {e}")
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
