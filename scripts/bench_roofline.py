#!/usr/bin/env python
"""Empirical roofline probe for the 256px exact-s2d stage-0 shapes.

The chain profile (scripts/profile_attr.py on /tmp/jax_trace_256_exact)
shows convolutions at ~48% MFU but every bandwidth-class op (GN statistics,
normalize+FiLM+SiLU fusions, copies) at ~85-110 GB/s.  This probe measures
what the chip can actually sustain op-by-op at the exact tensor geometry
([2B, H/2, W/2, 4C] = [8, 128, 128, 128] bf16), serialized device-side in a
lax.scan (per-dispatch tunnel latency ~2 ms would otherwise dominate).

Answers VERDICT r2 #1: is XLA at the achievable bound, or is there a fused
kernel to write?

    python scripts/bench_roofline.py [--iters 50] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)  # [2B] branched pair
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--c", type=int, default=128)
    args = ap.parse_args()

    from localdiffusion_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, HW, C = args.batch, args.hw, args.c
    K = args.iters
    shape = (B, HW, HW, C)
    nbytes = int(np.prod(shape)) * 2  # bf16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}; tensor {shape} bf16 = "
          f"{nbytes / 1e6:.1f} MB; {K} serialized iters/call", file=sys.stderr)

    def timed(name, scan_fn, carry0, bytes_per_iter, flops_per_iter=0.0,
              repeats=5):
        fn = jax.jit(lambda c: jax.lax.scan(scan_fn, c, None, length=K)[0])
        c = jax.block_until_ready(fn(carry0))  # compile
        t0 = time.perf_counter()
        for _ in range(repeats):
            c = jax.block_until_ready(fn(c))
        dt = (time.perf_counter() - t0) / repeats / K  # s per iteration
        row = {
            "op": name,
            "us_per_iter": round(dt * 1e6, 1),
            "gb_per_s": round(bytes_per_iter / dt / 1e9, 1),
        }
        if flops_per_iter:
            row["tf_per_s"] = round(flops_per_iter / dt / 1e12, 2)
        print(json.dumps(row))
        return row

    one = jnp.bfloat16(1.0000305)  # *1+eps keeps values bounded, serializes

    # 1. pure streaming: read + write
    timed("elementwise_scale (r+w)", lambda c, _: (c * one, None), x0,
          2 * nbytes)

    # 2. two-operand elementwise: 2 reads + write
    y0 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    timed("add_two_tensors (2r+w)",
          lambda c, _: ((c + y0) * one - y0 * one, None), x0, 3 * nbytes)

    # 3. GN statistics (channel-sum formulation, as gn_film_silu_s2d):
    #    read x once, emit [B, G]
    G, ff = 8, 4
    cg = C // ff // G

    def gn_stats(c, _):
        xf = c.astype(jnp.float32)
        s = jnp.sum(xf, axis=(1, 2))
        ss = jnp.sum(xf * xf, axis=(1, 2))
        gs = jnp.sum(s.reshape(B, ff, G, cg), axis=(1, 3))
        gss = jnp.sum(ss.reshape(B, ff, G, cg), axis=(1, 3))
        # fold the stats back so the scan carries a data dependency
        return c + (gs.sum() * 0.0).astype(jnp.bfloat16), (gs, gss)

    timed("gn_stats (1r)", gn_stats, x0, nbytes)

    # 4. GN apply + FiLM + SiLU: per-channel affine + silu (read + write)
    a = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)), jnp.float32)

    def gn_apply(c, _):
        y = c.astype(jnp.float32) * a + b
        y = y * jax.nn.sigmoid(y)
        return (y * 1e-3).astype(jnp.bfloat16), None

    timed("gn_apply_film_silu (r+w)", gn_apply, x0, 2 * nbytes)

    # 5. the full fused GN+FiLM+SiLU of the chain (2 reads of x + write)
    from localdiffusion_tpu.models.unet_s2d import gn_film_silu_s2d

    gamma = jnp.ones((C // ff,), jnp.float32)
    beta = jnp.zeros((C // ff,), jnp.float32)
    sc = jnp.zeros((B, C // ff), jnp.float32)
    sh = jnp.zeros((B, C // ff), jnp.float32)

    def gn_full(c, _):
        return gn_film_silu_s2d(c, gamma, beta, sc, sh, G, 2) * one, None

    timed("gn_film_silu_s2d (2r+w)", gn_full, x0, 3 * nbytes)

    # 6. conv3x3 C->C at the folded geometry (compute roofline point)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.01, jnp.bfloat16)
    conv_flops = 2.0 * B * HW * HW * 9 * C * C

    def conv(c, _):
        y = jax.lax.conv_general_dilated(
            c, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (y * 1e-2).astype(jnp.bfloat16), None

    timed("conv3x3_folded (r+w)", conv, x0, 2 * nbytes, conv_flops)

    # 7. dense matmul peak reference
    M = 4096
    a0 = jnp.asarray(rng.standard_normal((M, M)) * 0.01, jnp.bfloat16)

    def mm(c, _):
        y = (c @ a0) * one
        return (y - c * one + c)[:M], None  # keep magnitude bounded

    timed("matmul_4096 (peak ref)", mm, a0, 3 * M * M * 2, 2.0 * M**3)


if __name__ == "__main__":
    main()
