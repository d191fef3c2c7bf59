#!/usr/bin/env python
"""Conv efficiency by channel/spatial geometry on the attached TPU chip.

Answers the stage-1 s2d question for the exact layout execution
(models/unet_s2d.py): the faithful 256px arch's stage 1 runs 3×3 convs at
C=64@128² (half lane occupancy); the s2d f=2 equivalent runs 4× the FLOPs
at C=256@64² (full lanes).  s2d wins iff
    4 / eff(C=256@64²)  <  1 / eff(C=64@128²).

Shapes measured (batch 8, bf16, NHWC):
  c32_256    3×3  32→ 32 @256²   faithful stage-0 (round-2: ~6 TF/s)
  c64_128    3×3  64→ 64 @128²   faithful stage-1
  c128_128   3×3 128→128 @128²   s2d stage-0 / stem (round-2: ~45 TF/s)
  c256_64    3×3 256→256 @ 64²   s2d stage-1 candidate
  c512_64    3×3 512→512 @ 64²   s2d stage-1 up-path concat width
  flag28     3×3  32→ 32 @ 28²   flagship MNIST hot shape (batch 128)

Uses the data-dependency-chain timing from scripts/bench_quant.py (plain
block_until_ready over the relay mis-reports small programs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, a, b, repeats=20):
    out = fn(a, b)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(out, b)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / repeats


def conv_case(rng, b, hw, cin, cout, k=3, repeats=20):
    x = jnp.asarray(rng.standard_normal((b, hw, hw, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.02, jnp.bfloat16)
    assert cin == cout, "dependency chain needs cin == cout"
    f = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    )
    dt = _time(f, x, w, repeats)
    flops = 2 * b * hw * hw * cin * cout * k * k
    return dt, flops / dt / 1e12


def main():
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    cases = {
        "c32_256": (8, 256, 32),
        "c64_128": (8, 128, 64),
        "c128_128": (8, 128, 128),
        "c256_64": (8, 64, 256),
        "c512_64": (8, 64, 512),
        "flag28": (128, 28, 32),
    }
    results = {"metric": "conv_geometry_microbench",
               "device_kind": jax.devices()[0].device_kind}
    for name, (b, hw, c) in cases.items():
        dt, tf = conv_case(rng, b, hw, c, c, repeats=args.repeats)
        results[f"{name}_ms"] = round(dt * 1e3, 3)
        results[f"{name}_tflops"] = round(tf, 2)

    # the decision: s2d stage-1 does 4× FLOPs at the c256_64 rate vs 1× at
    # the c64_128 rate (same underlying full-res conv)
    if results.get("c64_128_tflops") and results.get("c256_64_tflops"):
        ratio = (4 / results["c256_64_tflops"]) / (1 / results["c64_128_tflops"])
        results["s2d_stage1_conv_cost_ratio"] = round(ratio, 2)  # <1 → s2d wins
    print(json.dumps(results))


if __name__ == "__main__":
    main()
