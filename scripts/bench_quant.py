#!/usr/bin/env python
"""int8-vs-bf16 matmul/conv microbenchmark (the round-1 quantization
candidate, VERDICT r1 item 4).

Measures raw op throughput at the 256px pipeline's shapes to establish
whether quantized compute has headroom on this chip — independent of model
quality questions (which need a quantization-aware calibration study).
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
    """Serialize via a data dependency (out feeds the next call) and close
    with a real device→host transfer — over the relay, block_until_ready
    alone reported impossible (>10× peak-FLOP) rates for small programs."""
    out = fn(a, b)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(out, b)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / repeats


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

    results = {}

    # --- large matmul: [8192, 2048] x [2048, 2048] ---
    m, k, n = 8192, 2048, 2048
    a_f = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b_f = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    a_i = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    b_i = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)

    # outputs cast back to the input dtype so the dependency chain in _time
    # can feed them forward
    mm_bf16 = jax.jit(lambda a, b: jax.lax.dot(a, b).astype(jnp.bfloat16))
    mm_int8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.int8)
    )
    dt_bf = _time(mm_bf16, a_f, b_f, repeats=args.repeats)
    dt_i8 = _time(mm_int8, a_i, b_i, repeats=args.repeats)
    flops = 2 * m * k * n
    results["matmul_bf16_tflops"] = round(flops / dt_bf / 1e12, 1)
    results["matmul_int8_tops"] = round(flops / dt_i8 / 1e12, 1)
    results["matmul_int8_speedup"] = round(dt_bf / dt_i8, 2)

    # --- conv3x3 at a 256px-pipeline stage shape (C=32, the faithful arch) ---
    x32 = jnp.asarray(rng.standard_normal((8, 256, 256, 32)), jnp.bfloat16)
    k32 = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.05, jnp.bfloat16)
    x32i = jnp.asarray(rng.integers(-127, 127, (8, 256, 256, 32)), jnp.int8)
    k32i = jnp.asarray(rng.integers(-127, 127, (3, 3, 32, 32)), jnp.int8)

    def conv(x, k, ptype):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype,
        )

    conv_bf16 = jax.jit(lambda x, k: conv(x, k, jnp.float32).astype(jnp.bfloat16))
    conv_int8 = jax.jit(lambda x, k: conv(x, k, jnp.int32).astype(jnp.int8))
    dt_cbf = _time(conv_bf16, x32, k32, repeats=args.repeats)
    try:
        dt_ci8 = _time(conv_int8, x32i, k32i, repeats=args.repeats)
    except Exception as e:
        dt_ci8 = None
        results["conv32_int8_error"] = str(e)[:120]
    cflops = 2 * 8 * 256 * 256 * 32 * 32 * 9
    results["conv32_bf16_tflops"] = round(cflops / dt_cbf / 1e12, 2)
    if dt_ci8:
        results["conv32_int8_tops"] = round(cflops / dt_ci8 / 1e12, 2)
        results["conv32_int8_speedup"] = round(dt_cbf / dt_ci8, 2)

    # --- conv3x3 at the s2d-stem shape (C=128, half resolution) ---
    x128 = jnp.asarray(rng.standard_normal((8, 128, 128, 128)), jnp.bfloat16)
    k128 = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.02, jnp.bfloat16)
    dt_c128 = _time(
        jax.jit(lambda x, k: conv(x, k, jnp.float32).astype(jnp.bfloat16)),
        x128, k128, repeats=args.repeats,
    )
    c128flops = 2 * 8 * 128 * 128 * 128 * 128 * 9
    results["conv128_bf16_tflops"] = round(c128flops / dt_c128 / 1e12, 2)

    results["metric"] = "quantization_microbench"
    results["device_kind"] = jax.devices()[0].device_kind
    print(json.dumps(results))


if __name__ == "__main__":
    main()
