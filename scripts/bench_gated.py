#!/usr/bin/env python
"""Classifier-gated chain cost measurement (VERDICT r3 #5).

The reference pays classifier cost only on rejection (ddpm.py:883-916: it
scores the fused x_start each post-fusion step and re-fuses until accept /
retry budget).  Our gated sampler latches per-sample acceptance and takes a
`lax.cond` fast path once every sample has accepted — this script measures
what that actually costs on-chip:

  * ungated          — classifier_fn=None (the plain branched chain)
  * gated, 0% reject — a constant-accept gate: the fast-path claim is that
                       this costs ≈ ungated (+ one gate eval per step)
  * gated, scripted rejection — a gate that rejects while t is in the top
    `reject_frac` share of post-fusion steps, burning the full retry budget
    there (worst case per rejected step)

Scripted gates are ~zero-cost functions, isolating the CHAIN-STRUCTURE
overhead; add --real-gate to also measure a live PatchCore classifier gate
(its WRN pass per step is the reference's actual Stage-cost model).

    python scripts/bench_gated.py --sizes 28,256
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure(gd, scfg, batch, size, classifier_fn, repeats=8):
    import jax
    import jax.numpy as jnp

    from localdiffusion_tpu.diffusion import sampler as S

    params = gd.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.uniform(0, 2, (batch, size, size, 1)).astype(np.float32))
    mask = np.zeros((batch, size, size, 1), np.float32)
    mask[:, :, : size // 4, :] = 1.0
    mask = jnp.asarray(mask)
    mmv = (0.0, 2.0)

    want_ft = classifier_fn is not None
    fn = jax.jit(
        lambda p, c, m, k: S.ddpm_sample_branched(
            gd, p, c, m, k, scfg, mmv, classifier_fn=classifier_fn,
            return_fusion_time=want_ft,
        )
    )
    key = jax.random.PRNGKey(7)
    out = jax.block_until_ready(fn(params, cond, mask, key))
    t0 = time.perf_counter()
    for i in range(repeats):
        out = jax.block_until_ready(fn(params, cond, mask, jax.random.PRNGKey(i)))
    dt = (time.perf_counter() - t0) / repeats
    fusion_time = None
    if want_ft and isinstance(out, tuple) and len(out) >= 2:
        fusion_time = np.asarray(out[1]).tolist()
    return dt, fusion_time


def main():
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="28,256")
    ap.add_argument("--timesteps", type=int, default=50)
    ap.add_argument("--start-timestep", type=int, default=5)
    ap.add_argument("--reject-frac", type=float, default=0.2)
    ap.add_argument("--retries", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from localdiffusion_tpu.config import (
        DiffusionConfig,
        ModelConfig,
        SamplerConfig,
    )
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion

    rows = []
    for size in (int(s) for s in args.sizes.split(",")):
        if size <= 64:
            mcfg = ModelConfig(dim=32, init_dim=32, dim_mults=(1, 2, 4),
                               full_attn=(False, False, True), channels=1)
            batch = 64
        else:
            mcfg = ModelConfig(dim=32, init_dim=32, dim_mults=(1, 2, 4, 8),
                               full_attn=(False, False, False, True),
                               channels=1, cond_encoder_depth="deep",
                               exact_layout_s2d=2)
            batch = 4
        gd = GaussianDiffusion(
            mcfg,
            DiffusionConfig(image_size=size, timesteps=args.timesteps,
                            objective="pred_x0"),
            dtype=jnp.bfloat16,
        )
        # rejection window: the top reject_frac of post-fusion steps
        t_hi = args.timesteps - 1
        t_cut = t_hi - args.reject_frac * (t_hi - args.start_timestep)

        def accept_all(xs, t):
            return jnp.ones((xs.shape[0],), jnp.float32)

        def reject_window(xs, t):
            # reject (score<0) while t > t_cut — scripted, zero-cost gate
            return jnp.where(t > t_cut, -1.0, 1.0) * jnp.ones(
                (xs.shape[0],), jnp.float32
            )

        variants = [
            ("ungated", SamplerConfig(start_timestep=args.start_timestep),
             None),
            ("gated_0pct",
             SamplerConfig(start_timestep=args.start_timestep,
                           classifier=True,
                           max_classifier_retries=args.retries),
             accept_all),
            (f"gated_{int(args.reject_frac * 100)}pct",
             SamplerConfig(start_timestep=args.start_timestep,
                           classifier=True,
                           max_classifier_retries=args.retries),
             reject_window),
        ]
        base_dt = None
        for name, scfg, gate in variants:
            dt, fusion_time = measure(gd, scfg, batch, size, gate)
            row = {
                "size": size, "variant": name, "batch": batch,
                "ms_per_call": round(dt * 1e3, 1),
                "img_per_s": round(batch / dt, 3),
                "vs_ungated": round(dt / base_dt, 3) if base_dt else 1.0,
            }
            if fusion_time is not None:
                row["fusion_time_minmax"] = [
                    int(np.min(fusion_time)), int(np.max(fusion_time))
                ]
            if base_dt is None:
                base_dt = dt
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
