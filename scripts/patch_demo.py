#!/usr/bin/env python
"""Patch-parallel local diffusion demo (BASELINE.json config 5).

Tiles a large image into overlapping patches, runs branched local diffusion
over ALL patches as one batch (sharded over the mesh when more devices are
attached), and stitches with overlap feathering.

    python scripts/patch_demo.py --image-size 256 --patch 64 --overlap 8
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--overlap", type=int, default=8)
    ap.add_argument("--milestone", default="best400")
    args = ap.parse_args()

    from localdiffusion_tpu.config import SamplerConfig
    from localdiffusion_tpu.data.synthetic import synthetic_brain_translation
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from localdiffusion_tpu.parallel import patch_parallel_sample, plan_patches
    from scripts.train import load_config

    cfg = load_config("configs/mri_synthetic.yaml")
    gd = GaussianDiffusion(cfg.model, cfg.diffusion)

    from localdiffusion_tpu.train.trainer import Trainer

    trainer = Trainer(gd, cfg.train)
    try:
        state = trainer.load(args.milestone)
        params = state.ema_params
        print(f"loaded {args.milestone}")
    except Exception as e:
        print(f"no checkpoint ({e}); random init")
        params = gd.init_params(jax.random.PRNGKey(0))

    # big synthetic brain + tumor mask at full resolution
    d = cfg.data
    hr, lr, seg = synthetic_brain_translation(
        1, args.image_size, tumor=True, seed=3,
        mean_t1=d.mean_t1, std_t1=d.std_t1,
        mean_flair=d.mean_flair, std_flair=d.std_flair,
    )
    mask = (seg > 0).astype(np.float32)
    grid = plan_patches(args.image_size, args.image_size, args.patch, args.overlap)
    print(f"{grid.num_patches} patches of {args.patch}px (overlap {args.overlap})")

    # patch sampling uses DDPM directly (static chain per patch)
    import dataclasses

    scfg = dataclasses.replace(cfg.sampler)
    t0 = time.perf_counter()
    out = patch_parallel_sample(
        gd, params, jnp.asarray(lr), jnp.asarray(mask), jax.random.PRNGKey(0),
        scfg, (0.0, 12.0), patch=args.patch, overlap=args.overlap,
    )
    out = jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"first call (incl. compile): {dt:.2f}s")
    t0 = time.perf_counter()
    out = jax.block_until_ready(
        patch_parallel_sample(
            gd, params, jnp.asarray(lr), jnp.asarray(mask), jax.random.PRNGKey(1),
            scfg, (0.0, 12.0), patch=args.patch, overlap=args.overlap,
        )
    )
    dt = time.perf_counter() - t0
    print(f"steady-state: {dt:.3f}s for one {args.image_size}px image "
          f"({grid.num_patches} patch chains)")
    mse = float(np.mean((np.asarray(out) - hr) ** 2))
    print(f"mse vs gt: {mse:.4f}")


if __name__ == "__main__":
    main()
