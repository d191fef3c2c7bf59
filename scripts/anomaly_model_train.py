#!/usr/bin/env python
"""Build the PatchCore memory bank (reference anomaly_model_train.py equivalent).

Streams the training set through the feature extractor, concatenates patch
embeddings, coreset-subsamples 10% via k-center greedy, and saves
memory_bank_<dataset>.npy (reference anomaly_model_train.py:252-385).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--out", default=None)
    ap.add_argument("--ratio", type=float, default=0.1)
    ap.add_argument("--max-images", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pixel-q", type=float, default=0.999,
                    help="normal-pixel quantile for the fitted ladder threshold")
    ap.add_argument("--rel-rung", default="max-1std",
                    help="relative rung used for far-above-gate maps "
                         "(e.g. max-1std, max-2std; higher-res inputs "
                         "produce sharper score peaks and may need a looser "
                         "rung — max-1std under-segmented at 256px)")
    ap.add_argument("--gate-q", type=float, default=0.95,
                    help="quantile of the normal per-image maxima used as "
                         "the gate (1.0 = max, the reference-style extreme "
                         "statistic; the 0.95 default is robust to a single outlier "
                         "normal image and stabilizes refit ladders)")
    ap.add_argument("--no-ladder", action="store_true",
                    help="skip self-calibrating the threshold ladder")
    ap.add_argument("--feature-source", default=None,
                    choices=["wrn", "seg_encoder", "denoiser"],
                    help="override cfg.ood.feature_source (ood/features.py)")
    ap.add_argument("--feature-npz", default=None,
                    help="denoiser params snapshot for --feature-source "
                         "denoiser (e.g. results/mri_synth256_ema.npz)")
    ap.add_argument("--feature-t", type=int, default=None,
                    help="denoiser tap timestep")
    ap.add_argument("--feature-layers", default=None,
                    help="comma-separated tap names (per-source default "
                         "when unset)")
    ap.add_argument("--seed", type=int, default=0,
                    help="coreset/backbone seed (refit robustness sweeps)")
    args = ap.parse_args()

    from scripts.train import load_config

    cfg = load_config(args.config)

    from localdiffusion_tpu.data import MNISTDataset, load_mnist_arrays, synthetic_digits
    from localdiffusion_tpu.ood.patchcore import PatchCore

    if cfg.data.name == "mnist":
        try:
            imgs, labels = load_mnist_arrays(
                cfg.data.mnist_path, cfg.data.mnist_labels_path
            )
        except (FileNotFoundError, OSError):
            imgs, labels = synthetic_digits(512, seed=42)
        # normal class = digit 8 (the IND digit; reference uses the train set
        # of the source class, anomaly_model_train.py:262-280)
        ds = MNISTDataset(imgs, labels, num=[8], max_file=args.max_images)
        _, lr, _ = ds.as_arrays()
    elif cfg.data.name == "synthetic_texture":
        from localdiffusion_tpu.data.mvtec import sr_degrade
        from localdiffusion_tpu.data.synthetic import synthetic_textures

        imgs, _ = synthetic_textures(args.max_images,
                                     size=cfg.diffusion.image_size, seed=42)
        lr = np.stack([sr_degrade(im * 2.0) for im in imgs])
    elif cfg.data.name == "synthetic_brain":
        from localdiffusion_tpu.data.synthetic import synthetic_brain_translation

        d = cfg.data
        _, lr, _ = synthetic_brain_translation(
            args.max_images, cfg.diffusion.image_size, tumor=False, seed=42,
            mean_t1=d.mean_t1, std_t1=d.std_t1,
            mean_flair=d.mean_flair, std_flair=d.std_flair,
        )
    elif cfg.data.name == "mri":
        import glob

        from localdiffusion_tpu.data import BRATSPngDataset

        files = np.array(sorted(glob.glob(cfg.data.mri_files)))
        np.random.seed(42)
        np.random.shuffle(files)
        ds = BRATSPngDataset(cfg.data, files[: args.max_images], train=True,
                             crop=cfg.diffusion.image_size)
        _, lr, _ = ds.as_arrays()
    elif "mvtec" in cfg.data.name:
        import glob

        from localdiffusion_tpu.data import MvtecDatasetSR

        files = np.array(sorted(glob.glob(cfg.data.mvtec_path)))
        ds = MvtecDatasetSR(files, train=True, size=cfg.diffusion.image_size,
                            max_num=args.max_images)
        _, lr, _, _ = ds.as_arrays()
    else:
        raise NotImplementedError(f"unknown dataset {cfg.data.name}")

    import dataclasses

    import jax.numpy as jnp

    from localdiffusion_tpu.ood.frontend import OODFrontend
    from localdiffusion_tpu.ood.thresholds import fit_ladder, save_ladder

    ood_over = {}
    if args.feature_source:
        ood_over["feature_source"] = args.feature_source
    if args.feature_npz:
        ood_over["feature_npz"] = args.feature_npz
    if args.feature_t is not None:
        ood_over["feature_t"] = args.feature_t
    if args.feature_layers:
        ood_over["feature_layers"] = tuple(args.feature_layers.split(","))
    if ood_over:
        cfg = cfg.replace(ood=dataclasses.replace(cfg.ood, **ood_over))

    source = None
    if cfg.ood.feature_source != "wrn":
        from localdiffusion_tpu.ood.features import make_feature_source

        source = make_feature_source(cfg)
    pc = PatchCore(cfg.ood, rng=jax.random.PRNGKey(args.seed), source=source)
    # the bank MUST share preprocessing with the inference frontend — use
    # the frontend's path (per-dataset denorm etc., reference
    # test.py:199-242 / anomaly_model_train.py:358-365)
    fe = OODFrontend(
        cfg.replace(ood=dataclasses.replace(cfg.ood, detector="patchcore")),
        patchcore=pc,
    )
    batches = []
    for i in range(0, len(lr), args.batch):
        x = fe._preprocess_patchcore(jnp.asarray(lr[i : i + args.batch]))
        batches.append(np.asarray(x))
    bank = pc.build_memory_bank(batches, sampling_ratio=args.ratio,
                                key=jax.random.PRNGKey(args.seed))
    out = args.out or f"memory_bank_{cfg.data.name}.npy"
    np.save(out, bank)
    print(f"saved {out}: {bank.shape}")

    if not args.no_ladder:
        # self-calibrate the threshold ladder from the normal stream's own
        # anomaly maps (held-out style: scores of the very set the bank was
        # coreset-sampled from — nonzero because the coreset keeps 10%)
        maps = [np.asarray(pc(jnp.asarray(x))["anomaly_map"], np.float32)
                for x in batches]
        ladder = fit_ladder(maps, pixel_q=args.pixel_q, rel_rung=args.rel_rung,
                            gate_q=args.gate_q)
        ladder_out = os.path.splitext(out)[0] + "_ladder.json"
        save_ladder(ladder, ladder_out)
        print(f"saved fitted ladder {ladder_out}: gate={ladder.gate:.4f} "
              f"rungs={[(r.above, r.threshold) for r in ladder.rungs]}")


if __name__ == "__main__":
    main()
