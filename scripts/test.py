#!/usr/bin/env python
"""Inference pipeline: OOD detect → branched local diffusion → metrics.

Reference test.py equivalent.  Usage:
    python scripts/test.py [--config config.yaml] [--milestone best] \
        [--detector patchcore|seg|manual|none] [--max-images N]
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
    ap.add_argument("--milestone", default="latest",
                    help="checkpoint milestone (train saves model-latest + model-best<N>)")
    ap.add_argument("--detector", default=None,
                    help="override ood detector (patchcore|seg|manual|none)")
    ap.add_argument("--max-images", type=int, default=100)
    ap.add_argument("--save-prefix", default=None,
                    help="dump hr_all/lr_all/pred_all/ad_masks npys with this prefix")
    ap.add_argument("--params-npz", default=None,
                    help="load EMA params from a slim npz snapshot "
                         "(utils/params_io.py) instead of an Orbax milestone")
    ap.add_argument("--mask-dilate", type=int, default=None,
                    help="override ood.mask_dilate (mask-growing EXTENSION; "
                         "0 = exact reference semantics)")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"], default=None,
                    help="compute dtype override (bf16 chains run 2-5x "
                         "faster; output parity measured — docs/PERFORMANCE)")
    ap.add_argument("--feature-source", default=None,
                    choices=["wrn", "seg_encoder", "denoiser"],
                    help="override cfg.ood.feature_source (ood/features.py)")
    ap.add_argument("--feature-npz", default=None,
                    help="denoiser params snapshot for --feature-source "
                         "denoiser (defaults to --params-npz when that is set)")
    ap.add_argument("--feature-t", type=int, default=None,
                    help="denoiser tap timestep (cfg.ood.feature_t)")
    ap.add_argument("--memory-bank", default=None,
                    help="override cfg.ood.memory_bank_path (a bank built "
                         "with the SAME feature source — "
                         "scripts/anomaly_model_train.py)")
    args = ap.parse_args()

    from scripts.train import load_config

    cfg = load_config(args.config)
    import dataclasses

    if args.dtype:
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, compute_dtype=args.dtype)
        )
    if args.detector:
        cfg = cfg.replace(ood=dataclasses.replace(cfg.ood, detector=args.detector))
    if args.mask_dilate is not None:
        cfg = cfg.replace(
            ood=dataclasses.replace(cfg.ood, mask_dilate=args.mask_dilate)
        )
    ood_over = {}
    if args.feature_source:
        ood_over["feature_source"] = args.feature_source
        if args.feature_source == "denoiser":
            ood_over["feature_npz"] = args.feature_npz or args.params_npz
    if args.feature_t is not None:
        ood_over["feature_t"] = args.feature_t
    if args.memory_bank is not None:
        # a bank override invalidates any configured ladder; build_frontend
        # auto-discovers the sibling <bank>_ladder.json instead
        ood_over.update(memory_bank_path=args.memory_bank, ladder_path=None)
    if ood_over:
        cfg = cfg.replace(ood=dataclasses.replace(cfg.ood, **ood_over))

    from localdiffusion_tpu.data import MNISTDataset, load_mnist_arrays, synthetic_digits
    from localdiffusion_tpu.factory import (
        build_classifier_gate,
        build_frontend,
        build_gd,
        load_params,
    )
    from localdiffusion_tpu.pipeline import LocalDiffusionPipeline

    np.random.seed(0)

    gd = build_gd(cfg)
    # EMA model for eval (reference test.py:144-147)
    params = load_params(cfg, gd, milestone=args.milestone,
                         params_npz=args.params_npz)

    # OOD-test dataset: the anomalous digit class (reference test.py:66-89)
    seg_pairs = None
    if cfg.data.name == "synthetic_brain":
        from localdiffusion_tpu.data.synthetic import synthetic_brain_translation

        d = cfg.data
        size = cfg.diffusion.image_size
        hr, lr, seg = synthetic_brain_translation(
            min(args.max_images, 32), size, tumor=True, seed=0,
            mean_t1=d.mean_t1, std_t1=d.std_t1,
            mean_flair=d.mean_flair, std_flair=d.std_flair,
            translate_zero=d.translate_zero,
        )
        seg_pairs = seg
    elif cfg.data.name.startswith("synthetic_texture"):
        from localdiffusion_tpu.data.mvtec import salt_and_pepper, sr_degrade
        from localdiffusion_tpu.data.synthetic import synthetic_textures

        denoise = cfg.data.name.endswith("denoise")
        size = cfg.diffusion.image_size
        imgs, dmasks = synthetic_textures(
            min(args.max_images, 16), size=size, seed=0, defect=True
        )
        hr = imgs * 2.0
        if denoise:
            lr = np.stack(
                [salt_and_pepper(im / 2.0, seed=i) * 2.0 for i, im in enumerate(hr)]
            )
        else:
            lr = np.stack([sr_degrade(im) for im in hr])
        seg_pairs = dmasks  # defect masks usable as gt masks
    elif cfg.data.name == "mnist":
        try:
            imgs, labels = load_mnist_arrays(
                cfg.data.mnist_path.replace("train-", "t10k-"),
                cfg.data.mnist_labels_path.replace("train-", "t10k-"),
            )
        except (FileNotFoundError, OSError):
            print("MNIST test files not found — synthetic")
            imgs, labels = synthetic_digits(
                256, size=cfg.diffusion.image_size, seed=0
            )
        num = cfg.data.anomaly_name
        ds = MNISTDataset(imgs, labels, num=[num], max_file=args.max_images)
        hr, lr, _ = ds.as_arrays()
    elif cfg.data.name == "mri":
        import glob

        from localdiffusion_tpu.data import BRATSPngDataset

        files = np.array(sorted(glob.glob(cfg.data.mri_files)))
        np.random.seed(42)
        np.random.shuffle(files)
        split = int(0.5 * len(files))  # OOD test half (reference test.py:74-80)
        ds = BRATSPngDataset(cfg.data, files[split:], train=False, tumor=True,
                             crop=cfg.diffusion.image_size,
                             max_test=args.max_images, mode="t1")
        hr, lr, seg = ds.as_arrays()
        seg_pairs = seg
    elif "mvtec" in cfg.data.name:
        import glob

        from localdiffusion_tpu.data import MvtecDatasetSR

        files = np.array(sorted(glob.glob(cfg.data.mvtec_path)))
        np.random.seed(42)
        np.random.shuffle(files)
        ds = MvtecDatasetSR(files, train=False,
                            mode=[str(cfg.data.anomaly_name)],
                            size=cfg.diffusion.image_size,
                            max_num=args.max_images)
        hr, lr, _, _ = ds.as_arrays()
    else:
        raise NotImplementedError(f"unknown dataset {cfg.data.name}")

    frontend, cfg = build_frontend(cfg, calibration_images=lr[:16])
    if frontend is None and seg_pairs is not None:
        # no trained seg detector — use ground-truth seg masks (the
        # reference's commented gt-mask path, test.py:325-327)
        print("no seg checkpoint — using ground-truth seg masks")

    # optional classifier-gated re-branching (reference ddpm.py:622-625,
    # 883-916): reuses the PatchCore detector as the accept/reject oracle
    if cfg.sampler.classifier and gd.is_ddim_sampling:
        print("NOTE: classifier gate applies to the DDPM ancestral path "
              "only (reference ddim_sample has no classifier logic, "
              "ddpm.py:979-1075) — ignored under DDIM; set "
              "sampling_timesteps: null to exercise it")
    # ROC-calibration stream when no threshold is configured
    # (reference models.py:338-402): GT batches labeled 1, degraded 0
    cal_pairs = [(hr[i : i + 1], 1) for i in range(min(8, len(hr)))] + [
        (lr[i : i + 1], 0) for i in range(min(8, len(lr)))
    ]
    classifier_gate = build_classifier_gate(cfg, frontend,
                                            calibration_pairs=cal_pairs)

    pipe = LocalDiffusionPipeline(
        cfg, gd, params, frontend=frontend, classifier_gate=classifier_gate
    )
    if frontend is None and seg_pairs is not None:
        # gt-mask flow: per-image translate with mask = binary seg
        import jax.numpy as jnp

        key = jax.random.PRNGKey(10)
        losses, times, region = [], [], []
        for i in range(len(hr)):
            key, sub = jax.random.split(key)
            m = (seg_pairs[i : i + 1] > 0).astype(np.float32)
            r = pipe.translate(lr[i : i + 1], hr=hr[i : i + 1], key=sub, mask=m,
                               gt_region=m)
            losses.append(float(r["mse"]))
            times.append(float(r["time"]))
            region.append(float(r["mse_ood_region"]))
            print(f"[{i}] mse={losses[-1]:.5f} mse_ood={region[-1]:.5f} "
                  f"time={times[-1]:.3f}s branched={bool(r['branched'])}")
        print(f"Test loss: {np.mean(losses):.4f}")
        print(f"OOD-region loss: {np.mean(region):.4f}")
        print(f"Average sampling time: {np.mean(times[1:] if len(times) > 1 else times):.4f}")
        return
    pairs = [(hr[i : i + 1], lr[i : i + 1]) for i in range(len(hr))]
    gt_masks = (
        [seg_pairs[i : i + 1] for i in range(len(hr))]
        if seg_pairs is not None else None
    )
    out = pipe.run(pairs, key=jax.random.PRNGKey(10), save_prefix=args.save_prefix,
                   gt_masks=gt_masks)
    if cfg.sampler.classifier:
        # the reference's fusion_time.npy diagnostic (ddpm.py:902-903)
        np.save("fusion_time.npy", out["fusion_time"])
        print(f"fusion_time (acceptance t per image): {out['fusion_time'].tolist()}")
    print(f"Test loss: {float(out['mean_mse']):.4f}")


if __name__ == "__main__":
    main()
