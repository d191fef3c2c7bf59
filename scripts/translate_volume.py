#!/usr/bin/env python
"""Whole-volume translation CLI: one medical volume in, translated volume out.

The reference's per-volume path is SingleMedDataset (all slices of one
volume, reference data.py:549-604) fed through its batch-1 test loop; this
runs every slice through the compiled local-diffusion chain `--batch` at a
time and writes the translated volume (plus the detector masks).

    python scripts/translate_volume.py --config configs/mri_synthetic_256.yaml \
        --t1 vol_t1.mha --flair vol_flair.mha [--seg vol_seg.mha] \
        [--milestone best1600 | --params-npz snap.npz] \
        [--detector patchcore|seg|manual|none] [--batch 8] \
        [--out pred_volume.npy]

Inputs may be .mha/.mhd (own MetaImage reader, data/mha.py) or .npy
volumes [D, H, W].  With --flair the target modality is available and MSE
is reported (plus OOD-region MSE when --seg is given); without it the
volume is translated blind (hr falls back to the conditioning volume for
shape only and metrics are skipped).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _load_volume(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    from localdiffusion_tpu.data.mha import load_mha

    vol, _ = load_mha(path)
    return vol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--t1", required=True, help="conditioning-modality volume")
    ap.add_argument("--flair", default=None, help="target-modality volume "
                    "(enables MSE; name reflects the default t1→flair task)")
    ap.add_argument("--seg", default=None, help="tumor segmentation volume "
                    "(enables OOD-region MSE)")
    ap.add_argument("--milestone", default="best")
    ap.add_argument("--params-npz", default=None)
    ap.add_argument("--detector", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mode", default="flair",
                    help="'flair' = translate t1→flair (reference data.py "
                    "mode semantics)")
    ap.add_argument("--out", default="pred_volume.npy")
    args = ap.parse_args()

    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    enable_compilation_cache()

    import dataclasses

    from scripts.train import load_config

    from localdiffusion_tpu.data import BRATSVolumeDataset
    from localdiffusion_tpu.factory import build_pipeline

    cfg = load_config(args.config)
    if args.detector:
        cfg = cfg.replace(ood=dataclasses.replace(cfg.ood, detector=args.detector))

    t1 = _load_volume(args.t1).astype(np.float32)
    flair = (_load_volume(args.flair).astype(np.float32)
             if args.flair else t1.copy())
    seg = _load_volume(args.seg).astype(np.float32) if args.seg else None
    print(f"volume {t1.shape}, target={'given' if args.flair else 'ABSENT'}")

    ds = BRATSVolumeDataset.single_volume(
        cfg.data, t1, flair, seg=seg,
        crop=cfg.diffusion.image_size, mode=args.mode,
    )
    pipe = build_pipeline(cfg, milestone=args.milestone,
                          params_npz=args.params_npz)
    out = pipe.translate_volume(ds, batch_size=args.batch)

    np.save(args.out, out["pred_volume"][..., 0])
    np.save(args.out.replace(".npy", "_masks.npy"), out["mask_volume"][..., 0])
    print(f"saved {args.out} {out['pred_volume'].shape}")
    if args.flair:
        msg = f"volume MSE: {float(out['mse']):.5f}"
        if "mean_mse_ood_region" in out:
            msg += f"  OOD-region MSE: {float(out['mean_mse_ood_region']):.5f}"
        print(msg)


if __name__ == "__main__":
    main()
