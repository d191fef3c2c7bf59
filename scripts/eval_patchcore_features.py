#!/usr/bin/env python
"""PatchCore feature-source shootout: mask IoU across independent refits.

VERDICT r3 #2 evaluation harness: the reference's detection quality rests
on ImageNet-pretrained WRN50-2 features (reference models.py:62-72) which
cannot exist in this environment.  This script measures what each
in-env feature source (ood/features.py) buys, the way the round-2/3 numbers
were measured: build a memory bank + self-calibrated ladder from normal
conditioning images, detect on tumor images, score the binary mask against
the ground-truth segmentation (IoU).  Each source is refit N times with an
independent normal sample + coreset/backbone seed (fit_ladder refit
variance was a round-3 finding); the test set is fixed across sources and
refits.

    python scripts/eval_patchcore_features.py \
        --config configs/mri_synthetic_256.yaml \
        --sources wrn,denoiser --feature-npz results/mri_synth256_ema.npz \
        --refits 5 --out /tmp/feature_shootout.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def iou(binary: np.ndarray, gt: np.ndarray) -> float:
    inter = float((binary * gt).sum())
    union = float(((binary + gt) > 0).sum())
    return inter / max(union, 1.0)


def main():
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/mri_synthetic_256.yaml")
    ap.add_argument("--sources", default="wrn,denoiser")
    ap.add_argument("--refits", type=int, default=5)
    ap.add_argument("--normals", type=int, default=48)
    ap.add_argument("--tests", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ratio", type=float, default=0.1)
    ap.add_argument("--gate-q", type=float, default=0.95)
    ap.add_argument("--feature-npz", default=None)
    ap.add_argument("--feature-t", default=None,
                    help="tap timestep; comma list = multi-t ensemble")
    ap.add_argument("--feature-layers", default=None)
    # mask-refinement sweep (VERDICT r5 #1): post-processing runs on the
    # CACHED anomaly maps, so sweeping (seed, hi, lo) combos is ~free next
    # to the feature extraction
    ap.add_argument("--refine-seeds", default="fwhm",
                    help="comma list of refine seed modes (fwhm,ladder)")
    ap.add_argument("--hi-fracs", default="0.5",
                    help="comma list of refine_hi_frac values")
    ap.add_argument("--lo-fracs", default="0.25",
                    help="comma list of refine_lo_frac values")
    ap.add_argument("--min-area", type=int, default=0)
    ap.add_argument("--refine-dilate", default="0",
                    help="residual dilation applied AFTER refinement "
                         "(comma list sweeps several radii)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scripts.train import load_config

    from localdiffusion_tpu.data.synthetic import synthetic_brain_translation
    from localdiffusion_tpu.ood.features import make_feature_source
    from localdiffusion_tpu.ood.frontend import OODFrontend
    from localdiffusion_tpu.ood.patchcore import PatchCore
    from localdiffusion_tpu.ood.thresholds import (
        dilate_with_backoff,
        fit_ladder,
        refine_masks,
        soft_mask_from_map,
    )

    cfg0 = load_config(args.config)
    d = cfg0.data
    size = cfg0.diffusion.image_size
    assert d.name == "synthetic_brain", "IoU eval needs ground-truth masks"

    # fixed tumor test set (ground-truth segmentations)
    _, lr_t, seg = synthetic_brain_translation(
        args.tests, size, tumor=True, seed=1234,
        mean_t1=d.mean_t1, std_t1=d.std_t1,
        mean_flair=d.mean_flair, std_flair=d.std_flair,
    )
    gt = (seg > 0).astype(np.float32)

    results = {}
    for src_name in args.sources.split(","):
        over = {"feature_source": src_name, "detector": "patchcore"}
        if args.feature_npz:
            over["feature_npz"] = args.feature_npz
        if args.feature_t is not None:
            ts = [int(v) for v in str(args.feature_t).split(",")]
            over["feature_t"] = ts[0] if len(ts) == 1 else tuple(ts)
        if args.feature_layers:
            over["feature_layers"] = tuple(args.feature_layers.split(","))
        cfg = cfg0.replace(ood=dataclasses.replace(cfg0.ood, **over))
        dilate = None  # resolved from the instantiated source's strides

        per_refit = []
        for r in range(args.refits):
            seed = 100 + r
            _, lr_n, _ = synthetic_brain_translation(
                args.normals, size, tumor=False, seed=seed,
                mean_t1=d.mean_t1, std_t1=d.std_t1,
                mean_flair=d.mean_flair, std_flair=d.std_flair,
            )
            source = (
                make_feature_source(cfg, verbose=(r == 0))
                if src_name != "wrn" else None
            )
            pc = PatchCore(cfg.ood, rng=jax.random.PRNGKey(seed),
                           source=source)
            if dilate is None:
                dilate = cfg.ood.resolved_mask_dilate(
                    size, strides=getattr(pc.source, "strides", None)
                )
            fe = OODFrontend(cfg, patchcore=pc)
            batches = [
                np.asarray(fe._preprocess_patchcore(
                    jnp.asarray(lr_n[i : i + args.batch])
                ))
                for i in range(0, len(lr_n), args.batch)
            ]
            pc.build_memory_bank(batches, sampling_ratio=args.ratio,
                                 key=jax.random.PRNGKey(seed))
            normal_maps = [
                np.asarray(pc(jnp.asarray(b))["anomaly_map"], np.float32)
                for b in batches
            ]
            ladder = fit_ladder(normal_maps, gate_q=args.gate_q)

            prep_t = fe._preprocess_patchcore(jnp.asarray(lr_t))
            amap = np.asarray(pc(prep_t)["anomaly_map"], np.float32)

            def score(binary):
                fired = [
                    not bool((binary[i] == 1.0).all())
                    for i in range(len(lr_t))
                ]
                ious = [
                    iou(binary[i], gt[i]) if fired[i] else 0.0
                    for i in range(len(lr_t))
                ]
                return float(np.mean(ious)), int(np.sum(fired))

            row = {}
            mask_raw, binary_raw = soft_mask_from_map(amap, ladder, dilate=0)
            row["iou"], row["iou_fired"] = score(binary_raw)
            _, binary_dil = soft_mask_from_map(amap, ladder, dilate=dilate)
            row["iou_dilated"], row["iou_dilated_fired"] = score(binary_dil)
            for seed_mode in args.refine_seeds.split(","):
                for hi in (float(v) for v in args.hi_fracs.split(",")):
                    for lo in (float(v) for v in args.lo_fracs.split(",")):
                        if lo > hi:
                            continue
                        m, b = refine_masks(
                            amap, mask_raw, binary_raw, seed=seed_mode,
                            hi_frac=hi, lo_frac=lo, min_area=args.min_area,
                        )
                        tag = f"iou_{seed_mode}_h{hi:g}_l{lo:g}"
                        row[tag], row[f"{tag}_fired"] = score(b)
                        for rd in (int(v) for v in
                                   str(args.refine_dilate).split(",")):
                            if rd <= 0:
                                continue
                            pairs = [
                                dilate_with_backoff(m[i], b[i], rd)
                                for i in range(len(b))
                            ]
                            bd = np.stack([p[1] for p in pairs])
                            row[f"{tag}_d{rd}"], _ = score(bd)
            per_refit.append(row)
            extras = " ".join(
                f"{k[4:]}={v:.3f}" for k, v in row.items()
                if k.startswith("iou_") and not k.endswith("_fired")
                and k != "iou_dilated"
            )
            print(f"[{src_name}] refit {r}: iou={row['iou']:.3f} "
                  f"dilated={row['iou_dilated']:.3f} "
                  f"fired={row['iou_fired']}/{len(lr_t)} {extras}",
                  flush=True)

        agg = {
            k: {
                "mean": float(np.mean([x[k] for x in per_refit])),
                "std": float(np.std([x[k] for x in per_refit])),
                "min": float(np.min([x[k] for x in per_refit])),
            }
            for k in per_refit[0]
            if k.startswith("iou") and not k.endswith("_fired")
        }
        results[src_name] = {"refits": per_refit, "agg": agg,
                             "dilate": dilate}
        print(f"== {src_name}: IoU {agg['iou']['mean']:.3f}±"
              f"{agg['iou']['std']:.3f} (min {agg['iou']['min']:.3f}), "
              f"dilated {agg['iou_dilated']['mean']:.3f}±"
              f"{agg['iou_dilated']['std']:.3f}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
