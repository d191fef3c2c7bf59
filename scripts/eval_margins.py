#!/usr/bin/env python
"""Branched-vs-plain margins with confidence intervals (VERDICT r4 next #2).

The reference evaluates hallucination suppression over up to 50 test images
(reference data.py:344-367, test.py:416-445) but reports single-run means.
This harness makes the margin claim statistically defensible: N synthetic
tumor images (generation is free in-env), per-image whole-image MSE and
ground-truth-OOD-region MSE for every detector variant, under DDPM and/or
DDIM, with 95% t-intervals on each mean AND on the PAIRED per-image deltas
vs the plain chain (same image, same noise key → the difference isolates
the branching effect).

    python scripts/eval_margins.py --config configs/mri_synthetic_256.yaml \
        --params-npz results/mri_synth256_ema.npz --images 64 --batch 8 \
        --variants plain,denoiser,seg,gt --samplers ddim \
        --out /tmp/margins_faithful_ddim.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# two-sided 97.5% Student-t quantiles; ~z beyond 120 dof
def _t975(df: int) -> float:
    from scipy import stats

    return float(stats.t.ppf(0.975, df))


def mean_ci(xs) -> dict:
    xs = np.asarray(xs, np.float64)
    n = len(xs)
    m = float(xs.mean())
    if n < 2:
        return {"mean": m, "ci95": None, "n": n}
    half = _t975(n - 1) * float(xs.std(ddof=1)) / np.sqrt(n)
    return {"mean": m, "ci95": [m - half, m + half], "n": n}


def main():
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/mri_synthetic_256.yaml")
    ap.add_argument("--frontend-config", default=None,
                    help="build Stage A detectors from THIS config instead "
                         "(e.g. run the stem arch's Stage B with the "
                         "faithful config's denoiser-tap detector, so the "
                         "masks are identical across architecture legs)")
    ap.add_argument("--params-npz", default=None,
                    help="Stage B params snapshot; a comma list runs every "
                         "checkpoint in ONE process (axon cross-process "
                         "compile reuse is erratic — round-5 lesson), with "
                         "result keys prefixed by the npz basename")
    ap.add_argument("--milestone", default="latest")
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=777,
                    help="test-set seed (disjoint from training/refit seeds)")
    ap.add_argument("--variants", default="plain,denoiser,gt",
                    help="comma list of plain|denoiser|wrn|seg|gt|gtd "
                         "(gtd = ground truth + the shipped residual "
                         "dilation — the proper oracle bound)")
    ap.add_argument("--samplers", default="ddim",
                    help="comma list of ddim|ddpm (ddpm = full ancestral "
                         "chain — timesteps sampling steps)")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"], default=None)
    # Stage-A overrides applied to the detector variants
    ap.add_argument("--mask-refine", default=None,
                    help="override ood.mask_refine (none|hysteresis)")
    ap.add_argument("--refine-lo-frac", type=float, default=None)
    ap.add_argument("--refine-dilate", type=int, default=None,
                    help="sets ood.mask_dilate for the refined path "
                         "(residual dilation AFTER hysteresis growth)")
    ap.add_argument("--mask-dilate", type=int, default=None)
    ap.add_argument("--gts-scale", type=float, default=0.5,
                    help="mask value of the soft-oracle 'gts' variant")
    ap.add_argument("--gte-radius", type=int, default=4,
                    help="erosion radius of the core-oracle 'gte' variant "
                         "(4 px ≈ the shipped denoiser mask's 0.88 gt "
                         "coverage at the synthetic radius-25 lesion)")
    ap.add_argument("--save-masks", default=None,
                    help="npz path: dump every variant's Stage-A masks + "
                         "the gt region for offline value-distribution "
                         "analysis")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from scripts.train import load_config

    from localdiffusion_tpu.factory import build_frontend, build_gd, load_params
    from localdiffusion_tpu.pipeline import LocalDiffusionPipeline

    cfg0 = load_config(args.config)
    if args.dtype:
        cfg0 = cfg0.replace(
            train=dataclasses.replace(cfg0.train, compute_dtype=args.dtype)
        )
    d = cfg0.data
    size = cfg0.diffusion.image_size
    assert d.name == "synthetic_brain", "margin eval needs ground-truth segs"

    from localdiffusion_tpu.data.synthetic import synthetic_brain_translation

    n = args.images - args.images % args.batch or args.batch
    hr, lr, seg = synthetic_brain_translation(
        n, size, tumor=True, seed=args.seed,
        mean_t1=d.mean_t1, std_t1=d.std_t1,
        mean_flair=d.mean_flair, std_flair=d.std_flair,
        translate_zero=d.translate_zero,
    )
    gt_region = (seg > 0).astype(np.float32)
    gt_px = gt_region.reshape(n, -1).sum(1)
    print(f"test set: {n} tumor images @ {size}px, "
          f"gt region {gt_px.mean():.0f}±{gt_px.std():.0f} px", flush=True)

    # ---- Stage A masks per variant (computed once; every sampler reuses) --
    cfg_fe = load_config(args.frontend_config) if args.frontend_config \
        else cfg0

    def detector_cfg(variant):
        over = {}
        if variant == "denoiser":
            over = {"detector": "patchcore", "feature_source": "denoiser"}
        elif variant == "wrn":
            over = {"detector": "patchcore", "feature_source": "wrn",
                    "memory_bank_path":
                        "results/memory_bank_mri256_wrn.npy",
                    "ladder_path": None}
        elif variant == "seg":
            over = {"detector": "seg"}
        if args.mask_refine is not None:
            over["mask_refine"] = args.mask_refine
        if args.refine_lo_frac is not None:
            over["refine_lo_frac"] = args.refine_lo_frac
        if args.refine_dilate is not None:
            over["mask_dilate"] = args.refine_dilate
        elif args.mask_dilate is not None:
            over["mask_dilate"] = args.mask_dilate
        return cfg_fe.replace(ood=dataclasses.replace(cfg_fe.ood, **over))

    from localdiffusion_tpu.ood.thresholds import dilate_mask, erode_mask

    variants = args.variants.split(",")
    masks: dict = {}
    ones = np.ones((n, size, size, 1), np.float32)
    for v in variants:
        if v == "plain":
            masks[v] = ones
        elif v == "gt":
            # soft-mask convention: 1.0 = fully OOD, 0 = in-distribution
            # (all-ones is the reserved no-anomaly bypass sentinel) — the
            # reference's gt-mask flow passes the binary seg directly
            # (scripts/test.py:214, reference test.py:325-327)
            masks[v] = gt_region.copy()
        elif v == "gtd":
            # oracle mask + the shipped residual dilation: the faithful-64
            # run showed the EXACT gt mask is significantly WORSE than
            # plain under both samplers while the detector's dilated mask
            # wins — branched fusion needs a blending halo around the OOD
            # region, so the proper oracle bound is gt ⊕ dilate
            rad = args.refine_dilate if args.refine_dilate is not None else (
                args.mask_dilate if args.mask_dilate is not None
                else cfg_fe.ood.mask_dilate
            )
            masks[v] = np.stack([
                dilate_mask(gt_region[i], max(int(rad), 0))
                for i in range(n)
            ])
        elif v == "gte":
            # ERODED oracle: gt minus its rim.  The shipped denoiser mask
            # (the only variant that beats plain) covers 87.6% of gt and
            # spills only 12% outside — it misses the tumor RIM — while
            # every full-coverage mask (gt, gtd, seg) loses to plain.  If
            # core-only branching wins here too, the mechanism is rim
            # blending: branched/plain fusion inside the boundary band
            # must stay on the plain chain.
            masks[v] = np.stack([
                erode_mask(gt_region[i], max(int(args.gte_radius), 0))
                for i in range(n)
            ])
        elif v == "gts":
            # SOFT oracle: dilated gt scaled to --gts-scale.  The faithful-64
            # run showed binary oracle masks (gt, gtd) are significantly
            # WORSE than plain while the detector's soft mask wins — this
            # variant isolates the mask-VALUE effect (partial branch/plain
            # blending) from the mask-SUPPORT effect at oracle support
            rad = args.refine_dilate if args.refine_dilate is not None else (
                args.mask_dilate if args.mask_dilate is not None
                else cfg_fe.ood.mask_dilate
            )
            masks[v] = args.gts_scale * np.stack([
                dilate_mask(gt_region[i], max(int(rad), 0))
                for i in range(n)
            ])
        else:
            cfg_v = detector_cfg(v)
            fe, cfg_v = build_frontend(cfg_v, verbose=True)
            if fe is None:
                raise SystemExit(f"variant {v}: no frontend (missing ckpt?)")
            out = []
            for i in range(0, n, args.batch):
                m, _, _ = fe.detect(lr[i : i + args.batch])
                out.append(np.asarray(m))
            masks[v] = np.concatenate(out)
        fired = [not bool((masks[v][i] == 1.0).all()) for i in range(n)]
        print(f"[{v}] masks ready: fired {int(np.sum(fired))}/{n}", flush=True)
    if args.save_masks:
        np.savez_compressed(args.save_masks, gt=gt_region,
                            **{f"mask_{v}": masks[v] for v in variants})
        print(f"saved masks {args.save_masks}", flush=True)

    # ---- Stage B per sampler × checkpoint --------------------------------
    npz_list = args.params_npz.split(",") if args.params_npz else [None]
    results = {"n": n, "size": size, "config": args.config,
               "params_npz": args.params_npz, "variants": {}}
    for sampler in args.samplers.split(","):
        if sampler == "ddpm":
            st = None
        else:
            # a config whose default is the full ancestral chain
            # (sampling_timesteps == timesteps, the r5 256px default) would
            # otherwise dispatch 'ddim' back to ancestral — pin DDIM-50
            st = cfg0.diffusion.sampling_timesteps
            if not st or st >= cfg0.diffusion.timesteps:
                st = 50
        cfg_s = cfg0.replace(
            diffusion=dataclasses.replace(cfg0.diffusion, sampling_timesteps=st)
        )
        gd = build_gd(cfg_s)
        # loop body runs once per checkpoint (paired noise keys are
        # re-derived identically, so deltas stay comparable across npz)
        for npz in npz_list:
            ck = ""
            if len(npz_list) > 1:
                ck = os.path.splitext(os.path.basename(npz))[0] + "/"
            params = load_params(cfg_s, gd, milestone=args.milestone,
                                 params_npz=npz)
            pipe = LocalDiffusionPipeline(cfg_s, gd, params)
            base_key = jax.random.PRNGKey(args.seed)

            per_variant_px = {}
            for v in variants:
                mse_whole = np.zeros(n)
                mse_ood = np.zeros(n)
                t0 = time.perf_counter()
                for i in range(0, n, args.batch):
                    sl = slice(i, i + args.batch)
                    # same key per batch index across variants → paired noise
                    key = jax.random.fold_in(base_key, i // args.batch)
                    r = pipe.translate(lr[sl], key=key, mask=masks[v][sl])
                    err = (np.asarray(r["pred"], np.float32) - hr[sl]) ** 2
                    mse_whole[sl] = err.reshape(err.shape[0], -1).mean(1)
                    g = gt_region[sl]
                    mse_ood[sl] = (err * g).reshape(err.shape[0], -1).sum(1) / (
                        np.maximum(g.reshape(g.shape[0], -1).sum(1), 1.0)
                    )
                dt = time.perf_counter() - t0
                per_variant_px[v] = (mse_whole, mse_ood)
                key_name = f"{ck}{sampler}/{v}"
                results["variants"][key_name] = {
                    "whole": mean_ci(mse_whole),
                    "ood_region": mean_ci(mse_ood),
                    "wall_s": round(dt, 2),
                    "per_image_whole": [round(float(x), 6) for x in mse_whole],
                    "per_image_ood": [round(float(x), 6) for x in mse_ood],
                }
                w, o = results["variants"][key_name]["whole"], \
                    results["variants"][key_name]["ood_region"]
                print(f"[{key_name}] whole {w['mean']:.4f} "
                      f"ood {o['mean']:.4f} ({dt:.0f}s)", flush=True)

            # paired deltas vs plain (the margin itself, with its own CI)
            if "plain" in per_variant_px:
                pw, po = per_variant_px["plain"]
                for v in variants:
                    if v == "plain":
                        continue
                    vw, vo = per_variant_px[v]
                    dkey = f"{ck}{sampler}/{v}_minus_plain"
                    results["variants"][dkey] = {
                        "whole_delta": mean_ci(vw - pw),
                        "ood_delta": mean_ci(vo - po),
                        "ood_delta_pct": round(
                            100.0 * float((vo - po).mean()) / float(po.mean()), 2
                        ),
                    }
                    od = results["variants"][dkey]["ood_delta"]
                    lo, hi = od["ci95"] if od["ci95"] else (None, None)
                    if hi is not None and hi < 0.0:
                        tag = "SIGNIFICANT (better)"
                    elif lo is not None and lo > 0.0:
                        tag = "SIGNIFICANT (worse)"
                    else:
                        tag = "ns"
                    print(f"[{dkey}] ood Δ {od['mean']:+.4f} "
                          f"CI [{lo:+.4f}, {hi:+.4f}] "
                          f"({results['variants'][dkey]['ood_delta_pct']:+.1f}%) "
                          f"{tag}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
