#!/usr/bin/env python
"""Classifier-gated re-branching QUALITY evaluation at 256px (VERDICT r4 #6).

Round 4 measured the gate's *cost* with scripted verdicts; this harness runs
the real thing end-to-end: a PatchCore classifier over TARGET-domain (FLAIR)
normal images — built with the configured feature source, denoiser taps by
default — ROC-calibrated on labeled normal/tumor images (reference
models.py:338-402), gating the fused x_start each post-fusion ancestral step
(reference ddpm.py:883-916: accept while the estimate still scores
anomalous, i.e. the tumor was NOT hallucinated away; reject → re-fuse from
the saved branch pair).

Outputs: accept/reject counts, the fusion_time (per-sample acceptance
timestep) distribution — the reference's fusion_time.npy diagnostic — and
the paired quality margin gated-vs-ungated on the same tumor images/noise.

    python scripts/eval_gated_quality.py --images 16 --batch 4 \
        --out /tmp/gated_quality.json
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


def main():
    from localdiffusion_tpu.utils.logging import (
        enable_compilation_cache,
        honor_platform_env,
    )

    honor_platform_env()
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/mri_synthetic_256_gated.yaml")
    ap.add_argument("--params-npz", default="results/mri_synth256_ema.npz")
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--bank-normals", type=int, default=64,
                    help="normal FLAIR images for the classifier bank")
    ap.add_argument("--bank-ratio", type=float, default=0.05,
                    help="coreset ratio (bank rides inside the sampler jit "
                         "— keep the NN matmul light)")
    ap.add_argument("--calib", type=int, default=32,
                    help="calibration images PER CLASS for the ROC sweep")
    ap.add_argument("--rebuild-bank", action="store_true")
    ap.add_argument("--polarity", choices=["preserve", "suppress"],
                    default=None,
                    help="override sampler.classifier_polarity.  'preserve' "
                         "(reference ddpm.py:888) accepts anomalous-scoring "
                         "x_starts — ill-posed for this synthetic task, "
                         "whose TARGET modality is tumor-free (the lesion "
                         "exists in T1 only), so normal/tumor FLAIR "
                         "calibration images are the same distribution.  "
                         "'suppress' accepts normal-scoring x_starts and "
                         "calibrates against lesion-INJECTED FLAIR "
                         "exemplars (synthetic hallucinations)")
    ap.add_argument("--lesion-amp", type=float, default=2.0,
                    help="peak amplitude (normalized units) of the "
                         "injected calibration lesions; the T1 tumor is "
                         "+4.3 normalized units for scale")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from scripts.train import load_config

    from localdiffusion_tpu.data.synthetic import synthetic_brain_translation
    from localdiffusion_tpu.factory import (
        build_classifier_gate,
        build_frontend,
        build_gd,
        load_params,
    )
    from localdiffusion_tpu.ood.classifier import ClassifierPatchCore
    from localdiffusion_tpu.ood.features import make_feature_source
    from localdiffusion_tpu.ood.patchcore import PatchCore
    from localdiffusion_tpu.pipeline import LocalDiffusionPipeline

    cfg = load_config(args.config)
    if args.polarity:
        cfg = cfg.replace(sampler=dataclasses.replace(
            cfg.sampler, classifier_polarity=args.polarity))
    polarity = cfg.sampler.classifier_polarity
    d, size = cfg.data, cfg.diffusion.image_size
    assert d.name == "synthetic_brain"
    norm_kw = dict(mean_t1=d.mean_t1, std_t1=d.std_t1, mean_flair=d.mean_flair,
                   std_flair=d.std_flair, translate_zero=d.translate_zero)

    # ---- classifier memory bank over normal FLAIR (hr) images ------------
    obj_path = os.path.join(
        os.path.dirname(cfg.ood.memory_bank_path or "results/x"),
        f"memory_bank_{d.name}_{cfg.sampler.classifier_obj}.npy",
    )
    src = make_feature_source(cfg)
    if args.rebuild_bank or not os.path.exists(obj_path):
        hr_n, _, _ = synthetic_brain_translation(
            args.bank_normals, size, tumor=False, seed=11, **norm_kw)
        pc = PatchCore(cfg.ood, source=src)
        t0 = time.perf_counter()
        pc.build_memory_bank(
            [hr_n[i : i + args.batch] for i in range(0, len(hr_n), args.batch)],
            sampling_ratio=args.bank_ratio,
        )
        np.save(obj_path, np.asarray(pc.memory_bank))
        print(f"classifier bank {obj_path} {pc.memory_bank.shape} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

    # ---- ROC threshold calibration (normal vs tumor FLAIR) ---------------
    mb = np.load(obj_path)
    cls = ClassifierPatchCore(PatchCore(cfg.ood, memory_bank=mb, source=src))
    hr_cn, _, _ = synthetic_brain_translation(
        args.calib, size, tumor=False, seed=21, **norm_kw)
    if polarity == "preserve":
        # reference semantics: anomalous exemplars = tumor-carrying inputs.
        # NOTE: on this synthetic task the target FLAIR is tumor-free, so
        # these are distributionally identical to the normals — the run
        # documents the ill-posedness (balanced acc ≈ 0.5)
        hr_ct, _, _ = synthetic_brain_translation(
            args.calib, size, tumor=True, seed=22, **norm_kw)
    else:
        # 'suppress': anomalous exemplars = normal FLAIR with an injected
        # Gaussian lesion (a synthetic hallucination residue) at a random
        # in-brain location, radius size/10 like the T1 tumor generator
        hr_ct, _, _ = synthetic_brain_translation(
            args.calib, size, tumor=False, seed=22, **norm_kw)
        rng = np.random.default_rng(23)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        tr = size / 10
        for i in range(args.calib):
            ty = int(rng.integers(size // 4, 3 * size // 4))
            tx = int(rng.integers(size // 4, 3 * size // 4))
            lesion = np.exp(-((yy - ty) ** 2 + (xx - tx) ** 2) / (2 * tr**2))
            hr_ct[i, :, :, 0] += args.lesion_amp * lesion
    pairs = [(hr_cn[i : i + 1], 0) for i in range(args.calib)] + \
            [(hr_ct[i : i + 1], 1) for i in range(args.calib)]
    thr = cls.calibrate(pairs)
    # post-calibration sanity: accuracy at the chosen threshold
    sc_n = np.concatenate([np.asarray(cls.score_raw(hr_cn[i:i+1]))
                           for i in range(args.calib)])
    sc_t = np.concatenate([np.asarray(cls.score_raw(hr_ct[i:i+1]))
                           for i in range(args.calib)])
    acc = 0.5 * ((sc_n <= thr).mean() + (sc_t > thr).mean())
    print(f"ROC threshold {thr:.4f}  normal scores "
          f"{sc_n.mean():.3f}±{sc_n.std():.3f}  tumor {sc_t.mean():.3f}"
          f"±{sc_t.std():.3f}  balanced acc {acc:.3f}", flush=True)
    cfg = cfg.replace(ood=dataclasses.replace(
        cfg.ood, classifier_threshold=float(thr)))

    # ---- test set + Stage A masks (shared by gated and ungated) ----------
    n = args.images - args.images % args.batch or args.batch
    hr, lr, seg = synthetic_brain_translation(
        n, size, tumor=True, seed=args.seed, **norm_kw)
    gt = (seg > 0).astype(np.float32)
    frontend, cfg = build_frontend(cfg, verbose=True)
    masks = np.concatenate([
        np.asarray(frontend.detect(lr[i : i + args.batch])[0])
        for i in range(0, n, args.batch)
    ])

    gd = build_gd(cfg)
    params = load_params(cfg, gd, params_npz=args.params_npz, strict=True)
    gate = build_classifier_gate(cfg, frontend)

    results = {"config": args.config, "n": n, "threshold": float(thr),
               "polarity": polarity,
               "balanced_acc": float(acc), "bank_rows": int(mb.shape[0]),
               "variants": {}}

    def run(tag, pipe):
        mse_w = np.zeros(n)
        mse_o = np.zeros(n)
        ft = []
        t0 = time.perf_counter()
        for i in range(0, n, args.batch):
            sl = slice(i, i + args.batch)
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed),
                                     i // args.batch)
            r = pipe.translate(lr[sl], key=key, mask=masks[sl])
            err = (np.asarray(r["pred"], np.float32) - hr[sl]) ** 2
            mse_w[sl] = err.reshape(err.shape[0], -1).mean(1)
            g = gt[sl]
            mse_o[sl] = (err * g).reshape(err.shape[0], -1).sum(1) / (
                np.maximum(g.reshape(g.shape[0], -1).sum(1), 1.0))
            if "fusion_time" in r:
                ft.append(np.asarray(r["fusion_time"]).reshape(-1))
        dt = time.perf_counter() - t0
        row = {"whole_mse": float(mse_w.mean()), "ood_mse": float(mse_o.mean()),
               "wall_s": round(dt, 1),
               "per_image_whole": [round(float(x), 6) for x in mse_w],
               "per_image_ood": [round(float(x), 6) for x in mse_o]}
        if ft:
            ft = np.concatenate(ft)
            t_first = int(cfg.sampler.start_timestep) - 1
            rejected = ft < t_first  # accepted later than the first gated step
            row["fusion_time"] = ft.tolist()
            row["accepted_first_step"] = int((~rejected).sum())
            row["rejected_at_least_once"] = int(rejected.sum())
            row["mean_accept_t"] = float(ft.mean())
        results["variants"][tag] = row
        print(f"[{tag}] whole {mse_w.mean():.4f} ood {mse_o.mean():.4f} "
              f"({dt:.0f}s)" + (f" fusion_t {sorted(set(ft.tolist()))}"
                                if len(ft) else ""), flush=True)
        return mse_w, mse_o

    cfg_un = cfg.replace(sampler=dataclasses.replace(
        cfg.sampler, classifier=False))
    uw, uo = run("ungated", LocalDiffusionPipeline(cfg_un, gd, params))
    gw, go = run("gated", LocalDiffusionPipeline(cfg, gd, params,
                                                 classifier_gate=gate))
    dw, do = gw - uw, go - uo
    results["gated_minus_ungated"] = {
        "whole_delta": float(dw.mean()), "ood_delta": float(do.mean()),
        "ood_delta_pct": round(100.0 * float(do.mean()) / float(uo.mean()), 2),
    }
    print(f"gated − ungated: whole Δ {dw.mean():+.4f} ood Δ {do.mean():+.4f} "
          f"({results['gated_minus_ungated']['ood_delta_pct']:+.1f}%)",
          flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
