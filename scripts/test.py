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
    from localdiffusion_tpu.utils.logging import enable_compilation_cache

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
    args = ap.parse_args()

    from scripts.train import load_config

    cfg = load_config(args.config)
    import dataclasses

    if args.detector:
        cfg = cfg.replace(ood=dataclasses.replace(cfg.ood, detector=args.detector))
    if args.mask_dilate is not None:
        cfg = cfg.replace(
            ood=dataclasses.replace(cfg.ood, mask_dilate=args.mask_dilate)
        )

    from localdiffusion_tpu.data import MNISTDataset, load_mnist_arrays, synthetic_digits
    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from localdiffusion_tpu.ood.frontend import OODFrontend
    from localdiffusion_tpu.ood.patchcore import PatchCore
    from localdiffusion_tpu.pipeline import LocalDiffusionPipeline
    from localdiffusion_tpu.train.trainer import Trainer

    np.random.seed(0)

    import jax.numpy as _jnp

    gd = GaussianDiffusion(
        cfg.model, cfg.diffusion, dtype=getattr(_jnp, cfg.train.compute_dtype)
    )
    trainer = Trainer(gd, cfg.train)
    if args.params_npz:
        from localdiffusion_tpu.utils.params_io import load_params_npz

        template = gd.init_params(jax.random.PRNGKey(0))
        params = load_params_npz(args.params_npz, template)
        print(f"loaded params snapshot {args.params_npz}")
    else:
        try:
            state = trainer.load(args.milestone)
            print(f"loaded milestone {args.milestone}")
        except Exception as e:
            print(f"WARNING: no checkpoint ({e}); using random init")
            state = trainer.init_state(jax.random.PRNGKey(0))
        # EMA model for eval (reference test.py:144-147)
        params = state.ema_params

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

    frontend = None
    if cfg.ood.detector == "none":
        # explicit plain-chain run: uniform-ones masks → branching bypass
        # (reference ddpm.py:1110-1117), regardless of gt seg availability
        frontend = OODFrontend(cfg)
    elif cfg.ood.detector == "seg":
        import orbax.checkpoint as ocp

        from localdiffusion_tpu.models import SegUNet
        from localdiffusion_tpu.ood.frontend import OODFrontend

        seg_model = SegUNet()
        seg_path = os.path.abspath("results/seg/best_dice")
        if os.path.exists(seg_path):
            ckptr = ocp.StandardCheckpointer()
            template = jax.device_get(
                seg_model.init(
                    jax.random.PRNGKey(0),
                    np.zeros((1, cfg.diffusion.image_size, cfg.diffusion.image_size, 1), np.float32),
                )
            )
            seg_params = ckptr.restore(seg_path, template)
            print("loaded seg detector checkpoint")
            frontend = OODFrontend(
                cfg, seg_apply=lambda x: seg_model.apply(seg_params, x)
            )
        elif seg_pairs is not None:
            # no trained detector — use ground-truth seg masks (the
            # reference's commented gt-mask path, test.py:325-327)
            print("no seg checkpoint — using ground-truth seg masks")
            frontend = None
    elif cfg.sampler.ood_ad and cfg.ood.detector != "none":
        pc = None
        if cfg.ood.detector == "patchcore":
            mb = None
            if cfg.ood.memory_bank_path and os.path.exists(cfg.ood.memory_bank_path):
                mb = np.load(cfg.ood.memory_bank_path)
                print(f"loaded memory bank {mb.shape}")
                # auto-discover the self-calibrated ladder saved next to the
                # bank by scripts/anomaly_model_train.py
                if not cfg.ood.ladder_path:
                    lad = os.path.splitext(cfg.ood.memory_bank_path)[0] + "_ladder.json"
                    if os.path.exists(lad):
                        import dataclasses as _dc

                        cfg = cfg.replace(ood=_dc.replace(cfg.ood, ladder_path=lad))
                        print(f"using fitted threshold ladder {lad}")
            pc = PatchCore(cfg.ood, memory_bank=mb)
        frontend = OODFrontend(cfg, patchcore=pc)
        if pc is not None and pc.memory_bank is None:
            # no memory bank — build one from the conditioning stream with
            # the frontend's own preprocessing (bank and inference-time maps
            # must share it)
            print("no memory bank — building from the conditioning stream")
            prep = frontend._preprocess_patchcore(np.asarray(lr[:16]))
            pc.build_memory_bank([np.asarray(prep)])

    # optional classifier-gated re-branching (reference ddpm.py:622-625,
    # 883-916): reuses the PatchCore detector as the accept/reject oracle
    classifier_gate = None
    if cfg.sampler.classifier:
        if gd.is_ddim_sampling:
            print("NOTE: classifier gate applies to the DDPM ancestral path "
                  "only (reference ddim_sample has no classifier logic, "
                  "ddpm.py:979-1075) — ignored under DDIM; set "
                  "sampling_timesteps: null to exercise it")
        from localdiffusion_tpu.ood.classifier import ClassifierPatchCore

        cls_pc = frontend.patchcore if (
            frontend is not None and getattr(frontend, "patchcore", None) is not None
        ) else None
        if cls_pc is None:
            # classifier oracle independent of the mask detector: the
            # reference loads its own patchcore+bank selected by
            # classifier_obj (models.py:278-287, e.g.
            # memory_bank_mvtec_{obj}.npy) — look for an obj-specific bank
            # next to the detector bank first, then fall back to it
            mb = None
            if cfg.ood.memory_bank_path:
                base = cfg.ood.memory_bank_path
                obj_path = os.path.join(
                    os.path.dirname(base),
                    f"memory_bank_{cfg.data.name}_{cfg.sampler.classifier_obj}.npy",
                )
                for cand in (obj_path, base):
                    if os.path.exists(cand):
                        mb = np.load(cand)
                        print(f"classifier memory bank: {cand} {mb.shape}")
                        break
            cls_pc = PatchCore(cfg.ood, memory_bank=mb)
            if mb is None:
                from localdiffusion_tpu.ood.classifier import preprocess_for_patchcore

                prep = preprocess_for_patchcore(np.asarray(lr[:16]), cfg.ood.input_size)
                cls_pc.build_memory_bank([np.asarray(prep)])
        thr = cfg.ood.classifier_threshold
        cls = ClassifierPatchCore(cls_pc, threshold=thr)
        if thr is None:
            print("calibrating classifier threshold from the test stream")
            loader = [(hr[i : i + 1], 1) for i in range(min(8, len(hr)))] + [
                (lr[i : i + 1], 0) for i in range(min(8, len(lr)))
            ]
            cls.calibrate(loader)
        classifier_gate = cls.as_sampler_gate()

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
