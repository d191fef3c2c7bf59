"""Pipeline factory: config → ready-to-run LocalDiffusionPipeline.

Extracts the construction flow of the reference inference script
(reference test.py:100-180: model load, EMA params, PatchCore/seg detector
wiring, classifier gate) into library functions, so entry points
(scripts/test.py, scripts/serve.py) and user code build identical
pipelines.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from localdiffusion_tpu.config import Config


def build_gd(cfg: Config):
    import jax.numpy as jnp

    from localdiffusion_tpu.diffusion.gaussian import GaussianDiffusion

    return GaussianDiffusion(
        cfg.model, cfg.diffusion, dtype=getattr(jnp, cfg.train.compute_dtype)
    )


def load_params(cfg: Config, gd=None, milestone: str = "latest",
                params_npz: Optional[str] = None, verbose: bool = True,
                strict: bool = False):
    """EMA params for inference (reference test.py:144-147), from a slim
    npz snapshot or an Orbax milestone; random init as last resort unless
    `strict` — a deployment (scripts/serve.py) must fail startup on a
    missing/corrupt checkpoint rather than silently serve random-init
    predictions (ADVICE r2)."""
    from localdiffusion_tpu.train.trainer import Trainer

    gd = gd if gd is not None else build_gd(cfg)
    if params_npz:
        from localdiffusion_tpu.utils.params_io import load_params_npz

        template = gd.init_params(jax.random.PRNGKey(0))
        params = load_params_npz(params_npz, template)
        if verbose:
            print(f"loaded params snapshot {params_npz}")
        return params
    trainer = Trainer(gd, cfg.train)
    try:
        state = trainer.load(milestone)
        if verbose:
            print(f"loaded milestone {milestone}")
    except Exception as e:
        if strict:
            raise RuntimeError(
                f"checkpoint milestone {milestone!r} could not be loaded "
                f"({e}); refusing to serve random-init params"
            ) from e
        if verbose:
            print(f"WARNING: no checkpoint ({e}); using random init")
        state = trainer.init_state(jax.random.PRNGKey(0))
    return state.ema_params


def build_frontend(cfg: Config, calibration_images=None, verbose: bool = True
                   ) -> Tuple[Optional[object], Config]:
    """Stage-A detector frontend for cfg.ood.detector.

    Returns (frontend, cfg) — cfg may gain a discovered ladder_path.
    frontend is None only for detector='seg' without a trained checkpoint
    (callers may fall back to ground-truth masks, reference test.py:325-327).
    `calibration_images` (normal conditioning images) back-fill a missing
    PatchCore memory bank.
    """
    from localdiffusion_tpu.ood.frontend import OODFrontend

    det = cfg.ood.detector
    if det == "none":
        # uniform-ones masks → branching bypass (reference ddpm.py:1110-1117)
        return OODFrontend(cfg), cfg
    if det == "seg":
        from localdiffusion_tpu.models import SegUNet
        from localdiffusion_tpu.ood.features import load_seg_params

        seg_model = SegUNet()
        seg_path, seg_params = load_seg_params(
            cfg.ood.seg_model_path, cfg.diffusion.image_size
        )
        if seg_params is not None:
            if verbose:
                print(f"loaded seg detector checkpoint {seg_path}")
            return (
                OODFrontend(cfg, seg_apply=lambda x: seg_model.apply(seg_params, x)),
                cfg,
            )
        return None, cfg
    if cfg.sampler.ood_ad:
        from localdiffusion_tpu.ood.patchcore import PatchCore

        pc = None
        if det == "patchcore":
            mb = None
            if cfg.ood.memory_bank_path and os.path.exists(cfg.ood.memory_bank_path):
                mb = np.load(cfg.ood.memory_bank_path)
                if verbose:
                    print(f"loaded memory bank {mb.shape}")
                # auto-discover the self-calibrated ladder saved next to the
                # bank by scripts/anomaly_model_train.py
                if not cfg.ood.ladder_path:
                    lad = os.path.splitext(cfg.ood.memory_bank_path)[0] + "_ladder.json"
                    if os.path.exists(lad):
                        import dataclasses as _dc

                        cfg = cfg.replace(ood=_dc.replace(cfg.ood, ladder_path=lad))
                        if verbose:
                            print(f"using fitted threshold ladder {lad}")
            source = None
            if cfg.ood.feature_source != "wrn":
                from localdiffusion_tpu.ood.features import make_feature_source

                source = make_feature_source(cfg, verbose=verbose)
            pc = PatchCore(cfg.ood, memory_bank=mb, source=source)
        frontend = OODFrontend(cfg, patchcore=pc)
        if pc is not None and pc.memory_bank is None:
            if calibration_images is None:
                raise ValueError(
                    "patchcore detector has no memory bank "
                    f"({cfg.ood.memory_bank_path!r}) and no calibration_images "
                    "to build one — run scripts/anomaly_model_train.py first"
                )
            if verbose:
                print("no memory bank — building from the calibration stream")
            prep = frontend._preprocess_patchcore(np.asarray(calibration_images))
            pc.build_memory_bank([np.asarray(prep)])
        return frontend, cfg
    # ood_ad off with a non-'none' detector: no Stage A — the pipeline uses
    # uniform-ones masks (callers may substitute ground-truth masks)
    return None, cfg


def build_classifier_gate(cfg: Config, frontend=None, calibration_pairs=None,
                          verbose: bool = True):
    """Classifier-gated re-branching oracle (reference ddpm.py:622-625,
    883-916) — PatchCore reused as the accept/reject classifier.

    `calibration_pairs` is an iterable of (image_batch, label) used only
    when cfg.ood.classifier_threshold is unset (ROC calibration,
    reference models.py:338-402)."""
    if not cfg.sampler.classifier:
        return None
    from localdiffusion_tpu.ood.classifier import ClassifierPatchCore
    from localdiffusion_tpu.ood.patchcore import PatchCore

    # classifier oracle independent of the mask detector: the reference
    # loads its own patchcore+bank selected by classifier_obj
    # (models.py:278-287, e.g. memory_bank_mvtec_{obj}.npy).  The obj bank
    # is preferred over reusing the mask detector's bank — the classifier
    # scores generated TARGET-domain x_starts, the detector scores
    # CONDITIONING images, and those distributions differ (MRI: FLAIR vs
    # T1).  The obj bank carries the embedding geometry of whatever
    # feature source built it, so the oracle's PatchCore is constructed
    # with the configured source (ood/features.py), not the WRN default.
    cls_pc = None
    if cfg.ood.memory_bank_path:
        base = cfg.ood.memory_bank_path
        obj_path = os.path.join(
            os.path.dirname(base),
            f"memory_bank_{cfg.data.name}_{cfg.sampler.classifier_obj}.npy",
        )
        if os.path.exists(obj_path):
            mb = np.load(obj_path)
            if verbose:
                print(f"classifier memory bank: {obj_path} {mb.shape}")
            from localdiffusion_tpu.ood.features import make_feature_source

            src = make_feature_source(cfg, verbose=verbose)
            cls_pc = PatchCore(cfg.ood, memory_bank=mb, source=src)
    if cls_pc is None and frontend is not None and getattr(
        frontend, "patchcore", None
    ) is not None:
        cls_pc = frontend.patchcore
    if cls_pc is None:
        mb = None
        if cfg.ood.memory_bank_path and os.path.exists(
            cfg.ood.memory_bank_path
        ):
            mb = np.load(cfg.ood.memory_bank_path)
            if verbose:
                print(
                    f"classifier memory bank: {cfg.ood.memory_bank_path} "
                    f"{mb.shape}"
                )
        cls_pc = PatchCore(cfg.ood, memory_bank=mb)
        if mb is None:
            if calibration_pairs is None:
                raise ValueError(
                    "classifier gate has no memory bank and no "
                    "calibration_pairs to build one"
                )
            from localdiffusion_tpu.ood.classifier import preprocess_for_patchcore

            imgs = np.concatenate([np.asarray(b) for b, _ in calibration_pairs])
            prep = preprocess_for_patchcore(imgs, cfg.ood.input_size)
            cls_pc.build_memory_bank([np.asarray(prep)])
    thr = cfg.ood.classifier_threshold
    cls = ClassifierPatchCore(cls_pc, threshold=thr)
    if thr is None:
        if calibration_pairs is None:
            raise ValueError(
                "classifier_threshold unset and no calibration_pairs to "
                "ROC-calibrate from"
            )
        if verbose:
            print("calibrating classifier threshold from the stream")
        cls.calibrate(calibration_pairs)
    return cls.as_sampler_gate(polarity=cfg.sampler.classifier_polarity)


def build_pipeline(cfg: Config, milestone: str = "latest",
                   params_npz: Optional[str] = None,
                   calibration_images=None, calibration_pairs=None,
                   verbose: bool = True, strict: bool = False, mesh=None):
    """One-call pipeline construction (the library equivalent of
    scripts/test.py's setup).  Raises for detector='seg' without a trained
    seg checkpoint — the ground-truth-mask fallback is a script-level
    evaluation flow, not a deployable pipeline."""
    from localdiffusion_tpu.pipeline import LocalDiffusionPipeline

    gd = build_gd(cfg)
    params = load_params(cfg, gd, milestone=milestone, params_npz=params_npz,
                         verbose=verbose, strict=strict)
    frontend, cfg = build_frontend(cfg, calibration_images=calibration_images,
                                   verbose=verbose)
    if frontend is None and cfg.ood.detector == "seg":
        raise ValueError(
            "detector='seg' has no trained checkpoint (results/seg/best_dice)"
        )
    gate = build_classifier_gate(cfg, frontend,
                                 calibration_pairs=calibration_pairs,
                                 verbose=verbose)
    return LocalDiffusionPipeline(cfg, gd, params, frontend=frontend,
                                  classifier_gate=gate, mesh=mesh)
