"""OOD detection front-end: conditioning image → (soft mask, binary mask).

Stage A of the inference pipeline (reference test.py:199-383): per-dataset
preprocessing, PatchCore or segmentation detection, threshold ladder, soft
mask — or the committed manual-mask override.  Device math (backbone, NN
search, blur, resize) is jitted; the per-image scalar ladder runs on host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import os

from localdiffusion_tpu.config import Config
from localdiffusion_tpu.ood.patchcore import PatchCore
from localdiffusion_tpu.ood.thresholds import (
    dilate_with_backoff,
    ladder_for,
    load_ladder,
    manual_mask,
    refine_masks,
    soft_mask_from_map,
)
from localdiffusion_tpu.ops.resize import imagenet_normalize, resize_bilinear


class OODFrontend:
    """Builds the OOD mask for one conditioning batch.

    detector='patchcore' → anomaly map + ladder (test.py:244-375)
    detector='seg'       → sigmoid(seg UNet) > 0.5 (test.py:215-222, 284-289)
    detector='manual'    → left-columns mask (the committed override,
                           test.py:379-381)
    detector='none'      → uniform ones (branching bypass)
    """

    def __init__(
        self,
        config: Config,
        patchcore: Optional[PatchCore] = None,
        seg_apply=None,  # callable [B,H,W,1] -> logits
    ):
        self.config = config
        self.patchcore = patchcore
        self.seg_apply = seg_apply
        det = config.ood.detector
        if det == "patchcore" and patchcore is None:
            raise ValueError("patchcore detector requires a PatchCore instance")
        if det == "seg" and seg_apply is None:
            raise ValueError("seg detector requires a seg model apply fn")

    # ------------------------------------------------------------------
    def _preprocess_patchcore(self, lr: jnp.ndarray) -> jnp.ndarray:
        """Reference test.py:199-242: channel repeat, per-dataset
        de/re-normalization, resize to detector input, ImageNet-normalize.

        Feature sources with preprocess='raw' (seg encoder, denoiser —
        ood/features.py) instead receive the conditioning image exactly as
        the diffusion pipeline normalizes it: that is the distribution the
        source network was trained on."""
        cfg = self.config
        if (
            self.patchcore is not None
            and getattr(self.patchcore.source, "preprocess", "imagenet")
            == "raw"
        ):
            return jnp.asarray(lr, jnp.float32)
        name = cfg.data.name
        x = jnp.asarray(lr, jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        if name == "mri":
            d = cfg.data
            if d.translate_zero:
                mini = (0.0 - d.mean_t1) / d.std_t1
                x = x - abs(mini)
            x = x * d.std_t1 + d.mean_t1
            x = x / 4096.0
        else:
            # mnist/mvtec arrive in [0, 2] (test.py:230-232)
            x = jnp.where(jnp.max(x) > 1.0, x / 2.0, x)
        size = cfg.ood.input_size
        x = resize_bilinear(x, (size, size))
        return imagenet_normalize(x)

    def _ladder_variant(self) -> str:
        cfg = self.config
        name = cfg.data.name
        if name == "mnist":
            return cfg.data.mnist_cls  # '8to3' | '8to5'
        if name == "mri":
            pn = cfg.train.project_name
            return "t12flair" if "t12flair" in pn else "flair2t1"
        # mvtec: category from the path (reference test.py:330); unknown
        # categories resolve to the DEFAULT_LADDER via ladder_for
        for cat in ("transistor", "toothbrush", "grid"):
            if cat in cfg.data.mvtec_path:
                return cat
        return os.path.basename(os.path.dirname(cfg.data.mvtec_path)) or "unknown"

    # ------------------------------------------------------------------
    def detect(
        self, lr: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """→ (mask_pred, binary_mask, anomaly_map or None), all [B,H,W,1]."""
        cfg = self.config
        img_size = cfg.diffusion.image_size
        b = lr.shape[0]
        shape = (b, img_size, img_size, 1)
        det = cfg.ood.detector

        if det == "none":
            ones = np.ones(shape, np.float32)
            return ones, ones, None

        if det == "manual":
            m = manual_mask(shape, cfg.ood.manual_mask_cols)
            return m, m.copy(), None

        strides = (
            getattr(self.patchcore.source, "strides", None)
            if self.patchcore is not None else None
        )
        dilate = cfg.ood.resolved_mask_dilate(img_size, strides=strides)
        if det == "seg":
            logits = self.seg_apply(jnp.asarray(lr))
            probs = jax.nn.sigmoid(logits)
            binary = (np.asarray(probs) > 0.5).astype(np.float32)
            if dilate > 0:
                # same saturation back-off as the patchcore path: never
                # dilate a detected mask into the uniform-ones bypass
                # sentinel (ADVICE r2: a saturated seg mask silently routed
                # the anomaly onto the PLAIN chain)
                binary = np.stack([
                    dilate_with_backoff(m, m, dilate)[1]
                    for m in binary
                ])
            return binary, binary.copy(), np.asarray(probs)

        # patchcore
        x = self._preprocess_patchcore(jnp.asarray(lr))
        out = self.patchcore(x)
        amap = out["anomaly_map"]
        if cfg.data.name in ("mnist", "mvtec", "mvtecSR"):
            amap = resize_bilinear(amap, (img_size, img_size))
        amap_np = np.asarray(amap, np.float32)
        if cfg.ood.ladder_path and os.path.exists(cfg.ood.ladder_path):
            # self-calibrated ladder fitted from normal-set scores
            ladder = load_ladder(cfg.ood.ladder_path)
        else:
            name = "mvtec" if "mvtec" in cfg.data.name else cfg.data.name
            ladder = ladder_for(name, self._ladder_variant())
        refine = cfg.ood.mask_refine == "hysteresis"
        mask_pred, binary = soft_mask_from_map(
            amap_np, ladder, dilate=0 if refine else dilate
        )
        if refine:
            # per-image adaptive re-segmentation + hysteresis growth
            # (thresholds.refine_mask_single); any residual mask_dilate is
            # applied AFTER refinement
            mask_pred, binary = refine_masks(
                amap_np, mask_pred, binary,
                seed=cfg.ood.refine_seed,
                hi_frac=cfg.ood.refine_hi_frac,
                lo_frac=cfg.ood.refine_lo_frac,
                min_area=cfg.ood.refine_min_area,
            )
            if dilate > 0:
                pairs = [
                    dilate_with_backoff(mask_pred[i], binary[i], dilate)
                    for i in range(len(binary))
                ]
                mask_pred = np.stack([p[0] for p in pairs])
                binary = np.stack([p[1] for p in pairs])
        return mask_pred, binary, amap_np
